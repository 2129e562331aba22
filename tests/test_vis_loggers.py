"""Visualization logging surface (gui/rerun_vis.py + gui/viser_vis.py) —
mirrors gui/rerun/logger.h:96-163 and pymomentum/{rerun_vis,viser_vis}.py.
The rerun/viser SDKs are absent in this image, so the tests drive the
fallback recorders, which capture the identical call stream."""

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.gui import rerun_vis as rv
from momentum_tpu.gui import viser_vis as vv
from momentum_tpu.testing.fixtures import create_test_character


def _char_and_motion(f=4):
    char = create_test_character(4)
    rng = np.random.default_rng(12345)
    motion = jnp.asarray(
        rng.uniform(-0.2, 0.2, (f, char.num_model_parameters)), jnp.float32)
    return char, motion


class TestRerunLogger:
    def test_log_character_stream(self):
        char, motion = _char_and_motion()
        rec = rv.make_recording()
        assert isinstance(rec, rv.FallbackRecording)  # no SDK in this image
        states = char.skeleton_states(motion[0])
        rv.log_character(rec, "world/char", char, states)
        paths = rec.paths()
        assert "world/char/skeleton/bones" in paths
        assert "world/char/skeleton/joints" in paths
        assert "world/char/locators" in paths
        joints = [e for e in rec.entries
                  if e.path == "world/char/skeleton/joints"][0]
        assert joints.payload["positions"].shape == (char.num_joints, 3)

    def test_log_animation_timeline_and_save(self, tmp_path):
        char, motion = _char_and_motion(f=5)
        rec = rv.make_recording()
        rv.log_motion(rec, "world/char", char, motion, fps=30.0)
        # one timeline entry per frame for each sub-path
        times = sorted({e.time[1] for e in rec.entries if e.time})
        assert times == [0, 1, 2, 3, 4]
        out = str(tmp_path / "capture.npz")
        rec.save(out)
        import json
        data = np.load(out, allow_pickle=True)
        index = json.loads(bytes(data["__index__"]))
        assert len(index) == len(rec.entries)
        # every referenced array is present
        for entry in index:
            for k, ref in entry["keys"].items():
                if "array" in ref:
                    assert ref["array"] in data

    def test_log_model_params_split(self):
        char, motion = _char_and_motion()
        rec = rv.make_recording()
        names = char.parameter_transform.names
        rv.log_model_params(rec, "world_params", "pose_params", names,
                            np.asarray(motion[0]))
        world = [e for e in rec.entries if e.path.startswith("world_params/")]
        pose = [e for e in rec.entries if e.path.startswith("pose_params/")]
        assert len(world) == 6 and len(world) + len(pose) == len(names)

    def test_log_markers_drops_occluded(self):
        rec = rv.make_recording()
        pos = np.zeros((5, 3), np.float32)
        occ = np.asarray([False, True, False, True, False])
        rv.log_markers(rec, "markers", pos, occ)
        assert rec.entries[0].payload["positions"].shape == (3, 3)

    def test_replay_into_another_stream(self):
        char, motion = _char_and_motion()
        rec = rv.make_recording()
        rv.log_character(rec, "c", char, char.skeleton_states(motion[0]))
        rec2 = rv.FallbackRecording()
        rv.replay(rec, rec2)
        assert rec2.paths() == rec.paths()
        assert rec2.count() == rec.count()


class TestViserLogger:
    def test_show_and_update(self):
        char, motion = _char_and_motion()
        scene = vv.make_scene()
        assert isinstance(scene, vv.FallbackScene)
        states0 = char.skeleton_states(motion[0])
        h = vv.show_character(scene, char, states0)
        assert "/character/joints" in scene.nodes
        assert "/character/bones" in scene.nodes
        assert "/character/locators" in scene.nodes
        before = dict(h.joints.props)
        vv.update_character(h, char, char.skeleton_states(motion[1]))
        assert ("/character/joints", "points") in scene.updates
        assert not np.allclose(h.joints.props["points"], before["points"])

    def test_animate_motion(self):
        char, motion = _char_and_motion(f=3)
        scene = vv.make_scene()
        frames = []
        vv.animate_motion(scene, char, motion,
                          frame_callback=lambda i: frames.append(i))
        assert frames == [0, 1, 2]
        # 3 frames × (joints+bones+locators) updates
        assert len(scene.updates) >= 9


def test_log_marker_locator_correspondence():
    """Segments pair same-named markers and locators; occluded and unmatched
    markers are skipped; far pairs get the outlier color
    (logMarkerLocatorCorrespondence, logger.h:79-86)."""
    import numpy as np

    char, motion = _char_and_motion()
    rec = rv.make_recording()
    states = char.skeleton_states(motion[0])
    world = np.asarray(char.locators.world_positions(states))
    names = list(char.locators.names) + ["unmatched"]
    markers = np.concatenate([world + 0.01, [[9.0, 9.0, 9.0]]])
    occluded = np.zeros(len(names), bool)
    occluded[1] = True
    rv.log_marker_locator_correspondence(
        rec, "world/corr", char, states, markers, names,
        occluded=occluded, error_threshold=0.1)
    entry = [e for e in rec.entries if e.path == "world/corr"][0]
    # all locators except the occluded one; the unmatched name is skipped
    assert len(entry.payload["strips"]) == char.locators.num_locators - 1
    assert all(c == (64, 200, 64) for c in entry.payload["colors"])

    rec2 = rv.make_recording()
    far = world + np.asarray([5.0, 0.0, 0.0])
    rv.log_marker_locator_correspondence(
        rec2, "world/corr", char, states, far, list(char.locators.names),
        error_threshold=0.1)
    entry2 = [e for e in rec2.entries if e.path == "world/corr"][0]
    assert all(c == (255, 64, 64) for c in entry2.payload["colors"])
