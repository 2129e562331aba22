"""End-to-end smoke of the example CLIs (reference: momentum/examples/*)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_assets")
    from momentum_tpu.io.gltf import save_character_glb
    from momentum_tpu.io.markers import RawMarkerData, save_trc
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5)
    motion = np.zeros((6, char.num_model_parameters), np.float32)
    motion[:, 0] = np.linspace(0, 0.4, 6)
    glb = str(d / "char.glb")
    save_character_glb(glb, char, motion=motion, fps=30.0)
    states = jax.vmap(char.skeleton_states)(jnp.asarray(motion))
    pos = np.asarray(jax.vmap(char.locators.world_positions)(states))
    trc = str(d / "markers.trc")
    save_trc(trc, RawMarkerData(pos, np.zeros(pos.shape[:2], bool),
                                list(char.locators.names), 30.0))
    return dict(glb=glb, trc=trc, dir=str(d))


def _run(*args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=600)


def test_convert_model_roundtrip(assets):
    out = os.path.join(assets["dir"], "out.bvh")
    r = _run("examples/convert_model.py", "--in", assets["glb"], "--out", out)
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(out)
    # and back through the BVH loader
    r2 = _run("examples/print_fps.py", out, assets["glb"])
    assert r2.returncode == 0, r2.stderr[-800:]
    assert "6 frames" in r2.stdout


def test_export_objs(assets):
    out = os.path.join(assets["dir"], "frames")
    r = _run("examples/export_objs.py", "--character", assets["glb"],
             "--out", out, "--stride", "3")
    assert r.returncode == 0, r.stderr[-800:]
    assert len(os.listdir(out)) == 2


def test_viewer_gif(assets):
    out = os.path.join(assets["dir"], "view.gif")
    r = _run("examples/viewer.py", "--in", assets["glb"], "--out", out,
             "--size", "48", "--skeleton")
    assert r.returncode == 0, r.stderr[-800:]
    assert open(out, "rb").read(6) == b"GIF89a"


def test_process_markers_with_config(assets):
    cfg = os.path.join(assets["dir"], "pm.cfg")
    with open(cfg, "w") as f:
        f.write("[tracking]\nmax-iter = 6\nno-calibrate = 1\n")
    out = os.path.join(assets["dir"], "tracked.glb")
    r = _run("examples/process_markers.py", "-c", cfg,
             "--markers", assets["trc"], "--character", assets["glb"],
             "--out", out)
    assert r.returncode == 0, r.stderr[-800:]
    assert "wrote" in r.stdout and os.path.exists(out)


def test_tutorial_runs_all_sections(assets):
    r = _run("examples/tutorial.py", "--out-dir", assets["dir"])
    assert r.returncode == 0, r.stderr[-800:]
    for marker in ("1. character basics", "2. single IK", "3. batched IK",
                   "4. differentiable IK", "5. sequence solve",
                   "6. IO round trip", "7. rendering",
                   "8. multi-view 2D keypoint tracking", "tutorial done"):
        assert marker in r.stdout, marker
    # the universal-scale calibration demo must actually recover the scale
    assert "recovered shared scale 0.150" in r.stdout
