"""IO round-trip tests (reference pattern: momentum/test/io/ + bundled
resources; real reference assets are read from /root/reference when present)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.io as mio
from momentum_tpu.errors.pose_prior import Mppca
from momentum_tpu.testing.fixtures import create_test_character

REF = "/root/reference/momentum/test/resources"


def _rng():
    return np.random.default_rng(12345)


class TestModelDefinition:
    MODEL_TEXT = """Momentum Model Definition V1.0

[ParameterTransform]
root.tx = 1 * root_tx
root.ty = 1 * root_ty
root.rz = 0.5 * shared_rz
joint1.rx = 1 * joint1_rx
joint1.rz = 0.5 * shared_rz
joint1.sc = 1 * scale  # comment
joint2.ty = 0.1
joint2.rx = 2 * joint1.rx

[ParameterSets]
parameterset rigid root_tx root_ty

[ParameterLimits]
limit root_tx minmax [-0.5, 0.5] 2.0
limit joint1.rx minmax [-1, 1]
limit joint1.rx minmax_passive [-2, 2]
limit root_tx linear root_ty [2, 0.5]
limit root_tx halfplane root_ty [1, 1] 0.25
"""

    def _skel(self):
        from momentum_tpu.character import make_skeleton
        return make_skeleton([-1, 0, 1], names=["root", "joint1", "joint2"])

    def test_parse_transform(self):
        skel = self._skel()
        pt, limits = mio.load_model_definition(self.MODEL_TEXT, skel)
        assert pt.names == ("root_tx", "root_ty", "shared_rz", "joint1_rx", "scale")
        mat = np.asarray(pt.transform)
        assert mat[0, 0] == 1.0  # root.tx <- root_tx
        assert mat[5, 2] == 0.5  # root.rz <- 0.5 shared_rz
        assert mat[7 + 5, 2] == 0.5  # joint1.rz
        assert mat[7 + 6, 4] == 1.0  # joint1.sc <- scale
        # joint2.rx = 2 * joint1.rx -> copies joint1.rx's terms scaled by 2
        assert mat[14 + 3, 3] == 2.0
        # bare-number offset
        assert float(np.asarray(pt.offsets)[14 + 1]) == pytest.approx(0.1)
        assert pt.parameter_sets["rigid"] == (0, 1)

    def test_parse_limits(self):
        skel = self._skel()
        pt, limits = mio.load_model_definition(self.MODEL_TEXT, skel)
        c = limits.counts
        assert c["minmax"] == 1 and c["minmax_joint"] == 2
        assert c["linear"] == 1 and c["halfplane"] == 1
        np.testing.assert_allclose(np.asarray(limits.minmax_bounds)[0], [-0.5, 0.5])
        assert float(np.asarray(limits.minmax_weight)[0]) == 2.0
        assert float(np.asarray(limits.minmax_joint_passive)[1]) == 1.0
        # halfplane normal normalized
        n = np.asarray(limits.halfplane_normal)[0]
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)

    def test_write_round_trip(self):
        skel = self._skel()
        pt, limits = mio.load_model_definition(self.MODEL_TEXT, skel)
        text = mio.write_model_definition(pt, skel, limits)
        pt2, limits2 = mio.load_model_definition(text, skel)
        assert pt2.names == pt.names
        np.testing.assert_allclose(np.asarray(pt2.transform), np.asarray(pt.transform))
        np.testing.assert_allclose(np.asarray(pt2.offsets), np.asarray(pt.offsets))
        assert limits2.counts["minmax"] == limits.counts["minmax"]

    def test_reference_sample_model(self):
        path = "/root/reference/momentum/examples/convert_model/test_data/character.model"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.character import make_skeleton
        skel = make_skeleton([-1, 0, 1], names=["root", "joint1", "joint2"])
        pt, _ = mio.load_model_definition(path, skel)
        assert "scale_global" in pt.names
        assert "shared_rz" in pt.names


class TestMotionIO:
    def test_mmo_round_trip(self, tmp_path):
        rng = _rng()
        poses = rng.normal(size=(20, 9)).astype(np.float32)
        scale = rng.normal(size=4).astype(np.float32)
        pnames = [f"p{i}" for i in range(9)]
        jnames = [f"j{i}" for i in range(4)]
        path = str(tmp_path / "test.mmo")
        mio.save_mmo(path, poses, scale, pnames, jnames)
        p2, s2, pn2, jn2 = mio.load_mmo(path)
        np.testing.assert_allclose(p2, poses)
        np.testing.assert_allclose(s2, scale)
        assert pn2 == pnames and jn2 == jnames


class TestMppcaIO:
    def test_round_trip(self, tmp_path):
        rng = _rng()
        d, k = 6, 3
        prior = Mppca.from_components(
            np.ones(k) / k,
            rng.normal(size=(k, d)),
            [rng.normal(size=(d, 2)) for _ in range(k)],
            rng.uniform(0.1, 0.5, k),
            names=tuple(f"p{i}" for i in range(d)),
        )
        path = str(tmp_path / "prior.mppca")
        mio.save_mppca(path, prior)
        p2 = mio.load_mppca(path)
        np.testing.assert_allclose(np.asarray(p2.mu), np.asarray(prior.mu), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2.cinv), np.asarray(prior.cinv), atol=1e-4)
        np.testing.assert_allclose(np.asarray(p2.rpre), np.asarray(prior.rpre), atol=1e-5)
        assert p2.names == prior.names
        # whitening factor consistency: LᵀL == Cinv
        l = np.asarray(p2.l)
        np.testing.assert_allclose(
            np.einsum("kij,kil->kjl", l, l), np.asarray(p2.cinv), atol=1e-3)


class TestMarkers:
    def test_reference_c3d(self):
        path = f"{REF}/markers.c3d"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        data = mio.load_c3d(path)
        assert data.num_frames > 0 and data.num_markers > 0
        assert len(data.names) == data.num_markers
        vis = data.positions[~data.occluded]
        assert np.isfinite(vis).all()
        assert np.abs(vis).max() < 1e5

    def test_reference_c3d_int_vs_real(self):
        pi = f"{REF}/data_format_variant/int/dec_int.c3d"
        pr = f"{REF}/data_format_variant/real/dec_real.c3d"
        if not (os.path.exists(pi) and os.path.exists(pr)):
            pytest.skip("reference asset unavailable")
        di = mio.load_c3d(pi)
        dr = mio.load_c3d(pr)
        assert di.num_markers == dr.num_markers
        both = ~(di.occluded | dr.occluded)
        scale = max(1.0, np.abs(dr.positions[both]).max())
        np.testing.assert_allclose(
            di.positions[both] / scale, dr.positions[both] / scale, atol=2e-3)

    def test_trc_round_trip(self, tmp_path):
        rng = _rng()
        pos = rng.normal(size=(5, 3, 3)).astype(np.float32)
        occ = np.zeros((5, 3), bool)
        occ[2, 1] = True
        data = mio.RawMarkerData(pos, occ, ["A", "B", "C"], 60.0)
        path = str(tmp_path / "test.trc")
        mio.save_trc(path, data)
        d2 = mio.load_trc(path)
        assert d2.names == ["A", "B", "C"]
        np.testing.assert_array_equal(d2.occluded, occ)
        np.testing.assert_allclose(d2.positions[~occ], pos[~occ], atol=1e-4)


class TestBvh:
    def test_round_trip(self, tmp_path):
        char = create_test_character(4)
        rng = _rng()
        f = 3
        jp = np.zeros((f, char.num_joints, 7), np.float32)
        jp[:, :, 3:6] = rng.uniform(-0.5, 0.5, (f, char.num_joints, 3))
        jp[:, 0, :3] = rng.uniform(-1, 1, (f, 3))
        path = str(tmp_path / "test.bvh")
        mio.save_bvh(path, char, jp.reshape(f, -1), fps=30.0)
        char2, jp2, fps = mio.load_bvh(path)
        assert abs(fps - 30.0) < 1e-3
        # joint count includes end-sites; compare world positions of real joints
        from momentum_tpu.character import fk
        s1 = fk.global_skel_states(char.skeleton, jnp.asarray(jp.reshape(f, -1)))
        s2 = fk.global_skel_states(char2.skeleton, jp2)
        name_map = [char2.skeleton.joint_names.index(n) for n in char.skeleton.joint_names]
        np.testing.assert_allclose(
            np.asarray(s1[..., :3]), np.asarray(s2[..., name_map, :3]), atol=1e-3)


class TestGltf:
    def test_character_round_trip(self, tmp_path):
        char = create_test_character(4)
        rng = _rng()
        motion = rng.normal(0, 0.2, (6, char.num_model_parameters)).astype(np.float32)
        path = str(tmp_path / "char.glb")
        mio.save_character_glb(path, char, motion=motion, fps=60.0)
        char2, motion2, fps = mio.load_character_glb(path)
        assert fps == 60.0
        assert char2.skeleton.joint_names == char.skeleton.joint_names
        np.testing.assert_allclose(
            np.asarray(char2.skeleton.translation_offset),
            np.asarray(char.skeleton.translation_offset), atol=1e-6)
        assert char2.parameter_transform.names == char.parameter_transform.names
        np.testing.assert_allclose(
            np.asarray(char2.parameter_transform.transform),
            np.asarray(char.parameter_transform.transform), atol=1e-6)
        np.testing.assert_allclose(np.asarray(motion2), motion, atol=1e-6)
        # locators + collision + mesh + skin survive
        assert char2.locators.num_locators == char.locators.num_locators
        np.testing.assert_allclose(np.asarray(char2.locators.offset),
                                   np.asarray(char.locators.offset), atol=1e-6)
        assert char2.collision.num_capsules == char.collision.num_capsules
        assert char2.mesh.num_vertices == char.mesh.num_vertices
        np.testing.assert_allclose(np.asarray(char2.skin_weights.weight),
                                   np.asarray(char.skin_weights.weight), atol=1e-6)
        # FK equivalence
        theta = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(char.skeleton_states(theta)),
            np.asarray(char2.skeleton_states(theta)), atol=1e-5)

    def test_reference_glb_loads(self):
        path = f"{REF}/blender_simple_armature.glb"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        char, motion, fps = mio.load_character_glb(path)
        assert char.num_joints > 0


class TestUrdf:
    URDF = """<robot name="arm">
  <link name="base"/>
  <link name="upper"/>
  <link name="lower"/>
  <joint name="shoulder" type="revolute">
    <parent link="base"/><child link="upper"/>
    <origin xyz="0 0.5 0" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-1.57" upper="1.57"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/><child link="lower"/>
    <origin xyz="0 1 0" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2.0" upper="0.1"/>
  </joint>
</robot>"""

    def test_load(self):
        from momentum_tpu.io.urdf import load_urdf
        char = load_urdf(self.URDF)
        assert char.skeleton.joint_names == ("base", "upper", "lower")
        assert char.parameter_transform.names == ("shoulder", "elbow")
        assert char.limits.counts["minmax"] == 2
        # rotating the shoulder about URDF z-axis moves the elbow in the xy plane
        theta = jnp.asarray([np.pi / 2, 0.0], jnp.float32)
        states = char.skeleton_states(theta)
        lower_pos = np.asarray(states[2, :3])
        # rest: lower at y=1.5; shoulder z-rotation by 90deg -> x = -1
        np.testing.assert_allclose(lower_pos, [-1.0, 0.5, 0.0], atol=1e-5)


class TestFbx:
    def test_reference_animation_fbx(self):
        path = "/root/reference/pymomentum/test/resources/animation_test.fbx"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.io.fbx import load_fbx
        char = load_fbx(path)
        assert char.num_joints == 3
        assert "joint1" in char.skeleton.joint_names
        # FK runs
        states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
        assert states.shape == (3, 8)

    @pytest.mark.parametrize("name", ["cube_uvs_per_vertex.fbx",
                                      "cube_uvs_per_face.fbx"])
    def test_reference_cube_fbx(self, name):
        """Both FBX UV addressing modes (ByVertice/Direct and
        ByPolygonVertex/IndexToDirect) land in Mesh.texcoords +
        texcoord_faces (mesh.h:51-55)."""
        path = f"/root/reference/momentum/test/resources/{name}"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.io.fbx import load_fbx
        char = load_fbx(path)
        assert char.mesh is not None and char.mesh.num_vertices == 8
        assert char.mesh.faces.shape[0] == 12  # cube quads fan-triangulated
        tc = np.asarray(char.mesh.texcoords)
        tf = np.asarray(char.mesh.texcoord_faces)
        assert tc.shape == (8, 2) and tf.shape == (12, 3)
        assert tf.min() >= 0 and tf.max() < tc.shape[0]
        # the cube's UV atlas lives in the unit square, all slots used
        assert tc.min() >= 0.0 and tc.max() <= 1.0
        assert len(np.unique(tf)) == 8

    def test_fbx_uv_save_round_trip(self, tmp_path):
        """Writer emits LayerElementUV (ByPolygonVertex/IndexToDirect);
        per-corner UVs survive a save→load round trip."""
        src = "/root/reference/momentum/test/resources/cube_uvs_per_face.fbx"
        if not os.path.exists(src):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.io.fbx import load_fbx
        from momentum_tpu.io.fbx_writer import save_fbx
        char = load_fbx(src)
        out = str(tmp_path / "uv_rt.fbx")
        save_fbx(out, char)
        char2 = load_fbx(out)
        tc1 = np.asarray(char.mesh.texcoords)
        tf1 = np.asarray(char.mesh.texcoord_faces)
        tc2 = np.asarray(char2.mesh.texcoords)
        tf2 = np.asarray(char2.mesh.texcoord_faces)
        np.testing.assert_allclose(tc1[tf1], tc2[tf2], atol=1e-6)
        assert np.array_equal(np.asarray(char.mesh.faces),
                              np.asarray(char2.mesh.faces))


class TestUsd:
    def test_usda_round_trip(self, tmp_path):
        """Full character round trip: skeleton + mesh + skin + locators +
        collision + parameter transform + exact model-param motion (the
        momentum:motion:* attributes, usd_animation_io.cpp:40-50)."""
        from momentum_tpu.io.usd import load_usda, save_usda
        char = create_test_character(4)
        rng = _rng()
        motion = jnp.asarray(rng.uniform(-0.2, 0.2, (3, char.num_model_parameters)),
                             jnp.float32)
        p = str(tmp_path / "c.usda")
        save_usda(p, char, motion=motion)
        c2, anim = load_usda(p)
        assert c2.skeleton.joint_names == char.skeleton.joint_names
        np.testing.assert_allclose(
            np.asarray(c2.skeleton.translation_offset),
            np.asarray(char.skeleton.translation_offset), atol=1e-5)
        # motion round-trips exactly as model params
        np.testing.assert_allclose(np.asarray(anim), np.asarray(motion),
                                   atol=1e-6)
        # parameter transform restored from momentum metadata
        assert c2.parameter_transform.names == char.parameter_transform.names
        np.testing.assert_allclose(
            np.asarray(c2.parameter_transform.transform),
            np.asarray(char.parameter_transform.transform), atol=1e-6)
        # mesh + skinning
        assert c2.mesh.num_vertices == char.mesh.num_vertices
        np.testing.assert_allclose(np.asarray(c2.mesh.vertices),
                                   np.asarray(char.mesh.vertices), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(c2.mesh.faces),
                                      np.asarray(char.mesh.faces))
        np.testing.assert_allclose(np.asarray(c2.skin_weights.weight),
                                   np.asarray(char.skin_weights.weight),
                                   atol=1e-6)
        # locators + collision prims
        assert c2.locators.names == char.locators.names
        np.testing.assert_allclose(np.asarray(c2.locators.offset),
                                   np.asarray(char.locators.offset), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c2.collision.radius),
                                   np.asarray(char.collision.radius), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c2.collision.transform),
                                   np.asarray(char.collision.transform),
                                   atol=1e-6)

    def test_usdc_round_trip(self, tmp_path):
        """Crate binary carries the same document model as text."""
        from momentum_tpu.io.usd import load_usd, save_usd
        char = create_test_character(4)
        rng = _rng()
        motion = jnp.asarray(rng.uniform(-0.2, 0.2, (2, char.num_model_parameters)),
                             jnp.float32)
        p = str(tmp_path / "c.usdc")
        save_usd(p, char, motion=motion)
        with open(p, "rb") as f:
            assert f.read(8) == b"PXR-USDC"
        c2, anim = load_usd(p)
        assert c2.skeleton.joint_names == char.skeleton.joint_names
        np.testing.assert_allclose(np.asarray(anim), np.asarray(motion),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c2.mesh.vertices),
                                   np.asarray(char.mesh.vertices), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c2.skin_weights.weight),
                                   np.asarray(char.skin_weights.weight),
                                   atol=1e-6)

    def test_usdc_bootstrap_and_toc_structural_pin(self, tmp_path):
        """Structural pin of the crate container against the PUBLISHED crate
        layout (pxr crateFile.cpp _BootStrap/_Section; reference writes
        through the pxr runtime, io/usd/usd_io.cpp:60-240):

        - bootstrap is exactly 88 bytes: ident char[8] 'PXR-USDC' +
          version uint8[8] (major/minor/patch + 5 reserved) +
          tocOffset int64 + reserved int64[8];
        - the TOC is int64 count + count × 32-byte section records
          (name char[16] NUL-padded, start int64, size int64);
        - section payloads are in-bounds, contiguous from byte 88, and
          TOKENS is an int64 count of NUL-terminated strings.

        No pxr runtime exists in this image to cross-read a golden file;
        the VALUE encoding now follows the public ValueRep layout too
        (io/usdc_crate.py, tests/test_usdc_crate.py) — this pin covers the
        container level a crate-aware tool parses first."""
        import struct

        from momentum_tpu.io.usd import save_usd

        char = create_test_character(3)
        p = str(tmp_path / "pin.usdc")
        save_usd(p, char)
        buf = open(p, "rb").read()

        # bootstrap
        assert buf[:8] == b"PXR-USDC"
        version = tuple(buf[8:16])
        assert version[3:] == (0, 0, 0, 0, 0)  # 5 reserved version bytes
        toc_off = struct.unpack_from("<q", buf, 16)[0]
        assert buf[24:88] == b"\0" * 64  # reserved int64[8]
        assert 88 <= toc_off <= len(buf) - 8

        # TOC records
        nsec = struct.unpack_from("<q", buf, toc_off)[0]
        assert nsec >= 3
        assert len(buf) == toc_off + 8 + 32 * nsec  # TOC is the file tail
        secs = []
        pos = toc_off + 8
        for _ in range(nsec):
            name = buf[pos:pos + 16].rstrip(b"\0").decode()
            start, size = struct.unpack_from("<qq", buf, pos + 16)
            secs.append((name, start, size))
            pos += 32
        names = [s[0] for s in secs]
        # known section names from the published spec
        assert set(names) <= {"TOKENS", "STRINGS", "FIELDS", "FIELDSETS",
                              "PATHS", "SPECS"}
        assert {"TOKENS", "FIELDS", "SPECS"} <= set(names)

        # sections ordered, non-overlapping, ending exactly at the TOC;
        # the region [88, first section) is the out-of-line value data area
        # (crate writes value payloads first, structural sections after)
        expect = 88
        for name, start, size in secs:
            assert start >= expect, (name, start, expect)
            assert start + size <= toc_off
            expect = start + size
        assert expect == toc_off

        # TOKENS: int64 count + count NUL-terminated strings
        tname, tstart, tsize = secs[names.index("TOKENS")]
        ntok = struct.unpack_from("<q", buf, tstart)[0]
        blob = buf[tstart + 8:tstart + tsize]
        assert blob.endswith(b"\0") and blob.count(b"\0") == ntok

    @pytest.mark.parametrize("asset,njoints", [
        ("simple_character.usda", 7),
        ("character_with_materials.usda", 17),
        ("simple_mesh.usda", 0),
    ])
    def test_reference_usd_assets(self, asset, njoints):
        """Load the reference's own UsdSkel test assets
        (momentum/test/resources/usd/)."""
        path = f"/root/reference/momentum/test/resources/usd/{asset}"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.io.usd import load_usd, parse_usda
        if njoints == 0:
            # mesh-only asset: no Skeleton prim — parse + mesh extraction
            with open(path) as f:
                stage = parse_usda(f.read())
            assert stage.find("Mesh"), "mesh prim expected"
            return
        char, _ = load_usd(path)
        assert char.skeleton.num_joints == njoints
        assert char.mesh is not None and char.mesh.num_vertices > 0
        assert char.skin_weights is not None
        # skin weights are sane: nonnegative, rows sum to ~1
        w = np.asarray(char.skin_weights.weight)
        assert (w >= 0).all()
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)

    def test_reference_simple_character_semantics(self):
        """simple_character.usda: flat joint paths ⇒ all roots; rest
        transforms preferred as local (usd_skeleton_io.cpp:171-180)."""
        path = "/root/reference/momentum/test/resources/usd/simple_character.usda"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        from momentum_tpu.io.usd import load_usd
        char, _ = load_usd(path)
        parents = np.asarray(char.skeleton.joint_parent)
        assert (parents == -1).all()  # flat names carry no hierarchy
        # rest translations match the file's restTransforms last column
        offs = np.asarray(char.skeleton.translation_offset)
        np.testing.assert_allclose(offs[1], [0.0, 1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(offs[2], [0.0, 2.0, 0.0], atol=1e-6)


class TestLegacyJson:
    def test_round_trip(self, tmp_path):
        from momentum_tpu.io.legacy_json import load_legacy_json, save_legacy_json
        char = create_test_character(4)
        p = str(tmp_path / "c.json")
        save_legacy_json(p, char)
        c2 = load_legacy_json(p)
        assert c2.skeleton.joint_names == char.skeleton.joint_names
        np.testing.assert_allclose(
            np.asarray(c2.skeleton.pre_rotation),
            np.asarray(char.skeleton.pre_rotation), atol=1e-6)
        assert c2.locators.num_locators == char.locators.num_locators


class TestFbxMotion:
    def test_reference_animation_fbx_motion(self):
        path = "/root/reference/pymomentum/test/resources/animation_test.fbx"
        if not __import__("os").path.exists(path):
            import pytest
            pytest.skip("reference asset unavailable")
        import numpy as np
        from momentum_tpu.io.fbx import load_fbx_with_motion

        char, motion, fps = load_fbx_with_motion(path, fps=30.0)
        assert fps == 30.0
        assert motion.shape[1] == char.skeleton.num_joints * 7
        assert motion.shape[0] > 1
        # the asset animates joints: sampled motion is non-constant
        assert np.abs(motion - motion[0]).max() > 1e-3
        # FK over the sampled motion is finite and moves joints
        import jax.numpy as jnp
        from momentum_tpu.character.fk import global_skel_states
        st = global_skel_states(char.skeleton, jnp.asarray(motion))
        assert bool(jnp.all(jnp.isfinite(st)))
        disp = np.abs(np.asarray(st[0][:, :3] - st[-1][:, :3])).max()
        assert disp > 1.0


class TestC3dCompatibilitySuite:
    """The reference's compatibility_test assets: the classic PI-series C3D
    files in Intel/DEC/MIPS variants (test/io resources readme)."""

    def test_all_variants_load_consistently(self):
        import os
        import numpy as np
        from momentum_tpu.io.markers import load_c3d

        base = "/root/reference/momentum/test/resources"
        files = [
            f"{base}/compatibility_test/EB015PI.c3d",
            f"{base}/compatibility_test/TESTAPI.c3d",  # Intel
            f"{base}/compatibility_test/TESTBPI.c3d",  # DEC
            f"{base}/compatibility_test/TESTCPI.c3d",  # MIPS
            f"{base}/compatibility_test/TESTDPI.c3d",
            f"{base}/data_format_variant/int/dec_int.c3d",
            f"{base}/data_format_variant/real/dec_real.c3d",
            f"{base}/data_format_variant/int/pc_int.c3d",
            f"{base}/data_format_variant/real/pc_real.c3d",
            f"{base}/file_format_variant/int/Eb015pi.c3d",
            f"{base}/file_format_variant/real/Eb015pr.c3d",
            f"{base}/file_format_variant/int/Eb015vi.c3d",
            f"{base}/file_format_variant/real/Eb015vr.c3d",
        ]
        files = [f for f in files if f and os.path.exists(f)]
        if len(files) < 4:
            import pytest
            pytest.skip("reference assets unavailable")
        seqs = {}
        for f in files:
            seq = load_c3d(f)
            assert seq.positions.shape[0] > 0, f
            assert seq.positions.shape[1] == len(seq.names), f
            vis = np.asarray(seq.occluded)
            assert vis.shape == seq.positions.shape[:2], f
            # finite where visible
            pos = np.asarray(seq.positions)
            assert np.isfinite(pos[~vis]).all(), f
            seqs[f.rsplit("/", 1)[-1]] = seq
        # TESTA (Intel) / TESTB (DEC) / TESTC (MIPS) encode the SAME capture:
        # all three must decode to identical marker trajectories
        a = seqs.get("TESTAPI.c3d")
        for other in ("TESTBPI.c3d", "TESTCPI.c3d"):
            b = seqs.get(other)
            if a is None or b is None:
                continue
            assert a.positions.shape == b.positions.shape, other
            np.testing.assert_allclose(
                np.asarray(a.positions), np.asarray(b.positions),
                atol=1e-3, err_msg=other)
        # file_format_variant: the same capture in INT vs REAL encoding
        fi = seqs.get("Eb015pi.c3d")
        fr = seqs.get("Eb015pr.c3d")
        if fi is not None and fr is not None:
            both = ~(np.asarray(fi.occluded) | np.asarray(fr.occluded))
            np.testing.assert_allclose(
                np.asarray(fi.positions)[both],
                np.asarray(fr.positions)[both], atol=2e-1)


class TestShapeIO:
    def test_blend_shape_round_trip(self, tmp_path):
        import jax.numpy as jnp
        from momentum_tpu.character.blend_shape import BlendShape
        from momentum_tpu.io.shape import (
            load_blend_shape, load_blend_shape_base, save_blend_shape,
        )

        rng = np.random.default_rng(0)
        bs = BlendShape(
            base_shape=jnp.asarray(rng.normal(0, 1, (12, 3)), jnp.float32),
            shape_vectors=jnp.asarray(rng.normal(0, 1, (4, 12, 3)),
                                      jnp.float32))
        p = str(tmp_path / "shapes.bin")
        save_blend_shape(p, bs)
        back = load_blend_shape(p)
        np.testing.assert_allclose(np.asarray(back.base_shape),
                                   np.asarray(bs.base_shape), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.shape_vectors),
                                   np.asarray(bs.shape_vectors), atol=1e-6)
        # truncation options
        t = load_blend_shape(p, expected_shapes=2, expected_vertices=5)
        assert t.shape_vectors.shape == (2, 5, 3)
        assert t.base_shape.shape == (5, 3)

    def test_pose_shape_round_trip(self, tmp_path):
        import jax.numpy as jnp
        from momentum_tpu.character.pose_shape import PoseShape
        from momentum_tpu.io.shape import load_pose_shape, save_pose_shape
        from momentum_tpu.testing.fixtures import create_test_character

        char = create_test_character(4)
        v = char.mesh.num_vertices
        rng = np.random.default_rng(1)
        ps = PoseShape(
            base_rot=char.skeleton.pre_rotation[0],
            base_shape=jnp.asarray(
                np.asarray(char.mesh.vertices)
                + rng.normal(0, 0.01, (v, 3)).astype(np.float32)),
            shape_vectors=jnp.asarray(
                rng.normal(0, 0.1, (v, 3, 8)).astype(np.float32)),
            base_joint=0,
            joint_map=(1, 2),
        )
        p = str(tmp_path / "pose.bin")
        save_pose_shape(p, ps, char)
        back = load_pose_shape(p, char)
        assert back.base_joint == 0
        assert back.joint_map == (1, 2)
        np.testing.assert_allclose(np.asarray(back.base_shape),
                                   np.asarray(ps.base_shape), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.shape_vectors),
                                   np.asarray(ps.shape_vectors), atol=1e-6)
        # the loaded pose shape evaluates identically
        states = char.skeleton_states(
            jnp.zeros(char.num_model_parameters).at[1].set(0.4))
        np.testing.assert_allclose(np.asarray(back.compute(states)),
                                   np.asarray(ps.compute(states)), atol=1e-5)


from momentum_tpu.io import load_character_glb


class TestReferenceWrittenGlbs:
    """Assets written by the reference itself (momentum/test/resources) —
    the interop direction our own round trips can't cover."""

    def test_model_with_motion(self):
        """The canonical reference character+motion GLB: rig, nested
        Vector2f limits, and the embedded motion all load."""
        path = f"{REF}/model_with_motion.glb"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        char, motion, fps = load_character_glb(path)
        assert char.skeleton.num_joints == 3
        assert char.num_model_parameters == 10
        assert motion is not None and motion.shape == (5, 10)
        # the reference writes Vector2f minmax limits in nested form
        assert char.limits is not None
        assert char.limits.minmax_index.shape[0] == 1
        np.testing.assert_allclose(
            np.asarray(char.limits.minmax_bounds[0]), [-0.1, 0.1], atol=1e-6)
        # FK on the embedded motion runs and is finite
        states = jax.vmap(char.skeleton_states)(jnp.asarray(motion))
        assert bool(jnp.all(jnp.isfinite(states)))

    @pytest.mark.parametrize("name,fps", [("animations/test_24fps.glb", 24.0),
                                          ("animations/test_30fps.glb", 30.0)])
    def test_animation_native_keyframe_rate(self, name, fps):
        """Standard glTF animations load at the file's native keyframe rate
        (not a fixed 120 Hz clock): the 24/30 fps reference exports report
        their own rate and resample to the same duration."""
        path = f"{REF}/{name}"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        char, motion, got = load_character_glb(path)
        assert abs(got - fps) < 0.01
        assert motion is not None and motion.shape[0] == 100  # same clip
        states = jax.vmap(char.skeleton_states)(jnp.asarray(motion[:3]))
        assert bool(jnp.all(jnp.isfinite(states)))

    @pytest.mark.parametrize("name", ["animations/test_24fps.glb",
                                      "sort_joints.glb"])
    def test_unsorted_joint_orders(self, name):
        """glTF does not require parent-before-child node order; the loader
        must topologically re-sort (reference sort_joints.glb test)."""
        path = f"{REF}/{name}"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        char, motion, _ = load_character_glb(path)
        par = np.asarray(char.skeleton.joint_parent)
        assert all(par[j] < j for j in range(len(par)) if par[j] >= 0)
        if motion is not None:
            states = jax.vmap(char.skeleton_states)(jnp.asarray(motion[:3]))
            assert bool(jnp.all(jnp.isfinite(states)))


def test_c3d_manufacturer_variants():
    """All four manufacturer-exported C3Ds from the reference suite parse
    with sane shapes (test/io manufacture readme)."""
    import glob

    files = sorted(glob.glob(f"{REF}/manufacture/*.c3d"))
    if not files:
        pytest.skip("reference assets unavailable")
    expected = {
        "manufacture_test_codamotion.c3d": (512, 24),
        "manufacture_test_innovative_sports_training.c3d": (134, 24),
        "manufacture_test_motion_analysis_corporation.c3d": (151, 49),
        "manufacture_test_nextgen_ergonomics.c3d": (721, 40),
    }
    for f in files:
        data = mio.load_c3d(f)
        want = expected.get(os.path.basename(f))
        if want:
            assert data.positions.shape[:2] == want, f
        assert bool(jnp.all(jnp.isfinite(
            jnp.where(data.occluded[..., None], 0.0, data.positions))))


def test_reference_bvh_and_fbx_animation_assets():
    """The bundled simple.bvh and simple_anim.fbx parse with hierarchy and
    motion intact."""
    bvh = f"{REF}/bvh/simple.bvh"
    if os.path.exists(bvh):
        char, jp, fps = mio.load_bvh(bvh)
        assert char.skeleton.num_joints == 6
        assert jp.shape == (3, char.skeleton.num_joint_parameters)
        assert fps == pytest.approx(30.0, rel=1e-3)
        par = np.asarray(char.skeleton.joint_parent)
        assert all(par[j] < j for j in range(len(par)) if par[j] >= 0)

    fbx = f"{REF}/animations/simple_anim.fbx"
    if os.path.exists(fbx):
        char, motion, fps = mio.load_fbx_with_motion(fbx)
        assert char.skeleton.num_joints == 159
        assert motion.shape[1] == char.skeleton.num_joint_parameters
        assert motion.shape[0] > 1
        assert bool(np.all(np.isfinite(motion)))
