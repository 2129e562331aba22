"""Crate (.usdc) encoding tests — io/usdc_crate.py.

Writer and reader are independent codepaths; these tests cross-validate
them on synthetic stages, on full characters, and on stages parsed from
the reference's own .usda assets, and pin the value-level layout
(ValueRep bit fields, Field/Spec record sizes) against the published
crate structure (pxr crateFile.h/.cpp; the reference writes .usdc through
that runtime, momentum/io/usd/usd_io.cpp:60-240).
"""

import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.io import usdc_crate as uc
from momentum_tpu.io.usd import (Attr, Prim, Stage, load_usd, parse_usda,
                                 read_usdc, save_usd)
from momentum_tpu.testing.fixtures import create_test_character


def _demo_stage():
    st = Stage()
    st.meta = {"upAxis": "Y", "metersPerUnit": 0.01,
               "framesPerSecond": 30.0, "custom:note": "hello"}
    root = Prim(name="Root", type="Xform", meta={"kind": "component"})
    mesh = Prim(name="Body", type="Mesh")
    mesh.attrs["points"] = Attr("points", "point3f[]",
                                [(0.0, 1.0, 2.0), (3.5, -4.0, 5.25)])
    mesh.attrs["faceVertexIndices"] = Attr("faceVertexIndices", "int[]",
                                           [0, 1, 0])
    mesh.attrs["faceVertexCounts"] = Attr("faceVertexCounts", "int[]", [3])
    mesh.attrs["primvars:st"] = Attr(
        "primvars:st", "texCoord2f[]", [(0.0, 0.0), (1.0, 0.5)],
        meta={"interpolation": "vertex"})
    mesh.attrs["doubleSided"] = Attr("doubleSided", "bool", True)
    mesh.attrs["weight"] = Attr("weight", "float", 2.5)
    mesh.attrs["offset"] = Attr("offset", "float3", (1.0, 2.0, 3.0))
    mesh.attrs["name"] = Attr("name", "string", "body mesh")
    mesh.attrs["purpose"] = Attr("purpose", "token", "render", uniform=True)
    skel = Prim(name="Skel", type="Skeleton")
    skel.attrs["joints"] = Attr("joints", "token[]",
                                ["a", "a/b", "a/b/c"], uniform=True)
    eye = tuple(float(x) for x in np.eye(4).reshape(-1))
    skel.attrs["bindTransforms"] = Attr("bindTransforms", "matrix4d[]",
                                        [eye, eye, eye])
    anim = Prim(name="Anim", type="SkelAnimation")
    anim.attrs["transforms"] = Attr(
        "transforms", "matrix4d[]",
        time_samples={0.0: [eye, eye, eye], 1.0: [eye, eye, eye]})
    anim.attrs["momentum:motion:poses"] = Attr(
        "momentum:motion:poses", "float[]",
        time_samples={0.0: [0.1, 0.2], 1.0: [0.3, 0.4]})
    mesh.attrs["skel:skeleton"] = Attr("skel:skeleton", "rel",
                                       "/Root/Skel")
    root.children = [mesh, skel, anim]
    st.roots = [root]
    return st


class TestCrateRoundTrip:
    def test_document_model_round_trip(self, tmp_path):
        st = _demo_stage()
        p = str(tmp_path / "demo.usdc")
        uc.write_crate(st, p)
        st2 = uc.read_crate(p)

        assert [r.name for r in st2.roots] == ["Root"]
        root2 = st2.roots[0]
        assert root2.type == "Xform"
        assert root2.meta.get("kind") == "component"
        assert [c.name for c in root2.children] == ["Body", "Skel", "Anim"]

        assert st2.meta["upAxis"] == "Y"
        assert st2.meta["metersPerUnit"] == pytest.approx(0.01)
        assert st2.meta["framesPerSecond"] == pytest.approx(30.0)
        assert st2.meta["custom:note"] == "hello"

        mesh2 = root2.children[0]
        np.testing.assert_allclose(
            np.asarray(mesh2.attrs["points"].value, np.float32),
            [(0.0, 1.0, 2.0), (3.5, -4.0, 5.25)], atol=1e-6)
        assert mesh2.attrs["faceVertexIndices"].value == [0, 1, 0]
        assert mesh2.attrs["doubleSided"].value is True
        assert mesh2.attrs["weight"].value == pytest.approx(2.5)
        assert tuple(mesh2.attrs["offset"].value) == (1.0, 2.0, 3.0)
        assert mesh2.attrs["name"].value == "body mesh"
        assert mesh2.attrs["purpose"].value == "render"
        assert mesh2.attrs["purpose"].uniform
        assert mesh2.attrs["primvars:st"].meta["interpolation"] == "vertex"
        assert mesh2.attrs["skel:skeleton"].type == "rel"
        assert mesh2.attrs["skel:skeleton"].value == "/Root/Skel"

        skel2 = root2.children[1]
        assert skel2.attrs["joints"].value == ["a", "a/b", "a/b/c"]
        assert skel2.attrs["joints"].uniform
        bt = np.asarray(skel2.attrs["bindTransforms"].value, np.float64)
        assert bt.reshape(3, 16).shape == (3, 16)
        np.testing.assert_allclose(bt[0].reshape(4, 4), np.eye(4))

        anim2 = root2.children[2]
        ts = anim2.attrs["momentum:motion:poses"].time_samples
        assert set(ts.keys()) == {0.0, 1.0}
        np.testing.assert_allclose(ts[1.0], [0.3, 0.4], atol=1e-6)
        mts = anim2.attrs["transforms"].time_samples
        assert np.asarray(mts[0.0], np.float64).reshape(3, 16).shape \
            == (3, 16)

    def test_character_through_crate(self, tmp_path):
        char = create_test_character(4)
        rng = np.random.default_rng(0)
        motion = jnp.asarray(
            rng.uniform(-0.2, 0.2, (3, char.num_model_parameters)),
            jnp.float32)
        p = str(tmp_path / "c.usdc")
        save_usd(p, char, motion=motion)
        c2, anim = load_usd(p)
        assert c2.skeleton.joint_names == char.skeleton.joint_names
        np.testing.assert_allclose(np.asarray(anim), np.asarray(motion),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c2.mesh.vertices),
                                   np.asarray(char.mesh.vertices), atol=1e-5)

    @pytest.mark.parametrize("asset", ["simple_character.usda",
                                       "character_with_materials.usda",
                                       "simple_mesh.usda"])
    def test_reference_asset_through_crate(self, asset, tmp_path):
        """Reference .usda asset -> stage -> crate -> independent reader
        reproduces every prim, attribute, and value."""
        path = f"/root/reference/momentum/test/resources/usd/{asset}"
        if not os.path.exists(path):
            pytest.skip("reference asset unavailable")
        with open(path) as f:
            st = parse_usda(f.read())
        p = str(tmp_path / "rt.usdc")
        uc.write_crate(st, p)
        st2 = uc.read_crate(p)

        def flat(stage):
            out = {}

            def walk(prim, prefix):
                key = prefix + "/" + prim.name
                out[key] = prim
                for c in prim.children:
                    walk(c, key)

            for r in stage.roots:
                walk(r, "")
            return out

        a, b = flat(st), flat(st2)
        assert set(a.keys()) == set(b.keys())
        for key, prim in a.items():
            prim2 = b[key]
            assert prim2.type == prim.type, key
            assert set(prim2.attrs) == set(prim.attrs), key
            for name, attr in prim.attrs.items():
                got = prim2.attrs[name]
                if attr.type != "rel":
                    assert got.type == attr.type, (key, name)
                _assert_value_equal(attr.value, got.value, (key, name))
                assert set(got.time_samples) == set(
                    float(t) for t in attr.time_samples), (key, name)

    def test_legacy_format_still_readable(self, tmp_path):
        from momentum_tpu.io.usd import _write_usdc_legacy
        st = _demo_stage()
        p = str(tmp_path / "old.usdc")
        _write_usdc_legacy(st, p)
        buf = open(p, "rb").read()
        assert tuple(buf[8:11]) == (0, 0, 1)
        st2 = read_usdc(p)
        assert [r.name for r in st2.roots] == ["Root"]
        assert st2.roots[0].children[1].attrs["joints"].value == \
            ["a", "a/b", "a/b/c"]


def _assert_value_equal(a, b, ctx):
    if a is None:
        assert b is None or b == [] or b == "", ctx
        return
    if isinstance(a, str):
        assert a == b, ctx
        return
    if isinstance(a, (list, tuple, np.ndarray)):
        aa = np.asarray(a, dtype=object)
        if aa.size and isinstance(aa.reshape(-1)[0], str):
            assert list(a) == list(b), ctx
            return
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            atol=1e-6, err_msg=str(ctx))
        return
    if isinstance(a, bool):
        assert bool(b) == a, ctx
        return
    assert b == pytest.approx(a), ctx


class TestCrateStructuralPins:
    """Byte-level pins of the published crate records."""

    def test_valuerep_bit_layout(self, tmp_path):
        st = Stage()
        prim = Prim(name="P", type="Scope")
        prim.attrs["i"] = Attr("i", "int", 7)
        prim.attrs["farr"] = Attr("farr", "float[]", [1.0, 2.0])
        st.roots = [prim]
        p = str(tmp_path / "pin.usdc")
        uc.write_crate(st, p)
        buf = open(p, "rb").read()
        r = uc._Reader(buf)
        by_name = dict(r.fields)
        # inline int: type enum 3 in bits 48-55, INLINED set, payload = 7
        rep = by_name["default"] if by_name.get("default") else None
        reps = [rep for name, rep in r.fields if name == "default"]
        int_reps = [x for x in reps if ((x >> 48) & 0xFF) == uc.T_INT]
        assert int_reps and (int_reps[0] & uc.INLINED_BIT)
        assert int_reps[0] & uc.PAYLOAD_MASK == 7
        # float[] array: ARRAY bit, type Float, payload = in-bounds offset
        arr_reps = [x for x in reps if ((x >> 48) & 0xFF) == uc.T_FLOAT]
        assert arr_reps and (arr_reps[0] & uc.ARRAY_BIT)
        off = arr_reps[0] & uc.PAYLOAD_MASK
        n = struct.unpack_from("<I", buf, off)[0]
        assert n == 2
        vals = np.frombuffer(buf, np.float32, 2, off + 4)
        np.testing.assert_allclose(vals, [1.0, 2.0])

    def test_record_sizes(self, tmp_path):
        st = _demo_stage()
        p = str(tmp_path / "rec.usdc")
        uc.write_crate(st, p)
        buf = open(p, "rb").read()
        r = uc._Reader(buf)
        fstart, fsize = r.sections["FIELDS"]
        nf = struct.unpack_from("<Q", buf, fstart)[0]
        assert fsize == 8 + 16 * nf  # Field = 16 B (uint32 + pad + uint64)
        sstart, ssize = r.sections["SPECS"]
        ns = struct.unpack_from("<Q", buf, sstart)[0]
        assert ssize == 8 + 12 * ns  # Spec = 3 x uint32
        pstart, psize = r.sections["PATHS"]
        npaths = struct.unpack_from("<Q", buf, pstart)[0]
        # one spec per prim/property path + pseudo-root
        assert ns == npaths
        assert tuple(buf[8:11]) == uc.VERSION

    def test_specs_reference_valid_paths_and_fieldsets(self, tmp_path):
        st = _demo_stage()
        p = str(tmp_path / "xref.usdc")
        uc.write_crate(st, p)
        r = uc._Reader(open(p, "rb").read())
        sec_start, _ = r.sections["SPECS"]
        buf = r.buf
        n = struct.unpack_from("<Q", buf, sec_start)[0]
        spec_types = set()
        for i in range(n):
            path_i, fs_i, ty = struct.unpack_from("<III", buf,
                                                  sec_start + 8 + 12 * i)
            assert path_i in r.path_strs
            assert fs_i < len(r.fieldsets)
            spec_types.add(ty)
        assert uc.SPEC_PSEUDO_ROOT in spec_types
        assert uc.SPEC_PRIM in spec_types
        assert uc.SPEC_ATTRIBUTE in spec_types
        assert uc.SPEC_RELATIONSHIP in spec_types
        # every fieldset run terminates
        assert r.fieldsets[-1] == uc.INVALID_INDEX
