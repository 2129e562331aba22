"""Synthetic test character — no asset dependency, mirrors the reference's
createTestCharacter (momentum/test/character/character_helpers.cpp:38-230):

* n-joint chain: root at origin, each child offset by +Y one unit.
* Model params: root tx/ty/tz/rx/ry/rz, scale_global (root scale), joint1_rx,
  shared_rz (0.5 to both joint1.rz and joint2.rz), then jointK_rx for K>=2.
* Locators: one per joint, uniform-random offsets in [-1, 1]^3.
* Mesh: 2 verts per segment along the chain (5 segments/joint), skinned to
  (bone, bone+1) with linearly varying weights; two triangles per segment.
* Limits: MinMax on model param 0 in [-0.1, 0.1].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from momentum_tpu.character import (
    Character,
    CollisionGeometry,
    Locators,
    Mesh,
    ParameterTransform,
    SkinWeights,
    make_limits,
    make_skeleton,
)
from momentum_tpu.character.skeleton import PARAMS_PER_JOINT
from momentum_tpu.math import skel_state as ss


def create_test_character(num_joints: int = 3, dtype=jnp.float32) -> Character:
    if num_joints < 3:
        raise ValueError("num_joints must be >= 3")

    parents = [-1] + list(range(num_joints - 1))
    offsets = np.zeros((num_joints, 3), np.float64)
    offsets[1:, 1] = 1.0
    names = ["root"] + [f"joint{i}" for i in range(1, num_joints)]
    skeleton = make_skeleton(parents, translation_offsets=offsets, names=names, dtype=dtype)

    # parameter transform
    pnames = ["root_tx", "root_ty", "root_tz", "root_rx", "root_ry", "root_rz",
              "scale_global", "joint1_rx", "shared_rz"]
    pnames += [f"joint{k}_rx" for k in range(2, num_joints)]
    n_jp = num_joints * PARAMS_PER_JOINT
    n_p = len(pnames)
    mat = np.zeros((n_jp, n_p), np.float64)
    for i in range(6):
        mat[i, i] = 1.0  # root tx..rz
    mat[6, 6] = 1.0  # root scale <- scale_global
    mat[1 * PARAMS_PER_JOINT + 3, 7] = 1.0  # joint1_rx
    mat[1 * PARAMS_PER_JOINT + 5, 8] = 0.5  # shared_rz
    mat[2 * PARAMS_PER_JOINT + 5, 8] = 0.5  # shared_rz
    for k in range(2, num_joints):
        mat[k * PARAMS_PER_JOINT + 3, 9 + k - 2] = 1.0
    pt = ParameterTransform(
        transform=jnp.asarray(mat, dtype),
        offsets=jnp.zeros(n_jp, dtype),
        names=tuple(pnames),
    )

    # locators (seeded like reference's Random(10001), values differ — only the
    # distribution matters for tests)
    rng = np.random.default_rng(10001)
    loc_offsets = rng.uniform(-1.0, 1.0, size=(num_joints, 3))
    locators = Locators(
        parent=jnp.arange(num_joints, dtype=jnp.int32),
        offset=jnp.asarray(loc_offsets, dtype),
        weight=jnp.ones(num_joints, dtype),
        names=tuple(f"l{i}" for i in range(num_joints)),
    )

    # mesh: 5 segments per bone, 2 verts each, skinned to (bone, next)
    seg_per = 5
    n_seg = seg_per * num_joints
    verts, sidx, swgt = [], [], []
    for b in range(num_joints):
        nxt = min(b + 1, num_joints - 1)
        for s in range(seg_per):
            frac = s / seg_per
            y = b + frac
            for x in (-0.5, 0.5):
                verts.append([x, y, 0.0])
                row_i = np.zeros(8, np.int32)
                row_w = np.zeros(8, np.float32)
                if frac > 0.5 and nxt != b:
                    row_i[0], row_i[1] = nxt, b
                    row_w[0], row_w[1] = frac, 1.0 - frac
                else:
                    row_i[0], row_i[1] = b, nxt
                    row_w[0] = 1.0 - frac if nxt != b else 1.0
                    row_w[1] = frac if nxt != b else 0.0
                sidx.append(row_i)
                swgt.append(row_w)
    faces = []
    for i in range(n_seg - 1):
        faces.append([2 * i + 0, 2 * i + 2, 2 * i + 1])
        faces.append([2 * i + 1, 2 * i + 2, 2 * i + 3])

    mesh = Mesh(
        vertices=jnp.asarray(np.asarray(verts), dtype),
        faces=jnp.asarray(np.asarray(faces), jnp.int32),
    )
    skin = SkinWeights(index=jnp.asarray(np.stack(sidx)), weight=jnp.asarray(np.stack(swgt), dtype))

    limits = make_limits(minmax=[(0, -0.1, 0.1, 1.0)])

    # collision: one tapered capsule per bone segment along local +Y
    # (reference createTestCharacter attaches capsules similarly;
    # test/character/character_helpers.cpp)
    import numpy as _np
    cap_tf = _np.zeros((num_joints, 8), _np.float32)
    # local transform rotating capsule x-axis onto +Y: quaternion for Rz(90deg)
    cap_tf[:, 5] = _np.sin(_np.pi / 4)  # qz
    cap_tf[:, 6] = _np.cos(_np.pi / 4)  # qw
    cap_tf[:, 7] = 1.0  # scale
    collision = CollisionGeometry(
        parent=jnp.arange(num_joints, dtype=jnp.int32),
        transform=jnp.asarray(cap_tf),
        radius=jnp.full((num_joints, 2), 0.15, dtype),
        length=jnp.ones(num_joints, dtype),
    )

    char = Character(
        skeleton=skeleton,
        parameter_transform=pt,
        limits=limits,
        mesh=mesh,
        skin_weights=skin,
        locators=locators,
        collision=collision,
        name=f"test_character_{num_joints}",
    )
    return char.with_inverse_bind_pose()


def create_fullbody_character(dtype=jnp.float32) -> Character:
    """Full-body-scale synthetic rig: 52 joints in a humanoid-like tree
    (spine/neck/head, clavicle/arm/hand and hip/leg/foot chains per side),
    3 rotation parameters per joint + root translation + global scale,
    and 80 locators. Matches the problem-size envelope of
    BASELINE.md (~50-160 joints, ~200 params, SIMD-era caps)."""
    import numpy as _np

    # humanoid-ish topology: chains hanging off a spine
    names = ["root"]
    parents = [-1]
    offsets = [[0.0, 0.0, 0.0]]

    def chain(base_name, parent_idx, count, offset):
        idx = parent_idx
        for i in range(count):
            names.append(f"{base_name}{i}")
            parents.append(idx)
            offsets.append(list(offset))
            idx = len(names) - 1
        return idx

    spine_end = chain("spine", 0, 6, [0.0, 0.25, 0.0])
    neck_end = chain("neck", spine_end, 2, [0.0, 0.12, 0.0])
    chain("head", neck_end, 2, [0.0, 0.15, 0.0])
    for side, sx in (("l", 1.0), ("r", -1.0)):
        clav = chain(f"{side}_clav", spine_end, 1, [sx * 0.1, 0.05, 0.0])
        arm = chain(f"{side}_arm", clav, 4, [sx * 0.28, 0.0, 0.0])
        chain(f"{side}_hand", arm, 7, [sx * 0.06, 0.0, 0.0])
        hip = chain(f"{side}_hip", 0, 1, [sx * 0.12, -0.05, 0.0])
        leg = chain(f"{side}_leg", hip, 4, [0.0, -0.32, 0.0])
        chain(f"{side}_foot", leg, 3, [0.0, -0.08, 0.08])
    nj = len(names)
    assert nj >= 50, nj

    skeleton = make_skeleton(parents, translation_offsets=_np.asarray(offsets),
                             names=names, dtype=dtype)

    # parameters: root tx/ty/tz + rx/ry/rz, global scale, then rx/ry/rz per
    # non-root joint
    pnames = ["root_tx", "root_ty", "root_tz", "root_rx", "root_ry", "root_rz",
              "scale_global"]
    n_jp = nj * PARAMS_PER_JOINT
    rows = []
    for i in range(6):
        rows.append((i, len(rows), 1.0))
    rows.append((6, 6, 1.0))  # root scale <- scale_global
    for j in range(1, nj):
        for k, axis in enumerate("xyz"):
            pnames.append(f"{names[j]}_r{axis}")
            rows.append((j * PARAMS_PER_JOINT + 3 + k, len(pnames) - 1, 1.0))
    mat = _np.zeros((n_jp, len(pnames)), _np.float64)
    for r, c, v in rows:
        mat[r, c] = v
    pt = ParameterTransform(
        transform=jnp.asarray(mat, dtype),
        offsets=jnp.zeros(n_jp, dtype),
        names=tuple(pnames),
        parameter_sets={"scaling": (6,)},
    )

    rng = _np.random.default_rng(20002)
    n_loc = 80
    loc_parent = rng.integers(0, nj, n_loc)
    locators = Locators(
        parent=jnp.asarray(loc_parent, jnp.int32),
        offset=jnp.asarray(rng.uniform(-0.12, 0.12, (n_loc, 3)), dtype),
        weight=jnp.ones(n_loc, dtype),
        names=tuple(f"m{i}" for i in range(n_loc)),
    )

    # skinned tube mesh: a ring of 6 vertices at each end of every bone,
    # blended between the bone and its parent — body-scale LBS workload
    ring = 6
    verts, sidx, swgt = [], [], []
    joint_pos = _np.zeros((nj, 3))
    for j in range(1, nj):
        joint_pos[j] = joint_pos[parents[j]] + _np.asarray(offsets[j])
    for j in range(nj):
        p_idx = parents[j] if parents[j] >= 0 else j
        for end, (anchor, other, w) in enumerate(
                [(j, p_idx, 1.0), (j, p_idx, 0.6)]):
            center = joint_pos[j] if end == 0 else                 0.5 * (joint_pos[j] + joint_pos[p_idx])
            for r in range(ring):
                a = 2 * _np.pi * r / ring
                verts.append(center + 0.04 * _np.asarray(
                    [_np.cos(a), 0.0, _np.sin(a)]))
                row_i = _np.zeros(8, _np.int32)
                row_w = _np.zeros(8, _np.float32)
                row_i[0], row_i[1] = anchor, other
                row_w[0], row_w[1] = w, 1.0 - w
                sidx.append(row_i)
                swgt.append(row_w)
    faces = []
    for j in range(nj):
        base = j * 2 * ring
        for r in range(ring):
            a, b = base + r, base + (r + 1) % ring
            c, d = a + ring, b + ring
            faces.append([a, b, c])
            faces.append([b, d, c])
    mesh = Mesh(vertices=jnp.asarray(_np.asarray(verts), dtype),
                faces=jnp.asarray(_np.asarray(faces), jnp.int32))
    skin = SkinWeights(index=jnp.asarray(_np.stack(sidx)),
                       weight=jnp.asarray(_np.stack(swgt), dtype))

    # minmax limits on every rotation parameter + the global scale — real
    # full-body rigs carry limits on essentially all pose DoFs, and the
    # marker-tracking residual stack always includes the limit term
    # (marker_tracker.cpp:645-653), so the bench fixture must too.
    mm = [(6, -0.5, 0.5, 1.0)]
    mm += [(i, -1.2, 1.2, 1.0) for i in range(7, len(pnames))]
    limits = make_limits(minmax=mm)

    char = Character(
        skeleton=skeleton,
        parameter_transform=pt,
        locators=locators,
        mesh=mesh,
        skin_weights=skin,
        limits=limits,
        name="fullbody_synthetic",
    )
    return char.with_inverse_bind_pose()
