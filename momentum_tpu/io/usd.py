"""USD (text .usda) skeleton + mesh IO.

Reference: momentum/io/usd/usd_io.{h,cpp} (optional UsdSkel load/save through
the USD runtime). No USD runtime is available here, so this module writes and
reads the UsdSkel schema as .usda TEXT directly: a Skeleton prim (joints,
bindTransforms, restTransforms), an optional SkelAnimation (joint-parameter
motion converted to local transforms), and an optional skinned Mesh prim.
The reader handles the subset this writer produces (round-trip capable) plus
simple externally-authored UsdSkel skeletons using the same attribute names.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["save_usda", "load_usda"]


def _fmt_matrix(m):
    rows = ", ".join(
        "(" + ", ".join(f"{v:.8g}" for v in row) + ")" for row in m
    )
    return f"( {rows} )"


def _joint_paths(names, parents):
    paths = []
    for i, n in enumerate(names):
        if parents[i] < 0:
            paths.append(n)
        else:
            paths.append(paths[parents[i]] + "/" + n)
    return paths


def save_usda(path, character, motion=None, fps=24.0) -> None:
    """Write character (+ optional (F, P) model-parameter motion) as .usda
    with UsdSkel Skeleton/SkelAnimation (+ Mesh with skinning primvars)."""
    import jax.numpy as jnp

    from momentum_tpu.character import fk
    from momentum_tpu.math import skel_state as ss

    skel = character.skeleton
    nj = skel.num_joints
    parents = np.asarray(skel.joint_parent)
    names = list(skel.joint_names)
    paths = _joint_paths(names, parents)

    rest_local = np.asarray(ss.to_matrix(fk.local_skel_states(
        skel, jnp.zeros(nj * 7))))  # (nJ, 4, 4)
    bind_world = np.asarray(ss.to_matrix(character.bind_pose()))
    # USD uses row-vector convention: transpose our column-vector matrices
    rest_local_usd = np.transpose(rest_local, (0, 2, 1))
    bind_world_usd = np.transpose(bind_world, (0, 2, 1))

    lines = [
        "#usda 1.0",
        "(",
        f"    timeCodesPerSecond = {fps:g}",
        '    upAxis = "Y"',
        ")",
        "",
        'def SkelRoot "Root"',
        "{",
        '    def Skeleton "Skel"',
        "    {",
        "        uniform token[] joints = ["
        + ", ".join(f'"{p}"' for p in paths) + "]",
        "        uniform matrix4d[] bindTransforms = ["
        + ", ".join(_fmt_matrix(m) for m in bind_world_usd) + "]",
        "        uniform matrix4d[] restTransforms = ["
        + ", ".join(_fmt_matrix(m) for m in rest_local_usd) + "]",
    ]

    if motion is not None:
        import jax

        motion = jnp.asarray(motion)
        jp = jax.vmap(character.parameter_transform.apply)(motion)
        locals_f = np.asarray(jax.vmap(
            lambda x: ss.to_matrix(fk.local_skel_states(skel, x)))(jp))
        locals_usd = np.transpose(locals_f, (0, 1, 3, 2))
        lines += [
            '        def SkelAnimation "Anim"',
            "        {",
            "            uniform token[] joints = ["
            + ", ".join(f'"{p}"' for p in paths) + "]",
            "            matrix4d[] transforms.timeSamples = {",
        ]
        for f_i in range(locals_usd.shape[0]):
            lines.append(
                f"                {f_i}: ["
                + ", ".join(_fmt_matrix(m) for m in locals_usd[f_i]) + "],")
        lines += ["            }", "        }"]
    lines.append("    }")

    if character.mesh is not None:
        mesh = character.mesh
        v = np.asarray(mesh.vertices)
        f = np.asarray(mesh.faces)
        lines += [
            '    def Mesh "Body"',
            "    {",
            "        int[] faceVertexCounts = [" + ", ".join(["3"] * f.shape[0]) + "]",
            "        int[] faceVertexIndices = ["
            + ", ".join(str(i) for i in f.reshape(-1)) + "]",
            "        point3f[] points = ["
            + ", ".join(f"({p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g})" for p in v) + "]",
        ]
        if character.skin_weights is not None:
            si = np.asarray(character.skin_weights.index)
            sw = np.asarray(character.skin_weights.weight)
            k = si.shape[1]
            lines += [
                f"        int[] primvars:skel:jointIndices = ["
                + ", ".join(str(i) for i in si.reshape(-1)) + f"] (elementSize = {k}, interpolation = \"vertex\")",
                f"        float[] primvars:skel:jointWeights = ["
                + ", ".join(f"{x:.6g}" for x in sw.reshape(-1)) + f"] (elementSize = {k}, interpolation = \"vertex\")",
            ]
        lines.append("    }")
    lines.append("}")

    with open(path, "w") as fobj:
        fobj.write("\n".join(lines) + "\n")


def _parse_matrices(text):
    """Parse '( (a,b,c,d), ... )' matrix list items."""
    mats = []
    for m in re.finditer(r"\(\s*(\([^)]*\)\s*,\s*){3}\([^)]*\)\s*\)", text):
        nums = [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", m.group(0))]
        if len(nums) == 16:
            mats.append(np.asarray(nums).reshape(4, 4))
    return mats


def load_usda(path):
    """→ (Character, motion joint-local matrices (F, nJ, 4, 4) or None).

    Reads the UsdSkel subset written by save_usda (joints/bindTransforms/
    restTransforms + optional SkelAnimation transforms)."""
    import jax.numpy as jnp

    from momentum_tpu.character import Character, make_skeleton
    from momentum_tpu.character.parameter_transform import make_identity_transform
    from momentum_tpu.math import skel_state as ss

    with open(path) as f:
        text = f.read()

    jm = re.search(r"joints\s*=\s*\[([^\]]*)\]", text)
    if not jm:
        raise ValueError("no joints attribute found")
    paths = re.findall(r'"([^"]+)"', jm.group(1))
    names = [p.split("/")[-1] for p in paths]
    path_idx = {p: i for i, p in enumerate(paths)}
    parents = []
    for p in paths:
        parent_path = "/".join(p.split("/")[:-1])
        parents.append(path_idx.get(parent_path, -1))

    rm = re.search(r"restTransforms\s*=\s*\[(.*?)\]\n", text, re.S)
    rest = _parse_matrices(rm.group(1)) if rm else []
    nj = len(names)
    pre, offs = [], []
    for i in range(nj):
        if i < len(rest):
            m_usd = rest[i].T  # row-vector → column-vector
            state = ss.from_matrix(jnp.asarray(m_usd, jnp.float32))
            t, q, _ = ss.split(state)
            offs.append(np.asarray(t))
            pre.append(np.asarray(q))
        else:
            offs.append([0.0, 0.0, 0.0])
            pre.append([0.0, 0.0, 0.0, 1.0])

    skeleton = make_skeleton(parents, np.asarray(pre), np.asarray(offs), names)
    character = Character(
        skeleton=skeleton,
        parameter_transform=make_identity_transform(nj),
    )

    motion = None
    am = re.search(r"transforms\.timeSamples\s*=\s*\{(.*?)\n\s*\}", text, re.S)
    if am:
        frames = []
        for fm in re.finditer(r"\d+\s*:\s*\[(.*?)\],", am.group(1), re.S):
            mats = _parse_matrices(fm.group(1))
            frames.append(np.stack([m.T for m in mats]))
        if frames:
            motion = np.stack(frames)
    return character, motion
