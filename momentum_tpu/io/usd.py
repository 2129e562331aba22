"""USD IO: UsdSkel characters + motion as .usda text and .usdc crate binary.

Reference capability: momentum/io/usd/usd_io.{h,cpp} (loadUsdCharacter /
saveUsd through the pxr runtime), usd_skeleton_io.cpp (Skeleton prim,
topology derived from '/'-separated joint paths, restTransforms preferred
over world bindTransforms:127-215; locator + collision custom prims with
momentum:* attributes:260-470), usd_mesh_io.cpp (points / faceVertex* /
primvars:st / skin primvars with elementSize influences, top-8 kept:218-265),
usd_io.cpp:196-240 (momentum metadata: parameter transform / limits as JSON
attributes on the SkelRoot), usd_animation_io.cpp:40-87 (SkelAnimation joint
transforms + momentum:motion:* model-parameter attributes).

No pxr runtime exists in this image, so this module implements the UsdSkel
schema directly over a small prim/attribute document model:

- `.usda` text: full parser + writer (handles the reference's own test assets
  in /root/reference/momentum/test/resources/usd/).
- `.usdc`: the crate binary, written and read by io/usdc_crate.py in the
  PUBLIC crate layout (version 0.2.0: bootstrap + TOC + TOKENS/STRINGS/
  FIELDS/FIELDSETS/PATHS/SPECS sections, standard 64-bit ValueReps with the
  pxr type enums — not a private encoding). Writer and reader are
  independent codepaths cross-tested in tests/test_usdc_crate.py; see that
  module's docstring for the conformance caveat (no pxr in the image to
  verify byte-level goldens against). Files written by the round-3 private
  format (version 0.0.1) remain readable via the legacy fallback.

Entry points: save_usd / load_usd dispatch on extension; save_usda /
load_usda keep their original signatures.
"""

from __future__ import annotations

import dataclasses
import json
import re
import struct

import numpy as np

__all__ = [
    "save_usd", "load_usd", "save_usda", "load_usda",
    "Prim", "Attr", "parse_usda", "write_usda",
    "write_usdc", "read_usdc",
    # pymomentum io_usd binding surface
    "is_usd_available", "load_character", "load_character_from_bytes",
    "load_character_with_motion", "load_character_with_motion_from_bytes",
    "load_character_with_skel_states",
    "load_character_with_skel_states_from_bytes",
    "save_character", "save_character_from_skel_states",
]


# --------------------------------------------------------------------------
# document model
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Attr:
    name: str
    type: str  # usda type string, e.g. "matrix4d[]", "token", "float[]"
    value: object = None
    meta: dict = dataclasses.field(default_factory=dict)
    time_samples: dict = dataclasses.field(default_factory=dict)
    uniform: bool = False


@dataclasses.dataclass
class Prim:
    name: str
    type: str = ""  # e.g. "SkelRoot", "Skeleton", "Mesh", "" for plain def
    meta: dict = dataclasses.field(default_factory=dict)
    attrs: dict = dataclasses.field(default_factory=dict)
    children: list = dataclasses.field(default_factory=list)

    def attr(self, name, default=None):
        a = self.attrs.get(name)
        return a.value if a is not None else default

    def find(self, prim_type):
        """Depth-first search for all prims of a type."""
        out = []
        if self.type == prim_type:
            out.append(self)
        for c in self.children:
            out.extend(c.find(prim_type))
        return out

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


@dataclasses.dataclass
class Stage:
    meta: dict = dataclasses.field(default_factory=dict)
    roots: list = dataclasses.field(default_factory=list)

    def walk(self):
        for r in self.roots:
            yield from r.walk()

    def find(self, prim_type):
        out = []
        for r in self.roots:
            out.extend(r.find(prim_type))
        return out


# --------------------------------------------------------------------------
# .usda tokenizer / parser
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
      "(?:[^"\\]|\\.)*"        # quoted string
    | @[^@]*@                  # asset path
    | <[^>]*>                  # prim path reference (rel / .connect targets)
    | [A-Za-z_][\w:.]*         # identifier (incl. namespaced a:b.c)
    | -?\d+\.?\d*(?:[eE][-+]?\d+)?   # number
    | \.\w+                    # .connect-style suffix
    | [=\[\]{}(),;:]           # punctuation (incl. timeSamples-dict colon)
""", re.X)


def _tokenize(text):
    # strip comments (# to end of line, outside strings)
    out = []
    for m in re.finditer(r'"(?:[^"\\]|\\.)*"|@[^@]*@|#[^\n]*|[^"#@]+', text):
        tok = m.group(0)
        if tok.startswith("#"):
            continue
        if tok.startswith('"') or tok.startswith("@"):
            out.append(tok)
        else:
            out.extend(_TOKEN_RE.findall(tok))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"usda parse: expected {t!r}, got {got!r} @ {self.i}")
        return got

    # -- values ------------------------------------------------------------
    def parse_value(self):
        t = self.peek()
        if t == "[":
            return self.parse_list()
        if t == "(":
            return self.parse_tuple()
        if t == "{":
            return self.parse_dict()
        t = self.next()
        if t is None:
            raise ValueError("usda parse: unexpected EOF in value")
        if t.startswith('"'):
            return _unquote(t)
        if t.startswith("@") or t.startswith("<"):
            return t[1:-1]
        if t in ("true", "false"):
            return t == "true"
        if t == "None":
            return None
        try:
            return int(t)
        except ValueError:
            pass
        try:
            return float(t)
        except ValueError:
            return t  # bare token (e.g. enum-ish identifiers)

    def parse_list(self):
        self.expect("[")
        items = []
        while self.peek() != "]":
            items.append(self.parse_value())
            if self.peek() == ",":
                self.next()
        self.expect("]")
        return items

    def parse_tuple(self):
        self.expect("(")
        items = []
        while self.peek() != ")":
            items.append(self.parse_value())
            if self.peek() == ",":
                self.next()
        self.expect(")")
        return tuple(items)

    def parse_dict(self):
        self.expect("{")
        d = {}
        while self.peek() != "}":
            key = self.parse_value()
            self.expect(":")
            d[key] = self.parse_value()
            if self.peek() == ",":
                self.next()
            if self.peek() == ";":
                self.next()
        self.expect("}")
        return d

    # -- metadata blocks ---------------------------------------------------
    def parse_meta_block(self):
        """( key = value ... ) — also swallows `prepend apiSchemas = [...]`
        and doc strings."""
        meta = {}
        self.expect("(")
        while self.peek() != ")":
            t = self.next()
            if t in ("prepend", "append", "add", "delete", "uniform", "custom"):
                continue
            if t.startswith('"'):
                meta.setdefault("doc", _unquote(t))
                continue
            if self.peek() == "=":
                self.next()
                meta[t] = self.parse_value()
            # else: stray token (qualifier) — skip
        self.expect(")")
        return meta

    # -- prims / attributes --------------------------------------------------
    def parse_stage(self):
        stage = Stage()
        if self.peek() == "(":
            stage.meta = self.parse_meta_block()
        while self.peek() is not None:
            stage.roots.append(self.parse_prim())
        return stage

    def parse_prim(self):
        kw = self.next()
        if kw not in ("def", "over", "class"):
            raise ValueError(f"usda parse: expected prim keyword, got {kw!r}")
        ptype = ""
        t = self.next()
        if not t.startswith('"'):
            ptype = t
            t = self.next()
        name = _unquote(t)
        prim = Prim(name=name, type=ptype)
        if self.peek() == "(":
            prim.meta = self.parse_meta_block()
        self.expect("{")
        while self.peek() != "}":
            if self.peek() in ("def", "over", "class"):
                prim.children.append(self.parse_prim())
            else:
                self.parse_attr_into(prim)
        self.expect("}")
        return prim

    def parse_attr_into(self, prim):
        uniform = False
        t = self.next()
        while t in ("uniform", "custom", "varying", "prepend", "append", "delete"):
            uniform = uniform or (t == "uniform")
            t = self.next()
        atype = t
        if self.peek() == "[" and self.peek(1) == "]":
            self.next()
            self.next()
            atype += "[]"
        name = self.next()
        # e.g. transforms.timeSamples
        is_ts = False
        if name.endswith(".timeSamples"):
            name = name[: -len(".timeSamples")]
            is_ts = True
        elif self.peek() == ".timeSamples":
            self.next()
            is_ts = True
        attr = prim.attrs.get(name) or Attr(name=name, type=atype, uniform=uniform)
        if self.peek() == "=":
            self.next()
            val = self.parse_value()
            if is_ts:
                attr.time_samples = val
            else:
                attr.value = val
        if self.peek() == "(":
            attr.meta.update(self.parse_meta_block())
        prim.attrs[name] = attr


def _unquote(t):
    if t.startswith('"""'):
        return t[3:-3]
    if t.startswith('"'):
        body = t[1:-1]
        return body.replace('\\"', '"').replace("\\\\", "\\")
    return t


def parse_usda(text) -> Stage:
    return _Parser(_tokenize(text)).parse_stage()


# --------------------------------------------------------------------------
# .usda writer
# --------------------------------------------------------------------------

def _fmt_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return f"{float(v):.8g}"
    if isinstance(v, tuple):
        return "(" + ", ".join(_fmt_value(x) for x in v) + ")"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ", ".join(_fmt_value(x) for x in _aslist(v)) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{_fmt_value(k)}: {_fmt_value(x)}"
                               for k, x in v.items()) + "}"
    if v is None:
        return "None"
    return str(v)


def _aslist(v):
    if isinstance(v, np.ndarray):
        return [tuple(r) if r.ndim else r.item() for r in
                (v if v.ndim <= 1 else list(v))] if v.ndim <= 2 else [
                    tuple(map(tuple, m)) for m in v]
    return v


def _write_prim(prim, lines, indent):
    pad = "    " * indent
    head = f"{pad}def {prim.type} \"{prim.name}\"" if prim.type else \
        f"{pad}def \"{prim.name}\""
    if prim.meta:
        lines.append(head + " (")
        for k, v in prim.meta.items():
            if k == "apiSchemas":
                lines.append(f"{pad}    prepend apiSchemas = {_fmt_value(v)}")
            else:
                lines.append(f"{pad}    {k} = {_fmt_value(v)}")
        lines.append(pad + ")")
    else:
        lines.append(head)
    lines.append(pad + "{")
    for attr in prim.attrs.values():
        q = "uniform " if attr.uniform else ""
        decl = f"{pad}    {q}{attr.type} {attr.name}"
        meta = ""
        if attr.meta:
            meta = " (" + ", ".join(
                f"{k} = {_fmt_value(v)}" for k, v in attr.meta.items()) + ")"
        if attr.time_samples:
            lines.append(decl + ".timeSamples = {")
            for k in sorted(attr.time_samples):
                lines.append(f"{pad}        {k}: "
                             f"{_fmt_value(attr.time_samples[k])},")
            lines.append(pad + "    }" + meta)
        elif attr.value is None and not attr.meta:
            lines.append(decl)
        else:
            lines.append(decl + f" = {_fmt_value(attr.value)}" + meta)
    for child in prim.children:
        _write_prim(child, lines, indent + 1)
    lines.append(pad + "}")


def write_usda(stage: Stage) -> str:
    lines = ["#usda 1.0"]
    if stage.meta:
        lines.append("(")
        for k, v in stage.meta.items():
            lines.append(f"    {k} = {_fmt_value(v)}")
        lines.append(")")
    for prim in stage.roots:
        lines.append("")
        _write_prim(prim, lines, 0)
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------------------
# .usdc crate container: public-layout encode/decode lives in usdc_crate.py.
# Below: the version-dispatching entry points plus the LEGACY (round-3,
# version 0.0.1) private container decoder kept for old files.
# --------------------------------------------------------------------------

_USDC_IDENT = b"PXR-USDC"


def _pack_value(v):
    """Self-describing little-endian packing of document values."""
    if isinstance(v, bool):
        return b"b" + struct.pack("<B", v)
    if isinstance(v, (int, np.integer)):
        return b"i" + struct.pack("<q", int(v))
    if isinstance(v, (float, np.floating)):
        return b"d" + struct.pack("<d", float(v))
    if isinstance(v, str):
        raw = v.encode()
        return b"s" + struct.pack("<I", len(raw)) + raw
    if isinstance(v, tuple):
        parts = [_pack_value(x) for x in v]
        return b"t" + struct.pack("<I", len(parts)) + b"".join(parts)
    if isinstance(v, (list, np.ndarray)):
        v = _aslist(v) if isinstance(v, np.ndarray) else v
        parts = [_pack_value(x) for x in v]
        return b"l" + struct.pack("<I", len(parts)) + b"".join(parts)
    if isinstance(v, dict):
        parts = []
        for k, x in v.items():
            parts.append(_pack_value(k))
            parts.append(_pack_value(x))
        return b"m" + struct.pack("<I", len(v)) + b"".join(parts)
    if v is None:
        return b"n"
    raise TypeError(f"usdc: cannot pack {type(v)}")


def _unpack_value(buf, pos):
    tag = buf[pos:pos + 1]
    pos += 1
    if tag == b"b":
        return bool(buf[pos]), pos + 1
    if tag == b"i":
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if tag == b"d":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tag == b"s":
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        return buf[pos:pos + n].decode(), pos + n
    if tag in (b"t", b"l"):
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        items = []
        for _ in range(n):
            x, pos = _unpack_value(buf, pos)
            items.append(x)
        return (tuple(items) if tag == b"t" else items), pos
    if tag == b"m":
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        d = {}
        for _ in range(n):
            k, pos = _unpack_value(buf, pos)
            x, pos = _unpack_value(buf, pos)
            d[k] = x
        return d, pos
    if tag == b"n":
        return None, pos
    raise ValueError(f"usdc: bad value tag {tag!r} @ {pos - 1}")


def write_usdc(stage: Stage, path) -> None:
    """Serialize the stage as a crate file (public layout, version 0.2.0 —
    see io/usdc_crate.py for the full encoding contract and its
    validation caveats)."""
    from momentum_tpu.io.usdc_crate import write_crate

    write_crate(stage, path)


def _write_usdc_legacy(stage: Stage, path) -> None:
    """Round-3 private container format (version bytes 0.0.1): kept only so
    old files remain decodable via `_read_usdc_legacy`; no longer written."""
    tokens = []
    tok_idx = {}

    def intern(s):
        if s not in tok_idx:
            tok_idx[s] = len(tokens)
            tokens.append(s)
        return tok_idx[s]

    fields = []  # packed field payloads

    def add_field(payload):
        fields.append(payload)
        return len(fields) - 1

    specs = []  # (nameTok, typeTok, parentIndex, metaField, attrsField)

    def emit(prim, parent):
        meta_f = add_field(_pack_value(prim.meta))
        attrs = []
        for a in prim.attrs.values():
            attrs.append({
                "name": a.name, "type": a.type, "uniform": a.uniform,
                "value": a.value, "meta": a.meta,
                "timeSamples": a.time_samples,
            })
        attrs_f = add_field(_pack_value(attrs))
        idx = len(specs)
        specs.append((intern(prim.name), intern(prim.type), parent,
                      meta_f, attrs_f))
        for c in prim.children:
            emit(c, idx)

    stage_meta_f = None
    for r in stage.roots:
        emit(r, -1)
    stage_meta_f = add_field(_pack_value(stage.meta))

    tok_blob = b"".join(t.encode() + b"\0" for t in tokens)
    tokens_sec = struct.pack("<q", len(tokens)) + tok_blob

    field_blob = b"".join(struct.pack("<I", len(f)) + f for f in fields)
    fields_sec = struct.pack("<q", len(fields)) + field_blob

    specs_blob = b"".join(struct.pack("<IIiii", *s) for s in specs)
    specs_sec = (struct.pack("<q", len(specs)) + specs_blob
                 + struct.pack("<i", stage_meta_f))

    sections = [(b"TOKENS", tokens_sec), (b"FIELDS", fields_sec),
                (b"SPECS", specs_sec)]

    with open(path, "wb") as f:
        # bootstrap: ident(8) + version(8) + tocOffset(8) + reserved(64)
        f.write(_USDC_IDENT)
        f.write(bytes([0, 0, 1]) + b"\0" * 5)
        boot_toc_pos = f.tell()
        f.write(struct.pack("<q", 0))
        f.write(b"\0" * 64)
        offsets = []
        for name, data in sections:
            offsets.append((name, f.tell(), len(data)))
            f.write(data)
        toc_off = f.tell()
        f.write(struct.pack("<q", len(sections)))
        for name, start, size in offsets:
            f.write(name.ljust(16, b"\0") + struct.pack("<qq", start, size))
        f.seek(boot_toc_pos)
        f.write(struct.pack("<q", toc_off))


def read_usdc(path) -> Stage:
    if isinstance(path, bytes):
        buf = path
    else:
        with open(path, "rb") as f:
            buf = f.read()
    if buf[:8] != _USDC_IDENT:
        raise ValueError("not a usdc file (bad ident)")
    if tuple(buf[8:11]) >= (0, 1, 0):
        from momentum_tpu.io.usdc_crate import read_crate

        return read_crate(buf)
    return _read_usdc_legacy(buf)


def _read_usdc_legacy(buf) -> Stage:
    toc_off = struct.unpack_from("<q", buf, 16)[0]
    nsec = struct.unpack_from("<q", buf, toc_off)[0]
    secs = {}
    pos = toc_off + 8
    for _ in range(nsec):
        name = buf[pos:pos + 16].rstrip(b"\0").decode()
        start, size = struct.unpack_from("<qq", buf, pos + 16)
        secs[name] = buf[start:start + size]
        pos += 32

    tsec = secs["TOKENS"]
    ntok = struct.unpack_from("<q", tsec, 0)[0]
    tokens = tsec[8:].split(b"\0")[:ntok]
    tokens = [t.decode() for t in tokens]

    fsec = secs["FIELDS"]
    nf = struct.unpack_from("<q", fsec, 0)[0]
    fields = []
    pos = 8
    for _ in range(nf):
        ln = struct.unpack_from("<I", fsec, pos)[0]
        pos += 4
        fields.append(fsec[pos:pos + ln])
        pos += ln

    ssec = secs["SPECS"]
    ns = struct.unpack_from("<q", ssec, 0)[0]
    prims = []
    stage = Stage()
    pos = 8
    for _ in range(ns):
        name_t, type_t, parent, meta_f, attrs_f = struct.unpack_from(
            "<IIiii", ssec, pos)
        pos += 20
        meta, _ = _unpack_value(fields[meta_f], 0)
        attrs_list, _ = _unpack_value(fields[attrs_f], 0)
        prim = Prim(name=tokens[name_t], type=tokens[type_t], meta=meta)
        for a in attrs_list:
            prim.attrs[a["name"]] = Attr(
                name=a["name"], type=a["type"], value=a["value"],
                meta=a["meta"], time_samples=a["timeSamples"],
                uniform=a["uniform"])
        prims.append(prim)
        if parent < 0:
            stage.roots.append(prim)
        else:
            prims[parent].children.append(prim)
    stage_meta_f = struct.unpack_from("<i", ssec, pos)[0]
    stage.meta, _ = _unpack_value(fields[stage_meta_f], 0)
    return stage


# --------------------------------------------------------------------------
# Character <-> stage
# --------------------------------------------------------------------------

_MAX_SKIN = 8


def _character_to_stage(character, motion=None, fps=24.0) -> Stage:
    import jax
    import jax.numpy as jnp

    from momentum_tpu.character import fk
    from momentum_tpu.math import skel_state as ss

    skel = character.skeleton
    nj = skel.num_joints
    parents = np.asarray(skel.joint_parent)
    names = list(skel.joint_names)
    paths = _joint_paths(names, parents)

    rest_local = np.asarray(ss.to_matrix(fk.local_skel_states(
        skel, jnp.zeros(nj * 7))))
    bind_world = np.asarray(ss.to_matrix(character.bind_pose()))
    # USD row-vector convention: transpose column-vector matrices
    rest_usd = np.transpose(rest_local, (0, 2, 1)).astype(np.float64)
    bind_usd = np.transpose(bind_world, (0, 2, 1)).astype(np.float64)

    skeleton_prim = Prim(name="Skel", type="Skeleton", attrs={
        "joints": Attr("joints", "token[]", list(paths), uniform=True),
        "bindTransforms": Attr("bindTransforms", "matrix4d[]",
                               [tuple(map(tuple, m)) for m in bind_usd],
                               uniform=True),
        "restTransforms": Attr("restTransforms", "matrix4d[]",
                               [tuple(map(tuple, m)) for m in rest_usd],
                               uniform=True),
    })

    if motion is not None:
        motion = jnp.asarray(motion)
        jp = jax.vmap(character.parameter_transform.apply)(motion)
        locals_f = np.asarray(jax.vmap(
            lambda x: ss.to_matrix(fk.local_skel_states(skel, x)))(jp))
        locals_usd = np.transpose(locals_f, (0, 1, 3, 2)).astype(np.float64)
        ts = {int(i): [tuple(map(tuple, m)) for m in locals_usd[i]]
              for i in range(locals_usd.shape[0])}
        anim = Prim(name="Anim", type="SkelAnimation", attrs={
            "joints": Attr("joints", "token[]", list(paths), uniform=True),
            "transforms": Attr("transforms", "matrix4d[]", time_samples=ts),
            # lossless momentum motion (usd_animation_io.cpp:40-50)
            "momentum:motion:parameterNames": Attr(
                "momentum:motion:parameterNames", "string[]",
                list(character.parameter_transform.names)),
            "momentum:motion:poses": Attr(
                "momentum:motion:poses", "float[]",
                [float(x) for x in np.asarray(motion).reshape(-1)]),
            "momentum:motion:numFrames": Attr(
                "momentum:motion:numFrames", "int", int(motion.shape[0])),
            "momentum:motion:numParams": Attr(
                "momentum:motion:numParams", "int", int(motion.shape[1])),
        })
        skeleton_prim.children.append(anim)

    root = Prim(name="Root", type="SkelRoot", children=[skeleton_prim])

    # momentum metadata (usd_io.cpp:196-240): parameter transform as JSON
    pt = character.parameter_transform
    pt_json = {
        "names": list(pt.names),
        "transform": np.asarray(pt.transform).tolist(),
        "offsets": np.asarray(pt.offsets).tolist(),
    }
    root.attrs["momentum:parameterTransform"] = Attr(
        "momentum:parameterTransform", "string", json.dumps(pt_json))
    if character.name:
        root.attrs["momentum:characterName"] = Attr(
            "momentum:characterName", "string", character.name)

    if character.mesh is not None:
        mesh = character.mesh
        v = np.asarray(mesh.vertices)
        fc = np.asarray(mesh.faces)
        mesh_prim = Prim(
            name="Body", type="Mesh",
            meta={"apiSchemas": ["SkelBindingAPI"]},
            attrs={
                "faceVertexCounts": Attr("faceVertexCounts", "int[]",
                                         [3] * fc.shape[0]),
                "faceVertexIndices": Attr("faceVertexIndices", "int[]",
                                          [int(i) for i in fc.reshape(-1)]),
                "points": Attr("points", "point3f[]",
                               [tuple(map(float, p)) for p in v]),
            })
        if getattr(mesh, "texcoords", None) is not None and \
                np.asarray(mesh.texcoords).size:
            mesh_prim.attrs["primvars:st"] = Attr(
                "primvars:st", "texCoord2f[]",
                [tuple(map(float, t)) for t in np.asarray(mesh.texcoords)],
                meta={"interpolation": "vertex"})
        if character.skin_weights is not None:
            si = np.asarray(character.skin_weights.index)
            sw = np.asarray(character.skin_weights.weight)
            k = si.shape[1]
            mesh_prim.attrs["primvars:skel:jointIndices"] = Attr(
                "primvars:skel:jointIndices", "int[]",
                [int(i) for i in si.reshape(-1)],
                meta={"elementSize": k, "interpolation": "vertex"})
            mesh_prim.attrs["primvars:skel:jointWeights"] = Attr(
                "primvars:skel:jointWeights", "float[]",
                [float(x) for x in sw.reshape(-1)],
                meta={"elementSize": k, "interpolation": "vertex"})
        root.children.append(mesh_prim)

    # locators as custom prims (usd_skeleton_io.cpp:400-445)
    if character.locators is not None and \
            np.asarray(character.locators.parent).size:
        loc = character.locators
        scope = Prim(name="Locators", type="Scope")
        lp = np.asarray(loc.parent)
        lo = np.asarray(loc.offset)
        lw = np.asarray(loc.weight)
        for i in range(lp.shape[0]):
            lname = loc.names[i] if loc.names else f"locator_{i}"
            p = Prim(name=_sanitize(f"{lname}_{i}"), attrs={
                "momentum:type": Attr("momentum:type", "string", "locator"),
                "momentum:name": Attr("momentum:name", "string", lname),
                "momentum:parent": Attr("momentum:parent", "string",
                                        names[int(lp[i])]),
                "momentum:offset": Attr("momentum:offset", "float3",
                                        tuple(map(float, lo[i]))),
                "momentum:weight": Attr("momentum:weight", "float",
                                        float(lw[i])),
            })
            scope.children.append(p)
        root.children.append(scope)

    # collision prims (usd_skeleton_io.cpp:260-300); tapered capsules
    if character.collision is not None and \
            np.asarray(character.collision.parent).size:
        col = character.collision
        scope = Prim(name="Collision", type="Scope")
        cp = np.asarray(col.parent)
        ct = np.asarray(col.transform)
        cr = np.asarray(col.radius)
        cl = np.asarray(col.length)
        for i in range(cp.shape[0]):
            jname = names[int(cp[i])]
            p = Prim(name=_sanitize(f"{jname}_col_{i}"), attrs={
                "momentum:type": Attr("momentum:type", "string",
                                      "collision_capsule"),
                "momentum:parent": Attr("momentum:parent", "string", jname),
                "momentum:length": Attr("momentum:length", "float",
                                        float(cl[i])),
                "momentum:radius": Attr("momentum:radius", "float2",
                                        (float(cr[i, 0]), float(cr[i, 1]))),
                "momentum:transform": Attr(
                    "momentum:transform", "float[]",
                    [float(x) for x in ct[i]]),
            })
            scope.children.append(p)
        root.children.append(scope)

    # per-joint mass bodies (usd_io.cpp:241-270 savePhysicalPropertiesToUsd:
    # a PhysicalProperties scope, one prim per body with momentum:joint +
    # momentum:physicalProperties JSON, tokens at usd_io.cpp:89-90)
    if character.physical_properties is not None and \
            character.physical_properties.num_bodies:
        from momentum_tpu.io._physical import body_to_json

        pp = character.physical_properties
        scope = Prim(name="PhysicalProperties", type="Scope")
        pj = np.asarray(pp.joint_index)
        pm = np.asarray(pp.mass)
        pc = np.asarray(pp.center_of_mass_offset)
        pi = np.asarray(pp.inertia)
        pq = np.asarray(pp.inertia_rotation)
        for b in range(pp.num_bodies):
            jname = pp.joint_names[b] if pp.joint_names else names[int(pj[b])]
            p = Prim(name=_sanitize(f"{jname}_body_{b}"), attrs={
                "momentum:joint": Attr("momentum:joint", "string", jname),
                "momentum:physicalProperties": Attr(
                    "momentum:physicalProperties", "string",
                    json.dumps(body_to_json(pm[b], pc[b], pi[b], pq[b]))),
            })
            scope.children.append(p)
        root.children.append(scope)

    return Stage(
        meta={"defaultPrim": "Root", "metersPerUnit": 1, "upAxis": "Y",
              "timeCodesPerSecond": float(fps)},
        roots=[root])


def _sanitize(name):
    return re.sub(r"[^\w]", "_", name)


def _joint_paths(names, parents):
    paths = []
    for i, n in enumerate(names):
        if parents[i] < 0:
            paths.append(n)
        else:
            paths.append(paths[parents[i]] + "/" + n)
    return paths


def _mat_list(value):
    """attribute value (list of 4-tuples of 4-tuples) → (N, 4, 4) float."""
    return np.asarray([[list(row) for row in m] for m in value], np.float64)


def _stage_to_character(stage: Stage):
    """Stage → (Character, motion). Reference load semantics
    (usd_skeleton_io.cpp:127-215): topology from '/'-separated joint paths,
    restTransforms preferred as local, world bindTransforms fallback
    composed against the parent's inverse."""
    import jax.numpy as jnp

    from momentum_tpu.character import (
        Character, CollisionGeometry, Locators, Mesh, SkinWeights,
        make_skeleton,
    )
    from momentum_tpu.character.parameter_transform import (
        ParameterTransform, make_identity_transform,
    )
    from momentum_tpu.math import skel_state as ss

    skels = stage.find("Skeleton")
    if not skels:
        raise ValueError("no Skeleton prim found")
    skel_prim = skels[0]

    paths = [str(p) for p in skel_prim.attr("joints", [])]
    names = [p.split("/")[-1] for p in paths]
    nj = len(names)
    path_idx = {p: i for i, p in enumerate(paths)}
    parents = []
    for p in paths:
        parent_path = "/".join(p.split("/")[:-1])
        parents.append(path_idx.get(parent_path, -1))

    rest_v = skel_prim.attr("restTransforms")
    bind_v = skel_prim.attr("bindTransforms")
    local = None
    if rest_v is not None and len(rest_v) == nj:
        local = np.transpose(_mat_list(rest_v), (0, 2, 1))
    elif bind_v is not None and len(bind_v) == nj:
        world = np.transpose(_mat_list(bind_v), (0, 2, 1))
        local = np.empty_like(world)
        for i in range(nj):
            if parents[i] >= 0:
                local[i] = np.linalg.inv(world[parents[i]]) @ world[i]
            else:
                local[i] = world[i]

    pre, offs = [], []
    for i in range(nj):
        if local is not None:
            state = ss.from_matrix(jnp.asarray(local[i], jnp.float32))
            t, q, _ = ss.split(state)
            offs.append(np.asarray(t))
            pre.append(np.asarray(q))
        else:
            offs.append([0.0, 0.0, 0.0])
            pre.append([0.0, 0.0, 0.0, 1.0])

    skeleton = make_skeleton(parents, np.asarray(pre), np.asarray(offs), names)

    # mesh + skinning (usd_mesh_io.cpp; fan-triangulate n-gons)
    mesh = skin = None
    meshes = stage.find("Mesh")
    if meshes:
        mp = meshes[0]
        pts = mp.attr("points")
        counts = mp.attr("faceVertexCounts")
        idx = mp.attr("faceVertexIndices")
        if pts is not None and counts is not None and idx is not None:
            verts = np.asarray([list(p) for p in pts], np.float32)
            tris = []
            pos = 0
            for c in counts:
                c = int(c)
                for k in range(1, c - 1):
                    tris.append([idx[pos], idx[pos + k], idx[pos + k + 1]])
                pos += c
            kw = {}
            st = mp.attrs.get("primvars:st")
            if st is not None and st.value is not None and \
                    len(st.value) == len(verts):
                kw["texcoords"] = jnp.asarray(
                    [list(t) for t in st.value], jnp.float32)
            mesh = Mesh(vertices=jnp.asarray(verts),
                        faces=jnp.asarray(np.asarray(tris, np.int32)), **kw)
            ji = mp.attrs.get("primvars:skel:jointIndices")
            jw = mp.attrs.get("primvars:skel:jointWeights")
            if ji is not None and jw is not None and ji.value:
                k = int(ji.meta.get("elementSize",
                                    len(ji.value) // len(verts)))
                si = np.asarray(ji.value, np.int64).reshape(len(verts), k)
                sw = np.asarray(jw.value, np.float32).reshape(len(verts), k)
                # keep top-_MAX_SKIN by weight (usd_mesh_io.cpp:245-263)
                kk = min(k, _MAX_SKIN)
                order = np.argsort(-sw, axis=1)[:, :kk]
                rows = np.arange(len(verts))[:, None]
                si8 = np.zeros((len(verts), _MAX_SKIN), np.int32)
                sw8 = np.zeros((len(verts), _MAX_SKIN), np.float32)
                si8[:, :kk] = si[rows, order]
                sw8[:, :kk] = sw[rows, order]
                skin = SkinWeights(index=jnp.asarray(si8),
                                   weight=jnp.asarray(sw8))

    # locators / collision / physical-body custom prims
    name_idx = {n: i for i, n in enumerate(names)}
    loc_rows, col_rows, phys_rows = [], [], []
    for prim in stage.walk():
        pj_json = prim.attr("momentum:physicalProperties")
        if pj_json:
            from momentum_tpu.io._physical import body_from_json

            jname = prim.attr("momentum:joint", "")
            if jname in name_idx:
                phys_rows.append(
                    (name_idx[jname],) + body_from_json(json.loads(pj_json))
                    + (jname,))
            continue
        ptype = prim.attr("momentum:type")
        if ptype == "locator":
            loc_rows.append((
                prim.attr("momentum:name", prim.name),
                name_idx.get(prim.attr("momentum:parent", ""), 0),
                [float(x) for x in prim.attr("momentum:offset",
                                             (0.0, 0.0, 0.0))],
                float(prim.attr("momentum:weight", 1.0))))
        elif ptype == "collision_capsule":
            col_rows.append((
                name_idx.get(prim.attr("momentum:parent", ""), 0),
                float(prim.attr("momentum:length", 1.0)),
                [float(x) for x in prim.attr("momentum:radius", (0.1, 0.1))],
                prim.attr("momentum:transform")))

    locators = None
    if loc_rows:
        locators = Locators(
            parent=jnp.asarray([r[1] for r in loc_rows], jnp.int32),
            offset=jnp.asarray([r[2] for r in loc_rows], jnp.float32),
            weight=jnp.asarray([r[3] for r in loc_rows], jnp.float32),
            names=tuple(r[0] for r in loc_rows))
    collision = None
    if col_rows:
        tf = []
        for r in col_rows:
            if r[3] is not None:
                tf.append([float(x) for x in r[3]])
            else:
                tf.append([0.0] * 3 + [0.0, 0.0, 0.0, 1.0, 1.0])
        collision = CollisionGeometry(
            parent=jnp.asarray([r[0] for r in col_rows], jnp.int32),
            transform=jnp.asarray(tf, jnp.float32),
            radius=jnp.asarray([r[2] for r in col_rows], jnp.float32),
            length=jnp.asarray([r[1] for r in col_rows], jnp.float32))

    # parameter transform from momentum metadata, else identity rig
    pt = None
    cname = ""
    for prim in stage.walk():
        v = prim.attr("momentum:parameterTransform")
        if v:
            d = json.loads(v)
            pt = ParameterTransform(
                transform=jnp.asarray(d["transform"], jnp.float32),
                offsets=jnp.asarray(d["offsets"], jnp.float32),
                names=tuple(d["names"]))
        cname = prim.attr("momentum:characterName", cname) or cname
    if pt is None:
        pt = make_identity_transform(nj)

    from momentum_tpu.io._physical import rows_to_physical_properties

    character = Character(
        skeleton=skeleton, parameter_transform=pt, mesh=mesh,
        skin_weights=skin, locators=locators, collision=collision,
        physical_properties=rows_to_physical_properties(phys_rows),
        name=cname or "usd_character")
    if mesh is not None and skin is not None:
        character = character.with_inverse_bind_pose()

    # motion: prefer lossless momentum model params, else joint transforms
    motion = None
    for prim in stage.find("SkelAnimation"):
        poses = prim.attr("momentum:motion:poses")
        nf = prim.attr("momentum:motion:numFrames")
        npar = prim.attr("momentum:motion:numParams")
        if poses and nf and npar:
            motion = np.asarray(poses, np.float32).reshape(int(nf), int(npar))
            break
        tattr = prim.attrs.get("transforms")
        if tattr is not None and tattr.time_samples:
            frames = []
            for k in sorted(tattr.time_samples):
                mats = _mat_list(tattr.time_samples[k])
                frames.append(np.transpose(mats, (0, 2, 1)))
            motion = np.stack(frames)  # (F, nJ, 4, 4) joint-local matrices
            break
    return character, motion


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------

def save_usda(path, character, motion=None, fps=24.0) -> None:
    """Write character (+ optional (F, P) model-parameter motion) as .usda
    with UsdSkel Skeleton/SkelAnimation + skinned Mesh + locator/collision
    prims + momentum metadata (usd_io.h saveUsd capability)."""
    stage = _character_to_stage(character, motion, fps)
    with open(path, "w") as f:
        f.write(write_usda(stage))


def load_usda(path):
    """→ (Character, motion). motion is (F, P) model params when the file
    carries momentum metadata, else (F, nJ, 4, 4) joint-local matrices,
    else None."""
    with open(path) as f:
        stage = parse_usda(f.read())
    return _stage_to_character(stage)


def save_usd(path, character, motion=None, fps=24.0) -> None:
    """Dispatch on extension: .usda text or .usdc crate binary."""
    if str(path).endswith(".usdc"):
        write_usdc(_character_to_stage(character, motion, fps), path)
    else:
        save_usda(path, character, motion, fps)


def load_usd(path):
    """Load .usda/.usdc. Prefers the pxr runtime when importable (reference
    parity: usd_io.cpp loadUsdCharacter); falls back to the built-in
    parsers."""
    path = str(path)
    try:
        import pxr  # noqa: F401 — not present in this image
        # A pxr-backed path would open the stage and export to usda text;
        # flatten through the text parser for a single load path.
        from pxr import Usd

        stage = Usd.Stage.Open(path)
        return _stage_to_character(parse_usda(
            stage.GetRootLayer().ExportToString()))
    except ImportError:
        pass
    if path.endswith(".usdc"):
        return _stage_to_character(read_usdc(path))
    with open(path, "rb") as f:
        head = f.read(8)
    if head == _USDC_IDENT:
        return _stage_to_character(read_usdc(path))
    return load_usda(path)


# ---- pymomentum.geometry USD binding surface (io_usd_pybind.cpp:329-520) ----


def is_usd_available() -> bool:
    """Always True: this build ships its own usda/usdc reader+writer (the
    reference gates USD behind an optional pxr build)."""
    return True


def _stage_from_any(source) -> Stage:
    """Path or raw bytes → parsed Stage."""
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
        if data[:8] == _USDC_IDENT:
            import os
            import tempfile

            fd, tmp = tempfile.mkstemp(suffix=".usdc")
            os.close(fd)
            try:
                with open(tmp, "wb") as f:
                    f.write(data)
                return read_usdc(tmp)
            finally:
                os.unlink(tmp)
        return parse_usda(data.decode("utf-8", errors="replace"))
    path = str(source)
    if path.endswith(".usdc"):
        return read_usdc(path)
    with open(path, "rb") as f:
        head = f.read(8)
    if head == _USDC_IDENT:
        return read_usdc(path)
    with open(path) as f:
        return parse_usda(f.read())


def _stage_fps(stage: Stage) -> float:
    return float(stage.meta.get("timeCodesPerSecond", 24.0))


def load_character(source):
    """Character only (io_usd_pybind load_character); accepts a path or
    raw USD bytes."""
    char, _ = _stage_to_character(_stage_from_any(source))
    return char


def load_character_from_bytes(data: bytes):
    return load_character(bytes(data))


def load_character_with_motion(source):
    """→ (character, motion (F, P) or None, identity (nJ·7,), fps) — the
    io_usd_pybind load_character_with_motion tuple. The identity vector is
    zero: this loader bakes bone offsets into the skeleton rest pose."""
    import numpy as np

    stage = _stage_from_any(source)
    char, motion = _stage_to_character(stage)
    identity = np.zeros(char.skeleton.num_joints * 7, np.float32)
    return char, motion, identity, _stage_fps(stage)


def load_character_with_motion_from_bytes(data: bytes):
    return load_character_with_motion(bytes(data))


def load_character_with_skel_states(source):
    """→ (character, skel_states (F, nJ, 8), fps): motion resolved through
    FK (io_usd_pybind load_character_with_skel_states)."""
    import jax

    stage = _stage_from_any(source)
    char, motion = _stage_to_character(stage)
    fps = _stage_fps(stage)
    if motion is None:
        states = char.skeleton_states(
            np.zeros(char.num_model_parameters, np.float32))[None]
    else:
        states = jax.vmap(char.skeleton_states)(np.asarray(motion, np.float32))
    return char, states, fps


def load_character_with_skel_states_from_bytes(data: bytes):
    return load_character_with_skel_states(bytes(data))


def save_character(path, character, fps: float = 24.0, motion=None) -> None:
    """io_usd_pybind save_character."""
    save_usd(path, character, motion=motion, fps=fps)


def save_character_from_skel_states(path, character, skel_states,
                                    fps: float = 24.0) -> None:
    """Save with motion given as GLOBAL skeleton states (F, nJ, 8): inverted
    to model parameters through constrained inverse FK + the rig
    pseudo-inverse (io_usd_pybind save_character_from_skel_states)."""
    import jax.numpy as jnp

    from momentum_tpu.character.inverse_fk import (
        joint_parameters_from_skeleton_states)

    states = jnp.asarray(skel_states, jnp.float32)
    if states.ndim == 2:
        states = states[None]
    jp = joint_parameters_from_skeleton_states(character.skeleton, states)
    pt = character.parameter_transform
    pinv = pt.pinv()
    motion = np.einsum("pj,fj->fp", np.asarray(pinv),
                       np.asarray(jp) - np.asarray(pt.offsets)[None])
    save_usd(path, character, motion=motion, fps=fps)
