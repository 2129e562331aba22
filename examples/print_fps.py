"""Print frame count / frame rate / duration of a motion container.

Reference: momentum/examples/print_fps.

    python examples/print_fps.py file.glb [file2.c3d ...]
"""

from __future__ import annotations

# Allow running from a source checkout: `python examples/<tool>.py` puts
# examples/ (not the repo root) on sys.path
import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import os
import sys


def main():
    import jax

    # host-side tool: force the CPU backend (the TPU plugin may be busy or
    # absent, and nothing here needs it)
    jax.config.update("jax_platforms", "cpu")

    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    for path in sys.argv[1:]:
        ext = os.path.splitext(path)[1].lower()
        if ext in (".c3d", ".trc"):
            from momentum_tpu.io.markers import load_c3d, load_trc

            seq = (load_trc if ext == ".trc" else load_c3d)(path)
            n, fps = seq.positions.shape[0], seq.fps
        elif ext == ".mmo":
            from momentum_tpu.io.motion import load_mmo

            motion = load_mmo(path)
            n, fps = motion[0].shape[0] if motion[0] is not None else 0, None
        else:
            from examples.convert_model import load_any

            _, motion, fps = load_any(path)
            n = 0 if motion is None else len(motion)
        dur = f"{n / fps:.2f}s" if fps else "?"
        print(f"{path}: {n} frames @ {fps} fps = {dur}")


if __name__ == "__main__":
    main()
