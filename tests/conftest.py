"""Test harness config: run everything on an 8-virtual-device CPU platform so
multi-chip sharding paths (shard_map over a Mesh) are exercised without TPU
hardware. Must set flags before the first jax import anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env may point at a TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's dominant cost is re-jitting solver
# variants on every run (~50 min wall round 3). Caching compiled executables
# across runs cuts repeat-run wall time; first run also benefits when multiple
# tests hit the same (fn, shape) key. Entries over the 1 s default compile
# threshold are kept; the dir is gitignored.
_cache_dir = os.environ.get(
    "MOMENTUM_TPU_JIT_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
if _cache_dir and _cache_dir != "0":
    # key by host CPU features: XLA:CPU AOT executables embed the compile
    # machine's ISA and reloading them on a different host risks SIGILL
    # (observed when this checkout moved machines)
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            _flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        _flags = ""
    _host_key = hashlib.sha1(
        (platform.machine() + _flags).encode()).hexdigest()[:12]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_cache_dir, _host_key))
    # 0.1 s threshold (was 0.5): the suite compiles thousands of sub-second
    # executables whose aggregate dominates repeat-run wall time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual-CPU platform"


@pytest.fixture
def rng():
    """Seeded numpy Generator — mirrors the reference's fixed-seed test fixtures
    (test/character_solver/error_function_helpers.h:22-53, seed 12345)."""
    return np.random.default_rng(12345)


# ---- quick tier ------------------------------------------------------------
# `pytest -m quick` runs the fast development gate; the FULL suite remains
# the merge gate. Slow tests are listed by nodeid in tests/slow_tests.txt
# (generated from a measured --durations run; regenerate when the shape of
# the suite changes). Everything else is marked quick, so the tier keeps
# per-file coverage — only individually-heavy cases drop out.
import pathlib  # noqa: E402

_SLOW_LIST = pathlib.Path(__file__).parent / "slow_tests.txt"
_SLOW_IDS = set()
if _SLOW_LIST.exists():
    _SLOW_IDS = {ln.strip() for ln in _SLOW_LIST.read_text().splitlines()
                 if ln.strip() and not ln.startswith("#")}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
