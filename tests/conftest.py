"""
Test configuration: force CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh) and float64.  Must run before jax
imports anywhere.

Escape hatch: ``SVMTPU_TEST_TPU=1`` keeps the default (TPU) backend so the
TPU-gated tests (Mosaic kernels, wall-clock perf assertions) actually run,
e.g. ``SVMTPU_TEST_TPU=1 python -m pytest tests/test_tpu_perf.py -q``.
"""
import os

_USE_TPU = os.environ.get("SVMTPU_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    # single-threaded LLVM codegen: XLA:CPU's parallel codegen segfaults
    # (stack overflow in a codegen thread) partway through the suite once many
    # large modules (whole-chain value_and_grad programs) have been compiled
    if "xla_cpu_parallel_codegen_split_count" not in _flags:
        _flags = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
    os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the image's sitecustomize force-registers the axon TPU backend via
# jax.config (which wins over JAX_PLATFORMS env); tests run on 8 virtual
# CPU devices, so force the platform back
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache ENABLED for tests (r05): the suite is almost
# pure single-core XLA:CPU compile — a warm cache cuts "not slow" from
# 16:05 to 7:44 measured.  An earlier round disabled it because jax 0.9's
# cache serialization segfaulted on some large CPU executables (jacfwd
# through the then-unrolled RK4 scan); those programs are gone (unroll
# dropped) and two full cache-writing suite runs completed clean.  Escape
# hatch if it ever regresses: SVMTPU_NO_COMPILE_CACHE=1.


# XLA:CPU JIT code mappings accumulate per compiled executable; a full-suite
# run crosses the kernel's vm.max_map_count (default 65530) and segfaults
# inside LLVM (observed: maps 833 -> 63581, then SIGSEGV at the limit; a
# single heavy module — e.g. the factor-HJM cube/LM programs — can cross it
# alone).  Two defenses: best-effort raise of the limit (root in CI), and
# dropping executables between test modules so shared programs recompile
# later — slower but deterministic.
import gc

import pytest

_MAP_LIMIT_RAISED = False
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _MAP_LIMIT_RAISED = int(_f.read().strip()) >= 1048576
    if not _MAP_LIMIT_RAISED:
        with open("/proc/sys/vm/max_map_count", "w") as _g:
            _g.write("1048576")
        _MAP_LIMIT_RAISED = True
except (OSError, PermissionError, ValueError):
    pass  # not root / not linux: fall back to the cache-clear defense


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """map-count fallback ONLY: when the limit raise failed, drop compiled
    executables between modules so the suite stays under the kernel's
    default vm.max_map_count (65530).  When the raise succeeded (root, the
    normal case on this box: 125 GB RAM, limit at 1048576), KEEP the JIT
    cache — the BTC chain pricers, BSM inversions and LM programs are
    shared by many modules, and recompiling them per module cost ~25-30%
    of suite wall-clock."""
    yield
    if not _MAP_LIMIT_RAISED:
        jax.clear_caches()
        gc.collect()
