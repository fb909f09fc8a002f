"""
Import the mounted read-only reference implementation as a numerical oracle.

The reference depends on numba, which is absent here; its @njit kernels are
plain Python/numpy functions once the decorator is a no-op, so a minimal
numba stub lets the whole package import and run (slowly — fine for parity
tests).  Nothing from the reference is executed at import beyond module-level
constants; the global set_seed(24) the reference runs at import
(model_pricer.py:29) only touches numpy RNG state.
"""
from __future__ import annotations

import sys
import types


def _install_numba_stub() -> None:
    if "numba" in sys.modules:
        return

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    class _ObjMode:
        def __call__(self, *a, **k):
            return self

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    numba = types.ModuleType("numba")
    numba.njit = njit
    numba.jit = njit
    numba.prange = range
    numba.objmode = _ObjMode()

    typed = types.ModuleType("numba.typed")

    class List(list):  # numba.typed.List([...]) / List.empty_list
        @staticmethod
        def empty_list(*a, **k):
            return List()

    typed.List = List
    numba.typed = typed
    sys.modules["numba"] = numba
    sys.modules["numba.typed"] = typed


def load_reference():
    """import and return the reference `stochvolmodels` package (cached)."""
    _install_numba_stub()
    ref_root = "/root/reference"
    added = ref_root not in sys.path
    if added:
        sys.path.insert(0, ref_root)
    # the repo-local compat shim shadows the name; evict it for this import
    shadowed = {k: v for k, v in sys.modules.items()
                if k == "stochvolmodels" or k.startswith("stochvolmodels.")}
    for k in shadowed:
        del sys.modules[k]
    import importlib
    try:
        ref = importlib.import_module("stochvolmodels")
    finally:
        # leaving /root/reference on sys.path would make the repo's `papers`
        # namespace package resolve to the reference's papers/ tree
        if added and ref_root in sys.path:
            sys.path.remove(ref_root)
    ref_mods = {k: v for k, v in sys.modules.items()
                if k == "stochvolmodels" or k.startswith("stochvolmodels.")}
    # restore the shim under the public name; keep reference modules reachable
    for k in list(ref_mods):
        sys.modules["_ref_" + k] = sys.modules.pop(k)
    sys.modules.update(shadowed)
    return ref
