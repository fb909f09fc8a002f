"""
Extract the bundled market-data snapshots (BTC/VIX/GLD/SQQQ/SPY/QVAR chains)
from the reference library into .npz files under stochvolmodels_tpu/data/chains/.

The reference depends on numba, which is not installed here; we stub it with
pass-through decorators just enough to import the data modules.  This copies
*market data* (quotes), not code.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

OUT_DIR = Path(__file__).resolve().parents[1] / "stochvolmodels_tpu" / "data" / "chains"
REF = "/root/reference"


def install_numba_stub() -> None:
    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        def deco(fn):
            return fn
        return deco

    numba.njit = njit
    numba.jit = njit
    numba.prange = range

    class _ObjMode:
        def __call__(self, *a, **k):
            return self

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    numba.objmode = _ObjMode()
    numba.float32 = "float32"
    numba.float64 = "float64"
    numba.int32 = "int32"
    numba.int64 = "int64"
    numba.boolean = "boolean"
    numba.complex128 = "complex128"

    typed = types.ModuleType("numba.typed")

    class _List(list):
        @staticmethod
        def empty_list(*a, **k):
            return _List()

    typed.List = _List
    numba.typed = typed

    core = types.ModuleType("numba.core")
    types_mod = types.ModuleType("numba.core.types")
    core.types = types_mod
    numba.core = core
    numba.types = types_mod

    sys.modules["numba"] = numba
    sys.modules["numba.typed"] = typed
    sys.modules["numba.core"] = core
    sys.modules["numba.core.types"] = types_mod


def chain_to_npz(chain, path: Path) -> None:
    n = len(chain.ttms)
    data = {
        "ttms": np.asarray(chain.ttms, dtype=float),
        "forwards": np.asarray(chain.forwards, dtype=float),
        "discfactors": np.asarray(chain.discfactors, dtype=float),
        "ids": np.asarray(chain.ids).astype(str),
        "ticker": np.asarray(chain.ticker if chain.ticker is not None else ""),
    }
    for i in range(n):
        data[f"strikes_{i}"] = np.asarray(chain.strikes_ttms[i], dtype=float)
        data[f"optiontypes_{i}"] = np.asarray(chain.optiontypes_ttms[i]).astype(str)
        if chain.bid_ivs is not None:
            data[f"bid_ivs_{i}"] = np.asarray(chain.bid_ivs[i], dtype=float)
            data[f"ask_ivs_{i}"] = np.asarray(chain.ask_ivs[i], dtype=float)
    np.savez(path, **data)
    print(f"wrote {path} ({n} slices)")


def main() -> None:
    install_numba_stub()
    sys.path.insert(0, REF)
    import stochvolmodels.data.sample_option_chains as chains

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    chain_to_npz(chains.get_btc_test_chain_data(), OUT_DIR / "btc_20211021.npz")
    chain_to_npz(chains.get_vix_test_chain_data(), OUT_DIR / "vix_20220715.npz")
    chain_to_npz(chains.get_gld_test_chain_data_6m(), OUT_DIR / "gld_6m.npz")
    chain_to_npz(chains.get_gld_test_chain_data(), OUT_DIR / "gld.npz")
    chain_to_npz(chains.get_sqqq_test_chain_data(), OUT_DIR / "sqqq.npz")
    chain_to_npz(chains.get_spy_test_chain_data(), OUT_DIR / "spy.npz")
    chain_to_npz(chains.get_qv_options_test_chain_data(), OUT_DIR / "qv_options.npz")


if __name__ == "__main__":
    main()
