"""
Measure the df32 swaption-cube engine on the real TPU in a CLEAN process.

Run by tests/test_tpu_perf.py::test_warm_swaption_cube_df32_reprice_under_150ms
as a subprocess: the perf suite's logsv df32 gates already hold the parent
process's df32 "slot", and a SECOND df32 program family compiled after
another df32 program has executed fails on re-execution through the axon
tunnel (PARITY.md "df32 compile-after-run hazard") — so the cube's df32
family gets its own process.

Prints ONE JSON line:
  {"warm_ms": ..., "abs_diff_max": ..., "price_scale": ...}

Order inside this process matters: the df32 cube compiles and runs FIRST
(it is the process's one df32 family), the f64 reference after.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import stochvolmodels_tpu  # noqa: F401  (x64 + cache config)


def main() -> None:
    from papers.sv_for_factor_hjm.calibration_fig_5_6_7 import (
        get_calib_rate_logsv_params,
        get_swaption_data,
    )
    from stochvolmodels_tpu.models.factor_hjm import (
        make_swaption_cube_fn,
        swaption_chain_to_cube,
    )

    chain = get_swaption_data("USD")
    params = get_calib_rate_logsv_params()["USD"]
    slices, fwds, strikes, _ = swaption_chain_to_cube(chain, max_expiry=5.0)
    args = (jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs),
            jnp.asarray(params.volvol.xs))

    fndd, mask = make_swaption_cube_fn(params, slices, fwds, strikes,
                                       engine="df32")
    pdd = np.asarray(fndd(*args))        # compile + first run (df32 first!)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fndd(*args)))      # fetch forces completion
        best = min(best, time.perf_counter() - t0)

    fn64, _ = make_swaption_cube_fn(params, slices, fwds, strikes,
                                    engine="f64")
    p64 = np.asarray(fn64(*args))
    m = np.asarray(mask)
    out = {
        "warm_ms": round(best * 1e3, 2),
        "abs_diff_max": float(np.max(np.abs(p64[m] - pdd[m]))),
        "price_scale": float(np.max(np.abs(p64[m]))),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
