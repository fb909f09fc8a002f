"""
Exact-path (f64) BTC chain reprice: step-count/unroll ablation on TPU.

VERDICT r02 weak-item 3: the warm f64 reprice was 1164 ms vs 36 ms fast —
find the (year_steps, unroll) and/or semi-analytic configuration that keeps
parity while cutting wall-clock.  Same-process A/B (tunnel perf varies ±20%
between processes).

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_exact_path.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import stochvolmodels_tpu  # noqa: F401
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.pricer import (
    logsv_chain_price_grid,
    set_vol_scaler,
)

chain = get_btc_test_chain_data()
grid = chain.to_grid()
params = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                     beta=0.15, volvol=1.85)
vol_scaler = float(set_vol_scaler(sigma0=params.sigma0, ttm=np.min(chain.ttms)))
ttms_static = tuple(float(t) for t in chain.ttms)


def make_fn(year_steps, unroll):
    def f(sigma0, theta, kappa1, kappa2, beta, volvol):
        return logsv_chain_price_grid(
            grid, sigma0, theta, kappa1, kappa2, beta, volvol,
            vol_scaler=vol_scaler, ttms_static=ttms_static,
            year_steps=year_steps, unroll=unroll)
    return jax.jit(f)


def timeit(fn, n=5):
    args = (params.sigma0, params.theta, params.kappa1, params.kappa2,
            params.beta, params.volvol)
    out = fn(*args)
    ref = np.asarray(out)   # force completion via host fetch
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best, ref


base_t, base_p = timeit(make_fn(720, 4))
print(f"720/yr unroll=4 (current exact): {base_t*1e3:7.1f} ms  [baseline]", flush=True)
# unroll measured irrelevant (720/yr unroll=16: 1146 vs 1118 ms baseline —
# the scan is op-latency-bound, same as the cube study); ablate steps only.
for ys, ur in [(360, 4), (240, 4), (180, 4), (120, 4)]:
    t, p = timeit(make_fn(ys, ur))
    err = np.nanmax(np.abs(p - base_p))
    rel = np.nanmax(np.abs(p - base_p) / np.maximum(np.abs(base_p), 1e-30))
    print(f"{ys}/yr unroll={ur:2d}: {t*1e3:7.1f} ms  max|dP| vs base = {err:.2e}"
          f"  max rel = {rel:.2e}", flush=True)
