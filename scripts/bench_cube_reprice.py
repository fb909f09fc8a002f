"""
Swaption-cube warm-reprice ablation on TPU.

test_warm_swaption_cube_reprice_under_1s measured 3.9 s warm (target < 1 s).
Hypothesis: the (P, S, ...) Riccati scan at S=1800 steps/cube is
latency-bound (tiny per-step work, no unroll).  Same-process A/B over
year_steps and scan unroll.

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_cube_reprice.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import stochvolmodels_tpu  # noqa: F401
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


def timeit(fn, n=5):
    t_compile0 = time.perf_counter()
    ref = float(jnp.sum(fn(*args)))
    t_compile = time.perf_counter() - t_compile0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best, t_compile, ref


for ys in (360, 120):
    fn, _ = make_swaption_cube_fn(params, slices, fwds, strikes, year_steps=ys)
    best, tc, ref = timeit(fn)
    print(f"year_steps={ys:4d} (S={int(np.ceil(ys*5.0))}): warm {best*1e3:7.1f} ms"
          f"  (compile {tc:.1f}s, sum={ref:.6f})")
