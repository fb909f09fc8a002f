"""
Phase breakdown of the swaption-cube reprice on TPU (same process).

Phases: (a) full cube price, (b) coefficient assembly only (the 12x7
jnp.interp panel), (c) Riccati scan only (precomputed stage coefficients,
unroll 1/8/32), (d) inversion only.  Also S-refinement accuracy so the
default year_steps can be chosen on evidence.

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_cube_breakdown.py
"""
import time
from functools import partial

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
from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
    solve_a_ode_grid_batch,
)
from stochvolmodels_tpu.models.factor_hjm.double_exp_pricer import (
    tanh_sinh_nodes,
)
from stochvolmodels_tpu.utils.cplx import Cplx

chain = get_swaption_data("USD")
params = get_calib_rate_logsv_params()["USD"]
slices, fwds, strikes, _ = swaption_chain_to_cube(chain, max_expiry=5.0)
args = (jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs),
        jnp.asarray(params.volvol.xs))
P = len(slices)
p_nodes, _ = tanh_sinh_nodes(h=0.125, x_max=2.75)
N = len(p_nodes)
print(f"P={P} slices, N={N} tanh-sinh nodes")


def timeit(fn, *a, n=5):
    t0 = time.perf_counter()
    out = fn(*a)
    ref = float(jnp.sum(out[0] if isinstance(out, tuple) else
                        (out.re if hasattr(out, 're') else out)))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else
                      (out.re if hasattr(out, 're') else out)))
        best = min(best, time.perf_counter() - t0)
    return best, tc, ref


# full cube at S=600 (year_steps=120) as the in-process baseline
fn120, _ = make_swaption_cube_fn(params, slices, fwds, strikes, year_steps=120)
best, tc, ref = timeit(fn120, *args)
print(f"(a) full cube  S=600 : warm {best*1e3:7.1f} ms (compile {tc:.0f}s)")

# Riccati scan alone on synthetic coefficients of the same shape
S = 600
phi = Cplx(jnp.full((N,), -0.5), jnp.asarray(p_nodes))
dts = jnp.asarray([float(e) / S for e, _ in slices])
rng = np.random.default_rng(0)
sc = jnp.asarray(rng.normal(size=(P, S, 7, 3)) * 0.05)


@partial(jax.jit, static_argnames=("q",))
def scan_only(sc, dts, q=float(params.theta)):
    return solve_a_ode_grid_batch(phi, dts, sc, q=q).re

best, tc, _ = timeit(scan_only, sc, dts)
print(f"(c) Riccati scan S=600 (unroll=8 in lib): warm {best*1e3:7.1f} ms "
      f"(compile {tc:.0f}s)")

# S-refinement accuracy of the full cube
px_ref = np.asarray(fn120(*args))
for ys in (60, 48, 24):
    fn, _ = make_swaption_cube_fn(params, slices, fwds, strikes, year_steps=ys)
    best, tc, _ = timeit(fn, *args)
    dp = np.nanmax(np.abs(np.asarray(fn(*args)) - px_ref))
    print(f"full cube year_steps={ys:4d} (S={int(np.ceil(ys*5.0))}): warm "
          f"{best*1e3:7.1f} ms (compile {tc:.0f}s) max|dP| vs 120 = {dp:.2e}")
