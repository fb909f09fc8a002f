"""
Fast-path quadrature precision x wall-clock study (one TPU process).

The r04 mixed-precision change (f32 ODE scans + ALL-f64 quadrature and
fused inversion) improved the fast path's accuracy 5.1e-5 -> 7e-7 but
regressed its warm wall-clock ~10x on hardware (warm fast ivols 61 ->
607 ms measured by the TPU perf gates): on a chip with no native f64,
every f64 transcendental is software-emulated and the axon backend is
per-op latency-bound.  This script times the candidate repairs within
ONE process (tunnel variance makes cross-process comparison meaningless):

  reprice  f64quad   f32 solve -> all-f64 quadrature   (the r04 regression)
  reprice  mixed     f32 solve -> f64 phase, f32 exp/cos/sin, f64 sum
  reprice  f32       all-f32 trace                     (the r03 shipping path)
  ivols    f64quad+f64inv   (the r04 regression)
  ivols    mixed+f32inv     mixed quadrature + f32 bisect/Newton inversion
  ivols    f32              all-f32 trace

Accuracy of each variant: scripts/logsv_fast_floor.py (CPU, same math):
f64quad 7e-7, mixed 2.9e-6, f32 5.1e-5 relative price error.

Run: SVMTPU_BENCH_TPU=1 PYTHONPATH="/root/.axon_site:/root/repo" \
       python scripts/bench_fast_quad.py
(or unset SVMTPU_BENCH_TPU to sanity-check the variants on CPU)
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax

if os.environ.get("SVMTPU_BENCH_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stochvolmodels_tpu.config import VariableType  # noqa: E402
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder  # noqa: E402
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data  # noqa: E402
from stochvolmodels_tpu.models.logsv.fast_calibration import _grid_to_f32  # noqa: E402
from stochvolmodels_tpu.models.logsv.pricer import (  # noqa: E402
    LOGSV_BTC_PARAMS,
    logsv_chain_price_grid,
    set_vol_scaler,
)
from stochvolmodels_tpu.ops import bsm  # noqa: E402


def _warm_best(fn, n=5):
    fn()  # compile + first run
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    chain = get_btc_test_chain_data()
    params = LOGSV_BTC_PARAMS
    grid = chain.to_grid()
    grid32 = _grid_to_f32(grid)
    vol_scaler = float(set_vol_scaler(sigma0=params.sigma0,
                                      ttm=np.min(chain.ttms)))
    ttms_static = tuple(float(t) for t in chain.ttms)
    args = dict(sigma0=float(params.sigma0), theta=float(params.theta),
                kappa1=float(params.kappa1), kappa2=float(params.kappa2),
                beta=float(params.beta), volvol=float(params.volvol),
                vol_scaler=vol_scaler, ttms_static=ttms_static,
                variable_type=VariableType.LOG_RETURN,
                expansion_order=ExpansionOrder.SECOND,
                is_spot_measure=True, year_steps=360)

    @partial(jax.jit, static_argnames=("mixed_quad",))
    def price_f64ctx(grid, mixed_quad):
        return logsv_chain_price_grid(grid, solve_f32=True,
                                      mixed_quad=mixed_quad, **args)

    def make_price_f32():
        with jax.enable_x64(False):
            f = jax.jit(lambda g: logsv_chain_price_grid(
                g, solve_f32=False, mixed_quad=False, **args))
        return f

    price_f32 = make_price_f32()

    def invert(prices, g, f32inv):
        if f32inv:
            f32 = jnp.float32
            return bsm.infer_bsm_implied_vol_fast(
                forward=g.forwards.astype(f32)[:, None],
                ttm=g.ttms.astype(f32)[:, None],
                strike=g.strikes.astype(f32),
                given_price=prices.astype(f32),
                discfactor=g.discfactors.astype(f32)[:, None],
                optiontype=g.optioncodes)
        return bsm.infer_bsm_implied_vol_fast(
            forward=g.forwards[:, None], ttm=g.ttms[:, None],
            strike=g.strikes, given_price=prices,
            discfactor=g.discfactors[:, None], optiontype=g.optioncodes)

    @partial(jax.jit, static_argnames=("mixed_quad", "f32inv"))
    def ivols_f64ctx(grid, mixed_quad, f32inv):
        prices = logsv_chain_price_grid(grid, solve_f32=True,
                                        mixed_quad=mixed_quad, **args)
        return grid.masked(invert(prices, grid, f32inv))

    def make_ivols_f32():
        with jax.enable_x64(False):
            def body(g):
                prices = logsv_chain_price_grid(g, solve_f32=False,
                                                mixed_quad=False, **args)
                return g.masked(invert(prices, g, False))
            f = jax.jit(body)
        return f

    ivols_f32 = make_ivols_f32()

    def fetch(x):
        return float(np.asarray(x)[0, 0])

    rows = [
        ("reprice f64quad (r04 regression)",
         lambda: fetch(price_f64ctx(grid, mixed_quad=False))),
        ("reprice mixed",
         lambda: fetch(price_f64ctx(grid, mixed_quad=True))),
        ("reprice all-f32 (r03 path)",
         lambda: fetch(price_f32(grid32))),
        ("ivols f64quad+f64inv (r04 regression)",
         lambda: fetch(ivols_f64ctx(grid, mixed_quad=False, f32inv=False))),
        ("ivols mixed+f32inv",
         lambda: fetch(ivols_f64ctx(grid, mixed_quad=True, f32inv=True))),
        ("ivols all-f32 (r03 path)",
         lambda: fetch(ivols_f32(grid32))),
    ]
    print(f"backend: {jax.devices()[0].platform}")
    print("| variant | warm best (ms) |")
    print("|---|---|")
    for name, fn in rows:
        best = _warm_best(fn)
        print(f"| {name} | {best * 1e3:.1f} |", flush=True)


if __name__ == "__main__":
    main()
