"""
VERDICT r3 #5: benchmark the semi-analytic expm+phi1 stepper
(models/logsv/affine.solve_analytic_ode_grid, the TPU rebuild of the
reference's eigendecomposition + fixed-point scheme,
/root/reference/stochvolmodels/pricers/logsv/affine_expansion.py:306-384)
as a candidate `precision='exact'` engine vs the shipping f64 RK4 at 240
steps/yr.

Runs on the real TPU (falls back to CPU with a note).  Same-process,
warm, best-of-3 per engine; parity of the candidate vs the RK4 engine is
printed alongside so speed is never read without accuracy.

Expected physics (PARITY.md "Swaption-cube latency study"): the axon scan
is per-step latency-bound (~50 us/step + ~6 us/op).  The analytic stepper
needs dt <= 1/(25 max|phi|) for its fixed point to contract — ~790
steps/yr on the BTC grid (max|phi| ~ 31) vs RK4's 240 — and runs nfp
fixed-point iterations of ~10 einsums per step, so it should LOSE badly
on this backend; this script records the number that closes the question.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_exact_engines.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import stochvolmodels_tpu  # noqa: F401  (x64 + cache config)
import stochvolmodels_tpu.models.logsv.affine as afe
from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.logsv.pricer import (
    LOGSV_BTC_PARAMS,
    LogSVPricer,
    set_vol_scaler,
)
from stochvolmodels_tpu.ops import mgf
from stochvolmodels_tpu.utils.cplx import Cplx


def analytic_chain_prices_fn(chain, nfp: int):
    """jitted BTC chain pricer with the semi-analytic exact engine."""
    vol_scaler = set_vol_scaler(sigma0=LOGSV_BTC_PARAMS.sigma0,
                                ttm=float(np.min(chain.ttms)))
    grid = chain.to_grid()
    ttms_static = tuple(float(t) for t in chain.ttms)

    @jax.jit
    def price(sigma0, theta, kappa1, kappa2, beta, volvol):
        phi_grid, psi_grid, _ = mgf.get_transform_var_grid(
            variable_type=VariableType.LOG_RETURN, vol_scaler=vol_scaler)
        n = phi_grid.shape[0]
        a_t = Cplx(jnp.zeros((n, 5)), jnp.zeros((n, 5)))
        ttm0 = 0.0
        prices = []
        for i, ttm in enumerate(ttms_static):
            a_t = afe.solve_analytic_ode_grid(
                phi_grid=phi_grid, psi_grid=psi_grid, ttm=ttm - ttm0,
                theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                volvol=volvol, a_t0=a_t, nfp=nfp)
            y = sigma0 - theta
            y2 = y * y
            ys = jnp.stack([jnp.ones_like(jnp.asarray(y)), y, y2, y2 * y,
                            y2 * y2])
            log_mgf = Cplx(a_t.re @ ys, a_t.im @ ys)
            prices.append(mgf.vanilla_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, phi_grid=phi_grid,
                forwards=grid.forwards[i], strikes=grid.strikes[i],
                optiontypes=grid.optioncodes[i],
                discfactors=grid.discfactors[i]))
            ttm0 = ttm
        return jnp.stack(prices, axis=0)

    return price, grid


def main():
    print(f"backend: {jax.devices()[0].platform}")
    chain = get_btc_test_chain_data()
    p = LOGSV_BTC_PARAMS
    pricer = LogSVPricer()

    def fetch(x):
        return float(np.asarray(x).ravel()[0])

    # f64 RK4 @ 240 steps/yr (the CPU default / reference-parity anchor)
    def run_rk4():
        return pricer.price_chain(option_chain=chain, params=p,
                                  exact_engine="f64")

    rk4_px = run_rk4()
    best_rk4 = min((lambda: (lambda t0: (run_rk4(), time.perf_counter() - t0))(
        time.perf_counter()))()[1] for _ in range(3))
    print(f"exact RK4 f64  @ 240/yr   : {best_rk4 * 1e3:8.1f} ms (warm best-of-3)")

    # df32 RK4 @ 240 steps/yr (the TPU exact default since r04: identical
    # scheme/steps, double-float32 carrier so the scan body runs on the
    # fused f32 path instead of the ~6 us/HLO-op f64 path)
    def run_df32():
        return pricer.price_chain(option_chain=chain, params=p,
                                  exact_engine="df32")

    df32_px = run_df32()
    best_df32 = min((lambda: (lambda t0: (run_df32(), time.perf_counter() - t0))(
        time.perf_counter()))()[1] for _ in range(3))
    err = 0.0
    for a, b in zip(rk4_px, df32_px):
        a, b = np.asarray(a), np.asarray(b)
        m = np.abs(a) > 1e-8
        err = max(err, float(np.max(np.abs(a[m] - b[m]) / np.abs(a[m]))))
    print(f"exact RK4 df32 @ 240/yr   : {best_df32 * 1e3:8.1f} ms, "
          f"max rel err vs f64 {err:.2e}")

    for nfp in (10, 4):
        fn, grid = analytic_chain_prices_fn(chain, nfp=nfp)
        args = (p.sigma0, p.theta, p.kappa1, p.kappa2, p.beta, p.volvol)
        px = fn(*args)
        fetch(px)  # compile + force
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        px_np = np.asarray(px)
        err = 0.0
        for i, ref_slice in enumerate(rk4_px):
            r = np.asarray(ref_slice)
            m = np.abs(r) > 1e-8
            err = max(err, float(np.max(
                np.abs(px_np[i][:r.size][m] - r[m]) / np.abs(r[m]))))
        print(f"semi-analytic nfp={nfp:2d}     : {best * 1e3:8.1f} ms, "
              f"max rel err vs RK4 {err:.2e}")


if __name__ == "__main__":
    main()
