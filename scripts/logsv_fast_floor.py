"""
LogSV fast-precision (f32) floor study — companion to
scripts/hawkes_fast_floor.py (PARITY.md "Hawkes fast floor").

Decomposes the shipping fast path's ~1e-4 relative price error on the BTC
chain, same-process vs an f64 @ 1440 anchor:

  B  f64 @ 360          discretization error of the fast step count alone
  C  f32 @ 360          the shipping fast path (all-f32)
  E  f32 solve -> f64 quadrature   error introduced BY the ODE solve
  F  f64 solve -> f32 quadrature   error introduced BY the quadrature sum

Run:  PYTHONPATH=/root/repo python scripts/logsv_fast_floor.py
"""
from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import stochvolmodels_tpu.models.logsv.affine as afe  # noqa: E402
from stochvolmodels_tpu.config import VariableType  # noqa: E402
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data  # noqa: E402
from stochvolmodels_tpu.models.logsv.pricer import (  # noqa: E402
    LOGSV_BTC_PARAMS,
    set_vol_scaler,
)
from stochvolmodels_tpu.ops import bsm, mgf  # noqa: E402
from stochvolmodels_tpu.utils.cplx import Cplx  # noqa: E402


def chain_prices(chain, params, year_steps, solve_dtype, quad_dtype,
                 mixed_quad=False):
    vol_scaler = set_vol_scaler(sigma0=params.sigma0, ttm=np.min(chain.ttms))
    phi_grid, psi_grid, _ = mgf.get_transform_var_grid(
        variable_type=VariableType.LOG_RETURN, vol_scaler=float(vol_scaler))
    phi64 = Cplx(jnp.asarray(np.asarray(phi_grid.re), jnp.float64),
                 jnp.asarray(np.asarray(phi_grid.im), jnp.float64))
    phi_s = Cplx(phi64.re.astype(solve_dtype), phi64.im.astype(solve_dtype))
    psi_s = Cplx(jnp.zeros_like(phi_s.re), jnp.zeros_like(phi_s.im))
    n = phi_s.shape[0]
    a_t = Cplx(jnp.zeros((n, 5), solve_dtype), jnp.zeros((n, 5), solve_dtype))

    def cast(v):
        return (np.float32(v) if solve_dtype == jnp.float32 else float(v))

    ttm0 = 0.0
    out = []
    for i, ttm in enumerate(chain.ttms):
        with jax.enable_x64(solve_dtype == jnp.float64):
            a_t = afe.solve_a_ode_grid(
                ttm=float(ttm) - ttm0, theta=cast(params.theta),
                kappa1=cast(params.kappa1), kappa2=cast(params.kappa2),
                beta=cast(params.beta), volvol=cast(params.volvol),
                phi_grid=phi_s, psi_grid=psi_s, a_t0=a_t,
                year_steps=year_steps)
        a_np = (np.asarray(a_t.re), np.asarray(a_t.im))
        with jax.enable_x64(quad_dtype == jnp.float64):
            y = quad_dtype(params.sigma0 - params.theta)
            ys = jnp.stack([jnp.asarray(1.0, quad_dtype), y, y * y,
                            y ** 3, y ** 4])
            a_q = Cplx(jnp.asarray(a_np[0], quad_dtype),
                       jnp.asarray(a_np[1], quad_dtype))
            log_mgf = Cplx(a_q.re @ ys, a_q.im @ ys)
            phi_q = Cplx(jnp.asarray(np.asarray(phi64.re), quad_dtype),
                         jnp.asarray(np.asarray(phi64.im), quad_dtype))
            px = mgf.vanilla_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, phi_grid=phi_q,
                forwards=quad_dtype(chain.forwards[i]),
                strikes=jnp.asarray(np.asarray(chain.strikes_ttms[i], float),
                                    quad_dtype),
                optiontypes=chain.optiontypes_ttms[i],
                discfactors=quad_dtype(chain.discfactors[i]),
                mixed_quad=mixed_quad)
        out.append(np.asarray(px, np.float64))
        ttm0 = float(ttm)
    return out


def max_errors(prices, anchor, chain):
    rel = 0.0
    iv_err = 0.0
    for i, (px, ax) in enumerate(zip(prices, anchor)):
        m = np.abs(ax) > 1e-6
        rel = max(rel, float(np.max(np.abs(px[m] - ax[m]) / np.abs(ax[m]))))
        ttm, fwd, df = (float(chain.ttms[i]), float(chain.forwards[i]),
                        float(chain.discfactors[i]))
        ks = np.asarray(chain.strikes_ttms[i], float)
        iv_p = np.asarray(bsm.infer_bsm_implied_vol_fast(
            forward=fwd, ttm=ttm, strike=jnp.asarray(ks),
            given_price=jnp.asarray(px), discfactor=df,
            optiontype=chain.optiontypes_ttms[i]))
        iv_a = np.asarray(bsm.infer_bsm_implied_vol_fast(
            forward=fwd, ttm=ttm, strike=jnp.asarray(ks),
            given_price=jnp.asarray(ax), discfactor=df,
            optiontype=chain.optiontypes_ttms[i]))
        ok = np.isfinite(iv_p) & np.isfinite(iv_a)
        iv_err = max(iv_err, float(np.max(np.abs(iv_p[ok] - iv_a[ok]))))
    return rel, iv_err


def main():
    chain = get_btc_test_chain_data()
    params = LOGSV_BTC_PARAMS
    f64, f32 = jnp.float64, jnp.float32
    anchor = chain_prices(chain, params, 1440, f64, f64)
    variants = [
        ("B  f64 @ 360 (discretization only)", (360, f64, f64, False)),
        ("C  f32 @ 360 (all-f32 fast path)", (360, f32, f32, False)),
        ("E  f32 solve -> f64 quadrature", (360, f32, f64, False)),
        ("F  f64 solve -> f32 quadrature", (360, f64, f32, False)),
        ("G  f32 solve -> mixed quadrature", (360, f32, f64, True)),
        ("H  f64 solve -> mixed quadrature", (360, f64, f64, True)),
    ]
    print("| variant | max rel price err | max abs IV err |")
    print("|---|---|---|")
    for name, (ys, sd, qd, mq) in variants:
        px = chain_prices(chain, params, ys, sd, qd, mixed_quad=mq)
        rel, iv = max_errors(px, anchor, chain)
        print(f"| {name} | {rel:.2e} | {iv:.2e} |", flush=True)


if __name__ == "__main__":
    main()
