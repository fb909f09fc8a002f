"""
Hawkes fast-precision (f32) floor study — VERDICT r3 item #4.

The exact-path parity floor was attributed to the reference's solve_ivp
tolerance (scripts/hawkes_parity_floor.py); this script drives the FAST
(f32, 720 steps/yr) path's ~1e-3 relative price error the same way, by
decomposing it same-process on the BTC test chain:

  A  f64 @ 2880        anchor (self-converged; 720 vs 1440 f64 is ~4e-13)
  B  f64 @ 720         discretization error of the fast step count alone
  C  f32 @ 720         the shipping fast path
  D  f32 @ {360,1440,2880}  step dependence of the f32 error (flat => roundoff)
  E  f32 solve -> f64 quadrature   error introduced BY the Riccati solve
  F  f64 solve -> f32 quadrature   error introduced BY the quadrature sum
  G  f32 @ 720 + Kahan-compensated RK4 carry
  H  f32 @ 720 + expm1-form jump MGF (cancellation-free small-arg branch)
  I  f32 @ 720 + Kahan + expm1

Metric: max relative price error vs A over all strikes/maturities with
|price| > 1e-6 (BTC-scale prices are O(1e-2..1e-1) of forward), plus max
abs BSM IV error.  Reference workload: hawkes_jd_pricer.py:368-420.

Run:  python scripts/hawkes_fast_floor.py            (CPU, f64 available)
      results go to stdout as a markdown table for PARITY.md.
"""
from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data  # noqa: E402
from stochvolmodels_tpu.models.hawkes_jd import (  # noqa: E402
    MAX_PHI,
    HawkesJDParams,
    _hawkes_rhs,
    set_vol_scaler,
)
from stochvolmodels_tpu.ops import bsm, mgf  # noqa: E402
from stochvolmodels_tpu.utils.cplx import Cplx  # noqa: E402


def _hawkes_rhs_expm1(A: Cplx, phi: Cplx, psi: Cplx, p) -> Cplx:
    """_hawkes_rhs with the jump MGF in cancellation-free expm1 form:

        e^{-s a}/(1 + m a) - 1 = (expm1(-s a) - m a) / (1 + m a)

    complex expm1 via the accurate split  re = expm1(u)cos(v) - (1-cos v),
    im = e^u sin v  (u = Re z, v = Im z).
    """
    a1 = Cplx(A.re[:, 1], A.im[:, 1])
    a2 = Cplx(A.re[:, 2], A.im[:, 2])

    def cexpm1(z: Cplx) -> Cplx:
        cos_v = jnp.cos(z.im)
        return Cplx(jnp.expm1(z.re) * cos_v - 2.0 * jnp.square(jnp.sin(0.5 * z.im)),
                    jnp.exp(z.re) * jnp.sin(z.im))

    def jump_mgf_minus_one(shift, mean, arg: Cplx) -> Cplx:
        num = cexpm1(arg * (-shift)) - arg * mean
        return num / (arg * mean + 1.0)

    arg_p = phi - a1 * p['beta1_p'] - a2 * p['beta1_m']
    arg_m = phi - a1 * p['beta2_p'] - a2 * p['beta2_m']
    j_p = jump_mgf_minus_one(p['shift_p'], p['mean_p'], arg_p)
    j_m = jump_mgf_minus_one(p['shift_m'], p['mean_m'], arg_m)

    sigma2 = p['sigma'] * p['sigma']
    r0 = (a1 * (p['kappa_p'] * p['theta_p']) + a2 * (p['kappa_m'] * p['theta_m'])
          + (phi * (phi + 1.0) * 0.5 - psi) * sigma2)
    r1 = j_p - a1 * p['kappa_p'] + phi * p['compensator_p']
    r2 = j_m - a2 * p['kappa_m'] + phi * p['compensator_m']
    return Cplx(jnp.stack([r0.re, r1.re, r2.re], axis=1),
                jnp.stack([r0.im, r1.im, r2.im], axis=1))


def solve_grid(phi_grid: Cplx, ttms, p, year_steps, rhs, kahan: bool):
    """chained RK4 over maturities; returns list of A(t_i) as numpy."""
    n_grid = phi_grid.shape[0]
    dt_ref = phi_grid.re.dtype
    psi = Cplx(jnp.zeros(n_grid, dt_ref), jnp.zeros(n_grid, dt_ref))
    a_re = jnp.zeros((n_grid, 3), dt_ref)
    a_im = jnp.zeros((n_grid, 3), dt_ref)
    c_re = jnp.zeros_like(a_re)
    c_im = jnp.zeros_like(a_im)
    out = []
    ttm0 = 0.0
    for ttm in ttms:
        dttm = float(ttm) - ttm0
        nb_steps = max(int(np.ceil(year_steps * dttm)), 16)
        dt = dttm / nb_steps

        def rk4_step(carry, _, dt=dt):
            a_re, a_im, c_re, c_im = carry
            A = Cplx(a_re, a_im)
            k1 = rhs(A, phi_grid, psi, p)
            k2 = rhs(A + k1 * (0.5 * dt), phi_grid, psi, p)
            k3 = rhs(A + k2 * (0.5 * dt), phi_grid, psi, p)
            k4 = rhs(A + k3 * dt, phi_grid, psi, p)
            inc = (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
            if kahan:
                # Kahan-compensated accumulation of the RK4 increments
                y_re = inc.re - c_re
                t_re = a_re + y_re
                c_re = (t_re - a_re) - y_re
                a_re = t_re
                y_im = inc.im - c_im
                t_im = a_im + y_im
                c_im = (t_im - a_im) - y_im
                a_im = t_im
            else:
                a_re = a_re + inc.re
                a_im = a_im + inc.im
            return (a_re, a_im, c_re, c_im), None

        (a_re, a_im, c_re, c_im), _ = jax.lax.scan(
            rk4_step, (a_re, a_im, c_re, c_im), None, length=nb_steps)
        out.append((np.asarray(a_re), np.asarray(a_im)))
        ttm0 = float(ttm)
    return out


def price_from_a(a_list, phi_grid_np, chain, params, quad_dtype):
    """quadrature stage at the requested dtype from concrete A panels."""
    phi = Cplx(jnp.asarray(phi_grid_np[0], quad_dtype),
               jnp.asarray(phi_grid_np[1], quad_dtype))
    prices = []
    for i, (a_re, a_im) in enumerate(a_list):
        lp, lm = params.lambda_p, params.lambda_m
        log_mgf = Cplx(
            jnp.asarray(a_re[:, 0] + a_re[:, 1] * lp + a_re[:, 2] * lm, quad_dtype),
            jnp.asarray(a_im[:, 0] + a_im[:, 1] * lp + a_im[:, 2] * lm, quad_dtype))
        px = mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi,
            forwards=float(chain.forwards[i]),
            strikes=np.asarray(chain.strikes_ttms[i], float),
            optiontypes=chain.optiontypes_ttms[i],
            discfactors=float(chain.discfactors[i]))
        prices.append(np.asarray(px, dtype=np.float64))
    return prices


def run_variant(name, chain, params, p, phi_np, year_steps, dtype,
                rhs=_hawkes_rhs, kahan=False, quad_dtype=None):
    quad_dtype = dtype if quad_dtype is None else quad_dtype
    if dtype == jnp.float32 or quad_dtype == jnp.float32:
        # solve at `dtype`
        phi = Cplx(jnp.asarray(phi_np[0], dtype), jnp.asarray(phi_np[1], dtype))
        p_cast = {k: (np.float32(v) if dtype == jnp.float32 else float(v))
                  for k, v in p.items()}
        with jax.enable_x64(dtype == jnp.float64):
            a_list = solve_grid(phi, chain.ttms, p_cast, year_steps, rhs, kahan)
        with jax.enable_x64(quad_dtype == jnp.float64):
            prices = price_from_a(a_list, phi_np, chain, params, quad_dtype)
    else:
        phi = Cplx(jnp.asarray(phi_np[0]), jnp.asarray(phi_np[1]))
        a_list = solve_grid(phi, chain.ttms, p, year_steps, rhs, kahan)
        prices = price_from_a(a_list, phi_np, chain, params, quad_dtype)
    return prices


def max_errors(prices, anchor, chain):
    rel = 0.0
    iv_err = 0.0
    for i, (px, ax) in enumerate(zip(prices, anchor)):
        m = np.abs(ax) > 1e-6
        rel = max(rel, float(np.max(np.abs(px[m] - ax[m]) / np.abs(ax[m]))))
        ttm, fwd, df = (float(chain.ttms[i]), float(chain.forwards[i]),
                        float(chain.discfactors[i]))
        ks = np.asarray(chain.strikes_ttms[i], float)
        ot = chain.optiontypes_ttms[i]
        iv_p = np.asarray(bsm.infer_bsm_implied_vol_fast(
            forward=fwd, ttm=ttm, strike=jnp.asarray(ks),
            given_price=jnp.asarray(px), discfactor=df, optiontype=ot))
        iv_a = np.asarray(bsm.infer_bsm_implied_vol_fast(
            forward=fwd, ttm=ttm, strike=jnp.asarray(ks),
            given_price=jnp.asarray(ax), discfactor=df, optiontype=ot))
        ok = np.isfinite(iv_p) & np.isfinite(iv_a)
        iv_err = max(iv_err, float(np.max(np.abs(iv_p[ok] - iv_a[ok]))))
    return rel, iv_err


def main():
    chain = get_btc_test_chain_data()
    params = HawkesJDParams()
    d = params.to_dict()
    p = {k: d[k] for k in ('sigma', 'shift_p', 'mean_p', 'shift_m', 'mean_m',
                           'kappa_p', 'theta_p', 'beta1_p', 'beta2_p',
                           'kappa_m', 'theta_m', 'beta1_m', 'beta2_m')}
    p['compensator_p'] = params.compensator_p
    p['compensator_m'] = params.compensator_m
    vol_scaler = set_vol_scaler(sigma0=params.sigma, ttm=np.min(chain.ttms))
    phi_grid, _, _ = mgf.get_transform_var_grid(
        max_phi=MAX_PHI, vol_scaler=float(vol_scaler))
    phi_np = (np.asarray(phi_grid.re, np.float64),
              np.asarray(phi_grid.im, np.float64))

    f64, f32 = jnp.float64, jnp.float32
    anchor = run_variant("anchor", chain, params, p, phi_np, 2880, f64)

    variants = [
        ("B  f64 @ 720 (discretization only)", dict(year_steps=720, dtype=f64)),
        ("C  f32 @ 720 (shipping fast path)", dict(year_steps=720, dtype=f32)),
        ("D  f32 @ 360", dict(year_steps=360, dtype=f32)),
        ("D  f32 @ 1440", dict(year_steps=1440, dtype=f32)),
        ("D  f32 @ 2880", dict(year_steps=2880, dtype=f32)),
        ("E  f32 solve -> f64 quadrature", dict(year_steps=720, dtype=f32,
                                                quad_dtype=f64)),
        ("F  f64 solve -> f32 quadrature", dict(year_steps=720, dtype=f64,
                                                quad_dtype=f32)),
        ("G  f32 @ 720 + Kahan carry", dict(year_steps=720, dtype=f32,
                                            kahan=True)),
        ("H  f32 @ 720 + expm1 jump MGF", dict(year_steps=720, dtype=f32,
                                               rhs=_hawkes_rhs_expm1)),
        ("I  f32 @ 720 + Kahan + expm1", dict(year_steps=720, dtype=f32,
                                              kahan=True,
                                              rhs=_hawkes_rhs_expm1)),
        # solve-side improvements, isolated under an f64 quadrature
        ("J  f32 Kahan solve -> f64 quad", dict(year_steps=720, dtype=f32,
                                                kahan=True, quad_dtype=f64)),
        ("K  f32 expm1 solve -> f64 quad", dict(year_steps=720, dtype=f32,
                                                rhs=_hawkes_rhs_expm1,
                                                quad_dtype=f64)),
        ("L  f32 Kahan+expm1 -> f64 quad", dict(year_steps=720, dtype=f32,
                                                kahan=True,
                                                rhs=_hawkes_rhs_expm1,
                                                quad_dtype=f64)),
        ("M  f32 @ 1440 solve -> f64 quad", dict(year_steps=1440, dtype=f32,
                                                 quad_dtype=f64)),
    ]
    print("| variant | max rel price err | max abs IV err |")
    print("|---|---|---|")
    for name, kw in variants:
        px = run_variant(name, chain, params, p, phi_np, **kw)
        rel, iv = max_errors(px, anchor, chain)
        print(f"| {name} | {rel:.2e} | {iv:.2e} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
