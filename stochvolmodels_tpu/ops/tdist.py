"""
Student-t distribution analytics for option valuation.

TPU rebuild of /root/reference/stochvolmodels/pricers/analytic/tdist.py:
terminal log-returns are Student-t with nu > 2 dof, scaled by upsilon so the
variance matches vol^2 ttm.  Everything is vectorized jnp; the risk-neutral
drift (reference: scipy fsolve, tdist.py:70-82) is a fixed-iteration Newton
solve, differentiable through its iterations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc as _betainc_raw
from jax.scipy.special import betaln, gammaln

from stochvolmodels_tpu.ops.bsm import _is_call

Array = jnp.ndarray


@jax.custom_jvp
def betainc(a, b, x):
    """regularized incomplete beta with full gradients.

    jax's ``lax.betainc`` only differentiates w.r.t. x; the Student-t
    calibration needs d/d nu, which enters through ``a``.  The jvp supplies
    the analytic x-derivative and central finite differences in (a, b) —
    plenty for SLSQP gradients (the reference differentiated the whole
    objective by finite differences).
    """
    return _betainc_raw(a, b, x)


@betainc.defjvp
def _betainc_jvp(primals, tangents):
    a, b, x = primals
    da, db, dx = tangents
    p = _betainc_raw(a, b, x)
    xc = jnp.clip(x, 1e-300, 1.0 - 1e-16)
    dpdx = jnp.exp((a - 1.0) * jnp.log(xc) + (b - 1.0) * jnp.log1p(-xc)
                   - betaln(a, b))
    eps = 1e-6
    dpda = (_betainc_raw(a + eps, b, x) - _betainc_raw(a - eps, b, x)) / (2 * eps)
    dpdb = (_betainc_raw(a, b + eps, x) - _betainc_raw(a, b - eps, x)) / (2 * eps)
    return p, dpdx * dx + dpda * da + dpdb * db


def compute_upsilon(vol, ttm, nu) -> Array:
    """scale upsilon = vol sqrt(ttm (nu-2)/nu), finite variance needs nu > 2."""
    return vol * jnp.sqrt(ttm * (nu - 2.0) / nu)


def _gamma_ratio(nu):
    """Gamma((nu+1)/2) / Gamma(nu/2) via gammaln (no jnp gamma on TPU f64)."""
    return jnp.exp(gammaln(0.5 * (nu + 1.0)) - gammaln(0.5 * nu))


def pdf_tdist(x, mu, vol, nu, ttm) -> Array:
    """location-scale Student-t density (tdist.py:37-43)."""
    upsilon = compute_upsilon(vol=vol, ttm=ttm, nu=nu)
    z = (jnp.asarray(x) - mu * ttm) / upsilon
    c = (1.0 / jnp.sqrt(jnp.pi * nu)) * _gamma_ratio(nu) / upsilon
    return c * jnp.power(1.0 + jnp.square(z) / nu, -0.5 * (nu + 1.0))


def cdf_tdist(x, mu, vol, nu, ttm) -> Array:
    """location-scale Student-t CDF via the incomplete beta (tdist.py:46-54)."""
    upsilon = compute_upsilon(vol=vol, ttm=ttm, nu=nu)
    z = (jnp.asarray(x) - mu * ttm) / upsilon
    return 0.5 * (1.0 + jnp.sign(z) * (1.0 - betainc(nu / 2.0, 0.5,
                                                     nu / (jnp.square(z) + nu))))


def cum_mean_tdist(x, mu=0.0, vol=0.2, nu=3.0, ttm=0.25) -> Array:
    """partial expectation h(x) = int_{-inf}^x u f(u) du (tdist.py:57-67)."""
    upsilon = compute_upsilon(vol=vol, ttm=ttm, nu=nu)
    z = (jnp.asarray(x) - mu * ttm) / upsilon
    norm = _gamma_ratio(nu) * jnp.sqrt(nu / jnp.pi) / (1.0 - nu)
    return (mu * cdf_tdist(x, mu=mu, vol=vol, nu=nu, ttm=ttm)
            + upsilon * norm * jnp.power(1.0 + jnp.square(z) / nu, -0.5 * (nu - 1.0)))


from functools import partial


@partial(jax.jit, static_argnames=("nb_iters",))
def imply_drift_tdist(rf_rate=0.0, vol=0.2, nu=3.0, ttm=0.25,
                      nb_iters: int = 50) -> Array:
    """risk-neutral drift mu solving the martingale condition (tdist.py:70-82).

    Fixed-iteration Newton (differentiable); the reference uses scipy fsolve
    with xtol 1e-10 — Newton converges far past that here. Jitted at module
    level so repeated scalar calls (term-structure sweeps) hit the cache.
    """
    rf_return = jnp.exp(rf_rate * ttm) - 1.0

    def func(mu):
        x_star = -(1.0 + ttm * mu)
        return (mu * ttm - cdf_tdist(x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)
                - cum_mean_tdist(x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)
                - rf_return)

    def dfunc(mu):
        # d/dmu with x* = -(1 + ttm mu): dcdf/dx = f(x), dh/dx = x f(x)
        x_star = -(1.0 + ttm * mu)
        fx = pdf_tdist(x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)
        return ttm * (1.0 + (1.0 + x_star) * fx)

    def body(_, mu):
        f = func(mu)
        df = dfunc(mu)
        return mu - f / jnp.where(jnp.abs(df) < 1e-14, 1e-14, df)

    mu0 = jnp.asarray(rf_rate, dtype=jnp.float64) + jnp.zeros_like(jnp.asarray(vol))
    return jax.lax.fori_loop(0, nb_iters, body, mu0)


@jax.jit
def compute_default_prob_tdist(ttm, vol, nu=4.5, rf_rate=0.0) -> Array:
    """P(terminal return <= -1) under the risk-neutral drift (tdist.py:85-96)."""
    risk_neutral_mu = imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=ttm)
    x_star = -(1.0 + risk_neutral_mu * ttm)
    return cdf_tdist(x=x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)


@jax.jit
def compute_forward_tdist(spot, ttm, vol, nu=4.5, rf_rate=0.0) -> Array:
    """forward with the default barrier (tdist.py:99-113)."""
    risk_neutral_mu = imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=ttm)
    x_star = -(1.0 + risk_neutral_mu * ttm)
    c_1 = cdf_tdist(x=x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    h_1 = cum_mean_tdist(x=x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    return spot * ((1.0 + risk_neutral_mu * ttm) * (1.0 - c_1) - h_1)


def compute_vanilla_price_tdist(spot,
                                strikes,
                                ttm,
                                vol,
                                nu=4.5,
                                optiontypes='C',
                                rf_rate=0.0,
                                is_compute_risk_neutral_mu: bool = True
                                ) -> Array:
    """vanilla prices under the Student-t terminal law (tdist.py:116-157);
    vectorized over strikes/optiontypes."""
    return _vanilla_price_tdist_core(
        spot, jnp.asarray(strikes), ttm, vol, nu, _is_call(optiontypes),
        rf_rate, is_compute_risk_neutral_mu)


@partial(jax.jit, static_argnames=("is_compute_risk_neutral_mu",))
def _vanilla_price_tdist_core(spot, strikes, ttm, vol, nu, is_call, rf_rate,
                              is_compute_risk_neutral_mu):
    discfactor = jnp.exp(-rf_rate * ttm)
    if is_compute_risk_neutral_mu:
        risk_neutral_mu = imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=ttm)
    else:
        risk_neutral_mu = rf_rate
    spot_star = spot * (1.0 + risk_neutral_mu * ttm)
    x_lower_bound = -1.0 - risk_neutral_mu * ttm
    y = strikes / spot - (1.0 + risk_neutral_mu * ttm)
    c_y = cdf_tdist(x=y, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    h_y = cum_mean_tdist(x=y, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    call_px = -spot * h_y + (spot_star - strikes) * (1.0 - c_y)
    c_1 = cdf_tdist(x=x_lower_bound, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    h_1 = cum_mean_tdist(x=x_lower_bound, mu=0.0, vol=vol, nu=nu, ttm=ttm)
    put_px = discfactor * ((strikes - spot_star) * (c_y - c_1)
                           - spot * (h_y - h_1) + strikes * c_1)
    return jnp.where(is_call, call_px, put_px)


def infer_implied_vol_tdist(spot, ttm, strike, given_price, rf_rate=0.0,
                            optiontype='C', nu=4.5, tol: float = 1e-12,
                            is_bounds_to_nan: bool = False) -> Array:
    """Student-t implied vol by the reference bisection on [0.05, 10]
    (tdist.py:160-201); vectorized.  ``tol`` accepted for parity;
    ``is_bounds_to_nan=True`` maps out-of-bracket results to NaN (the
    reference default here is False: clamp to the bound)."""
    del tol
    given_price = jnp.asarray(given_price)
    is_call = _is_call(optiontype)

    def price_at(vol):
        return compute_vanilla_price_tdist(
            spot=spot, strikes=strike, ttm=ttm, vol=vol, nu=nu,
            optiontypes=jnp.where(is_call, 1, 0).astype(jnp.int8),
            rf_rate=rf_rate)

    x1 = jnp.full_like(given_price, 0.05)
    x2 = jnp.full_like(given_price, 10.0)
    tol = 1e-12
    f = price_at(x1) - given_price
    fmid = price_at(x2) - given_price
    bracketed = f * fmid < 0.0

    def body(_, carry):
        rtb, dx, xmid, done = carry
        dx_new = dx * 0.5
        xmid_new = rtb + dx_new
        fmid_new = price_at(xmid_new) - given_price
        rtb_new = jnp.where(fmid_new <= 0.0, xmid_new, rtb)
        upd = jnp.logical_not(done)
        rtb = jnp.where(upd, rtb_new, rtb)
        dx = jnp.where(upd, dx_new, dx)
        xmid = jnp.where(upd, xmid_new, xmid)
        done = done | (jnp.abs(fmid_new) < tol)
        return rtb, dx, xmid, done

    rtb0 = jnp.where(f < 0.0, x1, x2)
    dx0 = jnp.where(f < 0.0, x2 - x1, x1 - x2)
    _, _, xmid, _ = jax.lax.fori_loop(0, 100, body,
                                      (rtb0, dx0, rtb0, jnp.zeros_like(bracketed)))
    out_of_bracket = jnp.where(jnp.asarray(is_bounds_to_nan), jnp.nan,
                               jnp.where(f < 0.0, x1, x2))
    return jnp.where(bracketed, xmid, out_of_bracket)


def infer_tdist_implied_vols_from_model_slice_prices(ttm, spot, strikes,
                                                     optiontypes, model_prices,
                                                     rf_rate, nu) -> Array:
    """slice-level Student-t implied vols (tdist.py:204-220)."""
    return infer_implied_vol_tdist(spot=spot, ttm=ttm, strike=strikes,
                                   given_price=model_prices, rf_rate=rf_rate,
                                   optiontype=optiontypes, nu=nu)
