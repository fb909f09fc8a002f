"""
Bachelier (normal) model analytics: prices, deltas, vegas, implied normal vols.

TPU-native rebuild of /root/reference/stochvolmodels/pricers/analytic/bachelier.py,
vectorized and differentiable.  Note the reference's convention quirks kept
here for parity: deltas/vegas scale the normal vol by the forward
(``sdev = forward * vol * sqrt(ttm)``, bachelier.py:117,139,172) while the
price uses the absolute normal vol (``sdev = vol * sqrt(ttm)``,
bachelier.py:25); the implied-vol bisection runs on [0.001, 0.1] with 100
iterations and tol 1e-12 (bachelier.py:195-235).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from stochvolmodels_tpu.ops.bsm import _is_call
from stochvolmodels_tpu.ops.gauss import ncdf, npdf, norm_ppf

Array = jnp.ndarray

NORMAL_IV_LOWER, NORMAL_IV_UPPER, NORMAL_IV_TOL = 0.001, 0.1, 1e-12


def compute_normal_price(forward, strike, ttm, vol, discfactor=1.0,
                         optiontype='C') -> Array:
    """Bachelier forward price (bachelier.py:14-34); elementwise over arrays."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    sdev = vol * jnp.sqrt(ttm)
    d = (forward - strike) / sdev
    call_px = (forward - strike) * ncdf(d) + sdev * npdf(d)
    put_px = (forward - strike) * (ncdf(d) - 1.0) + sdev * npdf(d)
    return discfactor * jnp.where(is_call, call_px, put_px)


def compute_normal_slice_prices(ttm, forward, strikes, vols, optiontypes,
                                discfactor=1.0) -> Array:
    """prices for one maturity slice, plural-kwarg reference signature
    (bachelier.py:38-60)."""
    return compute_normal_price(forward=forward, strike=strikes, ttm=ttm,
                                vol=vols, optiontype=optiontypes,
                                discfactor=discfactor)


def compute_normal_delta(ttm, forward, strike, vol, optiontype, discfactor=1.0) -> Array:
    """normal delta with the reference's forward-scaled vol (bachelier.py:106-125)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    sdev = forward * vol * jnp.sqrt(ttm)
    d = (forward - strike) / sdev
    return discfactor * jnp.where(is_call, ncdf(d), -ncdf(-d))


def compute_normal_slice_deltas(ttm, forward, strikes, vols, optiontypes,
                                discfactor=1.0) -> Array:
    """vectorized normal deltas (bachelier.py:128-143)."""
    return compute_normal_delta(ttm=ttm, forward=forward, strike=strikes,
                                vol=vols, optiontype=optiontypes,
                                discfactor=discfactor)


def compute_normal_slice_vegas(ttm, forward, strikes, vols, optiontypes=None) -> Array:
    """normal vegas with forward-scaled vol (bachelier.py:162-175)."""
    forward, strikes, ttm, vols = map(jnp.asarray, (forward, strikes, ttm, vols))
    sdev = forward * vols * jnp.sqrt(ttm)
    d = (forward - strikes) / sdev
    return forward * npdf(d) * jnp.sqrt(ttm)


def compute_normal_vegas_ttms(ttms, forwards, strikes_ttms, vols_ttms,
                              optiontypes_ttms=None) -> Array:
    """chain-level vegas over a padded (T, K) panel."""
    ttms = jnp.asarray(ttms)[:, None]
    forwards = jnp.asarray(forwards)[:, None]
    return compute_normal_slice_vegas(ttm=ttms, forward=forwards,
                                      strikes=strikes_ttms, vols=vols_ttms)


def compute_normal_deltas_ttms(ttms, forwards, strikes_ttms, vols_ttms,
                               optiontypes_ttms):
    """ragged chain-level normal deltas (bachelier.py:146-159 API compat)."""
    import numpy as np
    return [np.asarray(compute_normal_slice_deltas(ttm=t, forward=f, strikes=s,
                                                   vols=v, optiontypes=o))
            for t, f, s, v, o in zip(ttms, forwards, strikes_ttms, vols_ttms,
                                     optiontypes_ttms)]


def compute_normal_delta_to_strike(ttm, forward, delta, vol) -> Array:
    """strike at a given normal delta (bachelier.py:62-73)."""
    delta = jnp.asarray(delta)
    inv_delta = jnp.where(delta > 0.0, norm_ppf(delta), norm_ppf(1.0 + delta))
    sdev = forward * vol * jnp.sqrt(jnp.asarray(ttm))
    return forward - sdev * inv_delta


def strikes_to_delta(strikes, ivols, f0, ttm) -> Array:
    """normal call delta N((F-K)/(vol sqrt(T))) per strike (bachelier.py:299-313)."""
    d = (f0 - jnp.asarray(strikes)) / jnp.asarray(ivols) / jnp.sqrt(jnp.asarray(ttm))
    return ncdf(d)


def _normal_bisection(given_price, forward, strike, ttm, discfactor, is_call_f):
    """vectorized reference bisection on [0.001, 0.1] (bachelier.py:195-235)."""
    def price_at(vol):
        sdev = vol * jnp.sqrt(ttm)
        d = (forward - strike) / sdev
        call_px = (forward - strike) * ncdf(d) + sdev * npdf(d)
        put_px = (forward - strike) * (ncdf(d) - 1.0) + sdev * npdf(d)
        return discfactor * jnp.where(is_call_f > 0, call_px, put_px)

    x1 = jnp.full_like(given_price, NORMAL_IV_LOWER)
    x2 = jnp.full_like(given_price, NORMAL_IV_UPPER)
    f = price_at(x1) - given_price
    fmid = price_at(x2) - given_price
    bracketed = f * fmid < 0.0
    rtb0 = jnp.where(f < 0.0, x1, x2)
    dx0 = jnp.where(f < 0.0, x2 - x1, x1 - x2)

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
        done = done | (jnp.abs(fmid_new) < NORMAL_IV_TOL)
        return rtb, dx, xmid, done

    _, _, xmid, _ = jax.lax.fori_loop(0, 100, body,
                                      (rtb0, dx0, rtb0, jnp.zeros_like(bracketed)))
    v1 = jnp.where(bracketed, xmid, jnp.where(f < 0.0, x1, x2))
    at_bounds = (jnp.abs(v1 - x1) < NORMAL_IV_TOL) | (jnp.abs(v1 - x2) < NORMAL_IV_TOL)
    return jnp.where(at_bounds, jnp.nan, v1)


@jax.custom_vjp
def _normal_iv_core(given_price, forward, strike, ttm, discfactor, is_call_f):
    return _normal_bisection(given_price, forward, strike, ttm, discfactor, is_call_f)


def _normal_iv_fwd(given_price, forward, strike, ttm, discfactor, is_call_f):
    vol = _normal_bisection(given_price, forward, strike, ttm, discfactor, is_call_f)
    return vol, (vol, forward, strike, ttm, discfactor)


def _normal_iv_bwd(res, g):
    vol, forward, strike, ttm, discfactor = res
    safe_vol = jnp.where(jnp.isnan(vol), 1.0, vol)
    sdev = safe_vol * jnp.sqrt(ttm)
    vega = discfactor * npdf((forward - strike) / sdev) * jnp.sqrt(ttm)
    inv_vega = jnp.where(jnp.isnan(vol) | (jnp.abs(vega) < 1e-300), 0.0, 1.0 / vega)
    gv = g * inv_vega
    return (gv, None, None, None, None, None)


_normal_iv_core.defvjp(_normal_iv_fwd, _normal_iv_bwd)


def infer_normal_implied_vol(forward, ttm, strike, given_price, discfactor=1.0,
                             optiontype='C', tol: float = 1e-12,
                             is_bounds_to_nan: bool = True) -> Array:
    """normal implied vol on the reference bracket; grad w.r.t. price only.

    ``tol`` accepted for parity (bachelier.py:195-237; the fixed iteration
    count exceeds it); ``is_bounds_to_nan=False`` clamps out-of-bracket
    prices to the violated bound instead of NaN."""
    del tol
    given_price = jnp.asarray(given_price)
    shape = jnp.broadcast_shapes(jnp.shape(given_price), jnp.shape(forward),
                                 jnp.shape(strike), jnp.shape(ttm),
                                 jnp.shape(_is_call(optiontype)))
    dt = jnp.result_type(given_price, jnp.asarray(forward))
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dt), shape)
    is_call_f = jnp.where(jnp.broadcast_to(_is_call(optiontype), shape), 1.0, -1.0).astype(dt)
    res = _normal_iv_core(b(given_price), b(forward), b(strike), b(ttm),
                          b(discfactor), is_call_f)
    if not is_bounds_to_nan:
        p_low = compute_normal_price(forward=forward, strike=strike, ttm=ttm,
                                     vol=0.001, optiontype=optiontype,
                                     discfactor=discfactor)
        unbracketed = jnp.isnan(res) & jnp.isfinite(b(given_price))
        res = jnp.where(unbracketed,
                        jnp.where(b(given_price) <= p_low, 0.001, 0.1), res)
    return res


def infer_normal_ivols_from_model_slice_prices(ttm, forward, strikes, optiontypes,
                                               model_prices, discfactor) -> Array:
    """slice-level Bachelier inversion (bachelier.py:238-253)."""
    return infer_normal_implied_vol(forward=forward, ttm=ttm, strike=strikes,
                                    given_price=model_prices,
                                    discfactor=discfactor, optiontype=optiontypes)


def infer_normal_ivols_from_slice_prices(ttm, forward, discfactor, strikes,
                                         optiontypes, model_prices) -> Array:
    """reference positional order (bachelier.py:255-270): discfactor third."""
    return infer_normal_ivols_from_model_slice_prices(
        ttm=ttm, forward=forward, strikes=strikes, optiontypes=optiontypes,
        model_prices=model_prices, discfactor=discfactor)


def infer_normal_ivols_from_chain_prices(ttms, forwards, discfactors, strikes_ttms,
                                         optiontypes_ttms, model_prices_ttms) -> Array:
    """chain-level Bachelier inversion over a padded (T, K) panel."""
    ttms = jnp.asarray(ttms)[:, None]
    forwards = jnp.asarray(forwards)[:, None]
    discfactors = jnp.asarray(discfactors)[:, None]
    return infer_normal_implied_vol(forward=forwards, ttm=ttms, strike=strikes_ttms,
                                    given_price=model_prices_ttms,
                                    discfactor=discfactors,
                                    optiontype=optiontypes_ttms)


def compute_normal_delta_from_lognormal_vol(ttm, forward, strike, given_price,
                                            optiontype, discfactor=1.0) -> Array:
    """normal delta of an option quoted by price (bachelier.py:76-103)."""
    normal_vol = infer_normal_implied_vol(forward=forward, ttm=ttm, strike=strike,
                                          given_price=given_price,
                                          optiontype=optiontype, discfactor=discfactor)
    return compute_normal_delta(ttm=ttm, forward=forward, strike=strike,
                                vol=normal_vol, optiontype=optiontype,
                                discfactor=discfactor)


# ----------------------------------------------------------------------------
# fast implied normal vol (bisect + Newton, implicit-function-theorem jvp)
# ----------------------------------------------------------------------------

def _fast_normal_iv_impl(given_price, forward, strike, ttm, discfactor,
                         is_call_f, nb_bisect, nb_newton):
    def price_at(vol):
        sdev = vol * jnp.sqrt(ttm)
        d = (forward - strike) / sdev
        return discfactor * (is_call_f * (forward - strike) * ncdf(is_call_f * d)
                             + sdev * npdf(d))

    lo = jnp.full_like(given_price, NORMAL_IV_LOWER)
    hi = jnp.full_like(given_price, NORMAL_IV_UPPER)
    f_lo_raw = price_at(lo) - given_price
    f_hi_raw = price_at(hi) - given_price
    bracketed = f_lo_raw * f_hi_raw < 0.0
    # unbracketable (or NaN) quotes are replaced by a guaranteed-solvable
    # dummy BEFORE the solver so no NaN circulates; output stays NaN there
    mid_vol = jnp.full_like(lo, 0.5 * (NORMAL_IV_LOWER + NORMAL_IV_UPPER))
    given_price = jnp.where(bracketed, given_price, price_at(mid_vol))
    f_lo = price_at(lo) - given_price

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f_mid = price_at(mid) - given_price
        go_up = f_mid * f_lo > 0.0
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, nb_bisect, bisect, (lo, hi))
    vol = 0.5 * (lo + hi)

    def newton(_, vol):
        sdev = vol * jnp.sqrt(ttm)
        vega = discfactor * npdf((forward - strike) / sdev) * jnp.sqrt(ttm)
        step = (price_at(vol) - given_price) / jnp.maximum(vega, 1e-16)
        return jnp.clip(vol - step, NORMAL_IV_LOWER, NORMAL_IV_UPPER)

    vol = jax.lax.fori_loop(0, nb_newton, newton, vol)
    return jnp.where(bracketed, vol, jnp.nan)


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(6, 7))
def _fast_normal_iv_core(given_price, forward, strike, ttm, discfactor,
                         is_call_f, nb_bisect, nb_newton):
    return _fast_normal_iv_impl(given_price, forward, strike, ttm, discfactor,
                                is_call_f, nb_bisect, nb_newton)


@_fast_normal_iv_core.defjvp
def _fast_normal_iv_jvp(nb_bisect, nb_newton, primals, tangents):
    # implicit-function tangent dvol = (dP - dP_dF dF - dP_dK dK - ...) / vega,
    # linear in the tangents so it supports jacfwd AND transposes to reverse
    # mode (same rationale as bsm._fast_iv_jvp: AD through the Newton polish
    # compounds 1/vega and overflows f32 for deep-OTM quotes)
    given_price, forward, strike, ttm, discfactor, is_call_f = primals
    vol = _fast_normal_iv_impl(given_price, forward, strike, ttm, discfactor,
                               is_call_f, nb_bisect, nb_newton)

    def price_fn(f_, k_, t_, df_, v_):
        sdev = v_ * jnp.sqrt(t_)
        d = (f_ - k_) / sdev
        return df_ * (is_call_f * (f_ - k_) * ncdf(is_call_f * d)
                      + sdev * npdf(d))

    safe_vol = jnp.where(jnp.isnan(vol), 0.01, vol)
    grads = jax.grad(lambda f_, k_, t_, df_, v_:
                     jnp.sum(price_fn(f_, k_, t_, df_, v_)),
                     argnums=(0, 1, 2, 3, 4))(
        jnp.broadcast_to(forward, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(strike, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(ttm, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(discfactor, vol.shape).astype(vol.dtype),
        safe_vol)
    dP_dF, dP_dK, dP_dT, dP_ddf, vega = grads
    inv_vega = jnp.where(jnp.isnan(vol) | (jnp.abs(vega) < 1e-16), 0.0,
                         1.0 / vega)
    dp, df_t, dk, dt_, ddf, _ = tangents
    dvol = inv_vega * (dp - dP_dF * df_t - dP_dK * dk - dP_dT * dt_
                       - dP_ddf * ddf)
    return vol, dvol


def infer_normal_implied_vol_fast(forward, ttm, strike, given_price,
                                  discfactor=1.0, optiontype='C',
                                  nb_bisect: int = 20, nb_newton: int = 4):
    """fast implied normal vol: short bisection bracket + Newton polish.

    Counterpart of :func:`stochvolmodels_tpu.ops.bsm.infer_bsm_implied_vol_fast`
    for the Bachelier model — intended inside latency-bound calibration
    objectives (on-device LM needs forward-mode AD, which the exact
    :func:`infer_normal_implied_vol`'s custom_vjp cannot provide).  NaN at
    unbracketed quotes, same [0.001, 0.1] bracket as the reference bisection
    (bachelier.py:195-235); gradients via the implicit function theorem.
    """
    given_price = jnp.asarray(given_price)
    shape = jnp.broadcast_shapes(jnp.shape(given_price), jnp.shape(forward),
                                 jnp.shape(strike), jnp.shape(ttm),
                                 jnp.shape(_is_call(optiontype)))
    dt = jnp.result_type(given_price, jnp.asarray(forward))
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dt), shape)
    is_call_f = jnp.where(jnp.broadcast_to(_is_call(optiontype), shape),
                          1.0, -1.0).astype(dt)
    return _fast_normal_iv_core(b(given_price), b(forward), b(strike), b(ttm),
                                b(discfactor), is_call_f, nb_bisect, nb_newton)
