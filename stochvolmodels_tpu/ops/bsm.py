"""
Black-Scholes-Merton analytics: prices, greeks, implied volatilities.

TPU-native rebuild of /root/reference/stochvolmodels/pricers/analytic/bsm.py.
Where the reference runs numba scalar loops per strike, everything here is a
single vectorized expression over arbitrarily-shaped arrays (maturity x strike
panels), elementwise on the VPU, and differentiable end-to-end.

Implied volatility reproduces the reference's 200-iteration bisection on
[0.01, 5.0] with tolerance 1e-16 and NaN-at-bounds semantics
(bsm.py:445-489), vectorized via ``lax.fori_loop`` with a frozen-when-done
mask; its gradient is supplied analytically through the implicit function
theorem (d sigma / d price = 1 / vega), so calibration can differentiate
through the price -> vol inversion.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.config import encode_optiontypes
from stochvolmodels_tpu.ops.gauss import ncdf, npdf, norm_ppf

Array = jnp.ndarray

IV_LOWER, IV_UPPER, IV_TOL = 0.01, 5.0, 1e-16


def as_option_codes(optiontypes) -> Array:
    """convert string optiontypes (or already-encoded ints) to an int8 array.

    Traced int arrays pass straight through (they are already codes).
    """
    if isinstance(optiontypes, jax.core.Tracer) or isinstance(optiontypes, jnp.ndarray):
        return jnp.asarray(optiontypes, dtype=jnp.int8)
    arr = np.asarray(optiontypes)
    if arr.dtype.kind in ('U', 'S', 'O'):
        arr = encode_optiontypes(arr)
    return jnp.asarray(arr, dtype=jnp.int8)


def _is_call(optiontypes) -> Array:
    """bit0 of the option code: True for 'C'/'IC'."""
    return (as_option_codes(optiontypes) & 1).astype(bool)


def is_intrinsic(ttm, vol) -> Array:
    """True where the option degenerates to intrinsic value (bsm.py:32-44)."""
    ttm = jnp.asarray(ttm)
    vol = jnp.asarray(vol)
    return (ttm <= 0.0) | (vol <= 0.0) | jnp.isnan(vol)


def compute_bsm_vanilla_price(forward,
                              strike,
                              ttm,
                              vol,
                              optiontype='C',
                              discfactor=1.0
                              ) -> Array:
    """BSM forward price; elementwise over broadcastable array inputs.

    Intrinsic fallback where ttm<=0 or vol<=0/NaN matches bsm.py:54-83.
    """
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    sgn = jnp.where(is_call, 1.0, -1.0)
    intrinsic = jnp.maximum(sgn * (forward - strike), 0.0)

    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_ttm = safe_vol * jnp.sqrt(safe_ttm)
    d1 = (jnp.log(forward / strike) + 0.5 * s_ttm * s_ttm) / s_ttm
    d2 = d1 - s_ttm
    live = discfactor * sgn * (forward * ncdf(sgn * d1) - strike * ncdf(sgn * d2))
    return jnp.where(is_intrinsic(ttm, vol), intrinsic, live)


# API alias matching the reference's vectorized entrypoint (bsm.py:86)
compute_bsm_vanilla_price_vector = compute_bsm_vanilla_price


def compute_bsm_vanilla_slice_prices(ttm,
                                     forward,
                                     strikes,
                                     vols,
                                     optiontypes,
                                     discfactor=1.0
                                     ) -> Array:
    """prices for one maturity slice, vectorized over strikes (bsm.py:89-112)."""
    return compute_bsm_vanilla_price(forward=forward, strike=strikes, ttm=ttm,
                                     vol=vols, optiontype=optiontypes,
                                     discfactor=discfactor)


def compute_bsm_forward_grid_prices(ttm, forwards, strike, vol, optiontype,
                                    discfactor=1.0) -> Array:
    """prices over a grid of forwards at one strike (bsm.py:115-138)."""
    return compute_bsm_vanilla_price(forward=forwards, strike=strike, ttm=ttm,
                                     vol=vol, optiontype=optiontype,
                                     discfactor=discfactor)


def compute_bsm_vanilla_delta(ttm, forward, strike, vol, optiontype,
                              discfactor=1.0) -> Array:
    """BSM delta; vanilla codes get +/-N(d1), inverse codes 0 (bsm.py:148-176)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    codes = as_option_codes(optiontype)
    is_call = (codes & 1).astype(bool)
    is_inverse = (codes & 2).astype(bool)

    intrinsic_delta = jnp.where(is_call,
                                jnp.where(forward >= strike, 1.0, 0.0),
                                jnp.where(forward <= strike, -1.0, 0.0))
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_ttm = safe_vol * jnp.sqrt(safe_ttm)
    d1 = jnp.log(forward / strike) / s_ttm + 0.5 * s_ttm
    d1_sign = jnp.where(is_inverse, 0.0, jnp.where(is_call, 1.0, -1.0))
    live = discfactor * d1_sign * ncdf(d1_sign * d1)
    return jnp.where(is_intrinsic(ttm, vol), intrinsic_delta, live)


compute_bsm_vanilla_delta_vector = compute_bsm_vanilla_delta


def compute_bsm_vanilla_slice_deltas(ttm, forward, strikes, vols,
                                     optiontypes, discfactor=1.0) -> Array:
    """deltas for one maturity slice, plural-kwarg reference signature
    (bsm.py:183-201)."""
    return compute_bsm_vanilla_delta(forward=forward, strike=strikes, ttm=ttm,
                                     vol=vols, optiontype=optiontypes,
                                     discfactor=discfactor)
def compute_bsm_vanilla_grid_deltas(ttm, forwards, strike, vol, optiontype,
                                    discfactor=1.0) -> Array:
    """deltas over a grid of forwards at one strike (bsm.py:215-245)."""
    return compute_bsm_vanilla_delta(forward=forwards, strike=strike, ttm=ttm,
                                     vol=vol, optiontype=optiontype,
                                     discfactor=discfactor)


def compute_bsm_vanilla_vega(ttm, forward, strike, vol, optiontype=None) -> Array:
    """BSM vega = F n(d1) sqrt(T), zero in the intrinsic region (bsm.py:269-284)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_t = safe_vol * jnp.sqrt(safe_ttm)
    d1 = jnp.log(forward / strike) / s_t + 0.5 * s_t
    vega = forward * npdf(d1) * jnp.sqrt(safe_ttm)
    return jnp.where(is_intrinsic(ttm, vol), 0.0, vega)


compute_bsm_vanilla_vega_vector = compute_bsm_vanilla_vega


def compute_bsm_vanilla_slice_vegas(ttm, forward, strikes, vols,
                                    optiontypes=None) -> Array:
    """vegas for one maturity slice, plural-kwarg reference signature
    (bsm.py:388-404)."""
    return compute_bsm_vanilla_vega(forward=forward, strike=strikes, ttm=ttm,
                                    vol=vols, optiontype=optiontypes)


compute_bsm_slice_vegas = compute_bsm_vanilla_slice_vegas


def compute_bsm_vanilla_gamma(ttm, forward, strike, vol) -> Array:
    """BSM gamma = n(d1) / (F vol sqrt(T)) (bsm.py:329-344)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_t = safe_vol * jnp.sqrt(safe_ttm)
    d1 = jnp.log(forward / strike) / s_t + 0.5 * s_t
    gamma = npdf(d1) / (forward * s_t)
    return jnp.where(is_intrinsic(ttm, vol), 0.0, gamma)


compute_bsm_vanilla_gamma_vector = compute_bsm_vanilla_gamma


def compute_bsm_vanilla_theta(ttm, forward, strike, vol, optiontype,
                              discfactor=1.0, discount_rate=0.0) -> Array:
    """BSM theta with the 1.2.2 sign convention (bsm.py:357-381)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_t = safe_vol * jnp.sqrt(safe_ttm)
    d1 = jnp.log(forward / strike) / s_t + 0.5 * s_t
    d2 = d1 - s_t
    decay = -discfactor * forward * npdf(d1) * safe_vol / (2.0 * jnp.sqrt(safe_ttm))
    rate_term = jnp.where(is_call,
                          -discount_rate * discfactor * strike * ncdf(d2),
                          discount_rate * discfactor * strike * ncdf(-d2))
    return jnp.where(is_intrinsic(ttm, vol), 0.0, decay + rate_term)


compute_bsm_vanilla_theta_vector = compute_bsm_vanilla_theta


def compute_bsm_strike_from_delta(ttm, forward, delta, vol) -> Array:
    """strike solving BSM delta = delta (bsm.py:248-259)."""
    delta = jnp.asarray(delta)
    inv_delta = jnp.where(delta > 0.0, norm_ppf(jnp.abs(delta)), -norm_ppf(jnp.abs(delta)))
    s_t = jnp.asarray(vol) * jnp.sqrt(jnp.asarray(ttm))
    return forward * jnp.exp(-s_t * (inv_delta - 0.5 * s_t))


def compute_bsm_digital_price(forward, strike, ttm, vol, optiontype='C',
                              discfactor=1.0) -> Array:
    """cash digital price df*N(+-d2) (bsm.py:543-572)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    intrinsic = jnp.where(is_call,
                          jnp.where(forward >= strike, 1.0, 0.0),
                          jnp.where(forward <= strike, 1.0, 0.0))
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_ttm = safe_vol * jnp.sqrt(safe_ttm)
    d2 = (jnp.log(forward / strike) + 0.5 * s_ttm * s_ttm) / s_ttm - s_ttm
    live = discfactor * jnp.where(is_call, ncdf(d2), ncdf(-d2))
    return jnp.where(is_intrinsic(ttm, vol), intrinsic, live)


def compute_bsm_digital_delta(forward, strike, ttm, vol, optiontype='C',
                              discfactor=1.0) -> Array:
    """cash digital delta +-df n(d2)/(F vol sqrt(T)) (bsm.py:575-600)."""
    forward, strike, ttm, vol = map(jnp.asarray, (forward, strike, ttm, vol))
    is_call = _is_call(optiontype)
    safe_vol = jnp.where(is_intrinsic(ttm, vol), 1.0, vol)
    safe_ttm = jnp.where(ttm <= 0.0, 1.0, ttm)
    s_ttm = safe_vol * jnp.sqrt(safe_ttm)
    d2 = (jnp.log(forward / strike) + 0.5 * s_ttm * s_ttm) / s_ttm - s_ttm
    pnorm = discfactor / (forward * s_ttm)
    live = jnp.where(is_call, pnorm * npdf(d2), -pnorm * npdf(d2))
    return jnp.where(is_intrinsic(ttm, vol), 0.0, live)


# ----------------------------------------------------------------------------
# implied volatility: vectorized reference bisection with implicit-fn gradient
# ----------------------------------------------------------------------------

def _bisection_impl(given_price, forward, strike, ttm, discfactor, is_call_f):
    """vectorized port of the reference bisection (bsm.py:445-489).

    is_call_f: float array, 1.0 for calls, -1.0 for puts (kept float so the
    whole solver is a jnp expression).
    """
    def price_at(vol):
        sgn = is_call_f
        s_ttm = vol * jnp.sqrt(ttm)
        d1 = (jnp.log(forward / strike) + 0.5 * s_ttm * s_ttm) / s_ttm
        d2 = d1 - s_ttm
        return discfactor * sgn * (forward * ncdf(sgn * d1) - strike * ncdf(sgn * d2))

    x1 = jnp.full_like(given_price, IV_LOWER)
    x2 = jnp.full_like(given_price, IV_UPPER)
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
        # freeze state once |fmid| < tol, mirroring the reference's early break
        upd = jnp.logical_not(done)
        rtb = jnp.where(upd, rtb_new, rtb)
        dx = jnp.where(upd, dx_new, dx)
        xmid = jnp.where(upd, xmid_new, xmid)
        done = done | (jnp.abs(fmid_new) < IV_TOL)
        return rtb, dx, xmid, done

    init = (rtb0, dx0, rtb0, jnp.zeros_like(bracketed))
    _, _, xmid, _ = jax.lax.fori_loop(0, 200, body, init)

    v1 = jnp.where(bracketed, xmid, jnp.where(f < 0.0, x1, x2))
    at_bounds = (jnp.abs(v1 - x1) < IV_TOL) | (jnp.abs(v1 - x2) < IV_TOL)
    return jnp.where(at_bounds, jnp.nan, v1)


@jax.custom_vjp
def _implied_vol_core(given_price, forward, strike, ttm, discfactor, is_call_f):
    return _bisection_impl(given_price, forward, strike, ttm, discfactor, is_call_f)


def _implied_vol_fwd(given_price, forward, strike, ttm, discfactor, is_call_f):
    vol = _bisection_impl(given_price, forward, strike, ttm, discfactor, is_call_f)
    return vol, (vol, given_price, forward, strike, ttm, discfactor, is_call_f)


def _implied_vol_bwd(res, g):
    vol, given_price, forward, strike, ttm, discfactor, is_call_f = res
    # implicit function theorem on P(F,K,T,sigma)*df = price
    def price_fn(f_, k_, t_, df_, v_):
        sgn = is_call_f
        s_ttm = v_ * jnp.sqrt(t_)
        d1 = (jnp.log(f_ / k_) + 0.5 * s_ttm * s_ttm) / s_ttm
        d2 = d1 - s_ttm
        return df_ * sgn * (f_ * ncdf(sgn * d1) - k_ * ncdf(sgn * d2))

    safe_vol = jnp.where(jnp.isnan(vol), 1.0, vol)
    grads = jax.grad(lambda f_, k_, t_, df_, v_: jnp.sum(price_fn(f_, k_, t_, df_, v_)),
                     argnums=(0, 1, 2, 3, 4))(
        jnp.broadcast_to(forward, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(strike, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(ttm, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(discfactor, vol.shape).astype(vol.dtype),
        safe_vol)
    dP_dF, dP_dK, dP_dT, dP_ddf, vega = grads
    inv_vega = jnp.where(jnp.isnan(vol) | (jnp.abs(vega) < 1e-300), 0.0, 1.0 / vega)
    gv = g * inv_vega
    return (gv, -gv * dP_dF, -gv * dP_dK, -gv * dP_dT, -gv * dP_ddf, None)


_implied_vol_core.defvjp(_implied_vol_fwd, _implied_vol_bwd)


def _fast_iv_impl(given_price, forward, strike, ttm, discfactor, sgn,
                  nb_bisect, nb_newton):
    def price_at(vol):
        s_ttm = vol * jnp.sqrt(ttm)
        d1 = (jnp.log(forward / strike) + 0.5 * s_ttm * s_ttm) / s_ttm
        d2 = d1 - s_ttm
        return discfactor * sgn * (forward * ncdf(sgn * d1) - strike * ncdf(sgn * d2))

    lo = jnp.full_like(given_price, IV_LOWER)
    hi = jnp.full_like(given_price, IV_UPPER)
    f_lo_raw = price_at(lo) - given_price
    f_hi_raw = price_at(hi) - given_price
    bracketed = f_lo_raw * f_hi_raw < 0.0
    # unbracketable (or NaN) quotes are replaced by a guaranteed-solvable
    # dummy BEFORE the solver so no NaN circulates through the iterations;
    # the output is still NaN at unbracketed entries.
    given_price = jnp.where(bracketed, given_price,
                            price_at(jnp.ones_like(lo)))
    f_lo = price_at(lo) - given_price

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f_mid = price_at(mid) - given_price
        go_up = f_mid * f_lo > 0.0   # same sign as lower -> root above mid
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, nb_bisect, bisect, (lo, hi))
    vol = 0.5 * (lo + hi)

    def newton(_, vol):
        s_ttm = vol * jnp.sqrt(ttm)
        d1 = jnp.log(forward / strike) / s_ttm + 0.5 * s_ttm
        vega = discfactor * forward * npdf(d1) * jnp.sqrt(ttm)
        step = (price_at(vol) - given_price) / jnp.maximum(vega, 1e-12)
        return jnp.clip(vol - step, IV_LOWER, IV_UPPER)

    vol = jax.lax.fori_loop(0, nb_newton, newton, vol)
    return jnp.where(bracketed, vol, jnp.nan)


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(6, 7))
def _fast_iv_core(given_price, forward, strike, ttm, discfactor, sgn,
                  nb_bisect, nb_newton):
    return _fast_iv_impl(given_price, forward, strike, ttm, discfactor, sgn,
                         nb_bisect, nb_newton)


@_fast_iv_core.defjvp
def _fast_iv_jvp(nb_bisect, nb_newton, primals, tangents):
    # implicit-function-theorem tangent rule, dvol = (dP - dP_dx dx)/vega.
    # A custom rule is essential: differentiating through the Newton polish
    # compounds 1/vega four times, overflowing f32 for deep-OTM quotes and
    # poisoning whole-chain calibration gradients with 0*inf=NaN.  custom_jvp
    # (linear in tangents) supports BOTH jacfwd and, via transposition,
    # reverse mode.
    given_price, forward, strike, ttm, discfactor, sgn = primals
    vol = _fast_iv_impl(given_price, forward, strike, ttm, discfactor, sgn,
                        nb_bisect, nb_newton)

    def price_fn(f_, k_, t_, df_, v_):
        s_ttm = v_ * jnp.sqrt(t_)
        d1 = (jnp.log(f_ / k_) + 0.5 * s_ttm * s_ttm) / s_ttm
        d2 = d1 - s_ttm
        return df_ * sgn * (f_ * ncdf(sgn * d1) - k_ * ncdf(sgn * d2))

    safe_vol = jnp.where(jnp.isnan(vol), 1.0, vol)
    grads = jax.grad(lambda f_, k_, t_, df_, v_: jnp.sum(price_fn(f_, k_, t_, df_, v_)),
                     argnums=(0, 1, 2, 3, 4))(
        jnp.broadcast_to(forward, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(strike, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(ttm, vol.shape).astype(vol.dtype),
        jnp.broadcast_to(discfactor, vol.shape).astype(vol.dtype),
        safe_vol)
    dP_dF, dP_dK, dP_dT, dP_ddf, vega = grads
    # floor vega in units of the forward so 1/vega can't overflow f32
    floor = 1e-12 * jnp.broadcast_to(forward, vol.shape).astype(vol.dtype)
    inv_vega = jnp.where(jnp.isnan(vol) | (jnp.abs(vega) < floor), 0.0,
                         1.0 / vega)

    dp, df_t, dk, dt_, ddf, _ = tangents
    # inv_vega is exactly 0 at NaN-vol entries, so dvol stays clean there;
    # the rule is linear in the tangents, which keeps it transposable
    # (reverse mode works through it too)
    dvol = inv_vega * (dp - dP_dF * df_t - dP_dK * dk - dP_dT * dt_
                       - dP_ddf * ddf)
    return vol, dvol


def infer_bsm_implied_vol_fast(forward, ttm, strike, given_price,
                               discfactor=1.0, optiontype='C',
                               nb_bisect: int = 24, nb_newton: int = 4):
    """fast implied vol: short bisection bracket + Newton polish.

    ~15x fewer sequential stages than the reference's 200-iteration bisection
    — intended for inside latency-bound calibration objectives; final
    reporting should use :func:`infer_bsm_implied_vol` (exact reference
    semantics).  NaN-at-unbracketed behavior is preserved; gradients come
    from the implicit function theorem (1/vega), not AD through the solver.
    """
    given_price = jnp.asarray(given_price)
    shape = jnp.broadcast_shapes(jnp.shape(given_price), jnp.shape(forward),
                                 jnp.shape(strike), jnp.shape(ttm),
                                 jnp.shape(_is_call(optiontype)))
    dt = jnp.result_type(given_price, jnp.asarray(forward))
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dt), shape)
    sgn = jnp.where(jnp.broadcast_to(_is_call(optiontype), shape), 1.0, -1.0).astype(dt)
    return _fast_iv_core(b(given_price), b(forward), b(strike), b(ttm),
                         b(discfactor), sgn, int(nb_bisect), int(nb_newton))


def infer_bsm_implied_vol(forward,
                          ttm,
                          strike,
                          given_price,
                          discfactor=1.0,
                          optiontype='C',
                          tol: float = 1e-16,
                          is_bounds_to_nan: bool = True
                          ) -> Array:
    """Black implied vol by the reference bisection on [0.01, 5.0].

    Elementwise over broadcastable inputs; differentiable w.r.t. price,
    forward, strike, ttm and discount factor via the implicit function theorem.
    ``tol`` is accepted for reference parity (bsm.py:445-489) — the fixed 200
    bisection iterations exceed any representable tolerance.  With
    ``is_bounds_to_nan`` (reference default) out-of-bracket prices give NaN;
    otherwise they clamp to the violated bound.
    """
    del tol
    given_price = jnp.asarray(given_price)
    shape = jnp.broadcast_shapes(jnp.shape(given_price), jnp.shape(forward),
                                 jnp.shape(strike), jnp.shape(ttm),
                                 jnp.shape(_is_call(optiontype)))
    dt = jnp.result_type(given_price, jnp.asarray(forward))
    b = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dt), shape)
    is_call_f = jnp.where(jnp.broadcast_to(_is_call(optiontype), shape), 1.0, -1.0).astype(dt)
    res = _implied_vol_core(b(given_price), b(forward), b(strike), b(ttm),
                            b(discfactor), is_call_f)
    if not is_bounds_to_nan:
        p_low = compute_bsm_vanilla_price(forward=forward, strike=strike,
                                          ttm=ttm, vol=0.01,
                                          optiontype=optiontype,
                                          discfactor=discfactor)
        unbracketed = jnp.isnan(res) & jnp.isfinite(b(given_price))
        res = jnp.where(unbracketed,
                        jnp.where(b(given_price) <= p_low, 0.01, 5.0), res)
    return res


def infer_bsm_ivols_from_model_slice_prices(ttm, forward, strikes, optiontypes,
                                            model_prices, discfactor) -> Array:
    """slice-level inversion (bsm.py:428-442)."""
    return infer_bsm_implied_vol(forward=forward, ttm=ttm, strike=strikes,
                                 given_price=model_prices, discfactor=discfactor,
                                 optiontype=optiontypes)


def infer_bsm_ivols_from_slice_prices(ttm, forward, discfactor, strikes,
                                      optiontypes, model_prices) -> Array:
    """reference positional order (bsm.py:493-509): discfactor third."""
    return infer_bsm_ivols_from_model_slice_prices(
        ttm=ttm, forward=forward, strikes=strikes, optiontypes=optiontypes,
        model_prices=model_prices, discfactor=discfactor)


def compute_bsm_vanilla_deltas_ttms(ttms, forwards, strikes_ttms, vols_ttms,
                                    optiontypes_ttms):
    """ragged chain-level deltas (bsm.py:206-219 API compatibility)."""
    return [np.asarray(compute_bsm_vanilla_delta(ttm=t, forward=f, strike=s,
                                                 vol=v, optiontype=o))
            for t, f, s, v, o in zip(ttms, forwards, strikes_ttms, vols_ttms,
                                     optiontypes_ttms)]


def compute_bsm_vegas_ttms(ttms, forwards, strikes_ttms, vols_ttms,
                           optiontypes_ttms=None):
    """ragged chain-level vegas (bsm.py:306-319 API compatibility)."""
    return [np.asarray(compute_bsm_vanilla_vega(ttm=t, forward=f, strike=s, vol=v))
            for t, f, s, v in zip(ttms, forwards, strikes_ttms, vols_ttms)]


compute_bsm_vanilla_vegas_ttms = compute_bsm_vegas_ttms


def infer_bsm_ivols_from_model_chain_prices(ttms,
                                            forwards,
                                            discfactors,
                                            strikes_ttms,
                                            optiontypes_ttms,
                                            model_prices_ttms):
    """chain-level inversion over a padded (n_ttm, max_strikes) panel.

    ttms/forwards/discfactors: (T,); strikes/optiontypes/prices: (T, K) padded.
    Returns a (T, K) panel of implied vols (NaN on padded or unbracketed slots).
    """
    ttms = jnp.asarray(ttms)[:, None]
    forwards = jnp.asarray(forwards)[:, None]
    discfactors = jnp.asarray(discfactors)[:, None]
    return infer_bsm_implied_vol(forward=forwards, ttm=ttms,
                                 strike=strikes_ttms,
                                 given_price=model_prices_ttms,
                                 discfactor=discfactors,
                                 optiontype=optiontypes_ttms)
