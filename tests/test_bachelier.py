"""
Bachelier (normal) analytics: closed-form values, parity, IV roundtrips.
"""
import jax
import numpy as np
from scipy.stats import norm

import stochvolmodels_tpu.ops.bachelier as bachel


def scipy_normal_price(forward, strike, ttm, vol, is_call=True):
    sdev = vol * np.sqrt(ttm)
    d = (forward - strike) / sdev
    if is_call:
        return (forward - strike) * norm.cdf(d) + sdev * norm.pdf(d)
    return (forward - strike) * (norm.cdf(d) - 1.0) + sdev * norm.pdf(d)


def test_price_vs_scipy():
    f, k, t, v = 0.03, 0.035, 0.5, 0.01
    ours = float(bachel.compute_normal_price(f, k, t, v, optiontype='C'))
    assert abs(ours - scipy_normal_price(f, k, t, v)) < 1e-8


def test_put_call_parity():
    f, t, v = 0.03, 0.5, 0.01
    strikes = np.linspace(0.01, 0.05, 9)
    calls = np.asarray(bachel.compute_normal_price(f, strikes, t, v,
                                                   optiontype=np.full(9, 'C')))
    puts = np.asarray(bachel.compute_normal_price(f, strikes, t, v,
                                                  optiontype=np.full(9, 'P')))
    np.testing.assert_allclose(calls - puts, f - strikes, atol=1e-12)


def test_iv_roundtrip():
    f, t = 0.03, 0.5
    strikes = np.linspace(0.02, 0.04, 9)
    vols = 0.008 + 0.004 * np.linspace(0, 1, 9) ** 2
    types = np.where(strikes >= f, 'C', 'P')
    prices = bachel.compute_normal_price(f, strikes, t, vols, optiontype=types)
    ivs = np.asarray(bachel.infer_normal_implied_vol(
        forward=f, ttm=t, strike=strikes, given_price=prices, optiontype=types))
    np.testing.assert_allclose(ivs, vols, atol=1e-9)


def test_iv_gradient_is_inverse_vega():
    f, k, t, v = 0.03, 0.032, 0.5, 0.01
    price = float(bachel.compute_normal_price(f, k, t, v, optiontype='C'))
    g = float(jax.grad(lambda p: bachel.infer_normal_implied_vol(
        forward=f, ttm=t, strike=k, given_price=p, optiontype='C'))(price))
    sdev = v * np.sqrt(t)
    vega = norm.pdf((f - k) / sdev) * np.sqrt(t)
    assert abs(g - 1.0 / vega) / (1.0 / vega) < 1e-4


def test_delta_and_strike_roundtrip():
    f, t, v = 0.03, 0.5, 0.3  # relative-vol convention for deltas
    strike = float(bachel.compute_normal_delta_to_strike(ttm=t, forward=f,
                                                         delta=0.25, vol=v))
    delta = float(bachel.compute_normal_delta(ttm=t, forward=f, strike=strike,
                                              vol=v, optiontype='C'))
    assert abs(delta - 0.25) < 1e-6


def test_strikes_to_delta_monotone():
    strikes = np.linspace(0.02, 0.04, 7)
    deltas = np.asarray(bachel.strikes_to_delta(strikes=strikes,
                                                ivols=np.full(7, 0.01),
                                                f0=0.03, ttm=0.5))
    assert np.all(np.diff(deltas) < 0)
    assert np.all((deltas > 0) & (deltas < 1))

def test_fast_iv_matches_exact_and_supports_jacfwd():
    """infer_normal_implied_vol_fast: parity with the exact bisection and
    forward-mode AD (the on-device rate LM needs jacfwd; the exact path's
    custom_vjp cannot provide it)."""
    import jax.numpy as jnp
    f, t = 0.03, 1.0
    strikes = np.linspace(0.018, 0.045, 11)
    vols = 0.007 + 0.006 * np.linspace(0, 1, 11) ** 2
    types = np.where(strikes >= f, 'C', 'P')
    prices = bachel.compute_normal_price(f, strikes, t, vols, optiontype=types)
    fast = np.asarray(bachel.infer_normal_implied_vol_fast(
        forward=f, ttm=t, strike=strikes, given_price=prices, optiontype=types))
    np.testing.assert_allclose(fast, vols, atol=1e-9)
    J = np.asarray(jax.jacfwd(lambda p: bachel.infer_normal_implied_vol_fast(
        forward=f, ttm=t, strike=strikes, given_price=p,
        optiontype=types))(jnp.asarray(prices)))
    sdev = vols * np.sqrt(t)
    inv_vega = 1.0 / (norm.pdf((f - strikes) / sdev) * np.sqrt(t))
    np.testing.assert_allclose(np.diag(J), inv_vega, rtol=1e-6)
    # reverse mode through the same custom_jvp (transposed rule)
    g = np.asarray(jax.grad(lambda p: bachel.infer_normal_implied_vol_fast(
        forward=f, ttm=t, strike=strikes, given_price=p,
        optiontype=types).sum())(jnp.asarray(prices)))
    np.testing.assert_allclose(g, inv_vega, rtol=1e-6)


def test_fast_iv_nan_at_unbracketed():
    out = np.asarray(bachel.infer_normal_implied_vol_fast(
        forward=0.03, ttm=1.0, strike=np.array([0.03, 0.03]),
        given_price=np.array([0.004, 1.0])))
    assert np.isfinite(out[0]) and np.isnan(out[1])
