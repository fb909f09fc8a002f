"""
BSM analytics: closed-form values, parity identities, implied-vol roundtrips,
and differentiability of the inversion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

import stochvolmodels_tpu.ops.bsm as bsm


def scipy_bsm_price(forward, strike, ttm, vol, is_call=True, df=1.0):
    st = vol * np.sqrt(ttm)
    d1 = (np.log(forward / strike) + 0.5 * st * st) / st
    d2 = d1 - st
    if is_call:
        return df * (forward * norm.cdf(d1) - strike * norm.cdf(d2))
    return -df * (forward * norm.cdf(-d1) - strike * norm.cdf(-d2))


class TestPrices:
    def test_vs_exact_normal_cdf(self):
        # erfcc approximation is good to ~1e-7
        f, k, t, v = 100.0, 110.0, 0.5, 0.3
        ours = float(bsm.compute_bsm_vanilla_price(f, k, t, v, 'C'))
        exact = scipy_bsm_price(f, k, t, v, True)
        assert abs(ours - exact) / f < 1e-6

    def test_put_call_parity(self):
        f, t, v = 100.0, 0.5, 0.3
        strikes = np.linspace(50.0, 200.0, 31)
        calls = np.asarray(bsm.compute_bsm_vanilla_price(f, strikes, t, v, np.full(31, 'C')))
        puts = np.asarray(bsm.compute_bsm_vanilla_price(f, strikes, t, v, np.full(31, 'P')))
        np.testing.assert_allclose(calls - puts, f - strikes, atol=1e-9)

    def test_intrinsic_fallbacks(self):
        assert float(bsm.compute_bsm_vanilla_price(100.0, 90.0, 0.0, 0.2, 'C')) == 10.0
        assert float(bsm.compute_bsm_vanilla_price(100.0, 90.0, 1.0, np.nan, 'C')) == 10.0
        assert float(bsm.compute_bsm_vanilla_price(100.0, 110.0, 1.0, -1.0, 'P')) == 10.0

    def test_slice_prices_shape(self):
        strikes = np.array([90.0, 100.0, 110.0])
        types = np.array(['P', 'C', 'C'])
        prices = bsm.compute_bsm_vanilla_slice_prices(
            ttm=0.25, forward=100.0, strikes=strikes,
            vols=np.array([0.2, 0.2, 0.2]), optiontypes=types)
        assert prices.shape == (3,)
        assert np.all(np.asarray(prices) > 0)


class TestGreeks:
    def test_vega_is_dprice_dvol(self):
        f, k, t, v = 100.0, 105.0, 0.7, 0.35
        vega = float(bsm.compute_bsm_vanilla_vega(t, f, k, v))
        grad = float(jax.grad(lambda vol: bsm.compute_bsm_vanilla_price(f, k, t, vol, 'C'))(v))
        # price uses the erfcc rational approximation (reference parity), whose
        # derivative differs from the analytic npdf vega at ~1e-5 relative
        assert abs(vega - grad) / vega < 1e-4

    def test_delta_is_dprice_dforward(self):
        f, k, t, v = 100.0, 105.0, 0.7, 0.35
        delta = float(bsm.compute_bsm_vanilla_delta(t, f, k, v, 'C'))
        grad = float(jax.grad(lambda fwd: bsm.compute_bsm_vanilla_price(fwd, k, t, v, 'C'))(f))
        assert abs(delta - grad) < 1e-4  # erfcc-approximation derivative error

    def test_gamma_positive(self):
        g = float(bsm.compute_bsm_vanilla_gamma(0.5, 100.0, 100.0, 0.2))
        assert g > 0

    def test_strike_from_delta_roundtrip(self):
        f, t, v = 100.0, 0.5, 0.25
        strike = float(bsm.compute_bsm_strike_from_delta(t, f, 0.25, v))
        delta = float(bsm.compute_bsm_vanilla_delta(t, f, strike, v, 'C'))
        assert abs(delta - 0.25) < 1e-6


class TestImpliedVol:
    def test_roundtrip(self):
        f, t = 100.0, 0.5
        strikes = np.linspace(60.0, 180.0, 25)
        vols = 0.2 + 0.3 * np.linspace(0, 1, 25) ** 2
        types = np.where(strikes >= f, 'C', 'P')
        prices = bsm.compute_bsm_vanilla_price(f, strikes, t, vols, types)
        ivols = bsm.infer_bsm_implied_vol(forward=f, ttm=t, strike=strikes,
                                          given_price=prices, optiontype=types)
        np.testing.assert_allclose(np.asarray(ivols), vols, atol=1e-10)

    def test_out_of_bracket_is_nan(self):
        # price below intrinsic cannot be inverted
        iv = bsm.infer_bsm_implied_vol(forward=100.0, ttm=0.5, strike=90.0,
                                       given_price=5.0, optiontype='C')
        assert np.isnan(float(iv))

    def test_nan_price_is_nan(self):
        iv = bsm.infer_bsm_implied_vol(forward=100.0, ttm=0.5, strike=90.0,
                                       given_price=np.nan, optiontype='C')
        assert np.isnan(float(iv))

    def test_gradient_is_inverse_vega(self):
        f, k, t, v = 100.0, 105.0, 0.7, 0.35
        price = float(bsm.compute_bsm_vanilla_price(f, k, t, v, 'C'))
        g = float(jax.grad(lambda p: bsm.infer_bsm_implied_vol(
            forward=f, ttm=t, strike=k, given_price=p, optiontype='C'))(price))
        vega = float(bsm.compute_bsm_vanilla_vega(t, f, k, v))
        assert abs(g - 1.0 / vega) / abs(1.0 / vega) < 1e-4

    def test_gradient_nan_price_is_zero(self):
        g = float(jax.grad(lambda p: jnp.where(
            jnp.isnan(bsm.infer_bsm_implied_vol(forward=100.0, ttm=0.5, strike=90.0,
                                                given_price=p, optiontype='C')),
            0.0,
            bsm.infer_bsm_implied_vol(forward=100.0, ttm=0.5, strike=90.0,
                                      given_price=p, optiontype='C')))(5.0))
        assert g == 0.0

    def test_chain_panel_inversion(self):
        ttms = np.array([0.25, 0.5])
        forwards = np.array([100.0, 101.0])
        dfs = np.array([1.0, 0.99])
        strikes = np.array([[90.0, 100.0, 110.0], [95.0, 101.0, 115.0]])
        types = np.array([['P', 'C', 'C'], ['P', 'C', 'C']])
        vols = np.full((2, 3), 0.25)
        prices = bsm.compute_bsm_vanilla_price(forwards[:, None], strikes,
                                               ttms[:, None], vols, types,
                                               dfs[:, None])
        ivols = bsm.infer_bsm_ivols_from_model_chain_prices(
            ttms=ttms, forwards=forwards, discfactors=dfs,
            strikes_ttms=strikes, optiontypes_ttms=types,
            model_prices_ttms=prices)
        np.testing.assert_allclose(np.asarray(ivols), vols, atol=1e-10)


class TestFastImpliedVol:
    """infer_bsm_implied_vol_fast: bisect+Newton with implicit-fn custom VJP."""

    def test_matches_parity_bisection(self):
        strikes = np.array([60.0, 80.0, 100.0, 120.0, 150.0])
        vols = np.array([0.6, 0.4, 0.3, 0.35, 0.5])
        prices = bsm.compute_bsm_vanilla_price(100.0, strikes, 0.5, vols, 'C')
        fast = bsm.infer_bsm_implied_vol_fast(forward=100.0, ttm=0.5,
                                              strike=strikes, given_price=prices,
                                              optiontype='C')
        ref = bsm.infer_bsm_implied_vol(forward=100.0, ttm=0.5, strike=strikes,
                                        given_price=prices, optiontype='C')
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-7)

    def test_nan_behavior_matches_reference(self):
        # below-intrinsic and absurd prices are unbracketable -> NaN
        bad = bsm.infer_bsm_implied_vol_fast(forward=100.0, ttm=0.5,
                                             strike=90.0, given_price=5.0,
                                             optiontype='C')
        assert np.isnan(float(bad))
        bad2 = bsm.infer_bsm_implied_vol_fast(forward=100.0, ttm=0.5,
                                              strike=90.0, given_price=np.nan,
                                              optiontype='C')
        assert np.isnan(float(bad2))

    def test_gradient_is_inverse_vega(self):
        price = float(bsm.compute_bsm_vanilla_price(100.0, 105.0, 0.5, 0.3, 'C'))
        g = float(jax.grad(lambda p: bsm.infer_bsm_implied_vol_fast(
            forward=100.0, ttm=0.5, strike=105.0, given_price=p,
            optiontype='C'))(price))
        vega = float(bsm.compute_bsm_vanilla_vega(0.5, 100.0, 105.0, 0.3))
        np.testing.assert_allclose(g, 1.0 / vega, rtol=1e-4)

    def test_gradient_clean_through_unbracketable_batch(self):
        """one bad quote in a batch must not poison the whole gradient.

        This is the failure mode that froze on-device calibration: AD
        straight through the Newton polish compounds 1/vega and a NaN
        entry turns the masked-out zero cotangent into 0*NaN=NaN.
        """
        strikes = jnp.asarray([90.0, 100.0, 110.0])
        good = bsm.compute_bsm_vanilla_price(100.0, strikes, 0.5, 0.3, 'C')

        def loss(f):
            prices = jnp.asarray([5.0, good[1], good[2]])  # [0]: below intrinsic
            vols = bsm.infer_bsm_implied_vol_fast(forward=f, ttm=0.5,
                                                  strike=strikes,
                                                  given_price=prices,
                                                  optiontype='C')
            nan_mask = jnp.isnan(vols)
            clean = jnp.where(nan_mask, 0.0, vols)
            return jnp.sum(jnp.where(nan_mask, 0.0, jnp.square(clean)))

        g = float(jax.grad(loss)(100.0))
        assert np.isfinite(g)
