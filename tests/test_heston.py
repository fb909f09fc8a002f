"""
Heston model: Fourier chain pricing sanity, put-call parity, MC-vs-analytic
agreement within confidence bands, and gradient flow for calibration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.heston import (
    BTC_HESTON_PARAMS,
    HestonParams,
    HestonPricer,
    heston_chain_price_grid,
    _heston_calibration_objective,
)

PARAMS = HestonParams(v0=0.85 ** 2, theta=1.4 ** 2, kappa=3.0, volvol=2.0, rho=0.3)


@pytest.fixture(scope="module")
def chain():
    return get_btc_test_chain_data()


class TestFourierPricing:
    def test_chain_prices_positive_and_monotone(self, chain):
        pricer = HestonPricer()
        prices = pricer.price_chain(option_chain=chain, params=PARAMS)
        assert len(prices) == 4
        for p, strikes, types in zip(prices, chain.strikes_ttms, chain.optiontypes_ttms):
            assert p.shape == strikes.shape
            assert np.all(p > 0)
            # calls decrease, puts increase in strike
            calls = types == 'C'
            assert np.all(np.diff(p[calls]) < 0)
            assert np.all(np.diff(p[~calls]) > 0)

    def test_put_call_parity(self):
        # price calls and puts at same strikes: C - P = df (F - K)
        from stochvolmodels_tpu.data.option_chain import OptionChain
        strikes = np.linspace(40000.0, 100000.0, 13)
        f, ttm, df = 67000.0, 0.25, 0.98
        chain_c = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                             optiontypes=np.full(13, 'C'), discfactor=df)
        chain_p = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                             optiontypes=np.full(13, 'P'), discfactor=df)
        pricer = HestonPricer()
        calls = pricer.price_chain(option_chain=chain_c, params=PARAMS)[0]
        puts = pricer.price_chain(option_chain=chain_p, params=PARAMS)[0]
        np.testing.assert_allclose(calls - puts, df * (f - strikes), rtol=1e-9, atol=1e-6 * f)

    def test_implied_vols_sane(self, chain):
        pricer = HestonPricer()
        _, ivols = pricer.compute_chain_prices_with_vols(option_chain=chain, params=PARAMS)
        for iv in ivols:
            assert np.all(np.isfinite(iv))
            assert np.all((iv > 0.3) & (iv < 2.5))

    def test_price_vanilla_and_slice(self):
        pricer = HestonPricer()
        price, vol = pricer.price_vanilla(params=PARAMS, ttm=1.0, forward=1.0,
                                          strike=1.0, optiontype='C')
        assert 0.0 < float(price) < 1.0
        assert 0.3 < float(vol) < 2.0

    def test_maturity_chaining_consistency(self, chain):
        # pricing the full chain must equal pricing each slice alone
        # (the chained Riccati state is exact, not an approximation)
        pricer = HestonPricer()
        full = pricer.price_chain(option_chain=chain, params=PARAMS)
        vol_scaler = float(np.minimum(0.3, np.sqrt(PARAMS.v0 * chain.ttms[0])))
        for i in range(len(chain.ttms)):
            from stochvolmodels_tpu.data.option_chain import OptionChain
            single = OptionChain.slice_to_chain(
                ttm=chain.ttms[i], forward=chain.forwards[i],
                strikes=chain.strikes_ttms[i],
                optiontypes=chain.optiontypes_ttms[i],
                discfactor=chain.discfactors[i])
            sp = pricer.price_chain(option_chain=single, params=PARAMS,
                                    vol_scaler=vol_scaler)[0]
            np.testing.assert_allclose(full[i], sp, rtol=1e-9, atol=1e-9)


class TestMonteCarlo:
    def test_mc_matches_analytic_within_bands(self, chain):
        pricer = HestonPricer()
        analytic = pricer.price_chain(option_chain=chain, params=BTC_HESTON_PARAMS)
        mc_prices, mc_stds = pricer.model_mc_price_chain(
            option_chain=chain, params=BTC_HESTON_PARAMS, nb_path=100000, seed=7)
        for a, m, s in zip(analytic, mc_prices, mc_stds):
            # discretization bias + MC error: 4 stderr + 0.5% of forward
            tol = 4.0 * s + 5e-3 * np.asarray(a)
            assert np.all(np.abs(a - m) < tol), f"diff={np.abs(a-m)}, tol={tol}"

    def test_terminal_values_moments(self):
        pricer = HestonPricer()
        params = HestonParams(v0=0.04, theta=0.04, kappa=4.0, rho=-0.5, volvol=0.4)
        x, var, qvar = pricer.simulate_terminal_values(params=params, ttm=1.0,
                                                       nb_path=200000, seed=3)
        # E[var_T] ~ theta for v0=theta
        assert abs(np.mean(var) - params.theta) < 0.002
        # martingale: E[exp(x)] ~ 1
        assert abs(np.mean(np.exp(x)) - 1.0) < 0.01
        # E[qvar] = integral E[var] dt = theta
        assert abs(np.mean(qvar) - params.theta) < 0.002


class TestCalibration:
    def test_objective_gradient_finite(self, chain):
        grid = chain.to_grid()
        mid = chain.get_mid_vols()
        t, k = grid.mask.shape
        mv = np.zeros((t, k))
        for i, a in enumerate(mid):
            mv[i, :len(a)] = a
        w = np.where(np.asarray(grid.mask), 1.0, 0.0)
        pars = jnp.asarray(BTC_HESTON_PARAMS.to_array())
        val, grads = jax.value_and_grad(_heston_calibration_objective)(
            pars, grid=grid, market_vols=jnp.asarray(mv), weights=jnp.asarray(w),
            vol_scaler=0.28)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grads)))
        # finite-difference check on v0
        eps = 1e-5
        up = _heston_calibration_objective(pars.at[0].add(eps), grid=grid,
                                           market_vols=jnp.asarray(mv),
                                           weights=jnp.asarray(w), vol_scaler=0.28)
        dn = _heston_calibration_objective(pars.at[0].add(-eps), grid=grid,
                                           market_vols=jnp.asarray(mv),
                                           weights=jnp.asarray(w), vol_scaler=0.28)
        fd = (float(up) - float(dn)) / (2 * eps)
        assert abs(fd - float(grads[0])) < 1e-3 * max(1.0, abs(fd))

    @pytest.mark.slow
    def test_calibration_improves_fit(self, chain):
        pricer = HestonPricer()
        fit = pricer.calibrate_model_params_to_chain(option_chain=chain,
                                                     params0=BTC_HESTON_PARAMS)
        assert 0.01 <= fit.v0 <= 2.0
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain, params=fit)
        mids = chain.get_mid_vols()
        err = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols, mids)])
        assert err < 0.05  # mean abs IV error under 5 vol points


class TestOnDeviceCalibration:
    def test_lm_calibration_improves_fit(self, chain):
        pricer = HestonPricer()
        params0 = HestonParams(v0=0.8, theta=1.0, kappa=2.0, rho=0.1, volvol=1.5)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=params0, method='lm', nb_iters=10,
            use_float32=True)
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain, params=fit)
        ivols0 = pricer.compute_model_ivols_for_chain(option_chain=chain, params=params0)
        mids = chain.get_mid_vols()
        err = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols, mids)])
        err0 = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols0, mids)])
        assert err < err0
        assert err < 0.05
        # Feller penalty keeps the fit on the feasible side (or close)
        assert 2.0 * fit.kappa * fit.theta - fit.volvol ** 2 > -0.5

    def test_lm_rejects_unknown_method(self, chain):
        pricer = HestonPricer()
        with pytest.raises(ValueError):
            pricer.calibrate_model_params_to_chain(
                option_chain=chain, params0=None, method='nope')


class TestFastPrecision:
    def test_fast_mode_matches_exact(self, chain):
        """precision='fast' (mixed: f32 closed-form MGF, f64 quadrature)
        agrees with the exact f64 pricer to ~1e-5 relative (PARITY.md
        "Fourier fast floors")."""
        pricer = HestonPricer()
        exact = pricer.price_chain(option_chain=chain, params=PARAMS)
        fast = pricer.price_chain(option_chain=chain, params=PARAMS,
                                  precision="fast")
        for f, e in zip(fast, exact):
            np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                       rtol=5e-5, atol=1e-7)

    def test_fast_fused_ivols_match_exact(self, chain):
        pricer = HestonPricer()
        exact = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                     params=PARAMS)
        fast = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                    params=PARAMS,
                                                    precision="fast")
        for f, e in zip(fast, exact):
            f, e = np.asarray(f), np.asarray(e)
            assert np.isnan(f).sum() == np.isnan(e).sum()
            np.testing.assert_allclose(f, e, rtol=1e-4, atol=1e-5)

    def test_unknown_precision_raises(self, chain):
        import pytest as _pytest
        with _pytest.raises(NotImplementedError):
            HestonPricer().price_chain(option_chain=chain, params=PARAMS,
                                       precision="bogus")
