"""
Gaussian-mixture and Student-t terminal-distribution models.
"""
import numpy as np
import pytest
from scipy.optimize import fsolve
from scipy.special import betainc as scipy_betainc

import stochvolmodels_tpu.ops.tdist as td
from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data, get_spy_test_chain_data
from stochvolmodels_tpu.models.gmm import GmmParams, GmmPricer, compute_gmm_vanilla_price
from stochvolmodels_tpu.models.tdist import TdistParams, TdistPricer
from stochvolmodels_tpu.ops import bsm


class TestGmm:
    def test_single_state_equals_bsm(self):
        # one state with mu = -0.5 vol^2 reprices pure BSM
        vol, ttm, f = 0.3, 0.5, 100.0
        strikes = np.linspace(70.0, 140.0, 11)
        types = np.where(strikes >= f, 'C', 'P')
        mu = -0.5 * vol * vol
        prices = np.asarray(compute_gmm_vanilla_price(
            gmm_weights=np.array([1.0]), gmm_mus=np.array([mu]),
            gmm_vols=np.array([vol]), ttm=ttm, forward=f, strike=strikes,
            optiontype=types))
        expected = np.asarray(bsm.compute_bsm_vanilla_price(f, strikes, ttm, vol, types))
        np.testing.assert_allclose(prices, expected, rtol=1e-12)

    def test_martingale_mixture_parity(self):
        # a martingale mixture satisfies put-call parity at the forward
        ttm, f = 0.25, 1.0
        weights = np.array([0.5, 0.5])
        vols = np.array([0.2, 0.6])
        # choose mus so sum w exp((mu+0.5v^2)ttm) = 1 exactly (symmetric construction)
        mus = -0.5 * vols ** 2
        strikes = np.linspace(0.7, 1.4, 8)
        calls = np.asarray(compute_gmm_vanilla_price(weights, mus, vols, ttm, f,
                                                     strikes, np.full(8, 'C')))
        puts = np.asarray(compute_gmm_vanilla_price(weights, mus, vols, ttm, f,
                                                    strikes, np.full(8, 'P')))
        np.testing.assert_allclose(calls - puts, f - strikes, atol=1e-12)

    def test_pdf_normalizes(self):
        params = GmmParams(gmm_weights=np.array([0.4, 0.6]),
                           gmm_mus=np.array([-0.1, 0.05]),
                           gmm_vols=np.array([0.3, 0.7]), ttm=0.5)
        x = np.linspace(-4.0, 4.0, 4001)
        pdf = params.compute_pdf(x)
        assert abs(np.trapezoid(pdf, x) - 1.0) < 1e-6

    @pytest.mark.slow
    def test_gmm_calibration(self):
        chain = get_btc_test_chain_data()
        chain0 = OptionChain.get_slices_as_chain(chain, ids=['1m'])
        pricer = GmmPricer()
        fit = pricer.calibrate_model_params_to_chain_slice(option_chain=chain0,
                                                           n_mixtures=3)
        assert abs(np.sum(fit.gmm_weights) - 1.0) < 1e-6
        mart = np.sum(fit.gmm_weights * np.exp(
            (fit.gmm_mus + 0.5 * fit.gmm_vols ** 2) * fit.ttm)) - 1.0
        assert abs(mart) < 1e-6
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain0, params=fit)
        mids = chain0.get_mid_vols()
        assert np.nanmean(np.abs(ivols[0] - mids[0])) < 0.02


class TestTdistOps:
    def test_cdf_vs_scipy(self):
        x = np.linspace(-2.0, 2.0, 21)
        ours = np.asarray(td.cdf_tdist(x, mu=0.1, vol=0.3, nu=4.0, ttm=0.5))
        ups = 0.3 * np.sqrt(0.5 * 2.0 / 4.0)
        z = (x - 0.1 * 0.5) / ups
        expected = 0.5 * (1.0 + np.sign(z) * (1.0 - scipy_betainc(2.0, 0.5, 4.0 / (z ** 2 + 4.0))))
        np.testing.assert_allclose(ours, expected, atol=1e-10)

    def test_pdf_integrates_cdf(self):
        x = np.linspace(-6.0, 3.0, 30001)
        pdf = np.asarray(td.pdf_tdist(x, mu=0.0, vol=0.4, nu=3.5, ttm=1.0))
        cdf_num = np.cumsum(pdf) * (x[1] - x[0])
        cdf = np.asarray(td.cdf_tdist(x, mu=0.0, vol=0.4, nu=3.5, ttm=1.0))
        np.testing.assert_allclose(cdf_num[-1], cdf[-1], atol=2e-3)

    def test_drift_newton_vs_scipy_fsolve(self):
        vol, nu, ttm, rf = 0.3, 4.0, 0.5, 0.02
        ours = float(td.imply_drift_tdist(rf_rate=rf, vol=vol, nu=nu, ttm=ttm))
        rf_return = np.exp(rf * ttm) - 1.0

        def func(mu):
            mu = float(np.asarray(mu).ravel()[0])
            x_star = -(1.0 + ttm * mu)
            return (mu * ttm
                    - float(td.cdf_tdist(x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm))
                    - float(td.cum_mean_tdist(x_star, mu=0.0, vol=vol, nu=nu, ttm=ttm))
                    - rf_return)

        expected = fsolve(func, x0=rf, xtol=1e-12)[0]
        assert abs(ours - expected) < 1e-9

    def test_price_put_call_parity_at_forward(self):
        # with the implied risk-neutral drift, C - P = df(F - K) approximately
        spot, ttm, vol, nu = 1.0, 0.5, 0.3, 4.0
        strikes = np.linspace(0.7, 1.4, 8)
        calls = np.asarray(td.compute_vanilla_price_tdist(
            spot=spot, strikes=strikes, ttm=ttm, vol=vol, nu=nu,
            optiontypes=np.full(8, 'C'), rf_rate=0.0))
        puts = np.asarray(td.compute_vanilla_price_tdist(
            spot=spot, strikes=strikes, ttm=ttm, vol=vol, nu=nu,
            optiontypes=np.full(8, 'P'), rf_rate=0.0))
        np.testing.assert_allclose(calls - puts, spot - strikes, atol=2e-3)

    def test_implied_vol_roundtrip(self):
        spot, ttm, nu = 1.0, 0.5, 4.0
        vol = 0.35
        strikes = np.array([0.9, 1.0, 1.1])
        prices = td.compute_vanilla_price_tdist(spot=spot, strikes=strikes,
                                                ttm=ttm, vol=vol, nu=nu,
                                                optiontypes=np.full(3, 'C'))
        iv = np.asarray(td.infer_implied_vol_tdist(spot=spot, ttm=ttm,
                                                   strike=strikes,
                                                   given_price=prices, nu=nu))
        np.testing.assert_allclose(iv, vol, atol=1e-8)


class TestTdistPricer:
    def test_chain_prices(self):
        chain = get_spy_test_chain_data()
        chain0 = OptionChain.get_slices_as_chain(chain, ids=[chain.ids[0]])
        pricer = TdistPricer()
        params = TdistParams(drift=0.0, vol=0.2, nu=4.0, ttm=float(chain0.ttms[0]))
        prices = pricer.price_chain(option_chain=chain0, params=params)
        assert np.all(np.asarray(prices[0]) >= 0)

    @pytest.mark.slow
    def test_tdist_calibration(self):
        chain = get_spy_test_chain_data()
        chain0 = OptionChain.get_slices_as_chain(chain, ids=[chain.ids[1]])
        pricer = TdistPricer()
        fit = pricer.calibrate_model_params_to_chain_slice(option_chain=chain0)
        assert 2.01 <= fit.nu <= 20.0
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain0, params=fit)
        mids = chain0.get_mid_vols()
        assert np.nanmean(np.abs(ivols[0] - mids[0])) < 0.03
