"""
Hawkes jump-diffusion: Riccati ODE vs scipy oracle, Fourier pricing sanity,
MC-vs-analytic agreement, risk-premia kernel.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.hawkes_jd import (
    HawkesJDParams,
    HawkesJDPricer,
    hawkesjd_forwards_under_risk_kernel,
    solve_a_ode_grid,
)
from stochvolmodels_tpu.utils.cplx import Cplx

PARAMS = HawkesJDParams()  # BTC daily-frequency defaults


def scipy_riccati(phi, ttm, p: HawkesJDParams):
    def e_p(z):
        return np.exp(-p.shift_p * z) / (1.0 + p.mean_p * z)

    def e_m(z):
        return np.exp(-p.shift_m * z) / (1.0 + p.mean_m * z)

    def rhs(t, a0):
        out = np.zeros(3, dtype=complex)
        j_p = e_p(phi - p.beta1_p * a0[1] - p.beta1_m * a0[2]) - 1.0
        j_m = e_m(phi - p.beta2_p * a0[1] - p.beta2_m * a0[2]) - 1.0
        out[0] = (p.kappa_p * p.theta_p * a0[1] + p.kappa_m * p.theta_m * a0[2]
                  + p.sigma ** 2 * (0.5 * (phi + 1.0) * phi))
        out[1] = j_p - p.kappa_p * a0[1] + p.compensator_p * phi
        out[2] = j_m - p.kappa_m * a0[2] + p.compensator_m * phi
        return out

    return solve_ivp(rhs, (0.0, ttm), np.zeros(3, dtype=complex),
                     rtol=1e-12, atol=1e-14).y[:, -1]


class TestRiccati:
    @pytest.mark.parametrize("p_im", [0.0, 3.0, 20.0])
    def test_rk4_matches_scipy(self, p_im):
        phi = -0.5 + 1j * p_im
        ttm = 0.25
        ref = scipy_riccati(phi, ttm, PARAMS)
        a1 = solve_a_ode_grid(
            phi_grid=Cplx(jnp.array([-0.5]), jnp.array([p_im])),
            ttm=ttm, model_params=PARAMS)
        ours = np.asarray(a1.re)[0] + 1j * np.asarray(a1.im)[0]
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_chained_equals_direct(self):
        phi = Cplx(jnp.array([-0.5]), jnp.array([5.0]))
        a_mid = solve_a_ode_grid(phi_grid=phi, ttm=0.1, model_params=PARAMS)
        a_chained = solve_a_ode_grid(phi_grid=phi, ttm=0.1, model_params=PARAMS,
                                     a_t0=a_mid)
        a_direct = solve_a_ode_grid(phi_grid=phi, ttm=0.2, model_params=PARAMS)
        np.testing.assert_allclose(np.asarray(a_chained.re),
                                   np.asarray(a_direct.re), atol=1e-9)


@pytest.fixture(scope="module")
def chain():
    return get_btc_test_chain_data()


class TestPricing:
    def test_chain_prices_sane(self, chain):
        pricer = HawkesJDPricer()
        prices, ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain, params=PARAMS)
        for p, iv, strikes, types in zip(prices, ivols, chain.strikes_ttms,
                                         chain.optiontypes_ttms):
            assert p.shape == strikes.shape
            assert np.all(p > 0)
            assert np.all(np.isfinite(iv))
            assert np.all((iv > 0.2) & (iv < 2.0))

    def test_put_call_parity(self):
        strikes = np.linspace(0.7, 1.4, 8)
        f, ttm = 1.0, 0.25
        pricer = HawkesJDPricer()
        cc = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                        optiontypes=np.full(8, 'C'))
        cp = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                        optiontypes=np.full(8, 'P'))
        calls = pricer.price_chain(option_chain=cc, params=PARAMS)[0]
        puts = pricer.price_chain(option_chain=cp, params=PARAMS)[0]
        np.testing.assert_allclose(calls - puts, f - strikes, atol=2e-4)

    def test_stationarity_conditions(self):
        assert PARAMS.jump1_cond > 0
        assert PARAMS.jump2_cond > 0

    def test_risk_premia_kernel(self, chain):
        import dataclasses
        params = HawkesJDParams(**{**PARAMS.to_dict(), 'risk_premia_gamma': 0.5})
        normalizers, gamma_forwards = hawkesjd_forwards_under_risk_kernel(
            model_params=params, risk_premia_gamma=0.5, ttms=chain.ttms,
            forwards=chain.forwards)
        assert np.all(normalizers > 0)
        assert np.all(gamma_forwards > 0)
        pricer = HawkesJDPricer()
        prices, ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain, params=params)
        for p in prices:
            assert np.all(np.isfinite(p))


class TestMonteCarlo:
    def test_mc_vs_analytic(self, chain):
        # short slice only (MC at 1800 steps/yr is heavy); agreement within
        # jump-discretization bias + MC error
        chain0 = OptionChain.get_slices_as_chain(chain, ids=['2w'])
        pricer = HawkesJDPricer()
        analytic = pricer.price_chain(option_chain=chain0, params=PARAMS)
        mc_prices, mc_stds = pricer.model_mc_price_chain(
            option_chain=chain0, params=PARAMS, nb_path=100000, seed=11)
        a, m, s = analytic[0], mc_prices[0], mc_stds[0]
        tol = 4.0 * s + 0.02 * np.asarray(a) + 2e-4 * chain0.forwards[0]
        assert np.all(np.abs(a - m) < tol), f"diff={np.abs(a-m)}, tol={tol}"

    def test_martingale(self):
        pricer = HawkesJDPricer()
        x, lam_p, lam_m = pricer.simulate_terminal_values(params=PARAMS,
                                                          ttm=0.25,
                                                          nb_path=100000, seed=2)
        assert abs(np.mean(np.exp(x)) - 1.0) < 0.01
        assert np.all(lam_p >= 0)


class TestOnDeviceLm:
    @pytest.mark.slow
    @pytest.mark.parametrize("use_float32", [False, True])
    def test_lm_calibration_improves_fit(self, chain, use_float32):
        """the one-dispatch LM fit must beat the starting cost and keep the
        jump intensities stationary (jump1_cond + jump2_cond >= 0).  Run in
        both precisions: f32 is the TPU default, and the LogSV episode
        showed f32 ODE stability must be tested, not assumed."""
        from stochvolmodels_tpu.models.hawkes_jd import (
            calibrate_hawkesjd_lm_on_device)

        params0 = HawkesJDParams()
        fit, cost = calibrate_hawkesjd_lm_on_device(
            chain, params0, nb_iters=6, year_steps=360,
            use_float32=use_float32)
        assert np.isfinite(cost)
        # the start cost: weighted ivol SSE at params0
        pricer = HawkesJDPricer()
        vols0 = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                     params=params0)
        mids = chain.get_mid_vols()
        start = float(np.nansum([np.sum(np.square(np.asarray(v) - np.asarray(m)))
                                 for v, m in zip(vols0, mids)]))
        assert cost < start
        assert fit.jump1_cond + fit.jump2_cond >= -1e-6
        assert 0.1 <= fit.sigma <= 2.0
        # fitted surface actually close to market
        vols = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                    params=fit)
        errs = np.concatenate([np.abs(np.asarray(v) - np.asarray(m))
                               for v, m in zip(vols, mids)])
        assert np.nanmean(errs) < 0.05, f"mean IV err {np.nanmean(errs):.4f}"


class TestFastPrecision:
    def test_fast_mode_matches_exact(self, chain):
        """mixed-precision one-program chain reprice (f32 Riccati scans,
        f64 quadrature, expm1 jump MGF) agrees with the f64 host-loop path
        to ~1e-5 relative — the f32-quadrature floor was 4.8e-4
        (PARITY.md "Hawkes fast floor", scripts/hawkes_fast_floor.py)."""
        pricer = HawkesJDPricer()
        params = HawkesJDParams()
        exact = pricer.price_chain(option_chain=chain, params=params)
        fast = pricer.price_chain(option_chain=chain, params=params,
                                  precision="fast")
        for f, e in zip(fast, exact):
            np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                       rtol=1e-4, atol=1e-7)

    def test_fast_fused_ivols_match_exact(self, chain):
        pricer = HawkesJDPricer()
        params = HawkesJDParams()
        exact = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                     params=params)
        fast = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                    params=params,
                                                    precision="fast")
        for f, e in zip(fast, exact):
            f, e = np.asarray(f), np.asarray(e)
            assert np.isnan(f).sum() == np.isnan(e).sum()
            np.testing.assert_allclose(f, e, rtol=1e-4, atol=1e-5)
