"""
Transform-engine oracle: feed the known BSM MGF through the generic Fourier
pricer and compare against the closed form — validates the quadrature
machinery independently of any SV model (the reference's
examples/run_bsm_mgf_pricer.py:17-79 promoted to a pytest).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import stochvolmodels_tpu.ops.bsm as bsm
import stochvolmodels_tpu.ops.mgf as mgf
from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.utils.cplx import Cplx


def bsm_log_mgf(phi_grid: Cplx, ttm: float, vol: float, alpha: float = 1.0) -> Cplx:
    """log MGF of BSM log-return: 0.5 phi (phi + alpha) vol^2 ttm."""
    return phi_grid * (phi_grid + alpha) * (0.5 * ttm * vol * vol)


class TestSimpsonWeights:
    def test_even_length_quirk(self):
        # reference assigns weight 4 to the last point of an even-length grid
        grid = Cplx(np.full(10, -0.5), np.linspace(0.0, 9.0, 10))
        w = np.asarray(mgf.compute_integration_weights(grid))
        h = 1.0
        expected = (h / 3.0) * np.array([1, 4, 2, 4, 2, 4, 2, 4, 2, 4.0])
        np.testing.assert_allclose(w, expected)

    def test_odd_length_standard_simpson(self):
        grid = Cplx(np.full(5, -0.5), np.linspace(0.0, 4.0, 5))
        w = np.asarray(mgf.compute_integration_weights(grid))
        np.testing.assert_allclose(w, (1.0 / 3.0) * np.array([1, 4, 2, 4, 1.0]))

    def test_trapezoid(self):
        grid = Cplx(np.full(4, -0.5), np.array([0.0, 1.0, 2.0, 3.0]))
        w = np.asarray(mgf.compute_integration_weights(grid, is_simpson=False))
        np.testing.assert_allclose(w, np.array([0.5, 1.0, 1.0, 1.0]))


class TestVanillaThroughMgf:
    @pytest.mark.parametrize("ttm,vol", [(1.0, 1.0), (0.25, 0.5), (0.08, 0.9)])
    def test_spot_measure_calls_puts(self, ttm, vol):
        forward = 1.0
        strikes = np.linspace(0.5, 3.0, 19)
        types = np.where(strikes >= forward, 'C', 'P')
        vol_scaler = vol * np.sqrt(min(ttm, 1.0 / 12.0))
        phi_grid = mgf.get_phi_grid(is_spot_measure=True, vol_scaler=vol_scaler)
        log_mgf = bsm_log_mgf(phi_grid, ttm, vol, alpha=1.0)
        prices = np.asarray(mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=forward,
            strikes=strikes, optiontypes=types))
        expected = np.asarray(bsm.compute_bsm_vanilla_price(forward, strikes, ttm, vol, types))
        # quadrature truncation/discretization error on the 1000-pt grid is
        # ~5e-8 at vol=1, ttm=1 (identical in the reference engine)
        np.testing.assert_allclose(prices, expected, atol=1e-6)

    def test_inverse_measure(self):
        ttm, vol, forward = 1.0, 1.0, 1.0
        strikes = np.linspace(0.5, 3.0, 19)
        types = np.full(strikes.shape, 'IC')
        phi_grid = mgf.get_phi_grid(is_spot_measure=False, vol_scaler=vol * np.sqrt(1.0 / 12.0))
        log_mgf = bsm_log_mgf(phi_grid, ttm, vol, alpha=-1.0)
        prices = np.asarray(mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=forward,
            strikes=strikes, optiontypes=types, is_spot_measure=False))
        assert np.all(prices > 0)
        assert np.all(np.diff(prices) < 0)  # inverse calls decrease in strike

    def test_batched_maturities_match_loop(self):
        vol, forward = 0.6, 1.0
        ttms = np.array([0.1, 0.3])
        strikes = np.array([[0.8, 1.0, 1.2], [0.7, 1.0, 1.4]])
        types = np.array([['P', 'C', 'C'], ['P', 'C', 'C']])
        vol_scaler = vol * np.sqrt(1.0 / 12.0)
        phi_grid = mgf.get_phi_grid(vol_scaler=vol_scaler)
        log_mgf = Cplx(
            jnp.stack([bsm_log_mgf(phi_grid, t, vol).re for t in ttms]),
            jnp.stack([bsm_log_mgf(phi_grid, t, vol).im for t in ttms]))
        batched = np.asarray(mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid,
            forwards=np.array([forward, forward]), strikes=strikes,
            optiontypes=types))
        for i, t in enumerate(ttms):
            single = np.asarray(mgf.vanilla_prices_with_mgf_grid(
                log_mgf_grid=bsm_log_mgf(phi_grid, t, vol), phi_grid=phi_grid,
                forwards=forward, strikes=strikes[i], optiontypes=types[i]))
            np.testing.assert_allclose(batched[i], single, rtol=1e-14)


class TestQvarThroughMgf:
    def test_bsm_qvar_options(self):
        # under BSM, QVAR is deterministic = vol^2; calls pay (vol^2 - K)+
        ttm, vol = 1.0, 1.0
        strikes = np.linspace(0.5, 3.0, 19)
        types = np.full(strikes.shape, 'C')
        psi_grid = mgf.get_psi_grid()
        log_mgf = psi_grid * (-(ttm * vol * vol))
        prices = np.asarray(mgf.qvar_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, psi_grid=psi_grid, ttms=ttm,
            strikes=strikes, optiontypes=types, forwards=1.0))
        expected = np.maximum(vol * vol - strikes, 1e-10)
        # deterministic payoff is a step function: transform grid resolves it
        # to ~1e-3 near the kink, better away from it
        away = np.abs(strikes - vol * vol) > 0.2
        np.testing.assert_allclose(prices[away], expected[away], atol=5e-3)


class TestPdfThroughMgf:
    def test_bsm_density(self):
        ttm, vol = 0.5, 0.4
        phi_grid = mgf.get_phi_grid(vol_scaler=vol * np.sqrt(1.0 / 12.0))
        log_mgf = bsm_log_mgf(phi_grid, ttm, vol)
        x = np.linspace(-2.0, 2.0, 401)
        pdf = np.asarray(mgf.pdf_with_mgf_grid(log_mgf_grid=log_mgf,
                                               transform_var_grid=phi_grid,
                                               space_grid=x))
        dx = x[1] - x[0]
        mu = -0.5 * vol * vol * ttm
        sd = vol * np.sqrt(ttm)
        expected = dx * np.exp(-0.5 * ((x - mu) / sd) ** 2) / (sd * np.sqrt(2 * np.pi))
        np.testing.assert_allclose(pdf, expected, atol=1e-6)


class TestDigitalThroughMgf:
    def test_bsm_digital_calls(self):
        import stochvolmodels_tpu.ops.bsm as bsm_mod
        ttm, vol, forward = 0.5, 0.4, 1.0
        strikes = np.linspace(0.7, 1.4, 8)
        types = np.full(8, 'C')
        phi_grid = mgf.get_phi_grid(is_spot_measure=True,
                                    vol_scaler=vol * np.sqrt(1.0 / 12.0))
        log_mgf = bsm_log_mgf(phi_grid, ttm, vol)
        prices = np.asarray(mgf.digital_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=forward,
            strikes=strikes, optiontypes=types, real_phi_negative=True))
        expected = np.asarray(bsm_mod.compute_bsm_digital_price(
            forward, strikes, ttm, vol, types))
        np.testing.assert_allclose(prices, expected, atol=1e-6)

    def test_bsm_digital_puts(self):
        import stochvolmodels_tpu.ops.bsm as bsm_mod
        ttm, vol, forward = 0.5, 0.4, 1.0
        strikes = np.linspace(0.7, 1.4, 8)
        types = np.full(8, 'P')
        phi_grid = mgf.get_phi_grid(is_spot_measure=True,
                                    vol_scaler=vol * np.sqrt(1.0 / 12.0))
        log_mgf = bsm_log_mgf(phi_grid, ttm, vol)
        prices = np.asarray(mgf.digital_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=forward,
            strikes=strikes, optiontypes=types, real_phi_negative=True))
        expected = np.asarray(bsm_mod.compute_bsm_digital_price(
            forward, strikes, ttm, vol, types))
        np.testing.assert_allclose(prices, expected, atol=1e-6)
