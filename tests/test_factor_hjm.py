"""
Factor HJM rates suite: basis identities, measure transforms, DE-quadrature
swaption pricing vs a deterministic-vol oracle, futures convexity, and MC.
"""
import os

import numpy as np
import pytest

from stochvolmodels_tpu.models.factor_hjm.factor_hjm_pricer import calc_mc_vols
from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import UnderlyingType
from stochvolmodels_tpu.models.factor_hjm.rate_factor_basis import (
    Cheyette1D,
    CheyettePEND,
    NelsonSiegel,
)
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_params import (
    MultiFactRateLogSvParams,
    TermStructure,
)
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
    FutSettleType,
    futures_conv_adj,
    logsv_chain_de_pricer,
)
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder
from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid


KEY_TERMS = np.array([1.0, 5.0, 10.0])


@pytest.fixture(autouse=True, scope="class")
def _clear_caches_between_classes():
    """this module compiles many large CPU programs (cube pricers, jacfwd LM
    solves); without dropping executables between classes a single run can
    cross vm.max_map_count and segfault inside LLVM (see conftest.py)."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


def make_basis() -> NelsonSiegel:
    return NelsonSiegel(meanrev=0.25, key_terms=KEY_TERMS)


def make_params(beta_scalar=0.0, volvol=1e-4, sigma0=1.0, theta=1.0,
                kappa1=1.0, kappa2=1.0, vols=0.01) -> MultiFactRateLogSvParams:
    ts = np.array([0.0, 1.0, 2.0, 5.0])
    basis = make_basis()
    beta_vec = np.array([beta_scalar, -0.5 * beta_scalar, 0.0])
    return MultiFactRateLogSvParams(
        sigma0=sigma0, theta=theta, kappa1=kappa1, kappa2=kappa2,
        beta=TermStructure.create_multi_fact_from_vec(ts, beta_vec),
        volvol=TermStructure.create_from_scalar(ts, volvol),
        A=np.array([vols, vols, vols]), R=np.eye(3), basis=basis, ccy="USD")


class TestBases:
    def test_ns_bond_coeffs_integrate_basis(self):
        # d B_P / d tau = B(tau)
        basis = make_basis()
        tau, eps = 2.0, 1e-6
        numeric = (basis.bond_coeffs(tau + eps)[0] - basis.bond_coeffs(tau - eps)[0]) / (2 * eps)
        np.testing.assert_allclose(numeric, basis.get_basis(tau), atol=1e-8)
        numeric_aux = (basis.bond_coeffs(tau + eps)[1] - basis.bond_coeffs(tau - eps)[1]) / (2 * eps)
        np.testing.assert_allclose(numeric_aux, basis.get_aux_basis(tau), atol=1e-8)

    def test_ns_basis_generator(self):
        # B(tau) solves B' = B D with the generating matrix
        basis = make_basis()
        tau, eps = 1.5, 1e-6
        dB = (basis.get_basis(tau + eps) - basis.get_basis(tau - eps)) / (2 * eps)
        np.testing.assert_allclose(dB, basis.get_basis(tau) @ basis.get_generating_matrix(),
                                   atol=1e-8)
        dBa = (basis.get_aux_basis(tau + eps) - basis.get_aux_basis(tau - eps)) / (2 * eps)
        np.testing.assert_allclose(dBa, basis.get_aux_basis(tau) @ basis.get_aux_generating_matrix(),
                                   atol=1e-7)

    def test_cheyette1d_bond(self):
        basis = Cheyette1D(meanrev=0.1)
        b = basis.bond(0.0, 5.0, np.array([0.0]), np.array([0.0]), ccy="USD")
        assert 0.5 < float(np.asarray(b).ravel()[0]) < 1.0

    def test_pend_basis(self):
        basis = CheyettePEND(mrv0=0.1, mrv_delta=0.2, key_terms=KEY_TERMS)
        assert basis.get_aux_basis(0.5).size == basis.nb_aux_factors
        M = np.eye(3) * 0.01
        assert basis.calc_Omega(M).shape == (basis.nb_aux_factors,)

    def test_swap_rate_positive(self):
        basis = make_basis()
        ts_sw = np.arange(1.0, 6.1, 1.0)
        s0, s1 = basis.swap_rate(0.0, ts_sw, np.zeros(3), np.zeros(8), ccy="USD")
        assert 0.0 < float(np.asarray(s0).ravel()[0]) < 0.2


class TestMeasureTransforms:
    def test_qa_transform_shapes(self):
        params = make_params(beta_scalar=0.2, volvol=0.5)
        expiry, tenor = 1.0, 5.0
        t_grid = generate_ttms_grid(np.array([expiry]))
        a, k0, k1, k2, beta, volvol, ts_sw = params.transform_QA_params(
            expiry=expiry, tenor=tenor, t_grid=t_grid)
        n = t_grid.size
        assert a.shape == (n, 3) and k0.shape == (n,)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(k2))
        assert params.check_QA_kappa2(expiry=expiry, tenor=tenor)

    def test_qt_transform_shapes(self):
        params = make_params(beta_scalar=0.2, volvol=0.5)
        expiry = 1.0
        t_grid = generate_ttms_grid(np.array([expiry]))
        out = params.transform_QT_params(expiry=expiry, t_start=expiry,
                                         t_end=expiry + 0.25, t_grid=t_grid)
        assert out[0].shape == (t_grid.size, 3)
        assert params.check_QT_kappa2(t_start=expiry)


class TestSwaptionPricing:
    @pytest.mark.slow
    def test_deterministic_vol_oracle(self):
        # beta = 0, volvol ~ 0, sigma0 = theta: the SV driver is frozen at 1,
        # the swap rate is Gaussian, and the DE pricer must return the flat
        # normal vol sqrt(int a.a dt / ttm) per tenor
        params = make_params(beta_scalar=0.0, volvol=1e-4)
        expiry = 1.0
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
        prices, ivols = logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=np.array([expiry]),
            forwards=[np.array([0.043]) for _ in KEY_TERMS],
            strikes_ttms=[[np.array([0.035, 0.043, 0.05])] for _ in KEY_TERMS],
            optiontypes_ttms=[np.repeat('C', 3)],
            expansion_order=ExpansionOrder.FIRST)
        for idx_tenor, tenor in enumerate(KEY_TERMS):
            a, *_ = params.transform_QA_params(expiry=expiry, tenor=tenor,
                                               t_grid=t_grid)
            apa = np.einsum('td,td->t', a, a)
            expected = np.sqrt(np.trapezoid(apa, t_grid) / expiry)
            iv = np.asarray(ivols[idx_tenor][0])
            np.testing.assert_allclose(iv, expected, rtol=2e-2)

    @pytest.mark.slow
    def test_sv_swaption_vs_mc(self):
        # non-trivial SV params: DE analytic ivols vs MC within loose bands;
        # forward = the model-consistent par swap rate
        from stochvolmodels_tpu.utils.rate_core import get_default_swap_term_structure
        params = make_params(beta_scalar=0.15, volvol=0.6, kappa1=2.0, kappa2=2.0)
        expiry = 1.0
        tenor = KEY_TERMS[0]
        ts_sw = get_default_swap_term_structure(expiry, tenor)
        f0 = float(np.asarray(params.basis.swap_rate(
            0.0, ts_sw, np.zeros(3), np.zeros(8), ccy="USD")[0]).ravel()[0])
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
        strikes = np.array([f0 - 0.008, f0, f0 + 0.008])
        prices, ivols = logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=np.array([expiry]),
            forwards=[np.array([f0]) for _ in KEY_TERMS],
            strikes_ttms=[[strikes] for _ in KEY_TERMS],
            optiontypes_ttms=[np.repeat('C', 3)],
            expansion_order=ExpansionOrder.FIRST)
        _, mc_vols, mc_up, mc_down = calc_mc_vols(
            basis_type="NELSON-SIEGEL", params=params, ttm=expiry,
            tenors=KEY_TERMS[:1], forwards=[np.array([f0])],
            strikes_ttms=[[strikes]], optiontypes=np.repeat('C', 3),
            is_annuity_measure=False, nb_path=50000, seed=42)
        analytic = np.asarray(ivols[0][0]).ravel()
        mc = np.asarray(mc_vols[0]).ravel()
        # first-order expansion + frozen drift + MC error: ~10% relative band
        np.testing.assert_allclose(analytic, mc, rtol=0.1)


class TestDifferentiableSwaptionPricer:
    """fixed tanh-sinh panel path (make_swaption_slice_fn): price agreement
    with the adaptive DE pricer and gradient support — the reference's
    pricing path has neither (double_exp_pricer.py:20-72 refines on host)."""

    def _fn_and_inputs(self):
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_slice_fn,
        )
        params = make_params(beta_scalar=0.2, volvol=0.5, sigma0=1.0)
        ttm = 1.0
        t_grid = generate_ttms_grid(np.array([ttm]))
        strikes = np.array([-0.01, 0.0, 0.01])
        fn = make_swaption_slice_fn(params, t_grid, ttm=ttm, tenor=1.0,
                                    forward=0.0, strikes=strikes)
        args = (jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs),
                jnp.asarray(params.volvol.xs))
        return params, t_grid, ttm, strikes, fn, args

    def test_grad_finite(self):
        import jax
        _, _, _, _, fn, args = self._fn_and_inputs()
        prices = np.asarray(fn(*args))
        # regression values from the adaptive DE pricer on the same config
        # (agreement 4e-6 abs, i.e. ~0.04bp of forward)
        np.testing.assert_allclose(
            prices, [0.0109204, 0.00408582, 0.00092429], atol=2e-5)
        grads = jax.grad(lambda s0, b, v: fn(s0, b, v)[1],
                         argnums=(0, 1, 2))(*args)
        assert np.isfinite(float(grads[0]))
        assert np.all(np.isfinite(np.asarray(grads[1])))
        assert np.all(np.isfinite(np.asarray(grads[2])))
        # vega and d/d(beta of the live interval) must actually be nonzero
        assert abs(float(grads[0])) > 1e-6
        assert np.any(np.abs(np.asarray(grads[1])[0]) > 1e-9)

    @pytest.mark.slow
    def test_matches_adaptive_de_pricer(self):
        params, t_grid, ttm, strikes, fn, args = self._fn_and_inputs()
        prices_ad, _ = logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=np.array([ttm]),
            forwards=[np.array([0.0]) for _ in KEY_TERMS],
            strikes_ttms=[[strikes] for _ in KEY_TERMS],
            optiontypes_ttms=[np.repeat('C', 3)],
            expansion_order=ExpansionOrder.FIRST)
        np.testing.assert_allclose(np.asarray(fn(*args)),
                                   np.asarray(prices_ad[0][0]).ravel(),
                                   atol=1e-5)


class TestFuturesConvexity:
    def test_conv_adj_runs(self):
        params = make_params(beta_scalar=0.1, volvol=0.3)
        b1, b2, h1, h2, h0 = futures_conv_adj(
            t_start=1.0, basis_type="NELSON-SIEGEL", params=params, t0=0.0,
            Delta=0.25, settlement_type=FutSettleType.EURODOLLAR,
            expansion_order=ExpansionOrder.ZERO)
        assert np.all(np.isfinite(b1)) and np.all(np.isfinite(b2))
        assert np.isfinite(h1) and np.isfinite(h0)

    @pytest.mark.slow
    def test_futures_option_pricing(self):
        params = make_params(beta_scalar=0.1, volvol=0.3)
        expiry = 1.0
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
        f0 = 0.045
        strikes = np.array([0.04, 0.045, 0.05])
        prices, ivols = logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=np.array([expiry]),
            forwards=[np.array([f0])], strikes_ttms=[[strikes]],
            optiontypes_ttms=[np.repeat('C', 3)],
            underlying_type=UnderlyingType.FUTURES,
            expansion_order=ExpansionOrder.FIRST)
        iv = np.asarray(ivols[0][0])
        assert np.all(np.isfinite(iv))
        assert np.all((iv > 0.001) & (iv < 0.05))


class TestTermStructure:
    def test_pw_const(self):
        ts = TermStructure(ts=np.array([0.0, 1.0, 2.0]), xs=np.array([0.1, 0.2]))
        assert ts.pw_const(0.5) == 0.1
        assert ts.pw_const(1.5) == 0.2
        np.testing.assert_allclose(ts.interpolate(np.array([0.5, 1.5])), [0.1, 0.2])

    def test_multifact(self):
        ts = TermStructure.create_multi_fact_from_vec(
            np.array([0.0, 1.0, 2.0]), np.array([0.1, 0.2, 0.3]))
        assert ts.xs.shape == (2, 3)


class TestFuturesMC:
    @pytest.mark.slow
    def test_futures_mc_vs_de_pricer(self):
        """terminal futures rates simulated under Q^T reproduce the
        DE-quadrature normal smile within MC error (~1.5bp at 50k paths)."""
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            FutSettleType,
            calc_futures_mc_vols,
            logsv_chain_de_pricer,
        )
        from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
            UnderlyingType,
        )
        nelson_siegel = NelsonSiegel(meanrev=0.55, key_terms=np.array([2.0, 5.0, 10.0]))
        ttm = 75.0 / 365.0
        times = np.array([0.0, ttm])
        params = MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=0.5, kappa2=1.0,
            beta=TermStructure.create_multi_fact_from_vec(
                times, 0.2 * np.ones(3)),
            volvol=TermStructure.create_from_scalar(times, 0.35),
            A=np.array([0.012, 0.011, 0.010])[None, :] * np.ones((1, 1)),
            R=np.array([[1.0, 0.99, 0.97], [0.99, 1.0, 0.98], [0.97, 0.98, 1.0]]),
            basis=nelson_siegel, ccy="USD_NS", vol_interpolation="BY_YIELD")
        params.q = params.theta
        t_start, t_end = ttm, ttm + 0.25
        strikes = np.array([0.052, 0.057, 0.062])
        f0_mc, mc_vols, _ = calc_futures_mc_vols(
            params, ttm, t_start, t_end, strikes=strikes,
            optiontypes=np.array(['C', 'C', 'C']), nb_path=50000, seed=42)
        t_grid = generate_ttms_grid(np.array([ttm]))
        _, ivols = logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=np.array([ttm]),
            forwards=[np.array([f0_mc])], strikes_ttms=[[strikes]],
            optiontypes_ttms=[np.repeat('C', 3)],
            underlying_type=UnderlyingType.FUTURES,
            settlement_type=FutSettleType.EURODOLLAR)
        de_vols = np.asarray(ivols[0][0]).ravel()
        np.testing.assert_allclose(mc_vols, de_vols, atol=2.5e-4)


class TestOnDeviceRateCalibration:
    """on-device LM bootstrap of the (beta, volvol) term structure — beyond
    the reference, which ships only pre-fitted factor-HJM parameters
    (papers calibration_fig_5_6_7.py:171-215)."""

    @pytest.mark.slow
    def test_lm_recovers_known_smile(self):
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            calibrate_rate_logsv_lm_on_device,
        )
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_slice_fn,
        )
        from stochvolmodels_tpu.ops.bachelier import infer_normal_implied_vol

        def mk(beta_vec, volvol):
            ts = np.array([0.0, 1.0, 2.0, 5.0])
            return MultiFactRateLogSvParams(
                sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
                beta=TermStructure.create_multi_fact_from_vec(
                    ts, np.asarray(beta_vec)),
                volvol=TermStructure.create_from_scalar(ts, volvol),
                A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
                basis=make_basis(), ccy="USD")

        true = mk([0.3, -0.15, 0.05], 0.45)
        expiry, tenors = 1.0, [1.0, 5.0]
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
        strikes = np.array([-0.012, -0.006, 0.0, 0.006, 0.012])
        market = []
        for tenor in tenors:
            fn = make_swaption_slice_fn(true, t_grid, ttm=expiry, tenor=tenor,
                                        forward=0.0, strikes=strikes)
            px = fn(jnp.asarray(1.0), jnp.asarray(true.beta.xs),
                    jnp.asarray(true.volvol.xs))
            market.append(np.asarray(infer_normal_implied_vol(
                forward=0.0, ttm=expiry, strike=strikes, given_price=px)))

        start = mk([0.1, 0.1, 0.1], 0.2)
        fit, cost = calibrate_rate_logsv_lm_on_device(
            start, t_grid, expiry=expiry, idx=0, tenors=tenors,
            forwards=[0.0, 0.0], strikes_tenors=[strikes] * 2,
            market_ivols_tenors=market, nb_iters=30)
        # exact-recovery problem: the LM drives the ivol residuals to ~0
        assert cost < 1e-10
        np.testing.assert_allclose(fit.beta.xs[0], [0.3, -0.15, 0.05],
                                   atol=2e-3)
        assert abs(fit.volvol.xs[0] - 0.45) < 2e-3
        # untouched segments stay at the start values (bootstrap contract)
        np.testing.assert_allclose(fit.beta.xs[1:], start.beta.xs[1:])

    @pytest.mark.slow
    def test_term_structure_bootstrap_runs(self):
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            calibrate_rate_logsv_term_structure,
        )
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_slice_fn,
        )
        from stochvolmodels_tpu.ops.bachelier import infer_normal_implied_vol

        ts = np.array([0.0, 1.0, 2.0, 5.0])
        true = MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
            beta=TermStructure(ts=ts, xs=np.array([[0.25, -0.1, 0.0],
                                                   [0.1, 0.05, -0.05],
                                                   [0.0, 0.0, 0.0]])),
            volvol=TermStructure(ts=ts, xs=np.array([0.4, 0.3, 0.3])),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
            basis=make_basis(), ccy="USD")
        expiries, tenor = [1.0, 2.0], 5.0
        strikes = np.array([-0.008, 0.0, 0.008])
        market_rows = []
        for expiry in expiries:
            t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
            fn = make_swaption_slice_fn(true, t_grid, ttm=expiry, tenor=tenor,
                                        forward=0.0, strikes=strikes)
            px = fn(jnp.asarray(1.0), jnp.asarray(true.beta.xs),
                    jnp.asarray(true.volvol.xs))
            market_rows.append([np.asarray(infer_normal_implied_vol(
                forward=0.0, ttm=expiry, strike=strikes, given_price=px))])

        start = MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
            beta=TermStructure.create_multi_fact_from_vec(
                ts, np.array([0.05, 0.05, 0.05])),
            volvol=TermStructure.create_from_scalar(ts, 0.2),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
            basis=make_basis(), ccy="USD")
        fit, costs = calibrate_rate_logsv_term_structure(
            start, expiries=expiries, tenors=[tenor],
            forwards_expiries=[[0.0], [0.0]],
            strikes_expiries=[[strikes], [strikes]],
            market_ivols_expiries=market_rows, t_grid_pts=21, nb_iters=24)
        # each bootstrap step reprices its own expiry's smile to ~0
        assert all(c < 1e-8 for c in costs)
        # 3 strikes x 1 tenor under-determines the 4-vector; assert the
        # repriced smiles, not the raw parameters
        for expiry, row in zip(expiries, market_rows):
            t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)
            fn = make_swaption_slice_fn(fit, t_grid, ttm=expiry, tenor=tenor,
                                        forward=0.0, strikes=strikes)
            px = fn(jnp.asarray(1.0), jnp.asarray(fit.beta.xs),
                    jnp.asarray(fit.volvol.xs))
            iv = np.asarray(infer_normal_implied_vol(
                forward=0.0, ttm=expiry, strike=strikes, given_price=px))
            np.testing.assert_allclose(iv, row[0], atol=1e-5)


class TestSwaptionCubePricer:
    """batched whole-cube pricer (make_swaption_cube_fn): every
    (expiry, tenor) slice in one vmap(scan) program."""

    def _true_params(self):
        ts = np.array([0.0, 1.0, 2.0, 5.0])
        return MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
            beta=TermStructure(ts=ts, xs=np.array([[0.25, -0.1, 0.0],
                                                   [0.1, 0.05, -0.05],
                                                   [0.0, 0.0, 0.0]])),
            volvol=TermStructure(ts=ts, xs=np.array([0.4, 0.3, 0.3])),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
            basis=make_basis(), ccy="USD")

    def test_cube_matches_slice_pricer(self):
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn,
            make_swaption_slice_fn,
        )
        params = self._true_params()
        slices = [(1.0, 1.0), (1.0, 5.0), (2.0, 5.0)]
        strikes = [np.array([-0.01, 0.0, 0.01]),
                   np.array([-0.012, -0.006, 0.0, 0.006, 0.012]),
                   np.array([-0.01, 0.0, 0.01, 0.02])]
        fwds = [0.0, 0.0, 0.0]
        cube_fn, mask = make_swaption_cube_fn(params, slices, fwds, strikes,
                                              year_steps=180)
        args = (jnp.asarray(1.0), jnp.asarray(params.beta.xs),
                jnp.asarray(params.volvol.xs))
        cube_px = np.asarray(cube_fn(*args))
        assert cube_px.shape == (3, 5)
        np.testing.assert_array_equal(
            np.asarray(mask),
            [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 1, 1, 1, 0]])
        for p, (expiry, tenor) in enumerate(slices):
            t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=31)
            fn = make_swaption_slice_fn(params, t_grid, ttm=expiry,
                                        tenor=tenor, forward=0.0,
                                        strikes=strikes[p])
            ref = np.asarray(fn(*args))
            # shared-S cube uses a different (finer/equal) dt per slice than
            # the slice pricer's 360/yr — RK4 is converged to ~1e-13 here
            np.testing.assert_allclose(cube_px[p, :len(strikes[p])], ref,
                                       atol=1e-10)

    def test_cube_second_order_expansion(self):
        """ExpansionOrder.SECOND through the batched cube: off-sigma0 start
        so the higher-order (sigma0-theta) terms matter; orders agree to
        ~0.2% and differ measurably (the y^3/y^4 corrections are active)."""
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn,
        )
        params = self._true_params()
        params.update_params(idx=0, sigma0=1.05)
        slices = [(1.0, 1.0), (2.0, 5.0)]
        strikes = [np.array([-0.01, 0.0, 0.01])] * 2
        args = (jnp.asarray(1.05), jnp.asarray(params.beta.xs),
                jnp.asarray(params.volvol.xs))
        fn1, _ = make_swaption_cube_fn(params, slices, [0.0, 0.0], strikes,
                                       year_steps=120)
        fn2, _ = make_swaption_cube_fn(params, slices, [0.0, 0.0], strikes,
                                       year_steps=120,
                                       expansion_order=ExpansionOrder.SECOND)
        p1, p2 = np.asarray(fn1(*args)), np.asarray(fn2(*args))
        assert np.all(np.isfinite(p2)) and np.all(p2 > 0)
        rel = np.abs(p2 - p1) / p1
        assert np.max(rel) < 5e-3
        assert np.max(rel) > 1e-5


    @pytest.mark.slow
    def test_joint_cube_lm_reprices_market(self):
        import jax.numpy as jnp
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            calibrate_rate_logsv_cube_lm_on_device,
        )
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn,
        )
        from stochvolmodels_tpu.ops.bachelier import infer_normal_implied_vol

        true = self._true_params()
        slices = [(1.0, 1.0), (1.0, 5.0), (2.0, 1.0), (2.0, 5.0)]
        strikes = [np.array([-0.012, -0.006, 0.0, 0.006, 0.012])] * 4
        fwds = [0.0] * 4
        fn, _ = make_swaption_cube_fn(true, slices, fwds, strikes,
                                      year_steps=180)
        px = np.asarray(fn(jnp.asarray(1.0), jnp.asarray(true.beta.xs),
                           jnp.asarray(true.volvol.xs)))
        market = [np.asarray(infer_normal_implied_vol(
            forward=0.0, ttm=e, strike=strikes[p], given_price=px[p, :5]))
            for p, (e, _) in enumerate(slices)]

        ts = np.array([0.0, 1.0, 2.0, 5.0])
        start = MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
            beta=TermStructure.create_multi_fact_from_vec(
                ts, np.array([0.05, 0.05, 0.05])),
            volvol=TermStructure.create_from_scalar(ts, 0.2),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
            basis=make_basis(), ccy="USD")
        fit, cost = calibrate_rate_logsv_cube_lm_on_device(
            start, slices, fwds, strikes, market, nb_iters=40,
            year_steps=180)
        # 20 quotes, 8 free params: joint LM reprices the cube to ~0
        assert cost < 1e-10
        # segment (2y, 5y] has no quotes -> default segment selection must
        # leave it at the start value
        np.testing.assert_allclose(fit.beta.xs[2], start.beta.xs[2])
        assert fit.volvol.xs[2] == start.volvol.xs[2]


class TestRateLogSVPricerCalibration:
    @pytest.mark.slow
    def test_pricer_calibrate_to_chain(self):
        """ModelPricer-level entry: RateLogSVPricer.calibrate_model_params_to_chain
        runs the joint cube LM over a SwOptionChain (reduced USD cube)."""
        from papers.sv_for_factor_hjm.calibration_fig_5_6_7 import (
            get_calib_rate_logsv_params,
            get_swaption_data,
        )
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            RateLogSVPricer,
        )

        chain = get_swaption_data("USD")
        start = get_calib_rate_logsv_params()["USD"]
        for idx in range(start.beta.xs.shape[0]):
            start.beta.xs[idx, :] = np.array([0.1, 0.0, 0.0])
            start.volvol.xs[idx] = 0.1
        fit, cost = RateLogSVPricer().calibrate_model_params_to_chain(
            chain, start, max_expiry=2.0, nb_iters=10, year_steps=90)
        assert np.isfinite(cost)
        # the 1y and 2y segments moved off the flat start
        assert not np.allclose(fit.beta.xs[0], start.beta.xs[0])
        assert fit.volvol.xs[0] != start.volvol.xs[0]


class TestDLNSkewMC:
    """displaced-log-normal skew branch of the joint factor-HJM simulation
    (reference rate_logsv_pricer.py:1001-1023)."""

    @staticmethod
    def _dln_params(vols=0.01):
        """frozen SV driver: betas/volvols/kappas ~ 0, sigma0 = 1."""
        ts = np.array([0.0, 1.0, 2.0, 5.0])
        return MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=0.0, kappa2=0.0,
            beta=TermStructure.create_multi_fact_from_vec(ts, np.zeros(3)),
            volvol=TermStructure.create_from_scalar(ts, 0.0),
            A=np.array([vols, vols, vols]), R=np.eye(3),
            basis=make_basis(), ccy="USD")

    def test_zero_b_matches_standard_branch(self):
        """with b = 0 the per-path DLN factor vols collapse to the constant
        C(t) panels, so the DLN scan must reproduce the standard scan on the
        same threefry stream."""
        from stochvolmodels_tpu.models.factor_hjm.factor_hjm_pricer import (
            do_mc_simulation,
        )

        params = self._dln_params()
        nb_path = 256
        common = dict(basis_type="NELSON-SIEGEL", ccy="USD",
                      ttms=np.array([0.5]),
                      x0=np.zeros((nb_path, 3)), y0=np.zeros((nb_path, 8)),
                      I0=np.zeros(nb_path), sigma0=np.ones((nb_path, 1)),
                      params=params, nb_path=nb_path, seed=7)
        xs_std, ys_std, Is_std, _ = do_mc_simulation(**common)
        xs_dln, ys_dln, Is_dln, _ = do_mc_simulation(bxs=np.zeros(3), **common)
        np.testing.assert_allclose(xs_dln[-1], xs_std[-1], atol=1e-12)
        np.testing.assert_allclose(ys_dln[-1], ys_std[-1], atol=1e-12)
        np.testing.assert_allclose(Is_dln[-1], Is_std[-1], atol=1e-12)

    def test_matches_reference_oracle_at_matched_randoms(self):
        """inject the same normal draws into our jitted scan and the
        reference's numpy loop (via the W hook both share) and require the
        terminal states to agree to solver roundoff."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from reference_oracle import load_reference

        load_reference()
        from _ref_stochvolmodels.pricers.factor_hjm import (
            rate_factor_basis as ref_basis_mod,
        )
        from _ref_stochvolmodels.pricers.factor_hjm import (
            rate_logsv_params as ref_params_mod,
        )
        from _ref_stochvolmodels.pricers.factor_hjm import (
            rate_logsv_pricer as ref_rp,
        )

        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            Measure,
            simulate_logsv_MF,
        )

        nb_path, ttm, bvec = 64, 0.5, np.array([0.5, 0.2, -0.3])
        params = self._dln_params()
        nb_steps = int(ttm * 360) + 1  # set_time_grid contract
        rng = np.random.default_rng(3)
        W0 = rng.standard_normal((nb_steps, nb_path, 3))
        W1 = rng.standard_normal((nb_steps, nb_path))

        ref_ts = np.array([0.0, 1.0, 2.0, 5.0])
        ref_basis = ref_basis_mod.NelsonSiegel(meanrev=0.25, key_terms=KEY_TERMS)
        ref_params = ref_params_mod.MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=0.0, kappa2=0.0,
            beta=ref_params_mod.TermStructure.create_multi_fact_from_vec(
                ref_ts, np.zeros(3)),
            volvol=ref_params_mod.TermStructure.create_from_scalar(ref_ts, 0.0),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3), basis=ref_basis,
            ccy="USD", vol_interpolation="BY_YIELD")

        def fresh_state():
            # the reference loop mutates x0 in place — never share arrays
            return dict(x0=np.zeros((nb_path, 3)), y0=np.zeros((nb_path, 8)),
                        I0=np.zeros(nb_path), sigma0=np.ones((nb_path, 1)))

        common = dict(ttms=np.array([ttm]),
                      theta=1.0, kappa1=0.0, kappa2=0.0,
                      betaxs=params.beta.xs, volvolxs=params.volvol.xs,
                      ts_sw=None, T_fwd=None, ccy="USD", nb_path=nb_path,
                      bxs=bvec)
        r_xs, r_ys, r_Is, r_sigmas = ref_rp.simulate_logsv_MF(
            ts=ref_params.ts, A=ref_params.A, R=ref_params.R, C=ref_params.C,
            Omega=ref_params.Omega, basis=ref_basis,
            measure_type=ref_rp.Measure.RISK_NEUTRAL, W=[W0, W1],
            params0=ref_params, **fresh_state(), **common)
        o_xs, o_ys, o_Is, o_sigmas = simulate_logsv_MF(
            ts=params.ts, A=params.A, R=params.R, C=params.C,
            Omega=params.Omega, basis=params.basis,
            measure_type=Measure.RISK_NEUTRAL, W=(W0, W1),
            **fresh_state(), **common)

        np.testing.assert_allclose(o_xs[-1], r_xs[-1], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(o_ys[-1], r_ys[-1], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(o_Is[-1], r_Is[-1], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.ravel(o_sigmas[-1]),
                                   np.ravel(r_sigmas[-1]), rtol=1e-12)

    @pytest.mark.slow
    def test_dln_skew_shifts_smile(self):
        """a positive DLN displacement must tilt the MC swaption smile the
        displaced-log-normal way: higher normal vols for high strikes, and a
        skew slope growing with b (reference has no analytic DLN pricer; the
        sign/monotonicity of the smile tilt is the model-level contract)."""
        params = self._dln_params(vols=0.01)
        ttm, tenor = 1.0, 5.0
        fwd = 0.043
        strikes = np.array([fwd - 0.01, fwd, fwd + 0.01])

        def smile(bvec):
            _, vols, _, _ = calc_mc_vols(
                basis_type="NELSON-SIEGEL", params=params, ttm=ttm,
                tenors=np.array([tenor]), forwards=[np.array([fwd])],
                strikes_ttms=[[strikes]], optiontypes=np.array(['P', 'C', 'C']),
                is_annuity_measure=False, nb_path=16384, seed=11, bxs=bvec)
            return vols[0]

        # measured at seed 11: skews 0.0014 / 0.0044 / 0.0071, MC stderr ~5e-4
        v0 = smile(np.zeros(3))
        v1 = smile(np.full(3, 0.25))
        v2 = smile(np.full(3, 0.5))
        skew0 = v0[2] - v0[0]
        skew1 = v1[2] - v1[0]
        skew2 = v2[2] - v2[0]
        # DLN displacement adds positive skew, growing with b, well beyond
        # the MC error; the vol level also rises with the displacement
        assert skew1 > skew0 + 1.5e-3
        assert skew2 > skew1 + 1.5e-3
        assert v1[1] > v0[1] and v2[1] > v1[1]


class TestOdeTemplates:
    """the template-based RK4 stage rhs (no scatters inside the scan) is
    bit-equivalent to assembling (M, L, H) via _rates_ode_terms."""

    def test_template_rhs_matches_scatter_rhs(self):
        import jax.numpy as jnp

        from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
            _ode_rhs, _ode_rhs_from_templates, _rates_ode_templates,
            _rates_ode_terms)
        from stochvolmodels_tpu.utils.cplx import Cplx

        rng = np.random.default_rng(0)
        scales = np.array([0.5, 1.0, 1.0, 0.3, 0.2, 0.1, 0.05])
        for n in (3, 5):
            q = 1.07
            for _ in range(3):
                c = jnp.asarray(rng.normal(size=7) * scales)
                phi = Cplx(jnp.full(11, -0.5),
                           jnp.asarray(np.linspace(0.0, 40.0, 11)))
                A = Cplx(jnp.asarray(rng.normal(size=(11, n)) * 0.3),
                         jnp.asarray(rng.normal(size=(11, n)) * 0.3))
                M, L, H = _rates_ode_terms(q, c, phi, n)
                r1 = _ode_rhs(A, M, L, H)
                r2 = _ode_rhs_from_templates(A, phi, c,
                                             _rates_ode_templates(q, n))
                np.testing.assert_allclose(np.asarray(r1.re),
                                           np.asarray(r2.re),
                                           rtol=1e-13, atol=1e-14)
                np.testing.assert_allclose(np.asarray(r1.im),
                                           np.asarray(r2.im),
                                           rtol=1e-13, atol=1e-14)
