"""
LogSV model: ODE tensor parity with the paper formulas, integrator accuracy
vs scipy, analytic-vs-MC agreement, QVAR consistency, vol moments, pdfs,
and calibration gradient flow.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.logsv import affine as afe
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.pricer import (
    LOGSV_BTC_PARAMS,
    CalibrationEngine,
    LogsvModelCalibrationType,
    LogSVPricer,
    logsv_pdfs,
)
from stochvolmodels_tpu.models.logsv.vol_moments import (
    compute_analytic_qvar,
    compute_analytic_qvar_jnp,
    compute_expected_vol_t,
    fit_model_vol_backbone_to_varswaps,
)
from stochvolmodels_tpu.utils.cplx import Cplx

PARAMS = LOGSV_BTC_PARAMS


def _ode_terms_np(theta, kappa1, kappa2, beta, volvol, phi, psi,
                  is_spot_measure=True):
    """independent numpy assembly of (M, L, H) from Eqs. (4.17)/(4.25)."""
    M, L0, L1, h = afe.func_a_ode_quadratic_terms(
        theta, kappa1, kappa2, beta, volvol, is_spot_measure=is_spot_measure,
        expansion_order=afe.ExpansionOrder.SECOND)
    M, L0, L1, h = map(np.asarray, (M, L0, L1, h))
    L = L0 + phi * L1
    p = 1.0 if is_spot_measure else -1.0
    H = h * (phi * (phi + p) - 2.0 * psi)
    return M, L, H


class TestOdeSolver:
    @pytest.mark.parametrize("is_spot", [True, False])
    @pytest.mark.parametrize("p_im", [0.0, 2.0, 15.0])
    def test_rk4_matches_scipy(self, is_spot, p_im):
        theta, kappa1, kappa2, beta, volvol = (PARAMS.theta, PARAMS.kappa1,
                                               PARAMS.kappa2, PARAMS.beta,
                                               PARAMS.volvol)
        phi = (-0.5 if is_spot else 0.5) + 1j * p_im
        ttm = 0.43
        M, L, H = _ode_terms_np(theta, kappa1, kappa2, beta, volvol, phi, 0.0,
                                is_spot_measure=is_spot)

        def rhs(t, A):
            quad = np.array([A @ M[k] @ A for k in range(5)])
            return quad + L @ A + H

        ref = solve_ivp(rhs, (0.0, ttm), np.zeros(5, dtype=complex),
                        rtol=1e-12, atol=1e-14).y[:, -1]

        a1 = afe.solve_a_ode_grid(
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
            volvol=volvol,
            phi_grid=Cplx(jnp.array([np.real(phi)]), jnp.array([np.imag(phi)])),
            psi_grid=Cplx(jnp.array([0.0]), jnp.array([0.0])),
            a_t0=Cplx(jnp.zeros((1, 5)), jnp.zeros((1, 5))),
            is_spot_measure=is_spot, expansion_order=afe.ExpansionOrder.SECOND)
        ours = np.asarray(a1.re)[0] + 1j * np.asarray(a1.im)[0]
        np.testing.assert_allclose(ours, ref, atol=5e-8)

    @pytest.mark.slow
    @pytest.mark.parametrize("theta_seed", [100.0, 600.0])
    @pytest.mark.parametrize("p_im", [2.0, 15.0])
    def test_stiff_matrix_vs_scipy_bdf(self, theta_seed, p_im):
        # SIGMA-density-style seed A1(0) = -Theta with |Theta| up to 600 at
        # long ttm: the initial transient is stiff; is_stiff_solver=True must
        # track scipy BDF (the reference's switch, affine_expansion.py:294)
        theta, kappa1, kappa2, beta, volvol = (PARAMS.theta, PARAMS.kappa1,
                                               PARAMS.kappa2, PARAMS.beta,
                                               PARAMS.volvol)
        phi = -0.5 + 1j * p_im
        ttm = 2.0
        a0 = np.zeros(5, dtype=complex)
        a0[1] = -theta_seed
        M, L, H = _ode_terms_np(theta, kappa1, kappa2, beta, volvol, phi, 0.0)

        def rhs(t, A):
            quad = np.array([A @ M[k] @ A for k in range(5)])
            return quad + L @ A + H

        ref = solve_ivp(rhs, (0.0, ttm), a0, method="BDF",
                        rtol=1e-10, atol=1e-12).y[:, -1]
        sol = afe.solve_ode_for_a(
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
            volvol=volvol, phi=phi, psi=0.0, a_t0=a0,
            expansion_order=afe.ExpansionOrder.SECOND, is_stiff_solver=True)
        np.testing.assert_allclose(sol.y[:, -1], ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("p_im", [0.0, 2.0, 15.0])
    def test_semi_analytic_scheme_matches_scipy(self, p_im):
        # the exponential-Euler fixed-point path (reference's is_analytic
        # selector, affine_expansion.py:306-384) against a tight scipy solve
        theta, kappa1, kappa2, beta, volvol = (PARAMS.theta, PARAMS.kappa1,
                                               PARAMS.kappa2, PARAMS.beta,
                                               PARAMS.volvol)
        phi = -0.5 + 1j * p_im
        ttm = 0.43
        M, L, H = _ode_terms_np(theta, kappa1, kappa2, beta, volvol, phi, 0.0)

        def rhs(t, A):
            quad = np.array([A @ M[k] @ A for k in range(5)])
            return quad + L @ A + H

        ref = solve_ivp(rhs, (0.0, ttm), np.zeros(5, dtype=complex),
                        rtol=1e-12, atol=1e-14).y[:, -1]
        ours = afe.solve_analytic_ode_for_a(
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
            volvol=volvol, phi=phi, psi=0.0, is_spot_measure=True,
            expansion_order=afe.ExpansionOrder.SECOND)
        # |phi|-scaled steps + midpoint fixed point: O(dt^2) scheme error,
        # ~1e-4 at p_im=15 (the cheap path's accuracy trade-off; the
        # reference's version is strictly coarser)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_is_analytic_pricing_path_consistent(self):
        # chain MGF through the semi-analytic scheme vs the RK4 default
        phi = Cplx(jnp.full(32, -0.5), jnp.linspace(0.0, 40.0, 32))
        psi = Cplx(jnp.zeros(32), jnp.zeros(32))
        th = Cplx(jnp.zeros(32), jnp.zeros(32))
        kw = dict(ttm=0.25, phi_grid=phi, psi_grid=psi, theta_grid=th,
                  sigma0=PARAMS.sigma0, theta=PARAMS.theta,
                  kappa1=PARAMS.kappa1, kappa2=PARAMS.kappa2,
                  beta=PARAMS.beta, volvol=PARAMS.volvol,
                  expansion_order=afe.ExpansionOrder.SECOND)
        _, mgf_rk4 = afe.compute_logsv_a_mgf_grid(is_analytic=False, **kw)
        _, mgf_ana = afe.compute_logsv_a_mgf_grid(is_analytic=True, **kw)
        np.testing.assert_allclose(np.asarray(mgf_ana.re),
                                   np.asarray(mgf_rk4.re), atol=2e-4)
        np.testing.assert_allclose(np.asarray(mgf_ana.im),
                                   np.asarray(mgf_rk4.im), atol=2e-4)

    @pytest.mark.slow
    def test_dense_output_trajectory(self):
        # dense_output returns the full trajectory; its endpoint must match
        # the direct terminal solve and .sol must interpolate .y
        theta, kappa1, kappa2, beta, volvol = (PARAMS.theta, PARAMS.kappa1,
                                               PARAMS.kappa2, PARAMS.beta,
                                               PARAMS.volvol)
        kw = dict(ttm=0.5, theta=theta, kappa1=kappa1, kappa2=kappa2,
                  beta=beta, volvol=volvol, phi=-0.5 + 3.0j, psi=0.0,
                  expansion_order=afe.ExpansionOrder.SECOND)
        dense = afe.solve_ode_for_a(dense_output=True, **kw)
        terminal = afe.solve_ode_for_a(**kw)
        assert dense.y.shape[0] == 5 and dense.y.shape[1] == dense.t.size
        assert dense.t[0] == 0.0 and dense.t[-1] == 0.5
        np.testing.assert_allclose(dense.y[:, -1], terminal.y[:, -1],
                                   atol=1e-7)
        np.testing.assert_allclose(dense.sol(dense.t[3]).ravel(),
                                   dense.y[:, 3], atol=1e-12)

    def test_chained_equals_direct(self):
        # solving 0 -> t1 -> t2 with chained state == solving 0 -> t2 directly
        theta, kappa1, kappa2, beta, volvol = (PARAMS.theta, PARAMS.kappa1,
                                               PARAMS.kappa2, PARAMS.beta,
                                               PARAMS.volvol)
        phi = Cplx(jnp.array([-0.5]), jnp.array([5.0]))
        psi = Cplx(jnp.array([0.0]), jnp.array([0.0]))
        a0 = Cplx(jnp.zeros((1, 5)), jnp.zeros((1, 5)))
        kw = dict(theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                  volvol=volvol, phi_grid=phi, psi_grid=psi,
                  expansion_order=afe.ExpansionOrder.SECOND)
        a_mid = afe.solve_a_ode_grid(ttm=0.2, a_t0=a0, **kw)
        a_chained = afe.solve_a_ode_grid(ttm=0.2, a_t0=a_mid, **kw)
        a_direct = afe.solve_a_ode_grid(ttm=0.4, a_t0=a0, **kw)
        np.testing.assert_allclose(np.asarray(a_chained.re),
                                   np.asarray(a_direct.re), atol=1e-9)
        np.testing.assert_allclose(np.asarray(a_chained.im),
                                   np.asarray(a_direct.im), atol=1e-9)


@pytest.fixture(scope="module")
def chain():
    return get_btc_test_chain_data()


class TestAnalyticPricing:
    def test_btc_chain_fits_market(self, chain):
        # LOGSV_BTC_PARAMS are the reference's calibrated params for this chain
        pricer = LogSVPricer()
        _, ivols = pricer.compute_chain_prices_with_vols(option_chain=chain,
                                                         params=PARAMS)
        mids = chain.get_mid_vols()
        for iv, m in zip(ivols, mids):
            assert np.all(np.isfinite(iv))
            assert np.nanmean(np.abs(iv - m)) < 0.05

    def test_put_call_parity(self):
        from stochvolmodels_tpu.data.option_chain import OptionChain
        strikes = np.linspace(0.7, 1.5, 9)
        f, ttm = 1.0, 0.25
        pricer = LogSVPricer()
        cc = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                        optiontypes=np.full(9, 'C'))
        cp = OptionChain.slice_to_chain(ttm=ttm, forward=f, strikes=strikes,
                                        optiontypes=np.full(9, 'P'))
        calls = pricer.price_chain(option_chain=cc, params=PARAMS)[0]
        puts = pricer.price_chain(option_chain=cp, params=PARAMS)[0]
        np.testing.assert_allclose(calls - puts, f - strikes, atol=2e-6)

    def test_mma_vs_inverse_measure_consistency(self):
        # inverse-measure inverse options ~ MMA price / forward for tight smiles
        pricer = LogSVPricer()
        price_c, vol_c = pricer.price_vanilla(params=PARAMS, ttm=0.25,
                                              forward=1.0, strike=1.0,
                                              optiontype='C')
        price_ic, vol_ic = pricer.price_vanilla(params=PARAMS, ttm=0.25,
                                                forward=1.0, strike=1.0,
                                                optiontype='IC',
                                                is_spot_measure=False)
        assert abs(vol_c - vol_ic) < 0.03

    def test_vol_backbone_changes_prices(self, chain):
        import pandas as pd
        pricer = LogSVPricer()
        base = pricer.price_chain(option_chain=chain, params=PARAMS)
        params2 = LogSvParams(**{**PARAMS.to_dict()})
        params2.set_vol_backbone(pd.Series([1.1, 1.1, 1.1, 1.1],
                                           index=chain.ttms))
        scaled = pricer.price_chain(option_chain=chain, params=params2)
        # higher backbone -> more expensive OTM options
        assert np.all(scaled[2][:5] > base[2][:5])


class TestMonteCarlo:
    def test_mc_matches_analytic(self, chain):
        pricer = LogSVPricer()
        analytic = pricer.price_chain(option_chain=chain, params=PARAMS)
        mc_prices, mc_stds = pricer.model_mc_price_chain(
            option_chain=chain, params=PARAMS, nb_path=100000, seed=5)
        for a, m, s in zip(analytic, mc_prices, mc_stds):
            tol = 4.0 * s + 0.015 * np.asarray(a) + 1e-4 * chain.forwards[0]
            assert np.all(np.abs(a - m) < tol), f"diff={np.abs(a-m)}, tol={tol}"

    def test_expected_vol_vs_mc(self):
        params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0,
                             beta=0.0, volvol=1.75)
        pricer = LogSVPricer()
        sigma_t, grid_t = pricer.simulate_vol_paths(params=params, ttm=1.0,
                                                    nb_path=100000, seed=8)
        analytic = compute_expected_vol_t(params=params, t=grid_t[::60])
        mc = np.mean(sigma_t[::60], axis=1)
        np.testing.assert_allclose(mc, analytic, atol=0.02)

    def test_qvar_mc_vs_analytic(self):
        params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0,
                             beta=0.0, volvol=1.75)
        pricer = LogSVPricer()
        _, _, qvar = pricer.simulate_terminal_values(params=params, ttm=0.5,
                                                     nb_path=100000, seed=3)
        analytic = compute_analytic_qvar(params=params, ttm=0.5) * 0.5
        assert abs(np.mean(qvar) - analytic) < 0.01


class TestQvarAndPdfs:
    def test_qvar_fourier_forward_vs_analytic(self):
        # Fourier QVAR call struck at 0 ~ the analytic expected QVAR
        # (reference's QVAR cross-check, logsv_pricer.py:1188-1202)
        from stochvolmodels_tpu.data.option_chain import OptionChain
        params = PARAMS
        ttm = 0.5
        analytic_fwd = compute_analytic_qvar(params=params, ttm=ttm, n_terms=4)
        chain = OptionChain.slice_to_chain(
            ttm=ttm, forward=analytic_fwd,
            strikes=np.array([1e-8, 0.5 * analytic_fwd]),
            optiontypes=np.array(['C', 'C']))
        pricer = LogSVPricer()
        prices = pricer.price_chain(option_chain=chain, params=params,
                                    variable_type=VariableType.Q_VAR)[0]
        # deep ITM call on QVAR ~ forward - strike
        assert abs(prices[0] - analytic_fwd) / analytic_fwd < 0.02
        assert abs(prices[1] - 0.5 * analytic_fwd) / analytic_fwd < 0.02

    def test_qvar_jnp_matches_np(self):
        v = compute_analytic_qvar(params=PARAMS, ttm=0.3)
        vj = float(compute_analytic_qvar_jnp(PARAMS.sigma0, PARAMS.theta,
                                             PARAMS.kappa1, PARAMS.kappa2,
                                             PARAMS.beta, PARAMS.volvol, ttm=0.3))
        assert abs(v - vj) < 1e-10

    def test_logreturn_pdf_normalizes(self):
        params = PARAMS
        x_grid = params.get_x_grid(ttm=0.5, n=400)
        pdf = logsv_pdfs(params=params, ttm=0.5, space_grid=x_grid)
        assert abs(np.sum(pdf) - 1.0) < 5e-3
        assert np.all(pdf > -1e-6)

    def test_sigma_pdf_mass(self):
        params = PARAMS
        s_grid = params.get_sigma_grid(ttm=0.5, n=400)
        pdf = logsv_pdfs(params=params, ttm=0.5, space_grid=s_grid,
                         variable_type=VariableType.SIGMA)
        assert 0.9 < np.sum(pdf) < 1.1

    @pytest.mark.slow
    def test_stiff_pdfs_all_variables(self):
        """high-volvol paper params (vartheta2 ~ 5.7) make the SIGMA/Q_VAR
        transform ODEs stiff: the SIGMA seed A^(1)(0) = -Theta (|Theta| to
        600) and the Q_VAR forcing -2psi (|psi| to 4000) both exploded the
        uniform-step RK4 before the graded-warmup schedule (affine.py
        solve_a_ode_grid warmup_scale)."""
        params = LogSvParams(sigma0=0.8327, theta=1.0139, kappa1=4.8609,
                             kappa2=4.7940, beta=0.1988, volvol=2.3694)
        ttm = 0.25
        for vt, lo, hi in ((VariableType.SIGMA, 0.95, 1.05),
                           (VariableType.Q_VAR, 0.95, 1.05)):
            grid = params.get_variable_space_grid(variable_type=vt, ttm=ttm,
                                                  n=200, n_stdevs=4.5)
            pdf = logsv_pdfs(params=params, ttm=ttm, space_grid=grid,
                             variable_type=vt)
            mass = float(np.nansum(pdf))
            assert lo < mass < hi, f"{vt}: mass={mass}"
            mean = float(np.nansum(pdf * grid) / mass)
            assert 0.5 < mean < 1.5, f"{vt}: mean={mean}"


class TestCalibration:
    @pytest.mark.slow
    def test_gradient_flows(self, chain):
        pricer = LogSVPricer()
        grid = chain.to_grid()
        from stochvolmodels_tpu.models.logsv.pricer import logsv_chain_price_grid
        import stochvolmodels_tpu.ops.bsm as bsm

        mids = chain.get_mid_vols()
        t, k = grid.mask.shape
        mv = np.zeros((t, k))
        for i, a in enumerate(mids):
            mv[i, :len(a)] = a
        w = jnp.asarray(np.where(np.asarray(grid.mask), 1.0, 0.0))
        mv = jnp.asarray(np.where(np.asarray(grid.mask), mv, 0.0))
        ttms_static = tuple(float(x) for x in chain.ttms)

        def loss(pars):
            prices = logsv_chain_price_grid(
                grid, sigma0=pars[0], theta=pars[1], kappa1=pars[2],
                kappa2=pars[2] / pars[1], beta=pars[3], volvol=pars[4],
                vol_scaler=0.25, ttms_static=ttms_static)
            vols = bsm.infer_bsm_ivols_from_model_chain_prices(
                ttms=grid.ttms, forwards=grid.forwards,
                discfactors=grid.discfactors, strikes_ttms=grid.strikes,
                optiontypes_ttms=grid.optioncodes, model_prices_ttms=prices)
            r = w * jnp.square(vols - mv)
            return jnp.sum(jnp.where(jnp.isnan(r), 0.0, r))

        pars = jnp.array([PARAMS.sigma0, PARAMS.theta, PARAMS.kappa1,
                          PARAMS.beta, PARAMS.volvol])
        val, grads = jax.value_and_grad(loss)(pars)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grads)))
        eps = 1e-5
        fd = (float(loss(pars.at[0].add(eps))) - float(loss(pars.at[0].add(-eps)))) / (2 * eps)
        assert abs(fd - float(grads[0])) < 1e-3 * max(1.0, abs(fd))

    @pytest.mark.slow
    def test_analytic_calibration(self, chain):
        pricer = LogSVPricer()
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=3.0, kappa2=3.0,
                              beta=0.15, volvol=1.85)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=params0,
            model_calibration_type=LogsvModelCalibrationType.PARAMS5)
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain, params=fit)
        mids = chain.get_mid_vols()
        err = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols, mids)])
        assert err < 0.03


class TestVolBackboneFit:
    def test_backbone_fit(self):
        import pandas as pd
        params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0,
                             beta=0.0, volvol=1.75)
        backbone = fit_model_vol_backbone_to_varswaps(
            log_sv_params=params,
            varswap_strikes=pd.Series([1.0, 1.0], index=[1.0 / 12.0, 2.0 / 12.0]))
        assert len(backbone) == 2
        assert np.all(backbone.to_numpy() > 0)


class TestOnDeviceCalibration:
    """fast_calibration: whole optimizer inside one jit (LM is the fast path)."""

    @pytest.mark.slow
    def test_lm_calibration_improves_fit(self, chain):
        from stochvolmodels_tpu.models.logsv.fast_calibration import (
            calibrate_logsv_lm_on_device)
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.21,
                              beta=0.15, volvol=1.85)
        fit, cost = calibrate_logsv_lm_on_device(
            chain, params0, nb_iters=6, year_steps=120, use_float32=True)
        assert np.isfinite(cost)
        pricer = LogSVPricer()
        ivols = pricer.compute_model_ivols_for_chain(option_chain=chain, params=fit)
        ivols0 = pricer.compute_model_ivols_for_chain(option_chain=chain, params=params0)
        mids = chain.get_mid_vols()
        err = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols, mids)])
        err0 = np.nanmean([np.nanmean(np.abs(iv - m)) for iv, m in zip(ivols0, mids)])
        assert err < err0          # strictly better than the start point
        assert err < 0.02          # and close to the SLSQP optimum (~0.009)

    @pytest.mark.slow
    def test_lm_via_pricer_method_kwarg(self, chain):
        pricer = LogSVPricer()
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.21,
                              beta=0.15, volvol=1.85)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=params0,
            model_calibration_type=LogsvModelCalibrationType.PARAMS5,
            method='lm', nb_iters=6, year_steps=120)
        assert np.isfinite(fit.sigma0) and 0.1 <= fit.sigma0 <= 1.5


class TestFastPrecision:
    def test_fast_mode_matches_exact(self, chain):
        """precision='fast' (mixed: f32 ODE scans at 360 steps/yr, f64
        quadrature) agrees with the exact f64 pricer to ~1e-6 relative
        (PARITY.md "Fourier fast floors")."""
        pricer = LogSVPricer()
        exact = pricer.price_chain(option_chain=chain, params=PARAMS)
        fast = pricer.price_chain(option_chain=chain, params=PARAMS,
                                  precision="fast")
        for f, e in zip(fast, exact):
            np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                       rtol=2e-5, atol=1e-7)

    def test_unknown_precision_raises(self, chain):
        with pytest.raises(NotImplementedError):
            LogSVPricer().price_chain(option_chain=chain, params=PARAMS,
                                      precision="bogus")

    def test_fast_mode_stable_at_low_kappa(self, chain):
        """regression: f32 RK4 at 180 steps/yr sat ON its stability boundary
        — kappa1~2.2 at the longest BTC maturity diverged to ~1e12 prices
        (silently: NaN ivols zeroed the LM residuals, so diverged params
        looked perfect to the optimizer).  The fast path now runs 360
        steps/yr; assert it agrees with exact f64 at the stress params."""
        stress = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                             beta=0.15, volvol=1.85)
        pricer = LogSVPricer()
        exact = pricer.price_chain(option_chain=chain, params=stress)
        fast = pricer.price_chain(option_chain=chain, params=stress,
                                  precision="fast")
        for f, e in zip(fast, exact):
            np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                       rtol=5e-5, atol=1e-7)

    def test_fast_fused_ivols_match_exact(self, chain):
        """the fused mixed-precision price+IV program agrees with the exact
        price-then-invert path to the fused inverter's ~1e-6 vol accuracy,
        with no spurious NaNs."""
        stress = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                             beta=0.15, volvol=1.85)
        pricer = LogSVPricer()
        exact = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                     params=stress)
        fast = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                    params=stress,
                                                    precision="fast")
        for f, e in zip(fast, exact):
            f, e = np.asarray(f), np.asarray(e)
            assert np.isnan(f).sum() == np.isnan(e).sum()
            np.testing.assert_allclose(f, e, rtol=1e-4, atol=1e-5)


class TestLmStressStability:
    @pytest.mark.slow
    def test_lm_from_low_kappa_start_stays_stable(self, chain):
        """regression for the f32@180 RK4 divergence: starting LM at the
        kappa1~2.2 params that used to blow up the fast pricer (the NaN
        residual masking then made diverged params look optimal), the
        360-steps/yr fast path must converge to a sane fit."""
        from stochvolmodels_tpu.models.logsv.fast_calibration import (
            calibrate_logsv_lm_on_device)

        params0 = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21,
                              kappa2=2.18, beta=0.15, volvol=1.85)
        fit, cost = calibrate_logsv_lm_on_device(chain, params0, nb_iters=8)
        cost = float(cost)
        assert np.isfinite(cost) and cost < 0.01, f"LM cost {cost}"
        assert 0.3 < fit.sigma0 < 1.5 and 0.5 < fit.theta < 2.0
        # the fitted surface must actually reprice close to market
        pricer = LogSVPricer()
        vols = pricer.compute_model_ivols_for_chain(option_chain=chain,
                                                    params=fit,
                                                    precision="fast")
        mids = chain.get_mid_vols()
        errs = np.concatenate([np.abs(np.asarray(v) - np.asarray(m))
                               for v, m in zip(vols, mids)])
        assert np.nanmean(errs) < 0.03, f"mean IV err {np.nanmean(errs):.4f}"


class TestExactStepConvergence:
    """the precision='exact' default dropped 720 -> 240 steps/yr after a
    step-refinement study (scripts/bench_exact_path.py; the TPU scan is
    per-step-latency-bound so wall-clock is linear in steps, 1116 -> 419 ms
    warm).  These pin the convergence facts the new default rests on."""

    def test_btc_chain_default_matches_refined(self, chain):
        """BTC chain at the 240/yr default vs 1440/yr: the residual is the
        shortest slice's 16-step floor (identical for every year_steps in
        [120, 720]), ~7e-8 relative — 2.5 orders under the 2e-5 ref-parity
        gate."""
        pricer = LogSVPricer()
        p_def = pricer.price_chain(option_chain=chain, params=PARAMS)
        p_ref = pricer.price_chain(option_chain=chain, params=PARAMS,
                                   year_steps=1440)
        for a, b in zip(p_def, p_ref):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.nanmax(np.abs(a - b) / np.maximum(np.abs(b), 1e-30))
            assert rel < 1e-6, f"exact-default step error {rel:.2e}"

    def test_harsh_params_slice_converged(self):
        """kappa=4/volvol=1.7 (the reference-parity regime): 240/yr agrees
        with 1440/yr to ~4e-9 relative on a 0.25y slice (measured 3.65e-9
        vs a 2880/yr anchor in the study)."""
        from stochvolmodels_tpu.data.option_chain import OptionChain
        strikes = np.linspace(0.6, 1.6, 21)
        oc = OptionChain(ttms=np.array([0.25]), forwards=np.array([1.0]),
                         discfactors=np.array([1.0]), strikes_ttms=[strikes],
                         optiontypes_ttms=[np.where(strikes < 1.0, 'P', 'C')])
        params = LogSvParams(sigma0=0.8, theta=1.0, kappa1=4.0, kappa2=4.0,
                             beta=0.2, volvol=1.7)
        pricer = LogSVPricer()
        p_def = np.asarray(pricer.price_chain(option_chain=oc,
                                              params=params)[0])
        p_ref = np.asarray(pricer.price_chain(option_chain=oc, params=params,
                                              year_steps=1440)[0])
        rel = np.nanmax(np.abs(p_def - p_ref) / np.maximum(np.abs(p_ref),
                                                           1e-30))
        assert rel < 1e-7, f"harsh-params step error {rel:.2e}"
