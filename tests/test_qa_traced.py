"""
Traced QA structural panels (models/factor_hjm/qa_traced.py): parity with
the host scipy pipeline, exact A-greeks, and the single-program A-prefit.

Reference pipeline being replaced:
/root/reference/stochvolmodels/pricers/factor_hjm/rate_logsv_params.py:390-503
(host solve_ivp mean states + frozen panels).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stochvolmodels_tpu.models.factor_hjm.qa_traced import (
    build_qa_geometry,
    factor_vols_traced,
    qa_mean_states_traced,
    qa_panels_traced,
)
from stochvolmodels_tpu.models.factor_hjm.rate_factor_basis import NelsonSiegel
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_params import (
    MultiFactRateLogSvParams,
    TermStructure,
)
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
    make_swaption_cube_fn,
    make_swaption_cube_fn_traced,
)
from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid

KEY_TERMS = np.array([1.0, 5.0, 10.0])
TS = np.array([0.0, 1.0, 2.0, 5.0])


def make_params() -> MultiFactRateLogSvParams:
    """segment-varying A/beta/volvol and a correlated R so every traced
    dependency (C(A), chol(R), segment gathers) is exercised."""
    R = np.array([[1.0, 0.3, 0.1], [0.3, 1.0, 0.2], [0.1, 0.2, 1.0]])
    beta_xs = np.array([[0.3, -0.15, 0.05],
                        [0.2, -0.1, 0.0],
                        [0.15, -0.05, 0.0]])
    volvol_xs = np.array([0.45, 0.35, 0.30])
    A = np.array([[0.009, 0.010, 0.011],
                  [0.010, 0.011, 0.012],
                  [0.011, 0.012, 0.013]])
    return MultiFactRateLogSvParams(
        sigma0=1.05, theta=1.0, kappa1=0.8, kappa2=1.2,
        beta=TermStructure(ts=TS, xs=beta_xs),
        volvol=TermStructure(ts=TS, xs=volvol_xs),
        A=A, R=R,
        basis=NelsonSiegel(meanrev=0.25, key_terms=KEY_TERMS), ccy="USD")


SLICES = [(1.0, 1.0), (1.0, 5.0), (2.0, 5.0), (2.0, 10.0)]
FWDS = [0.0435, 0.0421, 0.0415, 0.0405]
STRIKES = [fwd + np.array([-0.01, -0.005, 0.0, 0.005, 0.01]) for fwd in FWDS]

# half-size fixture for the finite-difference verifications: each FD bump
# rebuilds and recompiles a whole cube program, which made these tests the
# suite's top wall-clock offenders (r04 verdict item 5) — the jvp==FD
# mathematics is shape-independent, so 2 slices x 3 strikes at 24 steps/yr
# asserts the same thing at a fraction of the cost
SLICES_FD = [(1.0, 1.0), (2.0, 10.0)]
FWDS_FD = [0.0435, 0.0405]
STRIKES_FD = [fwd + np.array([-0.01, 0.0, 0.01]) for fwd in FWDS_FD]
YS_FD = 24


class TestTracedPanels:
    def test_factor_vols_match_host(self):
        params = make_params()
        geom = build_qa_geometry(params, SLICES, nb_grid_pts=11)
        C = np.asarray(factor_vols_traced(geom, jnp.asarray(params.A)))
        for s in range(params.A.shape[0]):
            np.testing.assert_allclose(
                C[s], params.calc_factor_vols(params.A[s]), rtol=1e-12)

    def test_mean_states_match_tight_solve_ivp(self):
        """RK4 (n_sub=4) mean states vs solve_ivp at rtol=1e-11."""
        params = make_params()
        expiry, tenor = 2.0, 5.0
        nb_pts = 31
        geom = build_qa_geometry(params, [(expiry, tenor)],
                                 nb_grid_pts=nb_pts, n_sub=4)
        mx, my, msig = qa_mean_states_traced(
            geom, jnp.asarray(params.A), jnp.asarray(params.kappa1),
            jnp.asarray(params.kappa2), jnp.asarray(params.theta),
            jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs))
        t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=nb_pts)
        mx_h, my_h = params.calc_QA_mean_states(
            expiry=expiry, tenor=tenor, t_grid=t_grid,
            x0=np.zeros(3), y0=np.zeros(8), rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(mx)[0], mx_h, atol=5e-9)
        np.testing.assert_allclose(np.asarray(my)[0], my_h, atol=5e-9)
        assert np.all(np.isfinite(np.asarray(msig)))

    def test_panels_match_tight_host_assembly(self):
        """traced (a, kappa0/1/2, beta, volvol) panels vs transform_QA_params
        on a tight solve_ivp — the 'panels match the scipy path' gate."""
        params = make_params()
        nb_pts = 31
        geom = build_qa_geometry(params, SLICES, nb_grid_pts=nb_pts, n_sub=4)
        a_t, k0_t, k1_t, k2_t, beta_t, vv_t = qa_panels_traced(
            geom, jnp.asarray(params.A), jnp.asarray(params.kappa1),
            jnp.asarray(params.kappa2), jnp.asarray(params.theta),
            jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs),
            jnp.asarray(params.volvol.xs))
        for p, (expiry, tenor) in enumerate(SLICES):
            t_grid = generate_ttms_grid(np.array([float(expiry)]),
                                        nb_pts=nb_pts)
            a_h, k0_h, k1_h, k2_h, beta_h, vv_h, _ = \
                params.transform_QA_params(expiry=float(expiry),
                                           tenor=float(tenor), t_grid=t_grid,
                                           rtol=1e-11, atol=1e-13)
            np.testing.assert_allclose(np.asarray(a_t)[p], a_h, atol=2e-9)
            np.testing.assert_allclose(np.asarray(k0_t)[p], k0_h, atol=2e-8)
            np.testing.assert_allclose(np.asarray(k1_t)[p], k1_h, atol=5e-8)
            np.testing.assert_allclose(np.asarray(k2_t)[p], k2_h, atol=2e-8)
            np.testing.assert_allclose(np.asarray(beta_t)[p], beta_h,
                                       rtol=1e-12)
            np.testing.assert_allclose(np.asarray(vv_t)[p], vv_h, rtol=1e-12)


class TestTracedCube:
    def test_traced_cube_matches_frozen_tight(self):
        """traced cube prices vs the frozen cube on a tight host solve."""
        params = make_params()
        frozen_fn, mask = make_swaption_cube_fn(
            params, SLICES, FWDS, STRIKES, year_steps=48,
            panel_rtol=1e-11, panel_atol=1e-13)
        traced_fn, mask_t = make_swaption_cube_fn_traced(
            params, SLICES, FWDS, STRIKES, year_steps=48, n_sub=4)
        px_f = np.asarray(frozen_fn(jnp.asarray(params.sigma0),
                                    jnp.asarray(params.beta.xs),
                                    jnp.asarray(params.volvol.xs)))
        px_t = np.asarray(traced_fn(jnp.asarray(params.sigma0),
                                    jnp.asarray(params.A),
                                    jnp.asarray(params.beta.xs),
                                    jnp.asarray(params.volvol.xs),
                                    jnp.asarray(params.kappa1),
                                    jnp.asarray(params.kappa2)))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_t))
        m = np.asarray(mask)
        assert np.all(np.isfinite(px_t[m]))
        # prices are O(1e-3..1e-2) in annuity-normalized rate units
        np.testing.assert_allclose(px_t[m], px_f[m], atol=5e-9)

    def test_a_greek_matches_fd_through_unfrozen_pipeline(self):
        """jvp A-shift greek of the traced cube == central FD where each bump
        re-freezes the host panels (the 'unfrozen pipeline' FD oracle)."""
        params = make_params()
        traced_fn, mask = make_swaption_cube_fn_traced(
            params, SLICES_FD, FWDS_FD, STRIKES_FD, year_steps=YS_FD,
            n_sub=4)
        primals = (jnp.asarray(params.sigma0), jnp.asarray(params.A),
                   jnp.asarray(params.beta.xs), jnp.asarray(params.volvol.xs),
                   jnp.asarray(params.kappa1), jnp.asarray(params.kappa2))
        tangents = (jnp.zeros(()), jnp.ones_like(primals[1]),
                    jnp.zeros_like(primals[2]), jnp.zeros_like(primals[3]),
                    jnp.zeros(()), jnp.zeros(()))
        _, dA = jax.jvp(traced_fn, primals, tangents)
        dA = np.asarray(dA)

        h = 2e-5
        px_pm = []
        for sgn in (+1.0, -1.0):
            import copy
            p_b = copy.deepcopy(params)
            for seg in range(params.A.shape[0]):
                p_b.update_params(idx=seg,
                                  A_idx=params.A[seg] + sgn * h)
            fn_b, _ = make_swaption_cube_fn(
                p_b, SLICES_FD, FWDS_FD, STRIKES_FD, year_steps=YS_FD,
                panel_rtol=1e-11, panel_atol=1e-13)
            px_pm.append(np.asarray(fn_b(jnp.asarray(p_b.sigma0),
                                         jnp.asarray(p_b.beta.xs),
                                         jnp.asarray(p_b.volvol.xs))))
        fd = (px_pm[0] - px_pm[1]) / (2.0 * h)
        m = np.asarray(mask)
        denom = np.maximum(np.abs(fd[m]), 1e-3)
        assert np.max(np.abs(dA[m] - fd[m]) / denom) < 2e-4

    def test_kappa_and_vega_greeks_match_fd_traced(self):
        """kappa1/kappa2/sigma0 tangents vs FD of the traced primal."""
        params = make_params()
        traced_fn, mask = make_swaption_cube_fn_traced(
            params, SLICES_FD, FWDS_FD, STRIKES_FD, year_steps=YS_FD,
            n_sub=2)
        m = np.asarray(mask)

        def f(sigma0, k1, k2):
            return traced_fn(sigma0, jnp.asarray(params.A),
                             jnp.asarray(params.beta.xs),
                             jnp.asarray(params.volvol.xs), k1, k2)

        args = (jnp.asarray(params.sigma0), jnp.asarray(params.kappa1),
                jnp.asarray(params.kappa2))
        for i in range(3):
            tang = tuple(jnp.asarray(1.0 if j == i else 0.0)
                         for j in range(3))
            _, dv = jax.jvp(f, args, tang)
            h = 1e-5
            up = [a for a in args]
            dn = [a for a in args]
            up[i] = args[i] + h
            dn[i] = args[i] - h
            fd = (np.asarray(f(*up)) - np.asarray(f(*dn))) / (2.0 * h)
            np.testing.assert_allclose(np.asarray(dv)[m], fd[m],
                                       rtol=5e-5, atol=1e-10)


class TestTracedPrefit:
    def test_prefit_traced_matches_frozen_and_reuses_one_program(self):
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            prefit_A_to_atm)
        params = make_params()
        ivols = [np.full(len(s), 0.0095 + 0.0005 * p)
                 for p, s in enumerate(STRIKES_FD)]
        fit_t, err_t = prefit_A_to_atm(params, SLICES_FD, FWDS_FD,
                                       STRIKES_FD, ivols,
                                       nb_outer=3, traced=True)
        fit_f, err_f = prefit_A_to_atm(params, SLICES_FD, FWDS_FD,
                                       STRIKES_FD, ivols,
                                       nb_outer=3, traced=False)
        # identical fix-point iteration through two panel pipelines: same A
        # trajectory up to panel-solver noise (frozen path runs scipy at
        # rtol=1e-3), same reported ATM error
        np.testing.assert_allclose(fit_t.A, fit_f.A, rtol=2e-3)
        assert abs(err_t - err_f) < 0.2  # bp
        # and the iteration does contract on this fixture
        _, err_t1 = prefit_A_to_atm(params, SLICES_FD, FWDS_FD, STRIKES_FD,
                                    ivols, nb_outer=1, traced=True)
        assert err_t < err_t1

    @pytest.mark.slow
    def test_cube_lm_fit_A_joint(self):
        """one-stage joint (A, beta, volvol) cube LM through the traced
        pricer recovers a self-generated target."""
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            calibrate_rate_logsv_cube_lm_on_device)
        from stochvolmodels_tpu.ops.bachelier import (
            infer_normal_implied_vol_fast)
        target = make_params()
        traced_fn, mask = make_swaption_cube_fn_traced(
            target, SLICES, FWDS, STRIKES, year_steps=48, n_sub=2)
        px = traced_fn(jnp.asarray(target.sigma0), jnp.asarray(target.A),
                       jnp.asarray(target.beta.xs),
                       jnp.asarray(target.volvol.xs),
                       jnp.asarray(target.kappa1), jnp.asarray(target.kappa2))
        ivols = []
        for p, (e, _t) in enumerate(SLICES):
            iv = infer_normal_implied_vol_fast(
                forward=float(FWDS[p]), ttm=float(e),
                strike=jnp.asarray(STRIKES[p]),
                given_price=px[p, :len(STRIKES[p])])
            ivols.append(np.asarray(iv))
        start = make_params()
        start.update_params(idx=0, A_idx=target.A[0] * 1.25,
                            beta_idx=np.zeros(3), volvol_idx=0.5)
        fit, cost = calibrate_rate_logsv_cube_lm_on_device(
            start, SLICES, FWDS, STRIKES, ivols, nb_iters=16,
            year_steps=48, fit_A=True, n_sub=2)
        assert cost < 1e-9
        # the 1y/5y key-term levels are pinned by the slice set; the 10y
        # component is weakly identified (no short-expiry 10y slice — beta
        # absorbs it at machine-zero cost), so assert only what the data
        # determines plus the repriced smiles
        np.testing.assert_allclose(fit.A[0][:2], target.A[0][:2], rtol=2e-2)
        refit_fn, _ = make_swaption_cube_fn_traced(
            fit, SLICES, FWDS, STRIKES, year_steps=48, n_sub=2)
        px_fit = refit_fn(jnp.asarray(fit.sigma0), jnp.asarray(fit.A),
                          jnp.asarray(fit.beta.xs), jnp.asarray(fit.volvol.xs),
                          jnp.asarray(fit.kappa1), jnp.asarray(fit.kappa2))
        for p, (e, _t) in enumerate(SLICES):
            iv_fit = infer_normal_implied_vol_fast(
                forward=float(FWDS[p]), ttm=float(e),
                strike=jnp.asarray(STRIKES[p]),
                given_price=px_fit[p, :len(STRIKES[p])])
            np.testing.assert_allclose(np.asarray(iv_fit), ivols[p],
                                       atol=1e-5)  # 0.1 bp
