"""
Rough LogSV (Markovian lift): kernel quadrature quality, degeneracy to the
standard dynamics at H = 1/2, and rough-MC pricing sanity at H = 0.1.
"""
import os

import numpy as np
import pytest

from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS, LogSVPricer
from stochvolmodels_tpu.models.rough.kernel import (
    european_rule,
    kernel_l2_relative_error,
)


class TestKernelQuadrature:
    def test_error_decreases_with_n(self):
        H, T = 0.1, 0.5
        errs = []
        for n in (1, 2, 3):
            nodes, weights = european_rule(H, n, T)
            errs.append(kernel_l2_relative_error(H, nodes, weights, T))
        assert errs[0] > errs[1] > errs[2]
        assert errs[2] < 0.1  # 3-node lift approximates the H=0.1 kernel well

    def test_nodes_positive_sorted(self):
        nodes, weights = european_rule(0.2, 3, 1.0)
        assert np.all(nodes > 0)
        assert np.all(np.diff(nodes) > 0)
        assert np.all(weights > 0)

    def test_approximate_kernel_dispatch(self):
        p = LogSvParams(sigma0=0.8, theta=1.0, kappa1=3.0, kappa2=3.0,
                        beta=0.15, volvol=1.85, H=0.5)
        p.approximate_kernel(T=0.5)
        np.testing.assert_allclose(p.nodes, [1e-3])
        np.testing.assert_allclose(p.weights, [1.0])
        p2 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=3.0, kappa2=3.0,
                         beta=0.15, volvol=1.85, H=0.45)
        p2.approximate_kernel(T=0.5)
        assert len(p2.nodes) == 2
        p3 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=3.0, kappa2=3.0,
                         beta=0.15, volvol=1.85, H=0.1)
        p3.approximate_kernel(T=0.5)
        assert len(p3.nodes) == 3


@pytest.fixture(scope="module")
def chain():
    return get_btc_test_chain_data()


class TestRoughMc:
    def test_degenerate_lift_matches_analytic(self, chain):
        # H = 0.5 -> single node at 1e-3 reproduces the standard dynamics:
        # rough-MC prices must agree with the Fourier pricer within MC bands
        params = LogSvParams(**{**LOGSV_BTC_PARAMS.to_dict()})
        params.H = 0.5
        params.approximate_kernel(T=float(np.max(chain.ttms)))
        pricer = LogSVPricer()
        analytic = pricer.price_chain(option_chain=chain, params=params)
        mc_prices, mc_stds = pricer.model_mc_price_chain(
            option_chain=chain, params=params, nb_path=100000,
            use_rough_mc=True, seed=42)
        for a, m, s in zip(analytic, mc_prices, mc_stds):
            tol = 4.0 * s + 0.02 * np.asarray(a) + 2e-4 * chain.forwards[0]
            assert np.all(np.abs(a - m) < tol), f"diff={np.abs(a-m)}, tol={tol}"

    def test_rough_h01_prices_sane(self, chain):
        params = LogSvParams(sigma0=0.8376, theta=1.0413, kappa1=3.1844,
                             kappa2=3.058, beta=0.1514, volvol=1.8458, H=0.1)
        params.approximate_kernel(T=float(np.max(chain.ttms)))
        pricer = LogSVPricer()
        mc_prices, mc_stds = pricer.model_mc_price_chain(
            option_chain=chain, params=params, nb_path=50000,
            use_rough_mc=True, seed=10)
        ivols = chain.compute_model_ivols_from_chain_data(model_prices=mc_prices)
        for iv in ivols:
            finite = np.isfinite(iv)
            assert np.mean(finite) > 0.8
            assert np.all((iv[finite] > 0.3) & (iv[finite] < 2.5))

    def test_regression_baseline(self, chain):
        # our own .npz regression (the reference's pattern,
        # tests/test_rough_logsv_pricer_regression.py): fixed seed, H=0.1,
        # 10k paths; guards against silent numerical drift
        import pathlib
        params = LogSvParams(sigma0=0.8376, theta=1.0413, kappa1=3.1844,
                             kappa2=3.058, beta=0.1514, volvol=1.8458, H=0.1)
        params.approximate_kernel(T=float(np.max(chain.ttms)))
        pricer = LogSVPricer()
        mc_prices, _ = pricer.model_mc_price_chain(
            option_chain=chain, params=params, nb_path=10000,
            use_rough_mc=True, seed=10)
        baseline_path = pathlib.Path(__file__).parent / "baselines" / "rough_logsv_btc.npz"
        if not baseline_path.exists():
            baseline_path.parent.mkdir(exist_ok=True)
            np.savez(baseline_path, **{f"prices_{i}": p for i, p in enumerate(mc_prices)})
            pytest.skip("baseline created on first run")
        with np.load(baseline_path) as z:
            for i, p in enumerate(mc_prices):
                np.testing.assert_allclose(p, z[f"prices_{i}"], rtol=1e-7)


class TestExpmDrift:
    """exact-linear drift step (reference drift_ode_solve3) vs RK4 and vs a
    tight scipy integration of the frozen-lambda linear ODE."""

    def _setup(self):
        import jax.numpy as jnp
        nodes_np, weights_np = european_rule(0.1, 3, 1.0)
        P = 4
        rng = np.random.default_rng(3)
        nodes = jnp.asarray(np.tile(nodes_np[:, None], (1, P)))
        weights = jnp.asarray(np.tile(weights_np[:, None], (1, P)))
        v0 = jnp.asarray(np.full((3, P), 0.8 / weights_np.sum()))
        z0 = jnp.asarray(np.asarray(v0) * (1.0 + 0.2 * rng.standard_normal((3, P))))
        return nodes, weights, v0, z0, nodes_np, weights_np

    def test_expm_matches_frozen_linear_ode(self):
        from stochvolmodels_tpu.models.rough.simulation import drift_ode_expm
        from scipy.linalg import expm as scipy_expm
        nodes, weights, v0, z0, nodes_np, weights_np = self._setup()
        theta, kappa1, kappa2, h = 1.0, 3.0, 3.0, 1.0 / 720.0
        out = np.asarray(drift_ode_expm(nodes, v0, theta, kappa1, kappa2,
                                        z0, weights, h))
        for p in range(z0.shape[1]):
            z0p = np.asarray(z0)[:, p]
            lam = kappa1 + kappa2 * float(weights_np @ z0p)
            A = -(np.outer(np.full(3, lam), weights_np) + np.diag(nodes_np))
            b = lam * theta + nodes_np * np.asarray(v0)[:, p]
            E = scipy_expm(A * h)
            expect = E @ z0p + np.linalg.solve(A, (E - np.eye(3)) @ b)
            np.testing.assert_allclose(out[:, p], expect, rtol=1e-10)

    def test_expm_close_to_rk4(self):
        from stochvolmodels_tpu.models.rough.simulation import (
            drift_ode_expm,
            drift_ode_rk4,
        )
        nodes, weights, v0, z0, *_ = self._setup()
        theta, kappa1, kappa2, h = 1.0, 3.0, 3.0, 0.5 / 360.0
        a = np.asarray(drift_ode_expm(nodes, v0, theta, kappa1, kappa2, z0,
                                      weights, h))
        b = np.asarray(drift_ode_rk4(nodes, v0, theta, kappa1, kappa2, z0,
                                     weights, h))
        # the expm step freezes lambda over the step (O(h^2) linearization
        # error vs RK4's O(h^5) local error on the nonlinear ODE): at
        # h ~ 1.4e-3 the schemes agree at the O(h^2) ~ 2e-5 level
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_expm_scheme_prices_match_rk4(self, chain):
        from stochvolmodels_tpu.models.rough.simulation import (
            log_spot_full_combined,
        )
        from stochvolmodels_tpu.ops.random import key_from_seed
        # a step-resolved configuration (max node 27/yr at 720 steps/yr):
        # at H=0.1 / T=0.5 the top node is 303/yr and BOTH schemes carry
        # ~10% discretization error at standard steps — there the schemes
        # differ from each other as much as from the truth, so comparing
        # them is meaningless; here both are converged and must agree
        nodes, weights = european_rule(0.3, 2, 1.0)
        kw = dict(nodes=nodes, weights=weights, sigma0=0.8, theta=1.0,
                  kappa1=3.0, kappa2=3.0, rho=-0.3, volvol=1.0, ttm=0.25,
                  nb_path=20000, key=key_from_seed(11),
                  nb_steps_per_year=720)
        log_s_rk4, _, _ = log_spot_full_combined(drift_scheme="rk4", **kw)
        log_s_exp, _, _ = log_spot_full_combined(drift_scheme="expm", **kw)
        d = np.asarray(log_s_rk4) - np.asarray(log_s_exp)
        assert float(np.max(np.abs(d))) < 0.05
        assert abs(float(np.mean(d))) < 2e-3
        assert abs(float(np.std(np.asarray(log_s_rk4)))
                   - float(np.std(np.asarray(log_s_exp)))) < 2e-3


class TestQuadratureRules:
    """alternative kernel discretizations (RoughKernel.py research rules):
    each achieves a finite L2 error and the production european_rule beats
    or matches all of them."""

    def test_rule_family_errors(self):
        from stochvolmodels_tpu.models.rough.kernel import (
            kernel_l2_relative_error,
            quadrature_rule,
        )
        H, T, N = 0.1, 1.0, 3
        errs = {}
        for mode in ("european", "abi-jaber", "ak", "gaussian", "harms",
                     "optimized l1"):
            nodes, w = quadrature_rule(H, N, T, mode=mode)
            assert np.all(np.asarray(nodes) >= 0.0)
            assert np.all(np.isfinite(w))
            errs[mode] = kernel_l2_relative_error(H, np.asarray(nodes),
                                                  np.asarray(w), T)
        assert errs["european"] <= min(errs.values()) + 1e-12
        assert errs["european"] < 0.05
        assert all(e < 1.0 for e in errs.values())

    def test_l1_rule_beats_european_in_l1(self):
        """the OL1 polish targets the L1 functional, so it must (weakly)
        improve the L1 error over its L2-optimal starting point."""
        from stochvolmodels_tpu.models.rough.kernel import (
            european_rule,
            kernel_l1_relative_error,
            l1_rule,
        )
        H, N, T = 0.1, 3, 1.0
        ne, we = european_rule(H, N, T)
        nl, wl = l1_rule(H, N, T)
        e_eur = kernel_l1_relative_error(H, ne, we, T)
        e_l1 = kernel_l1_relative_error(H, nl, wl, T)
        assert e_l1 <= e_eur + 1e-12, (e_l1, e_eur)

    @pytest.mark.slow
    def test_european_rule_dominates_production_grid(self):
        """L2 dominance of the production european_rule over every research
        rule (AJE uniform, AK hybrid, Gaussian-on-partition, Harms) across
        the production (H, N(H), T) grid — the documented justification for
        not porting the reference's full optimizer cascade
        (RoughKernel.py:134,746,933,1014)."""
        from stochvolmodels_tpu.models.rough.kernel import (
            kernel_l2_relative_error,
            quadrature_rule,
        )
        rows = []
        for H in (0.05, 0.1, 0.2, 0.3, 0.45):
            N = 2 if H > 0.4 else 3  # params.approximate_kernel selection
            for T in (0.1, 0.5, 1.0, 2.0):
                errs = {}
                for mode in ("european", "abi-jaber", "ak", "gaussian",
                             "harms"):
                    nodes, w = quadrature_rule(H, N, T, mode=mode)
                    errs[mode] = kernel_l2_relative_error(
                        H, np.asarray(nodes), np.asarray(w), T)
                rows.append((H, N, T, errs))
                assert errs["european"] <= min(errs.values()) + 1e-12, \
                    (H, N, T, errs)
        # and not merely by a hair: on average the margin is substantial
        margins = [min(e for m, e in errs.items() if m != "european")
                   / max(errs["european"], 1e-12)
                   for (_, _, _, errs) in rows]
        assert np.median(margins) > 1.5, margins

    def test_dispatcher_unknown_mode(self):
        from stochvolmodels_tpu.models.rough.kernel import quadrature_rule
        with pytest.raises(NotImplementedError):
            quadrature_rule(0.1, 2, 1.0, mode="nope")


class TestReferenceCrossParity:
    """cross-implementation parity vs the reference's committed regression
    baseline (reference tests/test_rough_logsv_pricer_regression/*.npz): with
    the reference's kernel nodes/weights (computed by running its scipy
    RoughKernel.european_rule; H=0.1, N=3, T=0.43), our fixed-randoms rough
    chain pricer reproduces the reference's prices to <0.5% on every strike
    (z < 0.05 of MC stderr) — the numpy normal stream, Strang splitting and
    payoff assembly all match.  Note our own european_rule yields a *lower*
    L2 kernel error (0.354 vs 0.412 relative at this config) but different
    nodes, hence different default prices."""

    REF_NPZ = ("/root/reference/stochvolmodels/tests/"
               "test_rough_logsv_pricer_regression/"
               "test_rough_logsv_pricer_pricing_regression.npz")
    # output of the reference RoughKernel.european_rule(0.1, 3, 0.4301)
    REF_NODES = np.array([7.80003238e-02, 5.21204286e+00, 1.08883635e+02])
    REF_WEIGHTS = np.array([0.77792437, 1.55682086, 8.52877932])

    @pytest.mark.skipif(not os.path.exists(REF_NPZ),
                        reason="reference baseline not mounted")
    def test_prices_match_reference_baseline(self, chain):
        from stochvolmodels_tpu.models.logsv.pricer import (
            get_randoms_for_rough_vol_chain_valuation,
            rough_logsv_mc_chain_pricer_fixed_randoms,
        )
        Z0, Z1, grid_ttms = get_randoms_for_rough_vol_chain_valuation(
            ttms=chain.ttms, nb_path=10000, nb_steps_per_year=360, seed=10)
        prices, stds = rough_logsv_mc_chain_pricer_fixed_randoms(
            ttms=chain.ttms, forwards=chain.forwards,
            discfactors=chain.discfactors, strikes_ttms=chain.strikes_ttms,
            optiontypes_ttms=chain.optiontypes_ttms, Z0=Z0, Z1=Z1,
            sigma0=0.377, theta=0.347, kappa1=1.29, kappa2=1.93, beta=2.45,
            orthog_vol=1.81, weights=self.REF_WEIGHTS, nodes=self.REF_NODES,
            timegrids=grid_ttms)
        ref = np.load(self.REF_NPZ)
        for i in range(len(chain.ttms)):
            ours = np.asarray(prices[i])
            theirs = ref[f"option_prices_ttm_{i}"]
            sd = np.asarray(stds[i])
            # the rigorous criterion is the z-score: differences stay below
            # a fifth of the MC standard error at matched randoms (pathwise
            # roundoff divergence, not scheme differences)
            np.testing.assert_allclose(ours, theirs, rtol=1.5e-2,
                                       atol=1e-5 * float(chain.forwards[i]))
            assert np.max(np.abs(ours - theirs) / np.maximum(sd, 1e-8)) < 0.2


class TestKernelResearchInventory:
    """rounds out the RoughKernel research-code inventory: the unbounded OL2
    optimum (RoughKernel.py:746-871, dispatched at :1056), and the HQE-style
    discrete-kernel classes kernel_frac/kernel_rheston (:1080/:1121 — the
    reference's kernel_rheston is non-functional, referencing an undefined
    mittag_leffler)."""

    def test_ol2_beats_or_matches_bounded_rule(self):
        from stochvolmodels_tpu.models.rough.kernel import (
            european_rule,
            kernel_l2_relative_error,
            optimized_l2_rule,
            quadrature_rule,
        )
        H, N, T = 0.1, 3, 1.0
        nb, wb = european_rule(H, N, T)
        no, wo = optimized_l2_rule(H, N, T)
        e_b = kernel_l2_relative_error(H, nb, wb, T)
        e_o = kernel_l2_relative_error(H, no, wo, T)
        # the unconstrained optimum can only be (weakly) better
        assert e_o <= e_b + 1e-12, (e_o, e_b)
        # dispatcher routes OL2 to the unbounded rule, BL2 to the bounded one
        n1, _ = quadrature_rule(H, N, T, mode="OL2")
        np.testing.assert_allclose(n1, no)
        n2, _ = quadrature_rule(H, N, T, mode="BL2")
        np.testing.assert_allclose(n2, nb)

    def test_mittag_leffler_identities(self):
        from scipy.special import erfc

        from stochvolmodels_tpu.models.rough.kernel import mittag_leffler

        z = np.linspace(-25.0, 3.0, 29)
        np.testing.assert_allclose(mittag_leffler(z, 1.0, 1.0), np.exp(z),
                                   rtol=1e-10)
        # E_{1/2,1}(z) = e^{z^2} erfc(-z)
        z = np.linspace(-5.0, 2.0, 15)
        np.testing.assert_allclose(mittag_leffler(z, 0.5, 1.0),
                                   np.exp(z ** 2) * erfc(-z), rtol=1e-8)
        # both branches at the series/asymptotic switch vs 300-digit ground
        # truth (the function itself moves ~0.5% between the two points)
        a = 0.75
        lo = mittag_leffler(np.array([-79.9]), a, a)   # series branch
        hi = mittag_leffler(np.array([-80.1]), a, a)   # asymptotic branch
        np.testing.assert_allclose(lo[0], 3.324672515137835e-05, rtol=1e-10)
        np.testing.assert_allclose(hi[0], 3.3078775645068957e-05, rtol=1e-10)

    def test_kernel_frac_closed_forms(self):
        from scipy.integrate import quad

        from stochvolmodels_tpu.models.rough.kernel import kernel_frac

        H, eta, dt = 0.15, 1.3, 1.0 / 250.0
        k = kernel_frac(H=H, eta=eta)
        # K_0 = int_0^dt eta_tilde t^{H-1/2} dt
        eta_tilde = np.sqrt(2 * H) * eta
        ref0 = quad(lambda t: eta_tilde * t ** (H - 0.5), 0.0, dt)[0]
        np.testing.assert_allclose(k.K_0(dt), ref0, rtol=1e-10)
        # K_diag[j] = int_{j dt}^{(j+1) dt} (eta_tilde t^{H-1/2})^2 dt
        diag = k.K_diag(dt, 4)
        for j in range(4):
            ref = quad(lambda t: (eta_tilde * t ** (H - 0.5)) ** 2,
                       j * dt, (j + 1) * dt)[0]
            np.testing.assert_allclose(diag[j], ref, rtol=1e-9)

    def test_kernel_rheston_basics(self):
        from stochvolmodels_tpu.models.rough.kernel import kernel_rheston

        k = kernel_rheston(H=0.1, lam=0.3, zeta=0.4)
        # flat forward variance when v0 == theta
        t = np.array([0.0, 0.5, 1.0])
        np.testing.assert_allclose(k.xi(t, v0=0.04, lam=0.3, theta=0.04),
                                   np.full(3, 0.04))
        # v0 < theta: curve rises monotonically from v0 toward theta
        xi = k.xi(t, v0=0.04, lam=0.3, theta=0.09)
        assert xi[0] == 0.04 and np.all(np.diff(xi) > 0.0)
        # discrete kernel constants are positive and decreasing in the lag
        assert k.K_0(1.0 / 52.0) > 0.0
        d = k.K_diag(1.0 / 52.0, 3)
        assert np.all(d > 0.0) and d[0] > d[1] > d[2]
