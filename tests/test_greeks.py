"""
AD chain greeks (models/greeks.py) — validated against central finite
differences of the same pricers and against BSM greeks in the flat-vol
Heston limit (volvol -> 0, v0 = theta gives Black with sigma = sqrt(v0)).
"""
import numpy as np
import pytest

from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.models.greeks import (heston_chain_greeks,
                                              logsv_chain_greeks)
from stochvolmodels_tpu.models.heston import HestonParams, HestonPricer
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer


def small_chain(forward: float = 1.0) -> OptionChain:
    return OptionChain(
        ttms=np.array([0.08, 0.25]),
        forwards=np.array([forward, forward * 1.002]),
        discfactors=np.array([0.999, 0.995]),
        strikes_ttms=[forward * np.array([0.85, 0.95, 1.0, 1.05, 1.2]),
                      forward * np.array([0.8, 1.0, 1.25])],
        optiontypes_ttms=[np.array(['P', 'P', 'C', 'C', 'C']),
                          np.array(['P', 'C', 'C'])])


LOGSV = LogSvParams(sigma0=0.85, theta=1.0, kappa1=4.0, kappa2=4.0,
                    beta=0.15, volvol=1.8)
HESTON = HestonParams(v0=0.7, theta=0.9, kappa=3.0, rho=-0.4, volvol=1.5)


class TestLogSVGreeks:
    # 240 (not the 360 fast-mode default): the FD comparisons hold at any
    # step count as long as both sides share it, and the suite's top
    # offenders were these tests' 7+ chain evaluations per FD on one CPU
    # core (r04 verdict item 5).  NOT coarser: 120 steps/yr landed a
    # moment-exploding phi-lane mid-divergence on the bumped params (huge
    # finite Re log-MGF below the nansum drop cap -> 1e280 "prices" — the
    # same failure mode the exact-path step study documents at 180/yr;
    # 240 is the coarsest setting with a clean margin, PARITY.md).
    YEAR_STEPS = 240

    def greeks(self, chain, params, greeks):
        return logsv_chain_greeks(chain, params, greeks=greeks,
                                  year_steps=self.YEAR_STEPS)

    def test_delta_gamma_vs_finite_differences(self):
        chain = small_chain()
        out = self.greeks(chain, LOGSV, ("delta", "gamma"))
        eps = 1e-4
        # frozen vol_scaler across bumps: use the unbumped scaler for all
        from stochvolmodels_tpu.models.logsv.pricer import set_vol_scaler
        vs = set_vol_scaler(sigma0=LOGSV.sigma0, ttm=float(np.min(chain.ttms)))

        def grid_prices(fmult):
            c = small_chain()
            c.forwards = c.forwards * fmult
            return logsv_chain_greeks(c, LOGSV, greeks=(), vol_scaler=vs,
                                      year_steps=self.YEAR_STEPS)["price"]

        up, dn = grid_prices(1.0 + eps), grid_prices(1.0 - eps)
        mid = grid_prices(1.0)
        for i, f in enumerate(chain.forwards):
            h = f * eps
            fd_delta = (up[i] - dn[i]) / (2 * h)
            fd_gamma = (up[i] - 2 * mid[i] + dn[i]) / (h * h)
            np.testing.assert_allclose(out["delta"][i], fd_delta,
                                       rtol=2e-4, atol=1e-7)
            np.testing.assert_allclose(out["gamma"][i], fd_gamma,
                                       rtol=2e-3, atol=5e-4)

    def test_param_greeks_vs_finite_differences(self):
        chain = small_chain()
        out = self.greeks(chain, LOGSV, ("vega", "beta", "volvol"))
        from stochvolmodels_tpu.models.logsv.pricer import set_vol_scaler
        vs = set_vol_scaler(sigma0=LOGSV.sigma0, ttm=float(np.min(chain.ttms)))
        eps = 1e-4
        for name in ("sigma0", "beta", "volvol"):
            d = LOGSV.to_dict()
            d_up = {**d, name: d[name] + eps}
            d_dn = {**d, name: d[name] - eps}
            up = logsv_chain_greeks(chain, LogSvParams(**{
                k: d_up[k] for k in ("sigma0", "theta", "kappa1", "kappa2",
                                     "beta", "volvol")}), greeks=(),
                vol_scaler=vs, year_steps=self.YEAR_STEPS)["price"]
            dn = logsv_chain_greeks(chain, LogSvParams(**{
                k: d_dn[k] for k in ("sigma0", "theta", "kappa1", "kappa2",
                                     "beta", "volvol")}), greeks=(),
                vol_scaler=vs, year_steps=self.YEAR_STEPS)["price"]
            key = "vega" if name == "sigma0" else name
            for i in range(len(chain.ttms)):
                fd = (up[i] - dn[i]) / (2 * eps)
                np.testing.assert_allclose(out[key][i], fd,
                                           rtol=5e-4, atol=1e-6)

    def test_sanity_signs(self):
        chain = small_chain()
        out = self.greeks(chain, LOGSV, ("delta", "gamma", "vega"))
        for i, (codes, df) in enumerate(zip(chain.optiontypes_ttms,
                                            chain.discfactors)):
            is_call = codes == 'C'
            assert np.all(out["delta"][i][is_call] > 0.0)
            assert np.all(out["delta"][i][is_call] <= df + 1e-9)
            assert np.all(out["delta"][i][~is_call] < 0.0)
            assert np.all(out["gamma"][i] > 0.0)
            assert np.all(out["vega"][i] > 0.0)

    def test_pricer_method_and_price_consistency(self):
        chain = small_chain()
        out = LogSVPricer().compute_chain_greeks(chain, LOGSV,
                                                 greeks=("delta",),
                                                 year_steps=self.YEAR_STEPS)
        base = logsv_chain_greeks(chain, LOGSV, greeks=(),
                                  year_steps=self.YEAR_STEPS)["price"]
        for i in range(len(chain.ttms)):
            np.testing.assert_allclose(out["price"][i], base[i], rtol=1e-12)

    def test_calendar_theta_vs_finite_differences(self):
        """theta_calendar (internal central FD at dt=1/365) validated
        against an independent FD at a different step through manually
        shifted chains (fixed rates, fixed forwards)."""
        chain = small_chain()
        from stochvolmodels_tpu.models.logsv.pricer import set_vol_scaler
        vs = set_vol_scaler(sigma0=LOGSV.sigma0, ttm=float(np.min(chain.ttms)))
        out = logsv_chain_greeks(chain, LOGSV, greeks=("theta_calendar",),
                                 vol_scaler=vs, year_steps=self.YEAR_STEPS)
        h = 0.5 / 365.0
        rates = -np.log(chain.discfactors) / chain.ttms

        def prices(shift):
            c = small_chain()
            c.ttms = c.ttms + shift
            c.discfactors = np.exp(-rates * c.ttms)
            return logsv_chain_greeks(c, LOGSV, greeks=(), vol_scaler=vs,
                                      year_steps=self.YEAR_STEPS)["price"]

        up, dn = prices(h), prices(-h)
        for i in range(len(chain.ttms)):
            fd = -(up[i] - dn[i]) / (2.0 * h)
            np.testing.assert_allclose(out["theta_calendar"][i], fd,
                                       rtol=5e-3, atol=5e-5)
            # vanillas lose time value as the calendar advances (df ~ 1)
            assert np.all(out["theta_calendar"][i] < 0.0)


class TestIVSpaceGreeks:
    """in_vols=True: greeks expressed as implied-vol sensitivities via the
    inverter's implicit-function custom_jvp composed into the program."""
    YEAR_STEPS = 360

    def test_iv_vega_and_delta_vs_finite_differences(self):
        from stochvolmodels_tpu.models.logsv.pricer import set_vol_scaler
        chain = small_chain()
        vs = set_vol_scaler(sigma0=LOGSV.sigma0, ttm=float(np.min(chain.ttms)))
        out = logsv_chain_greeks(chain, LOGSV, greeks=("delta", "vega"),
                                 vol_scaler=vs, year_steps=self.YEAR_STEPS,
                                 in_vols=True)

        def ivols(params, fmult=1.0):
            c = small_chain()
            c.forwards = c.forwards * fmult
            return logsv_chain_greeks(c, params, greeks=(), vol_scaler=vs,
                                      year_steps=self.YEAR_STEPS,
                                      in_vols=True)["ivol"]

        eps = 1e-4
        up, dn = ivols(LOGSV, 1 + eps), ivols(LOGSV, 1 - eps)
        d = LOGSV.to_dict()
        mk = lambda s0: LogSvParams(sigma0=s0, theta=d["theta"],
                                    kappa1=d["kappa1"], kappa2=d["kappa2"],
                                    beta=d["beta"], volvol=d["volvol"])
        vup, vdn = ivols(mk(LOGSV.sigma0 + eps)), ivols(mk(LOGSV.sigma0 - eps))
        for i, f in enumerate(chain.forwards):
            fd_delta = (up[i] - dn[i]) / (2 * f * eps)
            fd_vega = (vup[i] - vdn[i]) / (2 * eps)
            np.testing.assert_allclose(out["delta"][i], fd_delta,
                                       rtol=2e-3, atol=2e-5)
            np.testing.assert_allclose(out["vega"][i], fd_vega,
                                       rtol=5e-4, atol=1e-6)
        # IV vega of a stochastic-vol model: higher sigma0 lifts the smile
        for v in out["vega"]:
            assert np.all(v > 0.0)
        # ivol panel matches prices: invert independently
        from stochvolmodels_tpu.ops import bsm
        for i, (ttm, f, df) in enumerate(zip(chain.ttms, chain.forwards,
                                             chain.discfactors)):
            iv_ref = np.asarray(bsm.infer_bsm_implied_vol(
                forward=f, ttm=ttm, strike=chain.strikes_ttms[i],
                given_price=out["price"][i], discfactor=df,
                optiontype=chain.optiontypes_ttms[i]))
            np.testing.assert_allclose(out["ivol"][i], iv_ref, atol=1e-7)

    def test_heston_iv_greeks_finite(self):
        chain = small_chain()
        out = heston_chain_greeks(chain, HESTON, greeks=("delta", "vega"),
                                  in_vols=True)
        for i in range(len(chain.ttms)):
            assert np.all(np.isfinite(out["ivol"][i]))
            assert np.all(out["vega"][i] > 0.0)
            assert np.all(np.isfinite(out["delta"][i]))


class TestHestonGreeks:
    def test_delta_vega_vs_finite_differences(self):
        chain = small_chain()
        out = heston_chain_greeks(chain, HESTON,
                                  greeks=("delta", "gamma", "vega", "rho"))
        vs = float(np.minimum(0.3, np.sqrt(HESTON.v0 * np.min(chain.ttms))))
        eps = 1e-4

        def prices(params, fmult=1.0):
            c = small_chain()
            c.forwards = c.forwards * fmult
            return heston_chain_greeks(c, params, greeks=(),
                                       vol_scaler=vs)["price"]

        up, dn, mid = prices(HESTON, 1 + eps), prices(HESTON, 1 - eps), \
            prices(HESTON)
        vup = prices(HestonParams(v0=HESTON.v0 + eps, theta=HESTON.theta,
                                  kappa=HESTON.kappa, rho=HESTON.rho,
                                  volvol=HESTON.volvol))
        vdn = prices(HestonParams(v0=HESTON.v0 - eps, theta=HESTON.theta,
                                  kappa=HESTON.kappa, rho=HESTON.rho,
                                  volvol=HESTON.volvol))
        rup = prices(HestonParams(v0=HESTON.v0, theta=HESTON.theta,
                                  kappa=HESTON.kappa, rho=HESTON.rho + eps,
                                  volvol=HESTON.volvol))
        rdn = prices(HestonParams(v0=HESTON.v0, theta=HESTON.theta,
                                  kappa=HESTON.kappa, rho=HESTON.rho - eps,
                                  volvol=HESTON.volvol))
        for i, f in enumerate(chain.forwards):
            h = f * eps
            np.testing.assert_allclose(out["delta"][i], (up[i] - dn[i]) / (2 * h),
                                       rtol=2e-4, atol=1e-7)
            np.testing.assert_allclose(out["gamma"][i],
                                       (up[i] - 2 * mid[i] + dn[i]) / (h * h),
                                       rtol=2e-3, atol=5e-4)
            np.testing.assert_allclose(out["vega"][i], (vup[i] - vdn[i]) / (2 * eps),
                                       rtol=5e-4, atol=1e-6)
            np.testing.assert_allclose(out["rho"][i], (rup[i] - rdn[i]) / (2 * eps),
                                       rtol=5e-4, atol=1e-6)

    def test_flat_vol_limit_matches_bsm_delta(self):
        """volvol -> 0, v0 = theta: Heston degenerates to Black with
        sigma = sqrt(v0); AD delta must match the BSM closed form."""
        from stochvolmodels_tpu.ops import bsm
        sigma = 0.6
        flat = HestonParams(v0=sigma ** 2, theta=sigma ** 2, kappa=2.0,
                            rho=0.0, volvol=1e-4)
        chain = small_chain()
        out = heston_chain_greeks(chain, flat, greeks=("delta",))
        for i, (ttm, f, df, strikes, codes) in enumerate(zip(
                chain.ttms, chain.forwards, chain.discfactors,
                chain.strikes_ttms, chain.optiontypes_ttms)):
            ref = np.asarray([
                float(bsm.compute_bsm_vanilla_delta(
                    ttm=ttm, forward=f, strike=k, vol=sigma,
                    optiontype=ot, discfactor=df))
                for k, ot in zip(strikes, codes)])
            np.testing.assert_allclose(out["delta"][i], ref, atol=2e-4)

    def test_flat_vol_limit_matches_bsm_theta(self):
        """volvol -> 0, v0 = theta, r = 0 (df = 1, so the spot-fixed BSM
        theta convention coincides with the forward-fixed chain theta):
        calendar theta must match the closed-form Black decay."""
        from stochvolmodels_tpu.ops import bsm
        sigma = 0.6
        flat = HestonParams(v0=sigma ** 2, theta=sigma ** 2, kappa=2.0,
                            rho=0.0, volvol=1e-4)
        chain = small_chain()
        chain.discfactors = np.ones_like(chain.discfactors)
        out = heston_chain_greeks(chain, flat, greeks=("theta_calendar",))
        for i, (ttm, f, strikes, codes) in enumerate(zip(
                chain.ttms, chain.forwards,
                chain.strikes_ttms, chain.optiontypes_ttms)):
            ref = np.asarray([
                float(bsm.compute_bsm_vanilla_theta(
                    ttm=ttm, forward=f, strike=k, vol=sigma,
                    optiontype=ot, discfactor=1.0, discount_rate=0.0))
                for k, ot in zip(strikes, codes)])
            np.testing.assert_allclose(out["theta_calendar"][i], ref,
                                       atol=1e-3)

    def test_unknown_greek_raises(self):
        with pytest.raises(ValueError):
            heston_chain_greeks(small_chain(), HESTON, greeks=("smile",))


class TestMCPathwiseGreeks:
    """pathwise MC greeks: jvp at a fixed threefry key must match central
    finite differences of the SAME fixed-key MC program (common random
    numbers make the FD nearly noise-free), and agree with the analytic AD
    greeks within MC error."""
    NB_PATH = 16384
    STEPS = 180

    def test_mc_delta_vega_vs_fixed_key_fd(self):
        from stochvolmodels_tpu.models.greeks import logsv_mc_chain_greeks
        chain = small_chain()
        out = logsv_mc_chain_greeks(chain, LOGSV, greeks=("delta", "vega"),
                                    nb_path=self.NB_PATH,
                                    nb_steps_per_year=self.STEPS, seed=7)

        def prices(params, fmult=1.0):
            c = small_chain()
            c.forwards = c.forwards * fmult
            return logsv_mc_chain_greeks(c, params, greeks=(),
                                         nb_path=self.NB_PATH,
                                         nb_steps_per_year=self.STEPS,
                                         seed=7)["price"]

        eps = 1e-4
        up, dn = prices(LOGSV, 1 + eps), prices(LOGSV, 1 - eps)
        d = LOGSV.to_dict()
        mk = lambda s0: LogSvParams(sigma0=s0, theta=d["theta"],
                                    kappa1=d["kappa1"], kappa2=d["kappa2"],
                                    beta=d["beta"], volvol=d["volvol"])
        vup, vdn = prices(mk(LOGSV.sigma0 + eps)), prices(mk(LOGSV.sigma0 - eps))
        for i, f in enumerate(chain.forwards):
            fd_delta = (up[i] - dn[i]) / (2 * f * eps)
            fd_vega = (vup[i] - vdn[i]) / (2 * eps)
            np.testing.assert_allclose(out["delta"][i], fd_delta,
                                       rtol=5e-3, atol=5e-4)
            np.testing.assert_allclose(out["vega"][i], fd_vega,
                                       rtol=5e-3, atol=5e-4)

    def test_mc_greeks_match_analytic_within_mc_error(self):
        from stochvolmodels_tpu.models.greeks import logsv_mc_chain_greeks
        chain = small_chain()
        mc = logsv_mc_chain_greeks(chain, LOGSV, greeks=("delta", "vega"),
                                   nb_path=self.NB_PATH,
                                   nb_steps_per_year=self.STEPS, seed=7)
        an = logsv_chain_greeks(chain, LOGSV, greeks=("delta", "vega"),
                                year_steps=360)
        for i in range(len(chain.ttms)):
            # loose: 16k paths, different discretizations
            np.testing.assert_allclose(mc["delta"][i], an["delta"][i],
                                       atol=0.03)
            np.testing.assert_allclose(mc["vega"][i], an["vega"][i],
                                       atol=0.03)

    def test_mc_gamma_rejected(self):
        from stochvolmodels_tpu.models.greeks import logsv_mc_chain_greeks
        with pytest.raises(ValueError):
            logsv_mc_chain_greeks(small_chain(), LOGSV, greeks=("gamma",))


class TestSwaptionCubeGreeks:
    """factor-HJM swaption sensitivities via jvp over the batched cube
    pricer — checked against finite differences of the same cube fn."""

    def setup_cube(self):
        import jax.numpy as jnp

        from stochvolmodels_tpu.models.factor_hjm.rate_factor_basis import (
            NelsonSiegel)
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_params import (
            MultiFactRateLogSvParams, TermStructure)
        ts = np.array([0.0, 1.0, 2.0, 5.0])
        params = MultiFactRateLogSvParams(
            sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=1.0,
            beta=TermStructure(ts=ts, xs=np.array([[0.25, -0.1, 0.0],
                                                   [0.1, 0.05, -0.05],
                                                   [0.0, 0.0, 0.0]])),
            volvol=TermStructure(ts=ts, xs=np.array([0.4, 0.3, 0.3])),
            A=np.array([0.01, 0.01, 0.01]), R=np.eye(3),
            basis=NelsonSiegel(meanrev=0.25,
                               key_terms=np.array([1.0, 5.0, 10.0])),
            ccy="USD")
        slices = [(1.0, 1.0), (2.0, 5.0)]
        strikes = [np.array([-0.01, 0.0, 0.01]), np.array([0.0, 0.01])]
        fwds = [0.0, 0.0]
        return params, slices, fwds, strikes, jnp

    def test_cube_greeks_vs_finite_differences(self):
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn)
        from stochvolmodels_tpu.models.greeks import swaption_cube_greeks
        params, slices, fwds, strikes, jnp = self.setup_cube()
        panels, mask = swaption_cube_greeks(params, slices, fwds, strikes,
                                            year_steps=24)
        cube_fn, _ = make_swaption_cube_fn(params, slices, fwds, strikes,
                                           year_steps=24)
        s0 = jnp.asarray(1.0)
        b = jnp.asarray(params.beta.xs)
        v = jnp.asarray(params.volvol.xs)
        eps = 1e-5
        fd = {
            "vega": (np.asarray(cube_fn(s0 + eps, b, v))
                     - np.asarray(cube_fn(s0 - eps, b, v))) / (2 * eps),
            "beta_shift": (np.asarray(cube_fn(s0, b + eps, v))
                           - np.asarray(cube_fn(s0, b - eps, v))) / (2 * eps),
            "volvol_shift": (np.asarray(cube_fn(s0, b, v + eps))
                             - np.asarray(cube_fn(s0, b, v - eps))) / (2 * eps),
        }
        assert np.all(panels["vega"][mask] > 0.0)  # long vol
        for g, ref in fd.items():
            np.testing.assert_allclose(panels[g][mask], ref[mask],
                                       rtol=2e-4, atol=1e-9)

    def test_unknown_greek_raises(self):
        from stochvolmodels_tpu.models.greeks import swaption_cube_greeks
        params, slices, fwds, strikes, _ = self.setup_cube()
        with pytest.raises(ValueError):
            swaption_cube_greeks(params, slices, fwds, strikes,
                                 greeks=("delta",), year_steps=120)

    @pytest.mark.slow
    def test_frozen_panel_greek_bias_bounded(self):
        """the cube greeks jvp holds the QA structural panels frozen
        (they re-freeze per calibration iteration, not per tangent); the
        mean-state ODE depends weakly on (sigma0, beta) through the vol
        drift, so the frozen-jvp differs from the total derivative (FD
        with panels REBUILT at the bumped params) at second order.  This
        bounds that inconsistency: the relative gap must stay small, so
        the documented 'frozen panels' caveat is quantified, not open."""
        import copy

        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn)
        from stochvolmodels_tpu.models.greeks import swaption_cube_greeks
        params, slices, fwds, strikes, jnp = self.setup_cube()
        ys = 24

        def total_price(p):
            fn, _ = make_swaption_cube_fn(p, slices, fwds, strikes,
                                          year_steps=ys)
            return np.asarray(fn(jnp.asarray(p.sigma0),
                                 jnp.asarray(p.beta.xs),
                                 jnp.asarray(p.volvol.xs)))

        panels, mask = swaption_cube_greeks(
            params, slices, fwds, strikes,
            greeks=("vega", "beta_shift"), year_steps=ys)
        eps = 1e-3
        p_up, p_dn = copy.deepcopy(params), copy.deepcopy(params)
        p_up.sigma0 = params.sigma0 + eps
        p_dn.sigma0 = params.sigma0 - eps
        fd_vega = (total_price(p_up) - total_price(p_dn)) / (2 * eps)
        b_up, b_dn = copy.deepcopy(params), copy.deepcopy(params)
        b_up.beta.xs = params.beta.xs + eps
        b_dn.beta.xs = params.beta.xs - eps
        fd_beta = (total_price(b_up) - total_price(b_dn)) / (2 * eps)
        for g, fd in (("vega", fd_vega), ("beta_shift", fd_beta)):
            scale = np.max(np.abs(fd[mask]))
            gap = np.max(np.abs(panels[g][mask] - fd[mask])) / scale
            # second-order effect; 5% relative is the documented bound
            assert gap < 0.05, (g, gap)
