"""Randomized quasi-Monte Carlo engine (TPU-native addition; the reference
has pseudo-random MC only, /root/reference/stochvolmodels/pricers/
logsv_pricer.py:843-940).

Checks: the on-device gray-code generator reproduces scipy's Sobol sequence
bit-exactly, digital-shift randomization keeps marginals uniform, the
inverse-CDF normals have the expected near-perfect moments, and the
engine='qmc' chain pricers beat pseudo-MC accuracy at matched paths against
exact (BSM) and analytic (Fourier) oracles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stochvolmodels_tpu.models.heston import heston_mc_chain_pricer
from stochvolmodels_tpu.models.logsv.pricer import (
    logsv_chain_pricer, logsv_mc_chain_pricer, simulate_logsv_terminal_qmc)
from stochvolmodels_tpu.ops import bsm
from stochvolmodels_tpu.ops.qmc import (dimension_shifts, sobol_normals,
                                        sobol_uniforms)
from stochvolmodels_tpu.ops.random import key_from_seed


class TestSobolSequence:
    def test_matches_scipy_unscrambled(self):
        """gray-code XOR formula == scipy's recursive Sobol, up to the f64
        cell-midpoint offset 2^-33."""
        from scipy.stats import qmc

        ours = np.asarray(sobol_uniforms(128, 7, key=None, dtype=jnp.float64))
        ref = qmc.Sobol(d=7, scramble=False, bits=32).random(128)
        np.testing.assert_allclose(ours, ref + 2.0 ** -33, rtol=0, atol=0)

    def test_dim_offset_consistency(self):
        """slicing the dimension axis reproduces the same columns."""
        full = np.asarray(sobol_uniforms(64, 10, key=None))
        tail = np.asarray(sobol_uniforms(64, 4, key=None, dim_offset=6))
        np.testing.assert_array_equal(full[:, 6:], tail)

    def test_digital_shift_uniform_marginals(self):
        key = key_from_seed(3)
        u = np.asarray(sobol_uniforms(1024, 8, key=key))
        assert u.min() > 0.0 and u.max() < 1.0
        # a digitally shifted (0,m,1)-net still balances each dimension
        np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=2e-3)
        # shifts are per-dimension stateless: same key -> same shift words
        s1 = np.asarray(dimension_shifts(key, 2, 6))
        s2 = np.asarray(dimension_shifts(key, 0, 6))[2:]
        np.testing.assert_array_equal(s1, s2)

    def test_normals_moments_near_perfect(self):
        z = np.asarray(sobol_normals(4096, 4, key=key_from_seed(11)))
        # QMC moments at 4096 points are far inside the ~1/64 MC noise
        np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=5e-3)
        np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-2)
        assert np.all(np.isfinite(z))

    def test_f32_unit_interval_safe(self):
        u = np.asarray(sobol_uniforms(256, 3, key=None, dtype=jnp.float32))
        assert u.dtype == np.float32
        assert u.min() > 0.0 and u.max() < 1.0


TTMS = np.array([0.5])
FORWARDS = np.array([1.0])
DISCS = np.array([1.0])
STRIKES = [np.array([0.8, 0.9, 1.0, 1.1, 1.2])]
TYPES = [np.array(['P', 'P', 'C', 'C', 'C'])]


class TestQmcEngines:
    def test_qmc_beats_mc_on_gbm_oracle(self):
        """with sigma0=theta and beta=volvol=0 the LogSV dynamics are exact
        GBM, so BSM is an exact oracle: the Sobol run must beat pseudo-MC
        at matched paths by a wide margin."""
        vol = 0.2
        kwargs = dict(ttms=TTMS, forwards=FORWARDS, discfactors=DISCS,
                      strikes_ttms=STRIKES, optiontypes_ttms=TYPES,
                      v0=vol, theta=vol, kappa1=2.0, kappa2=2.0, beta=0.0,
                      volvol=0.0, nb_path=4096, nb_steps_per_year=32, seed=17)
        exact = np.asarray(bsm.compute_bsm_vanilla_slice_prices(
            ttm=float(TTMS[0]), forward=1.0, strikes=STRIKES[0],
            vols=np.full(5, vol), optiontypes=TYPES[0]))
        p_mc, _ = logsv_mc_chain_pricer(**kwargs)
        p_qmc, _ = logsv_mc_chain_pricer(engine="qmc", qmc_replicates=0,
                                         **kwargs)
        err_mc = np.sqrt(np.mean((p_mc[0] - exact) ** 2))
        err_qmc = np.sqrt(np.mean((p_qmc[0] - exact) ** 2))
        # measured 44x at this seed (rms 1.1e-5 vs 4.8e-4); assert with 4x
        # headroom so the gate is robust to jax PRNG-detail changes
        assert err_qmc < 0.1 * err_mc, (err_qmc, err_mc)
        assert err_qmc < 5e-5

    def test_rqmc_replicate_stderr_honest_on_gbm(self):
        """R=8 independently digitally-shifted replicates: the reported
        standard error must be an honest estimate of the realized QMC
        error against the exact BSM oracle — same scale as the realized
        RMS error (the iid per-path formula, by contrast, overstates the
        QMC error by one-to-two orders of magnitude)."""
        vol = 0.2
        kwargs = dict(ttms=TTMS, forwards=FORWARDS, discfactors=DISCS,
                      strikes_ttms=STRIKES, optiontypes_ttms=TYPES,
                      v0=vol, theta=vol, kappa1=2.0, kappa2=2.0, beta=0.0,
                      volvol=0.0, nb_path=8192, nb_steps_per_year=32, seed=17)
        exact = np.asarray(bsm.compute_bsm_vanilla_slice_prices(
            ttm=float(TTMS[0]), forward=1.0, strikes=STRIKES[0],
            vols=np.full(5, vol), optiontypes=TYPES[0]))
        p_rq, s_rq = logsv_mc_chain_pricer(engine="qmc", qmc_replicates=8,
                                           **kwargs)
        _, s_iid = logsv_mc_chain_pricer(engine="qmc", qmc_replicates=0,
                                         **kwargs)
        err = np.abs(p_rq[0] - exact)
        # every realized error inside 4 reported stderrs (no silent bias)
        assert np.all(err < 4.0 * s_rq[0] + 1e-8), (err, s_rq[0])
        # scale match: realized rms error within ~3x of the mean reported
        # stderr either way (chi-squared noise at R=8 over 5 strikes)
        ratio = np.sqrt(np.mean(err ** 2)) / np.mean(s_rq[0])
        assert 0.25 < ratio < 3.0, ratio
        # and the honest stderr is far below the iid upper bound
        assert np.mean(s_rq[0]) < 0.3 * np.mean(s_iid[0]), \
            (np.mean(s_rq[0]), np.mean(s_iid[0]))

    def test_qmc_chain_continues_sequence(self):
        """a 2-maturity chain must consume disjoint dimensions: terminal
        states at the second maturity differ from a fresh-sequence restart
        but prices stay consistent."""
        key = key_from_seed(5)
        n = 2048
        x0 = jnp.zeros(n)
        s0 = jnp.full(n, 0.8)
        q0 = jnp.zeros(n)
        xa, sa, qa = simulate_logsv_terminal_qmc(
            key=key, x0=x0, sigma0=s0, qvar0=q0, ttm=0.1, theta=0.9,
            kappa1=2.0, kappa2=2.0, beta=0.2, volvol=1.5,
            nb_steps_per_year=120)
        from stochvolmodels_tpu.ops.qmc import qmc_dims_per_slice

        xb, _, _ = simulate_logsv_terminal_qmc(
            key=key, x0=xa, sigma0=sa, qvar0=qa, ttm=0.1, theta=0.9,
            kappa1=2.0, kappa2=2.0, beta=0.2, volvol=1.5,
            nb_steps_per_year=120, dim_offset=qmc_dims_per_slice(12))
        xb_restart, _, _ = simulate_logsv_terminal_qmc(
            key=key, x0=xa, sigma0=sa, qvar0=qa, ttm=0.1, theta=0.9,
            kappa1=2.0, kappa2=2.0, beta=0.2, volvol=1.5,
            nb_steps_per_year=120, dim_offset=0)
        assert not np.allclose(np.asarray(xb), np.asarray(xb_restart))
        assert np.all(np.isfinite(np.asarray(xb)))

    def test_logsv_qmc_chain_matches_analytic(self):
        """full LogSV: the 16k-path QMC chain must sit within tight bands of
        the Fourier price (reference-contract dynamics, logsv_pricer.py:
        699-760)."""
        from stochvolmodels_tpu.models.logsv.params import LogSvParams

        params = LogSvParams(sigma0=0.9, theta=1.0, kappa1=4.0, kappa2=4.0,
                             beta=0.15, volvol=1.75)
        ttms = np.array([0.25])
        strikes = [np.linspace(0.7, 1.4, 8)]
        types = [np.array(['P', 'P', 'P', 'C', 'C', 'C', 'C', 'C'])]
        analytic = logsv_chain_pricer(
            params=params, ttms=ttms, forwards=np.ones(1),
            discfactors=np.ones(1), strikes_ttms=strikes,
            optiontypes_ttms=types)
        p_qmc, s_qmc = logsv_mc_chain_pricer(
            ttms=ttms, forwards=np.ones(1), discfactors=np.ones(1),
            strikes_ttms=strikes, optiontypes_ttms=types, v0=0.9,
            theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.15, volvol=1.75,
            nb_path=16384, nb_steps_per_year=360, seed=24, engine="qmc")
        # discretization bias dominates at 360 steps/yr; 3 iid-formula
        # stderrs is already conservative for QMC
        tol = np.maximum(3.0 * s_qmc[0], 2e-3)
        assert np.all(np.abs(p_qmc[0] - np.asarray(analytic[0])) < tol)

    def test_heston_qmc_chain_matches_analytic(self):
        from stochvolmodels_tpu.data.option_chain import OptionChain
        from stochvolmodels_tpu.models.heston import HestonParams, HestonPricer

        ttms = np.array([0.5])
        strikes = [np.linspace(0.8, 1.2, 5)]
        types = [np.array(['P', 'P', 'C', 'C', 'C'])]
        chain = OptionChain(ttms=ttms, forwards=np.ones(1),
                            discfactors=np.ones(1), strikes_ttms=strikes,
                            optiontypes_ttms=types)
        params = HestonParams(v0=0.04, theta=0.04, kappa=2.0, rho=-0.5,
                              volvol=0.6)
        analytic = HestonPricer().price_chain(option_chain=chain, params=params)
        p_qmc, s_qmc = heston_mc_chain_pricer(
            ttms=ttms, forwards=np.ones(1), discfactors=np.ones(1),
            strikes_ttms=strikes, optiontypes_ttms=types, v0=0.04,
            theta=0.04, kappa=2.0, rho=-0.5, volvol=0.6,
            nb_path=16384, seed=24, engine="qmc")
        tol = np.maximum(3.0 * s_qmc[0], 2e-3)
        assert np.all(np.abs(p_qmc[0] - np.asarray(analytic[0])) < tol)

    def test_qmc_fixed_randoms_matches_qmc_engine(self):
        """the materialized QMC blocks (fixed-randoms contract) and the
        scan QMC engine consume the same dims from the same key, so the
        chain prices must agree to float tolerance."""
        from stochvolmodels_tpu.models.logsv.pricer import (
            get_qmc_randoms_for_chain_valuation,
            logsv_mc_chain_pricer_fixed_randoms)

        ttms = np.array([0.1, 0.3])
        strikes = [np.array([0.9, 1.0, 1.1])] * 2
        types = [np.array(['P', 'C', 'C'])] * 2
        kwargs = dict(ttms=ttms, forwards=np.ones(2), discfactors=np.ones(2),
                      strikes_ttms=strikes, optiontypes_ttms=types,
                      theta=0.9, kappa1=3.0, kappa2=3.0, beta=0.2, volvol=1.5)
        W0s, W1s, dts = get_qmc_randoms_for_chain_valuation(
            ttms=ttms, nb_path=2048, nb_steps_per_year=120, seed=7)
        p_fixed, _ = logsv_mc_chain_pricer_fixed_randoms(
            W0s=W0s, W1s=W1s, dts=dts, v0=0.8, **kwargs)
        p_qmc, _ = logsv_mc_chain_pricer(
            v0=0.8, nb_path=2048, nb_steps_per_year=120, seed=7,
            engine="qmc", qmc_replicates=0, **kwargs)
        for a, b in zip(p_fixed, p_qmc):
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)

    def test_mc_calibration_with_qmc_engine(self):
        """calibration_engine=MC with mc_engine='qmc': the frozen-Sobol
        objective is smooth in params and the SLSQP fit recovers a sane
        smile from an analytic target at only 4096 paths."""
        from stochvolmodels_tpu.data.option_chain import OptionChain
        from stochvolmodels_tpu.models.logsv.params import LogSvParams
        from stochvolmodels_tpu.models.logsv.pricer import (
            CalibrationEngine, LogSVPricer)

        true = LogSvParams(sigma0=0.85, theta=0.95, kappa1=4.0, kappa2=4.0,
                           beta=0.2, volvol=1.6)
        ttms = np.array([0.25])
        strikes = [np.linspace(0.8, 1.3, 6)]
        types = [np.array(['P', 'P', 'C', 'C', 'C', 'C'])]
        pricer = LogSVPricer()
        chain0 = OptionChain(ttms=ttms, forwards=np.ones(1),
                             discfactors=np.ones(1), strikes_ttms=strikes,
                             optiontypes_ttms=types)
        _, ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain0, params=true)
        chain = OptionChain(ttms=ttms, forwards=np.ones(1),
                            discfactors=np.ones(1), strikes_ttms=strikes,
                            optiontypes_ttms=types, bid_ivs=ivols,
                            ask_ivs=ivols)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain,
            params0=LogSvParams(sigma0=0.8, theta=0.9, kappa1=4.0,
                                kappa2=4.0, beta=0.1, volvol=1.4),
            calibration_engine=CalibrationEngine.MC, mc_engine='qmc',
            nb_path=4096, nb_steps=120, use_float32=False)
        assert np.isfinite(fit.sigma0) and 0.5 < fit.sigma0 < 1.2
        # MC-implied vols of the fit must track the target smile closely
        _, fit_ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain0, params=fit)
        assert np.nanmax(np.abs(fit_ivols[0] - ivols[0])) < 0.02

    def test_unknown_engine_rejected(self):
        with pytest.raises(NotImplementedError):
            logsv_mc_chain_pricer(ttms=TTMS, forwards=FORWARDS,
                                  discfactors=DISCS, strikes_ttms=STRIKES,
                                  optiontypes_ttms=TYPES, v0=0.8, theta=0.9,
                                  kappa1=2.0, kappa2=2.0, beta=0.1,
                                  volvol=1.0, engine="sobol")
