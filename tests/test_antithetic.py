"""Antithetic-variates MC (TPU-native addition; the reference has no
variance reduction — its MC engines are plain Euler with fresh normals,
/root/reference/stochvolmodels/pricers/logsv_pricer.py:843-940).

Checks: the coupling is an exact mirror, the pair-averaged stderr estimator
is genuinely smaller than the plain-MC stderr at matched path counts, and
prices stay consistent with plain MC within the combined error bars.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stochvolmodels_tpu.models.heston import heston_mc_chain_pricer
from stochvolmodels_tpu.models.logsv.pricer import (logsv_mc_chain_pricer,
                                                    simulate_logsv_terminal)
from stochvolmodels_tpu.ops.random import antithetic_step_normals, key_from_seed

TTMS = np.array([0.25])
FORWARDS = np.array([100.0])
DISCS = np.array([1.0])
STRIKES = [np.array([80.0, 90.0, 100.0, 110.0, 120.0])]
TYPES = [np.array(['P', 'P', 'C', 'C', 'C'])]


class TestAntithetic:
    def test_mirrored_coupling_exact(self):
        """with beta=volvol=0 the vol path is deterministic, so antithetic
        pairs of X must sum to exactly twice the deterministic drift."""
        nb_path = 64
        key = key_from_seed(7)
        x, sigma, qvar = simulate_logsv_terminal(
            key=key, x0=jnp.zeros(nb_path), sigma0=0.5 * jnp.ones(nb_path),
            qvar0=jnp.zeros(nb_path), ttm=0.25, theta=0.5, kappa1=2.0,
            kappa2=2.0, beta=0.0, volvol=0.0, antithetic=True)
        pair_sum = np.asarray(x[:32] + x[32:])
        np.testing.assert_allclose(pair_sum, pair_sum[0], rtol=0, atol=1e-12)
        # sigma path identical across the pair (no vol noise)
        np.testing.assert_allclose(np.asarray(sigma[:32]), np.asarray(sigma[32:]))

    def test_antithetic_normals_shape_and_mirror(self):
        w = antithetic_step_normals(key_from_seed(1), 3, (2, 10), dtype=jnp.float64)
        assert w.shape == (2, 10)
        np.testing.assert_allclose(np.asarray(w[:, :5]), -np.asarray(w[:, 5:]))
        with pytest.raises(ValueError):
            antithetic_step_normals(key_from_seed(1), 3, (2, 9))

    def test_logsv_stderr_reduction_and_consistency(self):
        kwargs = dict(ttms=TTMS, forwards=FORWARDS, discfactors=DISCS,
                      strikes_ttms=STRIKES, optiontypes_ttms=TYPES,
                      v0=0.8, theta=0.9, kappa1=2.2, kappa2=2.2, beta=0.15,
                      volvol=1.8, nb_path=20000, seed=42)
        p_plain, s_plain = logsv_mc_chain_pricer(**kwargs)
        p_anti, s_anti = logsv_mc_chain_pricer(antithetic=True, **kwargs)
        # pair-averaged stderr must beat plain MC overall at matched paths
        assert np.sum(s_anti[0]) < np.sum(s_plain[0])
        # and prices must agree within the combined error bars
        tol = 4.0 * np.hypot(s_plain[0], s_anti[0])
        assert np.all(np.abs(p_plain[0] - p_anti[0]) < tol)

    def test_heston_stderr_reduction_and_consistency(self):
        kwargs = dict(ttms=TTMS, forwards=FORWARDS, discfactors=DISCS,
                      strikes_ttms=STRIKES, optiontypes_ttms=TYPES,
                      v0=0.2, theta=0.2, kappa=4.0, rho=-0.5, volvol=0.75,
                      nb_path=20000, seed=42)
        p_plain, s_plain = heston_mc_chain_pricer(**kwargs)
        p_anti, s_anti = heston_mc_chain_pricer(antithetic=True, **kwargs)
        assert np.sum(s_anti[0]) < np.sum(s_plain[0])
        tol = 4.0 * np.hypot(s_plain[0], s_anti[0])
        assert np.all(np.abs(p_plain[0] - p_anti[0]) < tol)

    def test_pallas_engine_rejects_antithetic(self):
        with pytest.raises(NotImplementedError):
            logsv_mc_chain_pricer(ttms=TTMS, forwards=FORWARDS,
                                  discfactors=DISCS, strikes_ttms=STRIKES,
                                  optiontypes_ttms=TYPES, v0=0.8, theta=0.9,
                                  kappa1=2.2, kappa2=2.2, beta=0.15,
                                  volvol=1.8, nb_path=1024,
                                  engine='pallas', antithetic=True)
