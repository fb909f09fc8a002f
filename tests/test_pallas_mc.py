"""
Pallas MC kernels: moment agreement with the lax.scan reference kernels.

These kernels are TPU-only (on-chip PRNG, Mosaic); the suite runs on CPU, so
they are exercised here only when a TPU is actually present — bench.py and
the TPU verification flow cover them on hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu", reason="Pallas TPU kernels need a TPU")


@requires_tpu
def test_logsv_pallas_moments_match_scan():
    from stochvolmodels_tpu.models.logsv.pricer import (
        LOGSV_BTC_PARAMS as P,
        simulate_logsv_terminal,
    )
    from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas

    nb_path = 1 << 17
    args = dict(ttm=0.5, theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
                beta=P.beta, volvol=P.volvol)
    xp, sp, qp = simulate_logsv_terminal_pallas(
        seed=7, x0=jnp.zeros(nb_path), sigma0=jnp.full(nb_path, P.sigma0),
        qvar0=jnp.zeros(nb_path), **args)
    xs, ss, qs = simulate_logsv_terminal(
        key=jax.random.key(7), x0=jnp.zeros(nb_path),
        sigma0=jnp.full(nb_path, P.sigma0), qvar0=jnp.zeros(nb_path), **args)
    assert abs(float(jnp.mean(xp)) - float(jnp.mean(xs))) < 0.01
    assert abs(float(jnp.std(xp)) - float(jnp.std(xs))) < 0.01
    assert abs(float(jnp.mean(sp)) - float(jnp.mean(ss))) < 0.01
    assert abs(float(jnp.mean(qp)) - float(jnp.mean(qs))) < 0.01
    assert abs(float(jnp.mean(jnp.exp(xp))) - 1.0) < 0.02


@requires_tpu
def test_heston_pallas_moments():
    from stochvolmodels_tpu.ops.pallas_mc import simulate_heston_terminal_pallas

    nb_path = 1 << 17
    x, var, qvar = simulate_heston_terminal_pallas(
        seed=3, x0=jnp.zeros(nb_path), var0=jnp.full(nb_path, 0.04),
        qvar0=jnp.zeros(nb_path), ttm=1.0, theta=0.04, kappa=4.0,
        rho=-0.5, volvol=0.4)
    assert abs(float(jnp.mean(var)) - 0.04) < 0.003
    assert abs(float(jnp.mean(jnp.exp(x))) - 1.0) < 0.01
    assert abs(float(jnp.mean(qvar)) - 0.04) < 0.003
