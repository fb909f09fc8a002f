"""
Pallas MC kernels: moment agreement with the lax.scan reference kernels.

The kernels use Mosaic-only primitives (on-chip PRNG, SMEM scalars); on CPU
they run under the Pallas TPU *interpreter* (``interpret=True``), so both the
LogSV and Heston kernels are exercised in every CI run.  The TPU-gated
variants below re-run the real Mosaic lowering when hardware is present.

Reference MC contracts: logsv_pricer.py:843-940, heston_pricer.py:312-359.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu", reason="Mosaic lowering needs a TPU")

# interpret-mode kernels exist for CPU CI coverage.  With the axon TPU
# backend primary, interpret=True executes the kernel op-by-op THROUGH the
# remote tunnel — pathologically slow (>20 min per test) and observed to
# abort the tunnel worker, poisoning every later test in the process.  The
# real-Mosaic (@requires_tpu) variants are the hardware check.
cpu_only_interpret = pytest.mark.skipif(
    jax.devices()[0].platform != "cpu",
    reason="interpret-mode Pallas is CPU-CI coverage; through the TPU "
           "tunnel it is pathological and can crash the worker")

NB_PATH = 1 << 15


def _logsv_moments(interpret: bool, nb_path: int = NB_PATH, ttm: float = 0.5):
    from stochvolmodels_tpu.models.logsv.pricer import (
        LOGSV_BTC_PARAMS as P,
        simulate_logsv_terminal,
    )
    from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas

    args = dict(ttm=ttm, theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
                beta=P.beta, volvol=P.volvol)
    xp, sp, qp = simulate_logsv_terminal_pallas(
        seed=7, x0=jnp.zeros(nb_path), sigma0=jnp.full(nb_path, P.sigma0),
        qvar0=jnp.zeros(nb_path), interpret=interpret, **args)
    xs, ss, qs = simulate_logsv_terminal(
        key=jax.random.key(7), x0=jnp.zeros(nb_path),
        sigma0=jnp.full(nb_path, P.sigma0), qvar0=jnp.zeros(nb_path), **args)
    return (xp, sp, qp), (xs, ss, qs)


def _check_logsv(pallas_out, scan_out, tol):
    (xp, sp, qp), (xs, ss, qs) = pallas_out, scan_out
    assert np.all(np.isfinite(np.asarray(xp)))
    assert abs(float(jnp.mean(xp)) - float(jnp.mean(xs))) < tol
    assert abs(float(jnp.std(xp)) - float(jnp.std(xs))) < tol
    assert abs(float(jnp.mean(sp)) - float(jnp.mean(ss))) < tol
    assert abs(float(jnp.mean(qp)) - float(jnp.mean(qs))) < tol
    # martingale check under the spot measure
    assert abs(float(jnp.mean(jnp.exp(xp))) - 1.0) < 4.0 * tol


def _heston_moments(interpret: bool, nb_path: int = NB_PATH):
    from stochvolmodels_tpu.ops.pallas_mc import simulate_heston_terminal_pallas

    return simulate_heston_terminal_pallas(
        seed=3, x0=jnp.zeros(nb_path), var0=jnp.full(nb_path, 0.04),
        qvar0=jnp.zeros(nb_path), ttm=1.0, theta=0.04, kappa=4.0,
        rho=-0.5, volvol=0.4, interpret=interpret)


def _check_heston(x, var, qvar, tol):
    assert np.all(np.isfinite(np.asarray(x)))
    assert abs(float(jnp.mean(var)) - 0.04) < tol
    assert abs(float(jnp.mean(jnp.exp(x))) - 1.0) < 4.0 * tol
    assert abs(float(jnp.mean(qvar)) - 0.04) < tol


@cpu_only_interpret
def test_logsv_pallas_interpret_moments_match_scan():
    _check_logsv(*_logsv_moments(interpret=True), tol=0.02)


@cpu_only_interpret
def test_heston_pallas_interpret_moments():
    _check_heston(*_heston_moments(interpret=True), tol=0.005)


@requires_tpu
def test_logsv_pallas_moments_match_scan():
    _check_logsv(*_logsv_moments(interpret=False, nb_path=1 << 17), tol=0.01)


@requires_tpu
def test_heston_pallas_moments():
    _check_heston(*_heston_moments(interpret=False, nb_path=1 << 17),
                  tol=0.003)


@cpu_only_interpret
def test_poly_log_and_cospi_accuracy():
    """the PRODUCTION ALU-polynomial ln and cos(pi x) used by the poly
    Box-Muller match libm to the documented bounds (2e-6 / 6e-6 max abs
    err).  Runs pallas_mc._poly_log/_poly_cospi themselves inside an
    interpret-mode kernel, so a coefficient change in the module cannot
    pass this test stale."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stochvolmodels_tpu.ops import pallas_mc

    def kernel(u_ref, ln_ref, cos_ref):
        ln_ref[:] = pallas_mc._poly_log(u_ref[:])
        cos_ref[:] = pallas_mc._poly_cospi(u_ref[:])

    n = 512 * 128
    u = np.linspace(0.0, 1.0, n + 2)[1:-1].astype(np.float32)
    u2 = u.reshape(512, 128)
    with jax.enable_x64(False):
        ln, cs = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct(u2.shape, jnp.float32),
                       jax.ShapeDtypeStruct(u2.shape, jnp.float32)),
            interpret=pltpu.InterpretParams(),
        )(jnp.asarray(u2))
    ln = np.asarray(ln).ravel()
    cs = np.asarray(cs).ravel()
    assert np.max(np.abs(ln - np.log(u.astype(np.float64)))) < 2.5e-6
    assert np.max(np.abs(cs - np.cos(np.pi * u.astype(np.float64)))) < 1e-5


def _rough_moments(interpret: bool, nb_path: int = NB_PATH, ttm: float = 0.5):
    from stochvolmodels_tpu.models.rough.kernel import european_rule
    from stochvolmodels_tpu.models.rough.simulation import log_spot_full_combined
    from stochvolmodels_tpu.ops.pallas_mc import simulate_rough_terminal_pallas

    nodes, weights = european_rule(0.125, 3, ttm)
    args = dict(sigma0=1.0, theta=1.0, kappa1=2.0, kappa2=2.0,
                volvol=1.5, nodes=nodes, weights=weights)
    xp, vwp, yp = simulate_rough_terminal_pallas(
        seed=7, nb_path=nb_path, ttm=ttm, rho=0.1,
        nb_steps_per_year=360, interpret=interpret, **args)
    log_s, v, y = log_spot_full_combined(
        ttm=ttm, nb_path=nb_path, key=jax.random.key(7), rho=0.1,
        nb_steps_per_year=360, **args)
    vw = jnp.sum(jnp.asarray(weights)[:, None] * v, axis=0)
    return (xp, vwp, yp), (log_s, vw, y)


def _check_rough(pallas_out, scan_out, tol):
    (xp, vwp, yp), (xs, vws, ys) = pallas_out, scan_out
    assert np.all(np.isfinite(np.asarray(xp)))
    assert abs(float(jnp.mean(xp)) - float(jnp.mean(xs))) < tol
    assert abs(float(jnp.std(xp)) - float(jnp.std(xs))) < 2.0 * tol
    assert abs(float(jnp.mean(vwp)) - float(jnp.mean(vws))) < tol
    assert abs(float(jnp.mean(yp)) - float(jnp.mean(ys))) < tol


@cpu_only_interpret
def test_rough_pallas_interpret_moments_match_scan():
    _check_rough(*_rough_moments(interpret=True), tol=0.03)


@requires_tpu
def test_rough_pallas_moments_match_scan():
    _check_rough(*_rough_moments(interpret=False, nb_path=1 << 17), tol=0.02)


@pytest.mark.slow
def test_logsv_chain_pricer_pallas_engine_matches_scan():
    """engine='pallas' chain MC prices agree with the f64 scan engine within
    MC noise (different RNG streams; 2^15 paths -> ~1% of forward)."""
    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    from stochvolmodels_tpu.models.logsv.pricer import (
        LOGSV_BTC_PARAMS,
        LogSVPricer,
    )

    chain = get_btc_test_chain_data()
    pricer = LogSVPricer()
    kw = dict(option_chain=chain, params=LOGSV_BTC_PARAMS, nb_path=1 << 15,
              nb_steps=120, seed=11)
    p_scan, _ = pricer.model_mc_price_chain(**kw)
    p_pallas, s_pallas = pricer.model_mc_price_chain(engine="pallas", **kw)
    for ps, pp, sp in zip(p_scan, p_pallas, s_pallas):
        # within 4 joint stderr, floored at 0.5% of forward for tiny prices
        tol = 4.0 * np.sqrt(2.0) * np.asarray(sp) + 5e-3
        assert np.all(np.abs(np.asarray(ps) - np.asarray(pp)) < tol)


@pytest.mark.slow
def test_rough_chain_pricer_pallas_engine_matches_scan():
    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.models.rough.simulation import (
        rough_logsv_mc_chain_pricer)

    chain = get_btc_test_chain_data()
    params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=2.0, kappa2=2.0,
                         beta=0.2, volvol=1.8, H=0.125)
    params.approximate_kernel(T=float(np.max(chain.ttms)))
    kw = dict(ttms=chain.ttms, forwards=chain.forwards,
              discfactors=chain.discfactors, strikes_ttms=chain.strikes_ttms,
              optiontypes_ttms=chain.optiontypes_ttms,
              sigma0=params.sigma0, theta=params.theta, kappa1=params.kappa1,
              kappa2=params.kappa2, beta=params.beta, volvol=params.volvol,
              weights=params.weights, nodes=params.nodes,
              nb_path=1 << 14, nb_steps_per_year=120, seed=11)
    p_scan, _ = rough_logsv_mc_chain_pricer(**kw)
    p_pallas, s_pallas = rough_logsv_mc_chain_pricer(engine="pallas", **kw)
    for ps, pp, sp in zip(p_scan, p_pallas, s_pallas):
        tol = 4.0 * np.sqrt(2.0) * np.asarray(sp) + 5e-3
        assert np.all(np.abs(np.asarray(ps) - np.asarray(pp)) < tol)


@pytest.mark.slow
def test_heston_chain_pricer_pallas_engine_matches_scan():
    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    from stochvolmodels_tpu.models.heston import HestonParams, HestonPricer

    chain = get_btc_test_chain_data()
    pricer = HestonPricer()
    # moderate volvol and 2^16 paths: at BTC-level vol the payoff tails are
    # heavy enough that the stderr estimate itself is noisy at small path
    # counts (seed-specific 5-8x-stderr flukes observed that vanish at 4x
    # paths / other seeds)
    params = HestonParams(v0=0.85 ** 2, theta=1.4 ** 2, kappa=4.0,
                          volvol=1.0, rho=0.2)
    kw = dict(option_chain=chain, params=params, nb_path=1 << 16, seed=12)
    p_scan, _ = pricer.model_mc_price_chain(**kw)
    p_pallas, s_pallas = pricer.model_mc_price_chain(engine="pallas", **kw)
    for ps, pp, sp in zip(p_scan, p_pallas, s_pallas):
        tol = 4.0 * np.sqrt(2.0) * np.asarray(sp) + 5e-3
        assert np.all(np.abs(np.asarray(ps) - np.asarray(pp)) < tol)


HAWKES_ARGS = dict(mu=0.0, sigma=0.5, shift_p=0.05, mean_p=0.1,
                   shift_m=-0.05, mean_m=-0.1, theta_p=1.0, kappa_p=3.0,
                   beta1_p=0.6, beta2_p=0.4, theta_m=1.0, kappa_m=3.0,
                   beta1_m=0.4, beta2_m=0.6)


def _hawkes_moments(interpret: bool, nb_path: int = NB_PATH, ttm: float = 0.5):
    from stochvolmodels_tpu.models.hawkes_jd import simulate_hawkesjd_terminal
    from stochvolmodels_tpu.ops.pallas_mc import (
        simulate_hawkesjd_terminal_pallas)

    lam0 = 1.0
    xp, lpp, lmp = simulate_hawkesjd_terminal_pallas(
        seed=5, ttm=ttm, x0=jnp.zeros(nb_path),
        lambda_p0=jnp.full(nb_path, lam0), lambda_m0=jnp.full(nb_path, lam0),
        nb_steps_per_year=720, interpret=interpret, **HAWKES_ARGS)
    xs, lps, lms = simulate_hawkesjd_terminal(
        key=jax.random.key(5), ttm=ttm, x0=jnp.zeros(nb_path),
        lambda_p0=jnp.full(nb_path, lam0), lambda_m0=jnp.full(nb_path, lam0),
        nb_steps_per_year=720, **HAWKES_ARGS)
    return (xp, lpp, lmp), (xs, lps, lms)


def _check_hawkes(pallas_out, scan_out, tol):
    (xp, lpp, lmp), (xs, lps, lms) = pallas_out, scan_out
    assert np.all(np.isfinite(np.asarray(xp)))
    assert abs(float(jnp.mean(xp)) - float(jnp.mean(xs))) < tol
    assert abs(float(jnp.std(xp)) - float(jnp.std(xs))) < 2.0 * tol
    assert abs(float(jnp.mean(lpp)) - float(jnp.mean(lps))) < 3.0 * tol
    assert abs(float(jnp.mean(lmp)) - float(jnp.mean(lms))) < 3.0 * tol
    # the compensator makes exp(x) a martingale under the spot measure
    assert abs(float(jnp.mean(jnp.exp(xp))) - 1.0) < 4.0 * tol


@cpu_only_interpret
def test_hawkes_pallas_interpret_moments_match_scan():
    _check_hawkes(*_hawkes_moments(interpret=True), tol=0.03)


@requires_tpu
def test_hawkes_pallas_moments_match_scan():
    _check_hawkes(*_hawkes_moments(interpret=False, nb_path=1 << 17),
                  tol=0.02)
