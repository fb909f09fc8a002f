"""
Multi-chip sharding: path-parallel MC over the 8-device virtual mesh.

conftest forces 8 virtual CPU devices via xla_force_host_platform_device_count.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stochvolmodels_tpu.models.heston import simulate_heston_terminal
from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS, simulate_logsv_terminal
from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff
from stochvolmodels_tpu.parallel.mesh import (
    make_path_mesh,
    path_sharding,
    round_up_paths,
    shard_paths,
)

requires_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                      reason="needs 8 virtual devices")


@requires_devices
def test_sharded_logsv_mc_matches_single_device():
    mesh = make_path_mesh()
    assert mesh.devices.size == 8
    nb_path = round_up_paths(4000, mesh)
    key = jax.random.key(5)
    args = dict(ttm=0.1, theta=LOGSV_BTC_PARAMS.theta,
                kappa1=LOGSV_BTC_PARAMS.kappa1, kappa2=LOGSV_BTC_PARAMS.kappa2,
                beta=LOGSV_BTC_PARAMS.beta, volvol=LOGSV_BTC_PARAMS.volvol,
                nb_steps_per_year=60)
    x0 = jnp.zeros(nb_path)
    s0 = jnp.full(nb_path, LOGSV_BTC_PARAMS.sigma0)
    q0 = jnp.zeros(nb_path)

    # single-device run
    x1, sig1, qv1 = simulate_logsv_terminal(key=key, x0=x0, sigma0=s0,
                                            qvar0=q0, **args)

    # sharded run: same computation with the path axis split over the mesh
    xs, ss, qs = shard_paths(mesh, x0, s0, q0)
    sim = jax.jit(lambda a, b, c: simulate_logsv_terminal(
        key=key, x0=a, sigma0=b, qvar0=c, **args))
    x2, sig2, qv2 = sim(xs, ss, qs)
    # stateless threefry => identical randoms regardless of sharding
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)

    # payoff reduction across shards (psum-lowered means)
    prices, stds = jax.jit(lambda x, s, q: compute_mc_vars_payoff(
        x0=x, sigma0=s, qvar0=q, ttm=0.1, forward=1.0,
        strikes_ttm=jnp.array([0.9, 1.0, 1.1]),
        optiontypes_ttm=np.array(['P', 'C', 'C'])))(x2, sig2, qv2)
    prices_ref, _ = compute_mc_vars_payoff(
        x0=x1, sigma0=sig1, qvar0=qv1, ttm=0.1, forward=1.0,
        strikes_ttm=jnp.array([0.9, 1.0, 1.1]),
        optiontypes_ttm=np.array(['P', 'C', 'C']))
    np.testing.assert_allclose(np.asarray(prices), np.asarray(prices_ref),
                               rtol=1e-10)


@requires_devices
def test_sharded_gradient_through_mc():
    mesh = make_path_mesh()
    nb_path = 8 * 64
    sharding = path_sharding(mesh)
    x0 = jax.device_put(jnp.zeros(nb_path), sharding)
    v0 = jax.device_put(jnp.full(nb_path, 0.04), sharding)
    q0 = jax.device_put(jnp.zeros(nb_path), sharding)
    key = jax.random.key(0)

    def loss(pars, x0, v0, q0):
        x, var, qvar = simulate_heston_terminal(
            key=key, x0=x0, var0=v0, qvar0=q0, ttm=0.1, theta=pars[0],
            kappa=pars[1], rho=pars[2], volvol=pars[3], nb_steps_per_year=50)
        prices, _ = compute_mc_vars_payoff(
            x0=x, sigma0=jnp.sqrt(var), qvar0=qvar, ttm=0.1, forward=1.0,
            strikes_ttm=jnp.array([1.0]), optiontypes_ttm=np.array(['C']))
        return prices[0]

    pars = jnp.array([0.04, 4.0, -0.5, 0.4])
    v, g = jax.jit(jax.value_and_grad(loss))(pars, x0, v0, q0)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


@requires_devices
@pytest.mark.slow
def test_lm_calibration_sweep_matches_single():
    """8 perturbed BTC chains calibrate in one sharded dispatch; each result
    matches the single-chain LM fit."""
    import dataclasses
    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    from stochvolmodels_tpu.models.logsv.fast_calibration import calibrate_logsv_lm_on_device
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.parallel.sweep import calibrate_logsv_lm_sweep

    base = get_btc_test_chain_data()
    scales = [0.95, 1.05]
    chains = [dataclasses.replace(base,
                                  bid_ivs=[s * iv for iv in base.bid_ivs],
                                  ask_ivs=[s * iv for iv in base.ask_ivs])
              for s in scales]
    params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.21,
                          beta=0.15, volvol=1.85)
    mesh = make_path_mesh()
    results = calibrate_logsv_lm_sweep(chains, params0, nb_iters=6, mesh=mesh,
                                       use_float32=False)
    assert len(results) == len(chains)
    single_fit, single_cost = calibrate_logsv_lm_on_device(
        chains[0], params0, nb_iters=6, use_float32=False)
    fit, cost = results[0]
    np.testing.assert_allclose(cost, single_cost, rtol=1e-6)
    np.testing.assert_allclose(
        [fit.sigma0, fit.theta, fit.kappa1, fit.beta, fit.volvol],
        [single_fit.sigma0, single_fit.theta, single_fit.kappa1,
         single_fit.beta, single_fit.volvol], rtol=1e-6)
    # vol-scaled chains fit to scaled sigma0
    assert results[0][0].sigma0 < results[1][0].sigma0


def test_sharded_pallas_mc_moments():
    """the Pallas MC kernel under shard_map on the 8-device mesh: outputs
    carry the path sharding and the moments match the single-device kernel
    (distinct per-device streams, so agreement is statistical)."""
    from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS as PP
    from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas
    from stochvolmodels_tpu.parallel.mesh import (
        simulate_logsv_terminal_pallas_sharded)

    mesh = make_path_mesh()
    nb_path = 8 * 128 * 16
    args = dict(ttm=0.5, sigma0=PP.sigma0, theta=PP.theta, kappa1=PP.kappa1,
                kappa2=PP.kappa2, beta=PP.beta, volvol=PP.volvol,
                nb_steps_per_year=120)
    x, sig, qvar = simulate_logsv_terminal_pallas_sharded(
        mesh, seed=3, nb_path=nb_path, **args)
    assert x.shape == (nb_path,)
    assert len(x.sharding.device_set) == mesh.devices.size
    xs, ss, qs = simulate_logsv_terminal_pallas(
        seed=3, x0=jnp.zeros(nb_path, jnp.float32),
        sigma0=jnp.full(nb_path, PP.sigma0, jnp.float32),
        qvar0=jnp.zeros(nb_path, jnp.float32), interpret=True,
        **{k: v for k, v in args.items() if k != 'sigma0'})
    assert np.all(np.isfinite(np.asarray(x)))
    assert abs(float(jnp.mean(x)) - float(jnp.mean(xs))) < 0.03
    assert abs(float(jnp.mean(sig)) - float(jnp.mean(ss))) < 0.03
    assert abs(float(jnp.mean(qvar)) - float(jnp.mean(qs))) < 0.03


@requires_devices
@pytest.mark.slow
def test_heston_lm_sweep_matches_single():
    """batched Heston LM sweep over the mesh equals the single-chain LM fit."""
    import dataclasses

    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    from stochvolmodels_tpu.models.heston import HestonParams, HestonPricer
    from stochvolmodels_tpu.parallel.sweep import calibrate_heston_lm_sweep

    base = get_btc_test_chain_data()
    chains = [base,
              dataclasses.replace(base,
                                  bid_ivs=[1.05 * iv for iv in base.bid_ivs],
                                  ask_ivs=[1.05 * iv for iv in base.ask_ivs])]
    params0 = HestonParams(v0=0.8 ** 2, theta=1.3 ** 2, kappa=4.0,
                           volvol=1.5, rho=0.1)
    mesh = make_path_mesh()
    results = calibrate_heston_lm_sweep(chains, params0, nb_iters=6,
                                        mesh=mesh, use_float32=False)
    assert len(results) == 2
    single = HestonPricer().calibrate_model_params_to_chain(
        option_chain=chains[0], params0=params0, method='lm', nb_iters=6,
        use_float32=False)
    fit, cost = results[0]
    assert np.isfinite(cost)
    np.testing.assert_allclose(
        [fit.v0, fit.theta, fit.kappa, fit.rho, fit.volvol],
        [single.v0, single.theta, single.kappa, single.rho, single.volvol],
        rtol=1e-6)
    # the 5%-scaled chain fits to a higher v0
    assert results[1][0].v0 > results[0][0].v0


@requires_devices
def test_sharded_cube_lm_matches_single():
    """factor-HJM swaption-cube LM with the slice axis sharded over the
    mesh equals the single-device joint fit (slices are independent, so
    sharding changes only the layout, not the math)."""
    from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
        calibrate_rate_logsv_cube_lm_on_device)
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
        basis=NelsonSiegel(meanrev=0.25, key_terms=np.array([1.0, 5.0, 10.0])),
        ccy="USD")
    # 3 slices x 3 strikes, 3 LM iterations: the sharded==single assertion
    # is shape-independent, and each extra iteration/slice only inflates
    # the two whole-cube vjp compiles this test pays on one CPU core
    # (r04 verdict item 5 — this test was a top-5 suite offender)
    slices = [(1.0, 1.0), (1.0, 5.0), (2.0, 5.0)]
    strikes = [np.array([-0.01, 0.0, 0.01])] * 3
    fwds = [0.0] * 3
    ivols = [np.array([0.011, 0.010, 0.0105])] * 3

    mesh = make_path_mesh()
    fit_sharded, cost_sharded = calibrate_rate_logsv_cube_lm_on_device(
        params, slices, fwds, strikes, ivols, nb_iters=3, year_steps=24,
        mesh=mesh)
    fit_single, cost_single = calibrate_rate_logsv_cube_lm_on_device(
        params, slices, fwds, strikes, ivols, nb_iters=3, year_steps=24)
    np.testing.assert_allclose(cost_sharded, cost_single, rtol=1e-9)
    np.testing.assert_allclose(fit_sharded.beta.xs, fit_single.beta.xs,
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(fit_sharded.volvol.xs, fit_single.volvol.xs,
                               rtol=1e-7, atol=1e-10)
