"""
TPU-gated wall-clock assertions for the headline perf claims.

These tests back the numbers recorded in PARITY.md ("BTC chain calibration
< 1 s warm", "warm analytic chain reprice in tens of ms", ">= 1e9 MC
path-steps/sec") with executable checks.  The CI suite always runs on CPU
(conftest), so they skip there; run them on hardware with

    SVMTPU_TEST_TPU=1 PYTHONPATH="/root/.axon_site:/root/repo" \
        python -m pytest tests/test_tpu_perf.py -q

Timing fetches a scalar to host after each device call: through the axon
tunnel `block_until_ready` does not reliably block, fetching does.

The warm-latency gates assert absolute bounds that assume a functioning
tunnel; warm wall-clocks swing ~±20% between processes normally, and in
sick periods (e.g. after a "TPU worker process crashed" event) the
per-call roundtrip balloons far beyond that.  The ``healthy_tunnel``
fixture probes roundtrip + f32-scan dispatch cost once per module and
SKIPS the wall-clock gates (with the measured numbers) when the tunnel
itself is sick — a red gate must mean a code regression, not weather.
(The f64-scan ~6 us/op cost is constant backend physics, not weather —
see PARITY.md "Tunnel health and the f64-scan regression".)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu", reason="wall-clock targets are TPU-only")

pytestmark = [requires_tpu, pytest.mark.slow]


@pytest.fixture(scope="module")
def btc_chain():
    from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
    return get_btc_test_chain_data()


@pytest.fixture(scope="module")
def healthy_tunnel():
    from stochvolmodels_tpu.utils.tunnel import (
        measure_tunnel_health,
        tunnel_degraded,
    )
    health = measure_tunnel_health()
    if tunnel_degraded(health):
        pytest.skip(
            f"axon tunnel degraded (roundtrip {health['roundtrip_ms']:.0f} ms, "
            f"scan dispatch {health['scan_us_per_op']:.1f} us/op) — absolute "
            "wall-clock gates are meaningless in this period")
    return health


def test_warm_lm_calibration_under_1s(btc_chain, healthy_tunnel):
    """BASELINE.md target: full BTC chain calibration < 1 s (warm).

    Reference baseline: scipy SLSQP with FD gradients, ~10 s
    (reference logsv_pricer.py calibrate_model_params_to_chain)."""
    from stochvolmodels_tpu.models.logsv.fast_calibration import (
        calibrate_logsv_lm_on_device)
    from stochvolmodels_tpu.models.logsv.params import LogSvParams

    params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.18,
                          beta=0.15, volvol=1.85)
    fit, cost = calibrate_logsv_lm_on_device(btc_chain, params0, nb_iters=12)
    float(cost)  # force completion: compile + first run
    t0 = time.perf_counter()
    fit, cost = calibrate_logsv_lm_on_device(btc_chain, params0, nb_iters=12)
    cost = float(cost)
    warm = time.perf_counter() - t0
    assert warm < 1.0, f"warm LM calibration took {warm:.2f}s (target < 1 s)"
    assert np.isfinite(cost) and cost < 0.01, f"LM fit cost {cost}"


def test_warm_analytic_chain_reprice_under_200ms(btc_chain, healthy_tunnel):
    """fast-precision analytic chain reprice should be tens of ms warm
    (measured 36 ms; the 200 ms bound absorbs tunnel-latency variance).

    This times ``price_chain`` — the repricing call inside calibration
    loops."""
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer

    pricer = LogSVPricer()
    params = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                         beta=0.15, volvol=1.85)

    def reprice():
        prices = pricer.price_chain(option_chain=btc_chain, params=params,
                                    precision="fast")
        return float(np.asarray(prices[0])[0])

    p00 = reprice()  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        reprice()
        best = min(best, time.perf_counter() - t0)
    assert best < 0.2, f"warm fast reprice took {best * 1e3:.0f}ms (target < 200ms)"
    assert np.isfinite(p00) and p00 > 0.0


def test_warm_exact_f64_chain_reprice_under_700ms(btc_chain, healthy_tunnel):
    """the f64 reference-parity engine (still the CPU default and the
    QVAR/SIGMA/graded-warmup engine).  The round-2 verdict flagged it at
    1164 ms warm; the step-refinement study (scripts/bench_exact_path.py —
    the scan is per-step-latency-bound, error flat down to 120 steps/yr)
    cut the default to 240 steps/yr, measured 419 ms warm.  700 ms bound
    absorbs tunnel variance.  ``exact_engine='f64'`` pins the engine: since
    r04 the TPU exact default is df32 (own gate below), and this gate must
    keep covering the f64 scans."""
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer

    pricer = LogSVPricer()
    params = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                         beta=0.15, volvol=1.85)

    def reprice():
        prices = pricer.price_chain(option_chain=btc_chain, params=params,
                                    exact_engine="f64")
        return float(np.asarray(prices[0])[0])

    p00 = reprice()  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        reprice()
        best = min(best, time.perf_counter() - t0)
    assert best < 0.7, f"warm exact reprice took {best * 1e3:.0f}ms (target < 700ms)"
    assert np.isfinite(p00) and p00 > 0.0


def test_warm_exact_df32_chain_reprice_under_150ms(btc_chain, healthy_tunnel):
    """the df32 exact engine — the TPU `precision='exact'` default since
    r04 (PARITY.md "Double-float32 exact engine": 35 ms warm vs 419 ms for
    the f64 scans, identical RK4 scheme and step count).  150 ms bound
    absorbs tunnel variance while still failing if the df32 trace ever
    falls back onto the latency-bound f64 scan path."""
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer

    pricer = LogSVPricer()
    params = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                         beta=0.15, volvol=1.85)

    def reprice():
        prices = pricer.price_chain(option_chain=btc_chain, params=params,
                                    exact_engine="df32")
        return float(np.asarray(prices[0])[0])

    p00 = reprice()  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        reprice()
        best = min(best, time.perf_counter() - t0)
    assert best < 0.15, f"warm df32 exact reprice took {best * 1e3:.0f}ms (target < 150ms)"
    assert np.isfinite(p00) and p00 > 0.0


def test_exact_df32_matches_f64_on_device(btc_chain):
    """NUMERIC gate for the shipping TPU exact default: full-chain df32
    prices agree with the f64 engine to < 1e-7 max relative ON DEVICE.

    df32 correctness rests on IEEE round-to-nearest f32 mul/add with no
    FP contraction (utils/df32.py) — exactly the property a TPU compiler
    change can silently break while CPU tests stay green, so this must run
    on the real backend.  No healthy_tunnel fixture: accuracy does not
    care about tunnel weather."""
    from stochvolmodels_tpu.models.logsv.pricer import (
        LOGSV_BTC_PARAMS,
        LogSVPricer,
    )

    pricer = LogSVPricer()
    p64 = pricer.price_chain(option_chain=btc_chain, params=LOGSV_BTC_PARAMS,
                             exact_engine="f64")
    pdd = pricer.price_chain(option_chain=btc_chain, params=LOGSV_BTC_PARAMS,
                             exact_engine="df32")
    err = 0.0
    for a, b in zip(p64, pdd):
        a, b = np.asarray(a), np.asarray(b)
        m = np.abs(a) > 1e-8
        err = max(err, float(np.max(np.abs(a[m] - b[m]) / np.abs(a[m]))))
    assert err < 1e-7, f"df32 vs f64 on-device max rel diff {err:.2e}"


def test_two_prod_exact_on_device():
    """error-free-transform probe on the real backend: TwoSum bit-exact,
    TwoProd p + e within ~2^-45 of the exact product, and a FUSED
    broadcast outer-product mul at full df32 accuracy.  The fused case is
    the one a contraction-happy backend corrupts (XLA:CPU emitted machine
    FMAs for fmul+fadd pairs with no fast-math flags in the IR and
    silently degraded jitted df32 bodies to plain f32 — PARITY.md
    "Double-float32 exact engine"); if XLA:TPU ever grows the same
    behavior beyond what the exact-split-partials TwoProd tolerates, this
    fails loudly instead of corrupting every df32 price."""
    from stochvolmodels_tpu.utils import df32 as dd

    rng = np.random.default_rng(7)
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * np.exp(
        rng.uniform(-20, 20, 4096))).astype(np.float32)

    @jax.jit
    def probe(a32, b32):
        p, e = dd._two_prod(a32, b32)
        s, f = dd._two_sum(a32, b32)
        return p, e, s, f

    with jax.enable_x64(False):
        p, e, s, f = probe(jnp.asarray(a), jnp.asarray(b))
    exact_prod = a.astype(np.float64) * b.astype(np.float64)
    got_prod = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    err = np.max(np.abs(got_prod - exact_prod) / np.abs(exact_prod))
    assert err < 2.0 ** -45, f"two_prod rel err {err:.2e}"
    exact_sum = a.astype(np.float64) + b.astype(np.float64)
    got_sum = np.asarray(s, np.float64) + np.asarray(f, np.float64)
    # TwoSum is exact whenever a+b does not round beyond f64 (always here)
    np.testing.assert_array_equal(got_sum, exact_sum)

    ar = dd.from_f64(jnp.asarray(rng.standard_normal((16, 5)) * 2))

    @jax.jit
    def outer(arh, arl):
        av = dd.DF(arh, arl)
        arr = dd.DF(av.hi[:, :, None], av.lo[:, :, None])
        arc = dd.DF(av.hi[:, None, :], av.lo[:, None, :])
        O = dd.mul(arr, arc)
        return O.hi, O.lo

    with jax.enable_x64(False):
        oh, ol = outer(ar.hi, ar.lo)
    a64 = np.asarray(dd.to_f64(ar))
    exact = a64[:, :, None] * a64[:, None, :]
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    ferr = np.max(np.abs(got - exact))
    assert ferr < 1e-12, f"fused broadcast mul err {ferr:.2e}"


def test_warm_fast_chain_ivols_under_500ms(btc_chain, healthy_tunnel):
    """fused price + IV inversion, one device program (measured 61 ms warm;
    bound at 500 ms for tunnel-latency spikes)."""
    from stochvolmodels_tpu.models.logsv.params import LogSvParams
    from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer

    pricer = LogSVPricer()
    params = LogSvParams(sigma0=0.88, theta=1.0, kappa1=2.21, kappa2=2.18,
                         beta=0.15, volvol=1.85)

    def ivols():
        vols = pricer.compute_model_ivols_for_chain(
            option_chain=btc_chain, params=params, precision="fast")
        return float(np.asarray(vols[0])[0])

    v00 = ivols()  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ivols()
        best = min(best, time.perf_counter() - t0)
    assert best < 0.5, f"warm fast ivols took {best * 1e3:.0f}ms (target < 500 ms)"
    assert 0.3 < v00 < 2.0


def test_warm_pdf_under_2s(healthy_tunnel):
    """jitted logsv_pdfs (LOG_RETURN, f64 engine under 'auto'): measured
    0.51 s warm r05 — the former EAGER assembly dispatched every op
    through the tunnel and cost 10.1 s (PARITY.md "Exact f64 surfaces").
    2 s bound absorbs tunnel variance while failing if the path ever
    regresses to eager assembly."""
    from stochvolmodels_tpu.models.logsv.pricer import (
        LOGSV_BTC_PARAMS,
        logsv_pdfs,
    )

    x_grid = np.linspace(-2.0, 2.0, 200)

    def density():
        return float(logsv_pdfs(params=LOGSV_BTC_PARAMS, ttm=0.25,
                                space_grid=x_grid)[100])

    v0 = density()  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        density()
        best = min(best, time.perf_counter() - t0)
    assert best < 2.0, f"warm pdf took {best:.2f}s (target < 2 s)"
    assert np.isfinite(v0) and v0 > 0.0


def test_pallas_mc_throughput_above_1e9():
    """BASELINE.md target: >= 1e9 MC path-steps/sec on one chip."""
    from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS as P
    from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas

    nb_path = 1 << 20
    steps_per_year = 360

    def run(seed):
        x, _, _ = simulate_logsv_terminal_pallas(
            seed=seed, x0=jnp.zeros(nb_path, dtype=jnp.float32),
            sigma0=jnp.full(nb_path, P.sigma0, dtype=jnp.float32),
            qvar0=jnp.zeros(nb_path, dtype=jnp.float32), ttm=1.0,
            theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
            beta=P.beta, volvol=P.volvol,
            nb_steps_per_year=steps_per_year)
        return float(jnp.mean(x))

    run(0)  # compile
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        run(r + 1)
        best = min(best, time.perf_counter() - t0)
    rate = nb_path * (steps_per_year + 1) / best
    assert rate > 1e9, f"MC throughput {rate:.2e} path-steps/s (target > 1e9)"


def test_warm_hawkes_lm_calibration_under_1_5s(btc_chain, healthy_tunnel):
    """the 8-param Hawkes LM (chained Riccati + pricing + IV inversion
    differentiated end-to-end): measured 0.37 s warm best-of-3 (r05);
    bound at 1.5 s for tunnel variance — the old 5 s bound was loose
    enough to hide a 10x regression (r04 verdict).  The FD-SLSQP
    reference path costs ~100 iterations x 9 chain reprices on host."""
    from stochvolmodels_tpu.models.hawkes_jd import (
        HawkesJDParams,
        calibrate_hawkesjd_lm_on_device,
    )

    params0 = HawkesJDParams()
    fit, cost = calibrate_hawkesjd_lm_on_device(btc_chain, params0,
                                                nb_iters=8)
    float(cost)  # compile + first run
    t0 = time.perf_counter()
    fit, cost = calibrate_hawkesjd_lm_on_device(btc_chain, params0,
                                                nb_iters=8)
    cost = float(cost)
    warm = time.perf_counter() - t0
    assert warm < 1.5, f"warm Hawkes LM took {warm:.2f}s (measured 0.37 s r05)"
    assert np.isfinite(cost) and cost < 0.05


def _usd_cube():
    from papers.sv_for_factor_hjm.calibration_fig_5_6_7 import (
        get_calib_rate_logsv_params,
        get_swaption_data,
    )
    from stochvolmodels_tpu.models.factor_hjm import swaption_chain_to_cube

    chain = get_swaption_data("USD")
    params = get_calib_rate_logsv_params()["USD"]
    slices, fwds, strikes, _ = swaption_chain_to_cube(chain, max_expiry=5.0)
    return params, slices, fwds, strikes


def test_warm_swaption_cube_f64_reprice_under_1s(healthy_tunnel):
    """the batched USD swaption cube (12 slices, 108 quotes, 240 shared RK4
    steps at the default year_steps=48 — max|dP| 5.9e-12 vs a 600-step run,
    scripts/bench_cube_breakdown.py) repriced warm in under a second on the
    f64 Riccati scans — the reference's host DE-refinement loop needs
    minutes for the same cube.  ``engine='f64'`` pins the engine: the TPU
    default is df32 since r05 (own, tighter gate below)."""
    from stochvolmodels_tpu.models.factor_hjm import make_swaption_cube_fn

    params, slices, fwds, strikes = _usd_cube()
    fn, _ = make_swaption_cube_fn(params, slices, fwds, strikes,
                                  engine="f64")
    args = (jnp.asarray(params.sigma0), jnp.asarray(params.beta.xs),
            jnp.asarray(params.volvol.xs))
    float(jnp.sum(fn(*args)))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        px = fn(*args)
        s = float(jnp.sum(px))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(s)
    assert best < 1.0, f"warm cube reprice took {best:.2f}s (target < 1 s)"


def test_warm_swaption_cube_df32_reprice_under_150ms(healthy_tunnel):
    """the df32 cube engine (auto default on TPU): same RK4 scheme on
    double-float32 carriers, warm 32 ms measured vs 560 ms for the f64
    scans (PARITY.md "Double-float32 swaption cube").  150 ms bound
    absorbs tunnel variance while failing if the trace ever falls back on
    the latency-bound f64 scan path; also asserts the on-device numeric
    agreement with the f64 engine (abs, measured 2.47e-10 at price scale
    2.7e-2).

    Runs in a SUBPROCESS: the logsv df32 gates above already hold this
    process's df32 slot, and a second df32 program family compiled after
    another df32 program has executed fails on re-execution through the
    axon tunnel (PARITY.md "df32 compile-after-run hazard")."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "measure_cube_df32.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon sitecustomize win
    proc = subprocess.run([sys.executable, script], capture_output=True,
                          text=True, timeout=1200, env=env)
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stderr[-2000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["warm_ms"] < 150.0, f"warm df32 cube reprice {out['warm_ms']}ms"
    assert out["abs_diff_max"] < 1e-9, \
        f"df32 vs f64 cube max abs diff {out['abs_diff_max']:.2e}"
