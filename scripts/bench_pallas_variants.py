"""A/B benchmark of Pallas LogSV MC kernel variants on the real TPU.

Run with: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_pallas_variants.py
Times each variant best-of-5 (the tunnel latency varies) and prints
path-steps/sec plus terminal-moment sanity, so perf changes that break the
distribution are caught immediately.
"""
import time

import jax
import jax.numpy as jnp

import stochvolmodels_tpu  # noqa: F401  (x64 config)
from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS as P
from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas

NB_PATH = 1 << 20
TTM = 1.0
STEPS_PER_YEAR = 360
NB_STEPS = int(TTM * STEPS_PER_YEAR) + 1


def run(seed: int, **kw) -> float:
    x, sig, qv = simulate_logsv_terminal_pallas(
        seed=seed, x0=jnp.zeros(NB_PATH, dtype=jnp.float32),
        sigma0=jnp.full(NB_PATH, P.sigma0, dtype=jnp.float32),
        qvar0=jnp.zeros(NB_PATH, dtype=jnp.float32), ttm=TTM,
        theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
        beta=P.beta, volvol=P.volvol, nb_steps_per_year=STEPS_PER_YEAR, **kw)
    # fetching scalars forces completion through the tunnel
    return (float(jnp.mean(jnp.exp(x))), float(jnp.std(x)),
            float(jnp.mean(sig)), float(jnp.mean(qv)))


def bench(name: str, **kw) -> None:
    moments = run(0, **kw)   # compile + sanity
    best = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        run(r + 1, **kw)
        best = min(best, time.perf_counter() - t0)
    rate = NB_PATH * NB_STEPS / best
    print(f"{name:28s} {rate:.3e} path-steps/s  "
          f"E[e^x]={moments[0]:.4f} std(x)={moments[1]:.4f} "
          f"E[sig]={moments[2]:.4f} E[qv]={moments[3]:.4f}")


if __name__ == "__main__":
    assert jax.devices()[0].platform != "cpu", "needs the TPU"
    bench("box-muller classic", fast_sincos=False)
    bench("box-muller fast-sincos", fast_sincos=True)
