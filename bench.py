"""
Benchmark: Monte-Carlo path-steps/sec on the flagship LogSV model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north-star target of 1e9 path-steps/sec
(the reference publishes no numbers and its numba CPU kernels cannot run
here — numba is not installed).

On TPU this exercises the Pallas kernel with on-chip PRNG
(stochvolmodels_tpu/ops/pallas_mc.py); elsewhere it falls back to the
lax.scan kernel.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import stochvolmodels_tpu  # noqa: F401  (x64 config)
from stochvolmodels_tpu.models.logsv.pricer import LOGSV_BTC_PARAMS as P

BASELINE_PATH_STEPS_PER_SEC = 1.0e9


def main() -> None:
    nb_path = 1 << 20          # 1,048,576 paths
    ttm = 1.0
    nb_steps_per_year = 360    # reference default workload density
    nb_steps = int(ttm * nb_steps_per_year) + 1

    x0 = jnp.zeros(nb_path, dtype=jnp.float32)
    s0 = jnp.full(nb_path, P.sigma0, dtype=jnp.float32)
    q0 = jnp.zeros(nb_path, dtype=jnp.float32)
    on_tpu = jax.devices()[0].platform != "cpu"

    if on_tpu:
        from stochvolmodels_tpu.ops.pallas_mc import simulate_logsv_terminal_pallas

        def run(seed):
            x, sig, qv = simulate_logsv_terminal_pallas(
                seed=seed, x0=x0, sigma0=s0, qvar0=q0, ttm=ttm,
                theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
                beta=P.beta, volvol=P.volvol,
                nb_steps_per_year=nb_steps_per_year)
            return float(jnp.sum(x) + jnp.sum(sig) + jnp.sum(qv))
        metric = "logsv_mc_pallas_path_steps_per_sec"
    else:
        from stochvolmodels_tpu.models.logsv.pricer import simulate_logsv_terminal

        def run(seed):
            x, sig, qv = simulate_logsv_terminal(
                key=jax.random.key(seed), x0=x0, sigma0=s0, qvar0=q0, ttm=ttm,
                theta=P.theta, kappa1=P.kappa1, kappa2=P.kappa2,
                beta=P.beta, volvol=P.volvol,
                nb_steps_per_year=nb_steps_per_year, dtype=jnp.float32)
            return float(jnp.sum(x) + jnp.sum(sig) + jnp.sum(qv))
        metric = "logsv_mc_scan_path_steps_per_sec"

    # warmup / compile; the host fetch inside run() forces completion
    # (block_until_ready does not reliably block through the axon tunnel)
    run(0)
    best = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        run(r + 1)
        best = min(best, time.perf_counter() - t0)

    path_steps_per_sec = nb_path * nb_steps / best
    print(json.dumps({
        "metric": metric,
        "value": path_steps_per_sec,
        "unit": "path-steps/sec",
        "vs_baseline": path_steps_per_sec / BASELINE_PATH_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
