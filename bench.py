"""
Benchmark: Monte-Carlo path-steps/sec on the flagship SV model MC kernel.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north-star target of 1e9 path-steps/sec
(the reference publishes no numbers and its numba CPU kernels cannot run
here — numba is not installed).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import stochvolmodels_tpu  # noqa: F401  (x64 config)
from stochvolmodels_tpu.models.heston import simulate_heston_terminal

BASELINE_PATH_STEPS_PER_SEC = 1.0e9


def main() -> None:
    nb_path = 1 << 20          # 1,048,576 paths
    ttm = 1.0
    nb_steps_per_year = 360    # reference default workload density
    nb_steps = int(ttm * nb_steps_per_year) + 1
    dtype = jnp.float32

    key = jax.random.key(42)
    x0 = jnp.zeros(nb_path, dtype=dtype)
    var0 = jnp.full(nb_path, 0.04, dtype=dtype)
    qvar0 = jnp.zeros(nb_path, dtype=dtype)

    @jax.jit
    def run(key, x0, var0, qvar0):
        x, var, qvar = simulate_heston_terminal(
            key=key, x0=x0, var0=var0, qvar0=qvar0, ttm=ttm,
            theta=0.04, kappa=4.0, rho=-0.5, volvol=0.4,
            nb_steps_per_year=nb_steps_per_year, dtype=dtype)
        # touch all outputs so nothing is dead-code eliminated
        return jnp.sum(x) + jnp.sum(var) + jnp.sum(qvar)

    # warmup / compile; fetch to host — block_until_ready does not reliably
    # block through the axon device tunnel
    float(run(key, x0, var0, qvar0))

    reps = 3
    best = float("inf")
    for r in range(reps):
        k = jax.random.fold_in(key, r)
        t0 = time.perf_counter()
        float(run(k, x0, var0, qvar0))
        best = min(best, time.perf_counter() - t0)

    path_steps_per_sec = nb_path * nb_steps / best
    print(json.dumps({
        "metric": "heston_mc_path_steps_per_sec",
        "value": path_steps_per_sec,
        "unit": "path-steps/sec",
        "vs_baseline": path_steps_per_sec / BASELINE_PATH_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
