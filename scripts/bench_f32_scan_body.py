"""
f32 scan-body cost scaling on the axon TPU backend.

The f64-scan study established ~6 us per HLO op per step for f64 bodies;
f32 bodies compile fused and run far cheaper — but HOW cheap at df32-size
bodies (thousands of HLO ops per step)?  This bounds the achievable
wall-clock of a double-float32 rewrite of the exact-path RK4 scans
(PARITY.md "Tunnel health and the f64-scan regression").

Times, warm-best within one process, a scan of `n_steps` whose body does
`n_rep` iterations of a 6-op block on a (1000, 5) f32 state (mimicking the
transform-ODE state panel), for a grid of body sizes.

Run: SVMTPU_BENCH_TPU=1 PYTHONPATH="/root/.axon_site:/root/repo" \
       python scripts/bench_f32_scan_body.py
"""
from __future__ import annotations

import os
import time

import jax

if os.environ.get("SVMTPU_BENCH_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make(n_steps, n_rep, dtype):
    def body(c, _):
        for _ in range(n_rep):
            c = c * 0.9995 + 0.001                       # 2 ops
            c = 0.5 * (c + 0.25 / jnp.maximum(c, 0.05))  # 4 ops
        return c, None

    return jax.jit(lambda x: jax.lax.scan(body, x, None, length=n_steps)[0])


def main():
    x = jnp.full((1000, 5), 0.5, jnp.float32)
    base = jax.jit(lambda v: v + 1.0)
    float(np.asarray(base(x))[0, 0])
    t0 = time.perf_counter()
    float(np.asarray(base(x))[0, 0])
    rt = time.perf_counter() - t0
    print(f"roundtrip: {rt * 1e3:.1f} ms")
    print("| steps | ops/step | warm best (ms) | us/op/step |")
    print("|---|---|---|---|")
    for n_steps, n_rep in [(110, 10), (110, 100), (110, 400), (110, 900),
                           (440, 100)]:
        f = make(n_steps, n_rep, jnp.float32)
        float(np.asarray(f(x))[0, 0])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(f(x))[0, 0])
            best = min(best, time.perf_counter() - t0)
        ops = n_rep * 6
        per_op = max(best - rt, 1e-9) * 1e6 / (n_steps * ops)
        print(f"| {n_steps} | {ops} | {best * 1e3:.1f} | {per_op:.3f} |",
              flush=True)


if __name__ == "__main__":
    main()
