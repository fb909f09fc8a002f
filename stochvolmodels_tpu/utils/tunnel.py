"""
Axon-tunnel health probe.

On the axon TPU backend, ``lax.scan`` bodies execute at a per-elementary-op
PER-STEP dispatch cost, and that cost varies more than 10x with tunnel load:
~0.5 us/op in healthy periods (the r03 perf transcript: warm fast BTC chain
reprice 32 ms) vs ~6 us/op degraded (same binary, same chip: 575 ms;
PARITY.md "Tunnel health and the warm-latency gates").  Wall-clock numbers
for scan-bound programs are therefore only comparable at similar health,
and absolute wall-clock gates must be skipped (not failed) when the tunnel
is degraded.

``measure_tunnel_us_per_op`` times a canonical mid-size scan body against a
trivial-program baseline (to remove the fixed per-call roundtrip, ~27 ms)
and returns the implied us-per-elementary-op.  It compiles two tiny
programs (~seconds) and runs in well under a second warm.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

#: empirical scan-dispatch cost thresholds (us per elementary op)
HEALTHY_US_PER_OP = 2.0


def measure_tunnel_us_per_op(n_steps: int = 512, reps: int = 3) -> float:
    """per-elementary-op scan-dispatch cost through the tunnel, in us.

    ~0.5 when healthy, ~6 when degraded (measured 2026-08-20); values are
    meaningless on CPU (returns ~0).
    """

    def body(c, _):
        for _ in range(8):
            c = c * 0.9995 + 0.001                       # 2 ops
            c = 0.5 * (c + 0.25 / jnp.maximum(c, 0.05))  # 4 ops
        return c, None

    ops = n_steps * 8 * 6
    probe = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n_steps)[0])
    base = jax.jit(lambda x: x + 1.0)
    x = jnp.full((1024,), 0.5, jnp.float32)
    # compile + first run; fetching forces completion (block_until_ready
    # does not reliably block through the tunnel)
    float(np.asarray(probe(x))[0])
    float(np.asarray(base(x))[0])

    def best_of(fn):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(x))[0])
            b = min(b, time.perf_counter() - t0)
        return b

    base_s = best_of(base)
    probe_s = best_of(probe)
    return max(probe_s - base_s, 0.0) * 1e6 / ops
