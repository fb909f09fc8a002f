"""
Axon-tunnel health probe.

Two stable facts about the axon TPU backend (measured r03 and re-measured
r04, identical): f32 ``lax.scan`` bodies compile to fused loops and run
fast, while f64 scan bodies execute per-op-latency-bound at ~6 us per
elementary op PER STEP (PARITY.md "Tunnel health and the f64-scan
regression", "Swaption-cube latency study").  Those are constant physics,
not weather — the r04 fast-path regression (32 -> 575 ms) was an
accidental f64 promotion, not tunnel load.

What DOES vary is tunnel health: warm wall-clocks swing ~±20% between
processes, and in sick periods (e.g. after a "TPU worker process crashed"
event) the per-call roundtrip and dispatch balloon by much more.  The
wall-clock perf gates in tests/test_tpu_perf.py assert absolute bounds
that assume a functioning tunnel; ``measure_tunnel_health`` gives them a
cheap basis to SKIP (with numbers) instead of failing when the tunnel
itself is sick:

* ``roundtrip_ms`` — warm best of a trivial jitted program including the
  host fetch (~27 ms normal; a sick worker shows hundreds of ms).
* ``scan_us_per_op`` — implied per-op cost of a canonical mid-size f32
  scan body over the roundtrip baseline (~0-1 us normal; genuine
  dispatch degradation shows up here).
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

#: skip thresholds for the wall-clock gates
MAX_ROUNDTRIP_MS = 150.0
MAX_SCAN_US_PER_OP = 2.0


def measure_tunnel_health(n_steps: int = 512, reps: int = 3) -> Dict[str, float]:
    """warm roundtrip and f32-scan dispatch cost through the tunnel.

    Compiles two tiny programs (seconds); runs in well under a second
    warm.  Values are ~0 on CPU.
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
    return {
        "roundtrip_ms": base_s * 1e3,
        "scan_us_per_op": max(probe_s - base_s, 0.0) * 1e6 / ops,
    }


def tunnel_degraded(health: Dict[str, float]) -> bool:
    return (health["roundtrip_ms"] > MAX_ROUNDTRIP_MS
            or health["scan_us_per_op"] > MAX_SCAN_US_PER_OP)
