"""
Isolate the per-step cost of a lax.scan on the axon TPU backend.

The cube's Riccati scan costs ~2.8 ms per step at (540, 3) f64 state —
~170x the flop estimate.  Sweep: dummy-body scans over dtype, state size,
unroll, and with/without xs, same process.

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/bench_scan_floor.py
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import stochvolmodels_tpu  # noqa: F401

S = 600


@partial(jax.jit, static_argnames=("steps", "unroll", "with_xs", "heavy"))
def scan_fn(x, xs, steps, unroll, with_xs, heavy):
    def body(c, x_t):
        if heavy:
            for _ in range(4):
                c = c + 0.1 * c * c - 0.05 * c * (c @ jnp.eye(c.shape[1],
                                                              dtype=c.dtype))
        else:
            c = c * 0.999 + 0.001
        if with_xs:
            c = c + x_t[0, 0, 0] * 1e-9
        return c, None

    if with_xs:
        c, _ = jax.lax.scan(body, x, xs, unroll=unroll)
    else:
        c, _ = jax.lax.scan(body, x, None, length=steps, unroll=unroll)
    return c


def timeit(fn, *a, n=4):
    t0 = time.perf_counter()
    float(jnp.sum(fn(*a)))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*a)))
        best = min(best, time.perf_counter() - t0)
    return best, tc


for dtype in (jnp.float64, jnp.float32):
    for with_xs in (False, True):
        for unroll in (1, 8):
            x = jnp.full((540, 3), 0.5, dtype=dtype)
            xs = jnp.zeros((S, 12, 7, 3), dtype=dtype)
            best, tc = timeit(scan_fn, x, xs if with_xs else None, S, unroll,
                              with_xs, False)
            print(f"{jnp.dtype(dtype).name} xs={int(with_xs)} unroll={unroll}"
                  f" light: {best*1e3:8.2f} ms ({best/S*1e6:6.1f} us/step,"
                  f" compile {tc:.0f}s)")

# heavier body, f64, closest to the Riccati step
x = jnp.full((540, 3), 0.5, dtype=jnp.float64)
xs = jnp.zeros((S, 12, 7, 3), dtype=jnp.float64)
for unroll in (1, 8, 32):
    best, tc = timeit(scan_fn, x, xs, S, unroll, True, True)
    print(f"float64 xs=1 unroll={unroll} heavy: {best*1e3:8.2f} ms "
          f"({best/S*1e6:6.1f} us/step, compile {tc:.0f}s)")
