"""
Double-float32 ("df32") arithmetic: each value is an (hi, lo) pair of
float32 with hi + lo == value to ~2^-48 relative — f64-class accuracy out
of pure f32 ops.

Why this exists: on the axon TPU backend f64 ``lax.scan`` bodies execute
per-op-latency-bound (~6 us per HLO op per step, emulation included) while
f32 scan bodies compile to fused loops ~200x cheaper per step (PARITY.md
"Tunnel health and the f64-scan regression").  The reference-parity f64
transform-ODE integrations are therefore scan-latency-bound; rewriting
their bodies in df32 multiplies the op count ~10x but moves them onto the
fast f32 path — a large net win — while keeping enough precision that RK4
truncation error still dominates (df32 roundoff ~2^-48 per op vs the
~1e-9 discretization floor of the 240 steps/yr default).

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP v2): TwoSum / Split / TwoProd, FMA-free (XLA does not expose
a guaranteed-fused multiply-add).  Requires IEEE round-to-nearest f32
mul/add — true of the TPU VPU and of XLA:CPU, but NOT of MXU matmuls
(which downcast to bf16), so df32 code must stay elementwise/VPU:
contract small tensors with unrolled loops of df_add/df_mul, never
jnp.dot/einsum.

All functions broadcast elementwise over arrays.  A df32 number is a
``DF`` namedtuple-like pair; complex df32 values pair two DFs (see
models/logsv/affine.py for the RK4 usage).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_SPLITTER = jnp.float32(4097.0)  # 2^12 + 1 for binary32 (24-bit mantissa)


class DF(NamedTuple):
    """double-float32 value: hi + lo, |lo| <= ulp(hi)/2."""
    hi: jnp.ndarray
    lo: jnp.ndarray


def _two_sum(a, b):
    """s + e == a + b exactly (Knuth TwoSum, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """s + e == a + b exactly, requires |a| >= |b| (Dekker FastTwoSum)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """a == hi + lo with hi, lo 12-bit mantissas (Dekker Split)."""
    t = _SPLITTER * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """p + e == a * b exactly (Dekker TwoProd, FMA-free, 17 flops)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df(x) -> DF:
    """lift an f32 (or weakly-typed) array to df32 with zero low part."""
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def from_f64(x) -> DF:
    """split an f64 array into an exact (hi, lo) f32 pair (for constants
    computed in f64 outside the scan)."""
    hi = jnp.asarray(x, jnp.float32)
    lo = jnp.asarray(x - hi.astype(jnp.float64), jnp.float32)
    return DF(hi, lo)


def to_f64(a: DF):
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def add(a: DF, b: DF) -> DF:
    """df32 + df32 (accurate ieee-style double-double add, 20 flops)."""
    s, e = _two_sum(a.hi, b.hi)
    t, f = _two_sum(a.lo, b.lo)
    e = e + t
    s, e = _quick_two_sum(s, e)
    e = e + f
    return DF(*_quick_two_sum(s, e))


def add_f(a: DF, b) -> DF:
    """df32 + f32 scalar/array (10 flops)."""
    s, e = _two_sum(a.hi, jnp.asarray(b, jnp.float32))
    e = e + a.lo
    return DF(*_quick_two_sum(s, e))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    """df32 * df32 (~25 flops)."""
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return DF(*_quick_two_sum(p, e))


def mul_f(a: DF, b) -> DF:
    """df32 * f32 scalar/array (~21 flops)."""
    b = jnp.asarray(b, jnp.float32)
    p, e = _two_prod(a.hi, b)
    e = e + a.lo * b
    return DF(*_quick_two_sum(p, e))


def scale_pow2(a: DF, k: float) -> DF:
    """exact scaling by a power of two (2 flops)."""
    k = jnp.float32(k)
    return DF(a.hi * k, a.lo * k)


def where(cond, a: DF, b: DF) -> DF:
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))
