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
Knuth TAOCP v2) made CONTRACTION-INVARIANT.  They require IEEE
round-to-nearest f32 add/sub — true of the TPU VPU and of XLA:CPU — but
deliberately do NOT require uncontracted multiplies: XLA:CPU's backend
emits machine FMAs for fmul+fadd pairs even with no fast-math flags in
the LLVM IR (observed vfmadd/vfmsub in the dumped fusion kernel objects),
which silently destroys any EFT that anchors on a ROUNDED product —
classic Dekker TwoProd degraded jitted df32 scan bodies to plain-f32
accuracy (~4e-8) while tiny probe programs stayed exact.  Two design
rules restore invariance:

* Split is MANTISSA BIT-MASKING (not the 2^12+1 multiply trick), so it
  contains no fmul a compiler could fuse;
* TwoProd multiplies only the <= 12-bit-mantissa split halves — all four
  partial products are exactly representable, so ``fma(ah, bh, x)`` and
  ``ah * bh + x`` round the identical value — and combines them with
  add-only TwoSum/FastTwoSum.  Every mul-feeding-add in the module is
  either an exact product or a correction-level term whose contraction
  shifts the result by ~2^-48 only.

MXU matmuls still downcast to bf16, so df32 code must stay
elementwise/VPU: contract small tensors with broadcast mul + tree-sum,
never jnp.dot/einsum.

All functions broadcast elementwise over arrays.  A df32 number is a
``DF`` namedtuple-like pair; complex df32 values pair two DFs (see
models/logsv/affine.py for the RK4 usage).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# keep sign(1) + exponent(8) + 11 explicit mantissa bits -> 12 significant
# bits incl. the implicit leading 1 (Dekker split target for binary32)
_SPLIT_MASK = jnp.uint32(0xFFFFF000)


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
    """a == hi + lo with hi, lo <= 12-bit mantissas (bit-mask Split).

    Masking the low 12 explicit mantissa bits is EXACT (hi carries a's top
    bits, lo = a - hi is a Sterbenz-exact difference holding the masked-off
    bits) and, unlike Dekker's ``t = (2^12+1)*a; hi = t - (t - a)``, has no
    fmul-feeding-fadd pattern an FP-contracting compiler can corrupt —
    XLA:CPU's LLVM JIT does exactly that inside large fused scan bodies
    (module docstring)."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & _SPLIT_MASK, jnp.float32)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """p + e == a * b to ~2^-47 relative, CONTRACTION-INVARIANT.

    Classic Dekker TwoProd anchors on the rounded full product
    ``p = fl(a*b)`` and reconstructs its rounding error — which an
    FP-contracting compiler silently destroys: XLA:CPU's backend emits
    machine FMAs for fmul+fadd pairs even with no fast-math flags in the
    IR (observed vfmadd/vfmsub in the fusion kernels), so a consumer
    computing ``s - p`` or ``p + e`` gets the UNROUNDED product and the
    compensation absorbs p's rounding error (~ulp(p)) as garbage.

    This variant only ever multiplies the <= 12-bit-mantissa split halves,
    so all four partial products are EXACT — ``fma(ah, bh, x)`` and
    ``ah * bh + x`` round the identical value, making the whole expression
    invariant under contraction.  The partials combine through add-only
    error-free transforms (TwoSum / FastTwoSum, which contain no multiply
    a compiler could fuse), so the only rounding is the final
    correction-level add at ~2^-48*|ab|.  |p| >= |e| holds, as
    _quick_two_sum callers need.
    """
    ah, al = _split(a)
    bh, bl = _split(b)
    p0 = ah * bh                           # all four partials exact
    p1 = ah * bl
    p2 = al * bh
    p3 = al * bl
    s1, e1 = _two_sum(p1, p2)              # exact (add-only EFT)
    p, e_a = _quick_two_sum(p0, s1)        # exact; |p0| >= |s1|
    e = (e_a + p3) + e1                    # ~2^-48|ab| rounding only
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
    """df32 * f32 scalar/array (~21 flops).

    Routed through the contraction-invariant _two_prod (exact dominant
    product), same as :func:`mul` — see _two_prod's docstring."""
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
