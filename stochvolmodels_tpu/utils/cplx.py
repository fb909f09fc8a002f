"""
Complex arithmetic as (real, imag) float pairs.

XLA:TPU has no complex128; the transform-pricing engine needs full f64
precision on the complex MGF grid (reference hot path:
/root/reference/stochvolmodels/utils/mgf_pricer.py).  We therefore carry
complex values as a pair of real arrays.  This is also MXU-friendly: the
quadrature contraction Re[w . exp(z)] decomposes into real multiply-adds.

All functions are shape-polymorphic and jit/vmap/grad friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Array = jnp.ndarray


class Cplx(NamedTuple):
    """complex value as a (re, im) pair of same-shaped real arrays."""
    re: Array
    im: Array

    @property
    def shape(self):
        return jnp.shape(self.re)

    @property
    def dtype(self):
        return jnp.result_type(self.re)

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re + other.re, self.im + other.im)
        re = self.re + other
        return Cplx(re, jnp.broadcast_to(self.im, jnp.shape(re)))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re - other.re, self.im - other.im)
        re = self.re - other
        return Cplx(re, jnp.broadcast_to(self.im, jnp.shape(re)))

    def __rsub__(self, other):
        re = other - self.re
        return Cplx(re, jnp.broadcast_to(-self.im, jnp.shape(re)))

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def __mul__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re * other.re - self.im * other.im,
                        self.re * other.im + self.im * other.re)
        return Cplx(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Cplx):
            d = other.re * other.re + other.im * other.im
            return Cplx((self.re * other.re + self.im * other.im) / d,
                        (self.im * other.re - self.re * other.im) / d)
        return Cplx(self.re / other, self.im / other)

    def __rtruediv__(self, other):
        # other / self with real other
        d = self.re * self.re + self.im * self.im
        return Cplx(other * self.re / d, -other * self.im / d)

    def conj(self) -> "Cplx":
        return Cplx(self.re, -self.im)

    def abs2(self) -> Array:
        return self.re * self.re + self.im * self.im


ScalarLike = Union[float, Array]


def of(re: ScalarLike, im: ScalarLike = 0.0) -> Cplx:
    """build a Cplx from real/imag parts, broadcasting scalars."""
    re = jnp.asarray(re)
    im = jnp.broadcast_to(jnp.asarray(im, dtype=re.dtype), jnp.shape(re)) \
        if jnp.shape(im) != jnp.shape(re) else jnp.asarray(im, dtype=re.dtype)
    return Cplx(re, im)


def from_numpy(z) -> Cplx:
    """build a Cplx from a numpy/jax complex array."""
    z = jnp.asarray(z)
    return Cplx(jnp.real(z), jnp.imag(z))


def to_numpy(z: Cplx):
    """assemble a native complex array (CPU/testing only)."""
    return z.re + 1j * z.im


def cexp(z: Cplx) -> Cplx:
    """exp(z) = e^re (cos im, sin im)."""
    e = jnp.exp(z.re)
    return Cplx(e * jnp.cos(z.im), e * jnp.sin(z.im))


def cexpm1(z: Cplx) -> Cplx:
    """exp(z) - 1, accurate for small |z| (no 1-ulp cancellation).

    re = expm1(u) cos(v) - (1 - cos(v)),  im = (expm1(u) + 1) sin(v): each
    term is O(|z|), so the f32 absolute error stays ~eps*|z| where the
    naive cexp(z) - 1 loses all relative accuracy below |z| ~ 1e-3.  Used
    by jump-MGF evaluations of the form e^{sa}/(1+ma) - 1 whose argument
    crosses zero inside the transform grid (models/hawkes_jd.py).
    """
    em = jnp.expm1(z.re)
    # 1 - cos(v) via the cancellation-free half-angle identity so the term's
    # rounding error scales with |v|^2 (the naive difference carries a flat
    # ~ulp(1)/2 absolute error independent of |v|).
    one_m_cos = 2.0 * jnp.square(jnp.sin(0.5 * z.im))
    return Cplx(em * (1.0 - one_m_cos) - one_m_cos, (em + 1.0) * jnp.sin(z.im))


def clog(z: Cplx) -> Cplx:
    """principal branch log(z)."""
    return Cplx(0.5 * jnp.log(z.abs2()), jnp.arctan2(z.im, z.re))


def csqrt(z: Cplx) -> Cplx:
    """principal branch sqrt(z): sqrt(r) * (cos(t/2) + i sin(t/2))."""
    r = jnp.sqrt(jnp.sqrt(z.abs2()))
    t = 0.5 * jnp.arctan2(z.im, z.re)
    return Cplx(r * jnp.cos(t), r * jnp.sin(t))


def cpow_int(z: Cplx, n: int) -> Cplx:
    """z**n for small non-negative integer n, by repeated squaring."""
    result = of(jnp.ones_like(z.re))
    base = z
    while n > 0:
        if n & 1:
            result = result * base
        base = base * base
        n >>= 1
    return result
