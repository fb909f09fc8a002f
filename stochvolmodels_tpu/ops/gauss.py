"""
Normal distribution helpers.

The reference's BSM layer evaluates the normal CDF through a rational
approximation to erfc (Numerical Recipes ``erfcc``, accuracy ~1.2e-7;
/root/reference/stochvolmodels/utils/funcs.py:108-133) because exact erfc is
not available in numba nopython mode.  Price-level parity with the reference
therefore requires the *same* approximation, so ``ncdf``/``npdf`` here default
to it; exact versions built on ``jax.lax.erfc`` are provided alongside.

All functions are elementwise (VPU-friendly) and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def erfcc(x: Array) -> Array:
    """complementary error function by the Numerical Recipes rational fit."""
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.5 * z)
    r = t * jnp.exp(
        -z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 + t * (0.09678418 + t * (
            -0.18628806 + t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 + t * (
                -0.82215223 + t * 0.17087277))))))))
    )
    return jnp.where(jnp.greater(x, 0.0), r, 2.0 - r)


def ncdf(x: Array) -> Array:
    """standard normal CDF via the erfcc approximation (reference-parity path)."""
    return 1.0 - 0.5 * erfcc(x / jnp.sqrt(2.0))


def npdf(x: Array, mu: float = 0.0, vol: float = 1.0) -> Array:
    """normal density with mean mu and standard deviation vol."""
    return jnp.exp(-0.5 * jnp.square((x - mu) / vol)) / (vol * jnp.sqrt(2.0 * jnp.pi))


def ncdf_exact(x: Array) -> Array:
    """standard normal CDF via exact erfc (use when parity is not required)."""
    return 0.5 * jax.lax.erfc(-x / jnp.sqrt(2.0))


def norm_ppf(q: Array) -> Array:
    """inverse standard normal CDF (exact, via erf-inv)."""
    return jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * jnp.asarray(q) - 1.0)
