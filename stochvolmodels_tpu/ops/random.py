"""
Stateless RNG discipline.

The reference relies on global seeding (``set_seed(24)`` at import,
/root/reference/stochvolmodels/pricers/model_pricer.py:29) and pre-drawn
normal blocks frozen across calibration iterations
(logsv_pricer.py:944-989).  Here every simulation takes an explicit
``jax.random`` threefry key; the "fixed randoms across optimizer iterations"
contract becomes simply "reuse the same key".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEED = 24


def key_from_seed(seed=None) -> jax.Array:
    """make a threefry key; defaults to the reference's global seed 24."""
    if seed is None:
        seed = DEFAULT_SEED
    if isinstance(seed, (int, float)):
        return jax.random.key(int(seed))
    return seed  # already a key


def step_normals(key: jax.Array, step: jnp.ndarray, shape, dtype=jnp.float32):
    """normals for one time step, derived by folding the step index into the key.

    Generating per-step inside ``lax.scan`` avoids materializing the full
    (steps x paths) block the reference pre-draws — that layout is
    memory-infeasible at 1e6 paths x 360 steps and is the reason the Pallas
    kernel generates randoms on-chip.
    """
    return jax.random.normal(jax.random.fold_in(key, step), shape, dtype=dtype)


def antithetic_step_normals(key: jax.Array, step: jnp.ndarray, shape,
                            dtype=jnp.float32):
    """per-step normals where the second half of the path axis mirrors the
    first: returns ``concat([w, -w])`` along the last axis with ``w`` of
    half width.

    Classic antithetic-variates coupling (not in the reference, which has no
    variance reduction): path ``i`` and path ``i + P/2`` see exactly opposite
    Brownian increments at every step, so smooth payoffs pair-average with
    strongly negative covariance.  The last axis of ``shape`` must be even.
    """
    *lead, nb_path = shape
    if nb_path % 2:
        raise ValueError(f"antithetic path count must be even, got {nb_path}")
    w = jax.random.normal(jax.random.fold_in(key, step),
                          (*lead, nb_path // 2), dtype=dtype)
    return jnp.concatenate([w, -w], axis=-1)
