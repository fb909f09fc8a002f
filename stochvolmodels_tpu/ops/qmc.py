"""
Randomized quasi-Monte Carlo: Sobol low-discrepancy normals, generated
on-device inside the time scan.

Beyond-reference capability (the reference at
/root/reference/stochvolmodels has pseudo-random MC only,
logsv_pricer.py:843-940): Sobol points cut the integration error of smooth
payoff expectations from O(N^-1/2) to nearly O(N^-1), so a 64k-path QMC
chain price typically matches a multi-million-path pseudo run.

TPU-native layout: the direction numbers are a tiny static (dims, 32)
uint32 table; each path's point index is its lane index, and one Sobol
*column* (all paths, one dimension) is an unrolled 32-term XOR-select over
the gray-code bits of the path indices — pure VPU integer ops, generated
per step inside ``lax.scan`` exactly like the threefry engine
(ops/random.py), so the (steps x paths) block is never materialized.
Dimensions map to time steps in simulation order: step t of a simulation
consumes dimensions (2t, 2t+1), and chained maturities continue the
dimension count (``dim_offset``), matching the reference's carried-state
chain MC contract (logsv_pricer.py:699-760).

Randomization is a per-dimension digital shift (XOR with threefry-derived
uint32), which preserves the (t, m, s)-net structure and makes every point
marginally uniform — the estimator is unbiased and the whole sequence is
reproducible from one jax key.  Shifts derive per-dimension via
``fold_in(key, dim)`` so any slicing of the dimension axis is consistent.

Error estimation: Sobol paths are not independent, so the iid std/sqrt(N)
formula is only an upper bound under QMC (typically 10-100x above the true
error for smooth payoffs).  The honest estimator is REPLICATED
randomization: split the path budget into R groups, give each group the
same Sobol point set under an independent digital shift
(``replicate_dimension_shifts``), and take the standard error of the R
replicate means — each replicate mean is unbiased and the R means are iid,
so classic confidence intervals apply (this is the standard randomized-QMC
construction, Owen 2013 ch. 17).  The simulation engines accept
``nb_replicates`` and the payoff reducer computes stderr over replicate
means; see ``compute_mc_vars_payoff(nb_replicates=...)``.
"""
from __future__ import annotations

import threading
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

SOBOL_BITS = 32
_MAX_DIMS = 21201  # scipy's Joe-Kuo direction-number table limit

_dir_lock = threading.Lock()
_dir_cache: Optional[np.ndarray] = None  # (cached_dims, 32) uint32


def sobol_direction_numbers(dims: int) -> np.ndarray:
    """(dims, 32) uint32 Joe-Kuo direction numbers, host-cached.

    Extracted from scipy's Sobol tables (scipy.stats.qmc.Sobol with
    ``bits=32``); the table is static data, computed once and grown on
    demand.  Row d column b is v_b^{(d)} scaled to 32 bits, so the
    (gray-code ordered) point i in dimension d is
    ``XOR_{b: bit b of gray(i)} v_b^{(d)} / 2^32`` — verified to reproduce
    scipy's unscrambled sequence bit-exactly (tests/test_qmc.py).
    """
    if dims > _MAX_DIMS:
        raise ValueError(f"Sobol direction numbers available up to "
                         f"{_MAX_DIMS} dims, requested {dims}")
    global _dir_cache
    with _dir_lock:
        if _dir_cache is None or _dir_cache.shape[0] < dims:
            from scipy.stats import qmc
            n = max(dims, 64)
            eng = qmc.Sobol(d=n, scramble=False, bits=SOBOL_BITS)
            _dir_cache = np.asarray(eng._sv, dtype=np.uint32).reshape(n, SOBOL_BITS)
        return _dir_cache[:dims]


def gray_codes(nb_points: int) -> jnp.ndarray:
    """gray codes of the point indices 0..n-1 as uint32 (device)."""
    idx = jnp.arange(nb_points, dtype=jnp.uint32)
    return idx ^ (idx >> 1)


def replicated_gray_codes(nb_points: int, nb_replicates: int) -> jnp.ndarray:
    """gray codes for R replicated Sobol point sets laid out contiguously
    on one path axis: path p belongs to replicate ``p // (n/R)`` and is
    Sobol point ``p % (n/R)`` of that replicate."""
    per = nb_points // nb_replicates
    if per * nb_replicates != nb_points:
        raise ValueError(f"nb_points={nb_points} not divisible by "
                         f"nb_replicates={nb_replicates}")
    idx = jnp.arange(nb_points, dtype=jnp.uint32) % jnp.uint32(per)
    return idx ^ (idx >> 1)


def replicate_dimension_shifts(key: jax.Array, dim_lo: int, dim_hi: int,
                               nb_replicates: int) -> jnp.ndarray:
    """(dims, R) digital-shift words: independent per replicate AND
    consistent per dimension across chained slices (replicate r derives
    its own key by ``fold_in(key, r)`` and then shifts per dimension like
    :func:`dimension_shifts`)."""
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
        jnp.arange(nb_replicates, dtype=jnp.uint32))
    return jax.vmap(lambda k: dimension_shifts(k, dim_lo, dim_hi))(keys).T


def dimension_shifts(key: jax.Array, dim_lo: int, dim_hi: int) -> jnp.ndarray:
    """per-dimension digital-shift words for dims [dim_lo, dim_hi).

    Derived independently per dimension (``fold_in(key, dim)``) so slices of
    the dimension axis are consistent: a chained simulation that consumes
    dims [0, 2s) then [2s, 2s+2k) sees the same shifts as one long run.
    """
    dims = jnp.arange(dim_lo, dim_hi, dtype=jnp.uint32)
    return jax.vmap(
        lambda d: jax.random.bits(jax.random.fold_in(key, d), (), jnp.uint32)
    )(dims)


def _to_unit(acc: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint32 Sobol integers -> (0, 1) uniforms in ``dtype``.

    f64: cell midpoints (acc + 1/2) / 2^32 — never exactly 0 or 1, tails of
    the subsequent ndtri reach ±6.3 sigma.  f32: scaled directly with the
    result clamped inside (0, 1) (f32 cannot resolve 32-bit cells anyway).
    """
    if dtype == jnp.float64:
        return (acc.astype(jnp.float64) + 0.5) * np.float64(2.0 ** -32)
    u = acc.astype(jnp.float32) * np.float32(2.0 ** -32)
    return jnp.clip(u, np.float32(2.0 ** -33), np.float32(1.0 - 2.0 ** -24))


def sobol_column(gray: jnp.ndarray, v_row: jnp.ndarray, shift, dtype
                 ) -> jnp.ndarray:
    """one randomized Sobol column: uniforms for every path in dimension d.

    ``gray``: (n,) uint32 gray codes of the path indices; ``v_row``: (32,)
    uint32 direction numbers of the dimension; ``shift``: scalar uint32
    digital shift.  Unrolled 32-term XOR-select — pure vector ALU.
    """
    acc = jnp.broadcast_to(jnp.asarray(shift, dtype=jnp.uint32), gray.shape)
    one = jnp.uint32(1)
    for b in range(SOBOL_BITS):
        bit = ((gray >> jnp.uint32(b)) & one) != 0
        acc = acc ^ jnp.where(bit, v_row[b], jnp.uint32(0))
    return _to_unit(acc, dtype)


@partial(jax.jit, static_argnames=("nb_points", "dim_lo", "dim_hi", "dtype"))
def _sobol_uniform_panel(v: jnp.ndarray, key, nb_points: int,
                         dim_lo: int, dim_hi: int, dtype) -> jnp.ndarray:
    g = gray_codes(nb_points)
    if key is None:
        shifts = jnp.zeros(dim_hi - dim_lo, dtype=jnp.uint32)
    else:
        shifts = dimension_shifts(key, dim_lo, dim_hi)
    cols = jax.vmap(lambda vr, sh: sobol_column(g, vr, sh, dtype),
                    in_axes=(0, 0), out_axes=1)
    return cols(v, shifts)


def sobol_uniforms(nb_points: int, dims: int, key: Optional[jax.Array] = None,
                   dim_offset: int = 0, dtype=jnp.float64) -> jnp.ndarray:
    """(nb_points, dims) randomized-Sobol uniform panel.

    ``key=None`` disables the digital shift (raw sequence, point 0 maps to
    the cell-midpoint of 0 in f64) — for parity tests against scipy.
    Materialized layout: use the scan engines for large path counts.
    """
    v = jnp.asarray(sobol_direction_numbers(dim_offset + dims)[dim_offset:])
    return _sobol_uniform_panel(v, key, nb_points, dim_offset,
                                dim_offset + dims, dtype)


def sobol_normals(nb_points: int, dims: int, key: Optional[jax.Array] = None,
                  dim_offset: int = 0, dtype=jnp.float64) -> jnp.ndarray:
    """(nb_points, dims) standard-normal panel by inverse CDF of randomized
    Sobol uniforms — the QMC analogue of a pre-drawn normal block (the
    inverse CDF keeps the low-discrepancy structure, unlike Box-Muller)."""
    return ndtri(sobol_uniforms(nb_points, dims, key=key,
                                dim_offset=dim_offset, dtype=dtype))


def qmc_step_normals(gray: jnp.ndarray, v_step: jnp.ndarray,
                     shift_step: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, ...]:
    """normals for one time step of a scan-based simulator.

    ``v_step``: (k, 32) direction-number rows of this step's k dimensions
    (scanned xs); ``shift_step``: (k,) digital shifts.  Returns k arrays of
    shape ``gray.shape`` — the drop-in QMC replacement for
    ``ops.random.step_normals``.
    """
    return tuple(ndtri(sobol_column(gray, v_step[j], shift_step[j], dtype))
                 for j in range(v_step.shape[0]))


def qmc_scan_panels(key: jax.Array, nb_steps: int, per_step: int = 2,
                    dim_offset: int = 0, nb_replicates: int = 0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray]:
    """(v_tot, shift_tot, v_steps, shifts) xs-panels for a ``lax.scan`` QMC
    simulator with stratified Brownian totals.

    The slice consumes dims [dim_offset, dim_offset + per_step*(nb_steps+1)):
    the first ``per_step`` dims drive the *total* of each Brownian stream
    over the slice (``v_tot`` (per_step, 32) / ``shift_tot`` (per_step,)),
    the rest the per-step raw draws (``v_steps`` (nb_steps, per_step, 32) /
    ``shifts`` (nb_steps, per_step)).  ``dim_offset`` is the number of
    *dimensions* consumed by earlier slices of a chained run
    (``qmc_dims_per_slice`` per slice).

    ``nb_replicates=R > 0`` appends a replicate axis to the shift panels
    (``shift_tot`` (per_step, R), ``shifts`` (nb_steps, per_step, R)) with
    independent shifts per replicate — pair with
    :func:`replicated_gray_codes` so each contiguous path group is the
    same Sobol point set under its own randomization.
    """
    lo = dim_offset
    hi = dim_offset + per_step * (nb_steps + 1)
    v = jnp.asarray(sobol_direction_numbers(hi)[lo:])
    if nb_replicates:
        shifts = replicate_dimension_shifts(key, lo, hi, nb_replicates)
        return (v[:per_step], shifts[:per_step],
                v[per_step:].reshape(nb_steps, per_step, SOBOL_BITS),
                shifts[per_step:].reshape(nb_steps, per_step, nb_replicates))
    shifts = dimension_shifts(key, lo, hi)
    return (v[:per_step], shifts[:per_step],
            v[per_step:].reshape(nb_steps, per_step, SOBOL_BITS),
            shifts[per_step:].reshape(nb_steps, per_step))


def qmc_dims_per_slice(nb_steps: int, per_step: int = 2) -> int:
    """dimensions a chained slice consumes (totals + per-step draws)."""
    return per_step * (nb_steps + 1)


def qmc_normal_blocks(key: jax.Array, nb_path: int, nb_steps_list,
                      dtype=jnp.float64):
    """materialized per-slice Sobol normal blocks with stratified totals.

    Returns ``[(W0 (steps, paths), W1 (steps, paths)), ...]`` — the QMC
    drop-in for the reference's pre-drawn fixed-randoms contract
    (logsv_pricer.py:944-966): feed to
    ``logsv_mc_chain_pricer_fixed_randoms``.  Slices chain one Sobol
    sequence (same dimension layout as the scan engine's
    ``qmc_scan_panels``); draws are frozen given ``key``.
    """
    blocks = []
    dim_offset = 0
    for n in nb_steps_list:
        n = int(n)
        z = sobol_normals(nb_path, 2 * (n + 1), key=key,
                          dim_offset=dim_offset, dtype=dtype)
        t0, t1 = z[:, 0], z[:, 1]
        z0 = z[:, 2::2].T        # (steps, paths), stream 0
        z1 = z[:, 3::2].T
        c0 = stratified_increment_shift(t0, jnp.sum(z0, axis=0), n)
        c1 = stratified_increment_shift(t1, jnp.sum(z1, axis=0), n)
        blocks.append((z0 + c0[None, :], z1 + c1[None, :]))
        dim_offset += qmc_dims_per_slice(n)
    return blocks


def stratified_increment_shift(total_z: jnp.ndarray, raw_sum: jnp.ndarray,
                               nb_steps: int) -> jnp.ndarray:
    """per-path constant ``c`` such that ``z'_t = z_t + c`` are iid N(0,1)
    increments whose sum equals ``sqrt(nb_steps) * total_z``.

    This is the level-0 Brownian-bridge (sum-stratified) construction:
    conditioning iid draws z_t on a target total T gives
    ``z'_t = z_t - mean(z) + T/sqrt(n)`` with exactly the iid N(0,1) joint
    law (var: 1 - 1/n + 1/n; cross-cov: -1/n + 1/n = 0).  Mapping T to the
    first (best-equidistributed) Sobol dimension moves the dominant ANOVA
    component of path functionals onto a perfectly stratified axis — the
    step-indexed dims alone leave the payoff variance spread across all
    orders and yield only ~2-3x over pseudo-MC; with stratified totals
    smooth payoffs gain one to two orders of magnitude (tests/test_qmc.py).
    """
    n = float(nb_steps)
    return total_z * np.sqrt(1.0 / n) - raw_sum * (1.0 / n)
