"""
Monte-Carlo payoff evaluation for vanilla, inverse and QVAR options.

TPU rebuild of /root/reference/stochvolmodels/utils/mc_payoffs.py: the
per-strike loop becomes a (strike x path) broadcast with a single reduction
over paths.  The reference's numerical contracts are preserved exactly:

* simulated spots are recentred on the forward before payoffs
  (mc_payoffs.py:60-62) so put-call parity holds across the slice;
* means/stds are NaN-dropping (``nanmean``/``nanstd``);
* the returned std is the standard error ``nanstd / sqrt(nb_path)``.

On a multi-chip mesh the path axis is sharded and the reductions here become
psums over ICI (see stochvolmodels_tpu.parallel).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.ops.bsm import as_option_codes

Array = jnp.ndarray


def compute_mc_vars_payoff(x0: Array,
                           sigma0: Array,
                           qvar0: Array,
                           ttm,
                           forward,
                           strikes_ttm: Array,
                           optiontypes_ttm,
                           discfactor=1.0,
                           variable_type: VariableType = VariableType.LOG_RETURN,
                           antithetic: bool = False,
                           nb_replicates: int = 0
                           ) -> Tuple[Array, Array]:
    """discounted mean payoff and standard error per strike for one slice.

    ``x0``/``qvar0``: terminal log-return and quadratic variance paths
    (nb_path,); ``sigma0`` is accepted for signature symmetry with the
    reference and unused (mc_payoffs.py:31-34).  Returns ((K,), (K,)).

    ``antithetic=True`` declares that path ``i`` and ``i + P/2`` are an
    antithetic pair (see ``ops.random.antithetic_step_normals``): the price
    is unchanged but the standard error is computed over the P/2 pair
    averages — the correct estimator under the coupling, since the raw
    per-path std would ignore the intra-pair covariance.  The reduction is
    largest where payoffs are near-monotone in the driving noise (short
    maturities, delta-dominated); for vol-of-vol-dominated long maturities
    the intra-pair covariance can be positive and the honest stderr then
    shows little or no gain.

    ``nb_replicates=R > 1`` declares the path axis to hold R contiguous
    independently-randomized QMC replicate groups (see
    ``ops.qmc``/``simulate_logsv_terminal_qmc``): forward recentring is
    applied per replicate (each group is a self-contained unbiased
    estimator), the price is the mean of the R replicate means and the
    standard error is ``std(replicate means, ddof=1)/sqrt(R)`` — honest
    under QMC, where the per-path iid formula overstates the error by
    one-to-two orders of magnitude.  Mutually exclusive with
    ``antithetic``.
    """
    del sigma0
    x0 = jnp.asarray(x0)
    if antithetic and nb_replicates > 1:
        raise NotImplementedError("antithetic pairing and QMC replicates "
                                  "are mutually exclusive reductions")
    if nb_replicates > 1:
        return _mc_vars_payoff_replicates(
            x0, jnp.asarray(qvar0), ttm, forward, strikes_ttm,
            optiontypes_ttm, discfactor, variable_type, nb_replicates)
    spots_t = forward * jnp.exp(x0)
    correction = jnp.nanmean(spots_t) - forward
    spots_t = spots_t - correction

    if variable_type == VariableType.LOG_RETURN:
        underlying_t = spots_t
    elif variable_type == VariableType.Q_VAR:
        underlying_t = jnp.asarray(qvar0) / ttm
    else:
        raise NotImplementedError(f"variable_type={variable_type}")

    strikes = jnp.asarray(strikes_ttm)[:, None]               # (K, 1)
    codes = as_option_codes(optiontypes_ttm)[:, None]
    is_call = (codes & 1).astype(bool)
    is_inverse = (codes & 2).astype(bool)

    u = underlying_t[None, :]                                  # (1, P)
    call_pay = jnp.where(u > strikes, u - strikes, 0.0)
    put_pay = jnp.where(u < strikes, strikes - u, 0.0)
    payoff = jnp.where(is_call, call_pay, put_pay)
    payoff = jnp.where(is_inverse, payoff / spots_t[None, :], payoff)

    if antithetic:
        half = payoff.shape[1] // 2
        pair_avg = 0.5 * (payoff[:, :half] + payoff[:, half:])
        option_prices = discfactor * jnp.nanmean(pair_avg, axis=1)
        option_std = discfactor * jnp.nanstd(pair_avg, axis=1)
        return option_prices, option_std / jnp.sqrt(half)
    option_prices = discfactor * jnp.nanmean(payoff, axis=1)
    option_std = discfactor * jnp.nanstd(payoff, axis=1)
    return option_prices, option_std / jnp.sqrt(x0.shape[0])


def _mc_vars_payoff_replicates(x0: Array, qvar0: Array, ttm, forward,
                               strikes_ttm: Array, optiontypes_ttm,
                               discfactor, variable_type: VariableType,
                               nb_replicates: int) -> Tuple[Array, Array]:
    """replicated-randomization reduction: per-replicate recentring and
    means, stderr over the R iid replicate means (Owen's RQMC CI)."""
    nb_path = x0.shape[0]
    if nb_path % nb_replicates:
        raise ValueError(f"nb_path={nb_path} not divisible by "
                         f"nb_replicates={nb_replicates}")
    spots = forward * jnp.exp(x0.reshape(nb_replicates, -1))   # (R, p)
    spots = spots - (jnp.nanmean(spots, axis=1, keepdims=True) - forward)

    if variable_type == VariableType.LOG_RETURN:
        underlying = spots
    elif variable_type == VariableType.Q_VAR:
        underlying = qvar0.reshape(nb_replicates, -1) / ttm
    else:
        raise NotImplementedError(f"variable_type={variable_type}")

    strikes = jnp.asarray(strikes_ttm)[:, None, None]          # (K, 1, 1)
    codes = as_option_codes(optiontypes_ttm)[:, None, None]
    is_call = (codes & 1).astype(bool)
    is_inverse = (codes & 2).astype(bool)

    u = underlying[None, :, :]                                  # (1, R, p)
    call_pay = jnp.where(u > strikes, u - strikes, 0.0)
    put_pay = jnp.where(u < strikes, strikes - u, 0.0)
    payoff = jnp.where(is_call, call_pay, put_pay)
    payoff = jnp.where(is_inverse, payoff / spots[None, :, :], payoff)

    rep_means = jnp.nanmean(payoff, axis=2)                     # (K, R)
    # nan-aware over the replicate axis too: a replicate whose paths are ALL
    # NaN yields a NaN mean and must be dropped, matching the unreplicated
    # reducer's nanmean/nanstd semantics (a partial-NaN replicate is already
    # handled by the per-replicate nanmean above)
    option_prices = discfactor * jnp.nanmean(rep_means, axis=1)
    option_std = discfactor * jnp.nanstd(rep_means, axis=1, ddof=1)
    return option_prices, option_std / jnp.sqrt(nb_replicates)
