"""
On-device LM calibration of the multi-factor rate LogSV term structure.

The reference ships the factor-HJM model with pre-fitted parameters only
(papers/sv_for_factor_hjm/calibration_fig_5_6_7.py:171-215 embeds the fitted
Nelson-Siegel term structure; no calibration engine exists in
/root/reference/stochvolmodels/pricers/factor_hjm/).  This module closes that
gap TPU-natively: per-expiry Levenberg-Marquardt over the differentiable
fixed-panel swaption pricer (:func:`make_swaption_slice_fn`), bootstrapped
left-to-right along the term structure exactly like the paper's progressive
calibration (SSRN-4519227 Sec. 5).

Per expiry the calibrated vector is ``[beta_idx (d,), volvol_idx]`` — the
segment of the skew term structure live on ``(ts[idx], ts[idx+1]]`` and the
scalar vol-of-vol — fitted jointly to the normal-ivol smiles of all supplied
tenors at that expiry.  The QA structural panels (mean states, swap gradient,
annuity log-derivative, factor vols C) are independent of (beta, volvol)
under the frozen-coefficient approximation (rate_logsv_params.py:289-297),
so they are computed once on host per expiry x tenor; everything inside the
LM loop — coefficient assembly, Riccati scan, tanh-sinh inversion, Bachelier
implied-vol inversion — is one jitted device program.
"""
from __future__ import annotations

import copy
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.models.factor_hjm.rate_logsv_params import (
    MultiFactRateLogSvParams,
)
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
    make_swaption_slice_fn,
)
from stochvolmodels_tpu.ops.bachelier import infer_normal_implied_vol_fast
from stochvolmodels_tpu.ops.lm import lm_minimize

Array = jnp.ndarray


def calibrate_rate_logsv_lm_on_device(
        params: MultiFactRateLogSvParams,
        t_grid: np.ndarray,
        expiry: float,
        idx: int,
        tenors: Sequence[float],
        forwards: Sequence[float],
        strikes_tenors: Sequence[np.ndarray],
        market_ivols_tenors: Sequence[np.ndarray],
        weights_tenors: Optional[Sequence[np.ndarray]] = None,
        nb_iters: int = 24,
        beta_bound: float = 2.0,
        volvol_bounds: Tuple[float, float] = (0.01, 2.0),
        x0: Optional[np.ndarray] = None,
        y0: Optional[np.ndarray] = None,
) -> Tuple[MultiFactRateLogSvParams, float]:
    """fit ``(beta.xs[idx], volvol.xs[idx])`` to the smiles at one expiry.

    ``strikes_tenors[i]`` / ``market_ivols_tenors[i]`` are the strike grid and
    market normal ivols of tenor ``tenors[i]`` at ``expiry``; the residual
    vector stacks all tenors (vega-flat weights unless ``weights_tenors``).
    Segments ``< idx`` of the term structures are held fixed (bootstrap);
    segments ``> idx`` are inactive because every slice pricer cuts the time
    grid at ``expiry``.  Returns ``(updated params copy, best cost)``.
    """
    d = params.basis.get_nb_factors()
    slice_fns = [
        make_swaption_slice_fn(params, t_grid, ttm=float(expiry),
                               tenor=float(tenor), forward=float(fwd),
                               strikes=np.asarray(strikes, dtype=float),
                               x0=x0, y0=y0)
        for tenor, fwd, strikes in zip(tenors, forwards, strikes_tenors)]
    beta0 = jnp.asarray(params.beta.xs, dtype=jnp.float64)
    volvol0 = jnp.asarray(params.volvol.xs, dtype=jnp.float64)
    sigma0 = jnp.asarray(params.sigma0, dtype=jnp.float64)
    market = [jnp.asarray(np.asarray(iv, dtype=float))
              for iv in market_ivols_tenors]
    if weights_tenors is None:
        weights = [jnp.ones_like(m) for m in market]
    else:
        weights = [jnp.asarray(np.asarray(w, dtype=float))
                   for w in weights_tenors]

    def residuals(pars):
        beta_xs = beta0.at[idx].set(pars[:d])
        volvol_xs = volvol0.at[idx].set(pars[d])
        res = []
        for fn, fwd, strikes, mkt, w in zip(slice_fns, forwards,
                                            strikes_tenors, market, weights):
            prices = fn(sigma0, beta_xs, volvol_xs)
            ivols = infer_normal_implied_vol_fast(
                forward=float(fwd), ttm=float(expiry),
                strike=jnp.asarray(np.asarray(strikes, dtype=float)),
                given_price=prices)
            clean = jnp.where(jnp.isnan(ivols), mkt, ivols)
            res.append(w * (clean - mkt))
        return jnp.concatenate(res)

    p0 = jnp.concatenate([beta0[idx], volvol0[idx][None]])
    lower = jnp.asarray([-beta_bound] * d + [volvol_bounds[0]])
    upper = jnp.asarray([beta_bound] * d + [volvol_bounds[1]])
    run = jax.jit(lambda q0: lm_minimize(residuals, q0, lower, upper,
                                         nb_iters=nb_iters))
    best, best_cost = run(p0)
    best = np.asarray(best, dtype=float)

    fitted = copy.deepcopy(params)
    fitted.update_params(idx=idx, beta_idx=best[:d], volvol_idx=float(best[d]))
    return fitted, float(best_cost)


def calibrate_rate_logsv_term_structure(
        params0: MultiFactRateLogSvParams,
        expiries: Sequence[float],
        tenors: Sequence[float],
        forwards_expiries: Sequence[Sequence[float]],
        strikes_expiries: Sequence[Sequence[np.ndarray]],
        market_ivols_expiries: Sequence[Sequence[np.ndarray]],
        t_grid_pts: int = 31,
        nb_iters: int = 24,
        **kwargs,
) -> Tuple[MultiFactRateLogSvParams, List[float]]:
    """bootstrap the full ``(beta, volvol)`` term structure expiry by expiry.

    ``expiries`` must align with ``params0.ts[1:]`` prefix segments (the
    paper calibrates one segment per listed expiry).  Row ``i`` of the
    market inputs holds, per tenor, the smile at ``expiries[i]``.  Returns
    the fitted parameter set and the per-expiry LM costs.
    """
    from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid

    params = copy.deepcopy(params0)
    costs: List[float] = []
    for i, expiry in enumerate(expiries):
        seg = np.searchsorted(np.asarray(params.ts), float(expiry)) - 1
        seg = int(np.clip(seg, 0, params.beta.xs.shape[0] - 1))
        t_grid = generate_ttms_grid(np.array([float(expiry)]),
                                    nb_pts=t_grid_pts)
        params, cost = calibrate_rate_logsv_lm_on_device(
            params, t_grid, expiry=float(expiry), idx=seg, tenors=tenors,
            forwards=forwards_expiries[i],
            strikes_tenors=strikes_expiries[i],
            market_ivols_tenors=market_ivols_expiries[i],
            nb_iters=nb_iters, **kwargs)
        costs.append(cost)
    return params, costs
