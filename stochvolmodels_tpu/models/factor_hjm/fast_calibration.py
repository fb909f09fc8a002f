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
    make_swaption_cube_fn,
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


def calibrate_rate_logsv_cube_lm_on_device(
        params: MultiFactRateLogSvParams,
        slices: Sequence[Tuple[float, float]],
        forwards: Sequence[float],
        strikes_slices: Sequence[np.ndarray],
        market_ivols_slices: Sequence[np.ndarray],
        segments: Optional[Sequence[int]] = None,
        weights_slices: Optional[Sequence[np.ndarray]] = None,
        nb_iters: int = 24,
        beta_bound: float = 2.0,
        volvol_bounds: Tuple[float, float] = (0.01, 2.0),
        year_steps: int = 48,
        nb_grid_pts: int = 31,
        mesh=None,
        fit_A: bool = False,
        A_bounds: Tuple[float, float] = (1e-5, 0.2),
        **cube_kwargs,
) -> Tuple[MultiFactRateLogSvParams, float]:
    """JOINT fit of the (beta, volvol) term structure to a whole swaption
    cube in one on-device LM solve.

    Where :func:`calibrate_rate_logsv_lm_on_device` bootstraps expiry by
    expiry (the paper's procedure), this drives the residuals of every
    (expiry, tenor, strike) quote simultaneously through
    :func:`make_swaption_cube_fn` — one compiled program evaluates the full
    cube and its Jacobian per LM iteration.  ``segments`` selects which
    term-structure segments are free (default: every segment covered by the
    supplied expiries); earlier segments couple into later expiries through
    the piecewise-constant term structure, which the bootstrap ignores by
    construction.  Returns ``(updated params copy, best cost)``.

    ``mesh``: optional ``jax.sharding.Mesh`` — the cube's (expiry, tenor)
    slice axis shards over it (see ``make_swaption_cube_fn``), so each LM
    iteration's cube evaluation and Jacobian split across devices; the
    normal-equation reductions become ICI psums inserted by XLA.  Slice
    results are mathematically independent, so the sharded fit equals the
    single-device fit to float tolerance (tests/test_parallel.py).

    ``fit_A=True`` extends the free vector with the per-segment factor-vol
    levels ``A`` (bounded by ``A_bounds``) and prices through the TRACED
    cube (``make_swaption_cube_fn_traced``): the QA structural panels
    depend on A, so the LM Jacobian is exact through the structure — a
    true one-stage cube calibration, where the reference's paper procedure
    (and ``calibrate_rate_logsv_full``) alternates an ATM A-prefit with a
    (beta, volvol) fit on frozen panels.
    """
    d = params.basis.get_nb_factors()
    n_seg = params.beta.xs.shape[0]
    if segments is None:
        last = max(int(np.searchsorted(np.asarray(params.ts), float(e)) - 1)
                   for e, _ in slices)
        segments = list(range(0, min(last, n_seg - 1) + 1))
    segments = list(segments)
    n_free = len(segments)

    # the two cube builders accept different path-specific kwargs (the frozen
    # builder's host solve_ivp takes panel_rtol/panel_atol; the traced builder
    # replaces that solve with an on-device scan controlled by n_sub) — strip
    # whichever set does not apply so toggling fit_A with otherwise-valid
    # kwargs never raises TypeError.
    cube_kwargs = dict(cube_kwargs)
    if fit_A:
        for k in ("panel_rtol", "panel_atol"):
            cube_kwargs.pop(k, None)
    else:
        cube_kwargs.pop("n_sub", None)
    if fit_A:
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn_traced)
        traced_fn, mask = make_swaption_cube_fn_traced(
            params, slices, forwards, strikes_slices, year_steps=year_steps,
            nb_grid_pts=nb_grid_pts, mesh=mesh, **cube_kwargs)
        A0_full = jnp.asarray(params.A, dtype=jnp.float64)
        k1_j = jnp.asarray(params.kappa1)
        k2_j = jnp.asarray(params.kappa2)
    else:
        price_fn, mask = make_swaption_cube_fn(
            params, slices, forwards, strikes_slices, year_steps=year_steps,
            nb_grid_pts=nb_grid_pts, mesh=mesh, **cube_kwargs)
    K_max = mask.shape[1]
    market = np.zeros((len(slices), K_max))
    weights = np.zeros((len(slices), K_max))
    fwd_panel = np.zeros((len(slices), K_max))
    strike_panel = np.zeros((len(slices), K_max))
    ttm_panel = np.zeros((len(slices), K_max))
    for p, (iv, strikes, fwd) in enumerate(zip(market_ivols_slices,
                                               strikes_slices, forwards)):
        k = len(strikes)
        market[p, :k] = np.asarray(iv, dtype=float)
        weights[p, :k] = (1.0 if weights_slices is None
                          else np.asarray(weights_slices[p], dtype=float))
        fwd_panel[p, :k] = float(fwd)
        strike_panel[p, :k] = np.asarray(strikes, dtype=float)
        ttm_panel[p, :k] = float(slices[p][0])
    weights = np.where(np.asarray(mask), weights, 0.0)
    market_j = jnp.asarray(market)
    weights_j = jnp.asarray(weights)
    fwd_j, strike_j, ttm_j = map(jnp.asarray,
                                 (fwd_panel, strike_panel, ttm_panel))
    # padded entries hold (fwd=0, strike=0, ttm=0) — give them a priceable
    # dummy so no NaN circulates (their weight is exactly 0 anyway)
    safe_ttm = jnp.where(ttm_j > 0.0, ttm_j, 1.0)

    beta0 = jnp.asarray(params.beta.xs, dtype=jnp.float64)
    volvol0 = jnp.asarray(params.volvol.xs, dtype=jnp.float64)
    sigma0 = jnp.asarray(params.sigma0, dtype=jnp.float64)
    seg_idx = jnp.asarray(np.asarray(segments, dtype=int))

    def unpack(pars):
        beta_free = pars[:n_free * d].reshape(n_free, d)
        volvol_free = pars[n_free * d:n_free * d + n_free]
        beta_xs = beta0.at[seg_idx].set(beta_free)
        volvol_xs = volvol0.at[seg_idx].set(volvol_free)
        if fit_A:
            A_free = pars[n_free * d + n_free:].reshape(n_free, d)
            A_xs = A0_full.at[seg_idx].set(A_free)
            return beta_xs, volvol_xs, A_xs
        return beta_xs, volvol_xs, None

    def residuals(pars):
        beta_xs, volvol_xs, A_xs = unpack(pars)
        if fit_A:
            prices = traced_fn(sigma0, A_xs, beta_xs, volvol_xs, k1_j, k2_j)
        else:
            prices = price_fn(sigma0, beta_xs, volvol_xs)
        ivols = infer_normal_implied_vol_fast(
            forward=fwd_j, ttm=safe_ttm, strike=strike_j, given_price=prices)
        clean = jnp.where(jnp.isnan(ivols), market_j, ivols)
        return (weights_j * (clean - market_j)).ravel()

    p0_parts = [beta0[seg_idx].ravel(), volvol0[seg_idx]]
    lower_parts = [jnp.full(n_free * d, -beta_bound),
                   jnp.full(n_free, volvol_bounds[0])]
    upper_parts = [jnp.full(n_free * d, beta_bound),
                   jnp.full(n_free, volvol_bounds[1])]
    if fit_A:
        p0_parts.append(A0_full[seg_idx].ravel())
        lower_parts.append(jnp.full(n_free * d, A_bounds[0]))
        upper_parts.append(jnp.full(n_free * d, A_bounds[1]))
    p0 = jnp.concatenate(p0_parts)
    lower = jnp.concatenate(lower_parts)
    upper = jnp.concatenate(upper_parts)
    run = jax.jit(lambda q0: lm_minimize(residuals, q0, lower, upper,
                                         nb_iters=nb_iters))
    best, best_cost = run(p0)
    best = np.asarray(best, dtype=float)

    fitted = copy.deepcopy(params)
    for j, seg in enumerate(segments):
        fitted.update_params(
            idx=int(seg),
            beta_idx=best[j * d:(j + 1) * d],
            volvol_idx=float(best[n_free * d + j]),
            A_idx=(best[n_free * (d + 1) + j * d:
                        n_free * (d + 1) + (j + 1) * d] if fit_A else None))
    return fitted, float(best_cost)


def swaption_chain_to_cube(swaption_chain,
                           max_expiry: Optional[float] = None):
    """flatten a SwOptionChain into (slices, forwards, strikes_slices,
    market_ivols_slices) rows, one per (expiry, tenor), optionally capped
    at ``max_expiry`` (e.g. where the parameter term structure ends)."""
    slices, forwards, strikes_slices, ivols_slices = [], [], [], []
    for i, tenor in enumerate(np.asarray(swaption_chain.tenors, dtype=float)):
        for j, ttm in enumerate(np.asarray(swaption_chain.ttms, dtype=float)):
            if max_expiry is not None and ttm > float(max_expiry):
                continue
            slices.append((float(ttm), float(tenor)))
            forwards.append(float(swaption_chain.forwards[i][j]))
            strikes_slices.append(
                np.asarray(swaption_chain.strikes_ttms[i][j]))
            ivols_slices.append(np.asarray(swaption_chain.bid_ivs[i][j]))
    return slices, forwards, strikes_slices, ivols_slices


def prefit_A_to_atm(params: MultiFactRateLogSvParams,
                    slices: Sequence[Tuple[float, float]],
                    forwards: Sequence[float],
                    strikes_slices: Sequence[np.ndarray],
                    market_ivols_slices: Sequence[np.ndarray],
                    nb_outer: int = 4,
                    year_steps: int = 48,
                    damping: float = 1.0,
                    traced: bool = True,
                    ) -> Tuple[MultiFactRateLogSvParams, float]:
    """fix-point prefit of the per-segment factor-vol levels A to the ATM
    normal vols of the cube (the paper's stage-1 calibration; its result is
    embedded as ``A_idx`` in calibration_fig_5_6_7.py:171-215).

    Each tenor maps to its nearest basis key term, and each outer iteration
    reprices the cube once and scales ``A[seg][j] *= (mkt_atm / model_atm)``
    for the latest segment covering that expiry — ATM normal vol is
    near-linear in the local vol level, so 3-5 iterations converge to
    sub-bp.

    With ``traced=True`` (default) the cube prices through
    ``make_swaption_cube_fn_traced``: A enters the program as a traced
    input, so ALL outer iterations reuse ONE compiled program.  The legacy
    ``traced=False`` path freezes A into the structural panels and must
    re-freeze (host scipy) and re-trace the cube every iteration.
    Returns ``(updated params copy, max ATM error in bp)``.
    """
    from stochvolmodels_tpu.ops.bachelier import infer_normal_implied_vol

    params = copy.deepcopy(params)
    key_terms = np.asarray(params.basis.key_terms, dtype=float)
    expiries = sorted({e for e, _ in slices})
    # latest term-structure segment covering each expiry
    seg_of = {e: int(np.clip(np.searchsorted(np.asarray(params.ts), e) - 1,
                             0, params.A.shape[0] - 1)) for e in expiries}
    # ATM quote (nearest strike to forward) per slice
    atm_mkt, atm_strike = [], []
    for (e, tenor), fwd, strikes, ivs in zip(slices, forwards, strikes_slices,
                                             market_ivols_slices):
        k = int(np.argmin(np.abs(np.asarray(strikes) - fwd)))
        atm_strike.append(k)
        atm_mkt.append(float(np.asarray(ivs)[k]))

    traced_fn = None
    if traced:
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn_traced)
        traced_fn, _ = make_swaption_cube_fn_traced(
            params, slices, forwards, strikes_slices, year_steps=year_steps)
        beta_j = jnp.asarray(params.beta.xs)
        volvol_j = jnp.asarray(params.volvol.xs)
        sigma0_j = jnp.asarray(params.sigma0)
        k1_j = jnp.asarray(params.kappa1)
        k2_j = jnp.asarray(params.kappa2)
    A = params.A.copy()

    max_err_bp = np.inf
    for _ in range(nb_outer):
        if traced:
            px = np.asarray(traced_fn(sigma0_j, jnp.asarray(A), beta_j,
                                      volvol_j, k1_j, k2_j))
        else:
            for seg in range(A.shape[0]):
                params.update_params(idx=seg, A_idx=A[seg])
            fn, _ = make_swaption_cube_fn(params, slices, forwards,
                                          strikes_slices,
                                          year_steps=year_steps)
            px = np.asarray(fn(jnp.asarray(params.sigma0),
                               jnp.asarray(params.beta.xs),
                               jnp.asarray(params.volvol.xs)))
        # per (segment, key-term) multiplicative updates, averaged over the
        # slices that inform them
        ratios = {}
        errs = []
        for p, ((e, tenor), fwd, strikes) in enumerate(
                zip(slices, forwards, strikes_slices)):
            k = atm_strike[p]
            model_atm = float(np.asarray(infer_normal_implied_vol(
                forward=fwd, ttm=e, strike=float(np.asarray(strikes)[k]),
                given_price=float(px[p, k]))))
            if not np.isfinite(model_atm):
                continue
            j = int(np.argmin(np.abs(key_terms - tenor)))
            key = (seg_of[e], j)
            ratios.setdefault(key, []).append(atm_mkt[p] / model_atm)
            errs.append(abs(model_atm - atm_mkt[p]) * 1e4)
        max_err_bp = float(np.max(errs)) if errs else np.inf
        new_A = A.copy()
        for (seg, j), rs in ratios.items():
            r = float(np.mean(rs)) ** damping
            new_A[seg, j] = A[seg, j] * r
        A = new_A
    for seg in range(A.shape[0]):
        params.update_params(idx=seg, A_idx=A[seg])
    return params, max_err_bp


def calibrate_rate_logsv_full(params0: MultiFactRateLogSvParams,
                              slices: Sequence[Tuple[float, float]],
                              forwards: Sequence[float],
                              strikes_slices: Sequence[np.ndarray],
                              market_ivols_slices: Sequence[np.ndarray],
                              nb_rounds: int = 2,
                              nb_outer_atm: int = 4,
                              nb_iters_lm: int = 24,
                              year_steps: int = 48,
                              **lm_kwargs,
                              ) -> Tuple[MultiFactRateLogSvParams, float]:
    """full two-stage cube calibration from scratch: alternate the ATM
    prefit of A (:func:`prefit_A_to_atm`) with the joint (beta, volvol)
    cube LM (:func:`calibrate_rate_logsv_cube_lm_on_device`).  The second
    round re-levels A under the fitted skew (beta shifts the ATM point).
    Returns ``(fitted params, final LM cost)``."""
    params, cost = params0, np.inf
    for _ in range(nb_rounds):
        params, _ = prefit_A_to_atm(params, slices, forwards, strikes_slices,
                                    market_ivols_slices,
                                    nb_outer=nb_outer_atm,
                                    year_steps=year_steps)
        params, cost = calibrate_rate_logsv_cube_lm_on_device(
            params, slices, forwards, strikes_slices, market_ivols_slices,
            nb_iters=nb_iters_lm, year_steps=year_steps, **lm_kwargs)
    return params, cost
