"""
Model-consistent chain greeks by automatic differentiation.

The reference computes greeks only under BSM (analytic/bsm.py:148-384:
delta/vega/gamma/theta of the *Black* formula at some implied vol).  Here
every analytic chain pricer is a differentiable jax program, so
model-consistent sensitivities — forward delta/gamma and per-parameter
vegas of the *model* price, smile-dynamics-consistent by construction —
fall out of `jax.jvp` at roughly one extra pricing per greek.  This has no
reference counterpart (beyond-parity feature).

Design: each model wrapper builds ONE jitted program computing the price
panel plus every requested greek panel for a padded `ChainGrid`; the
program is cached per (chain shape, maturities, greek set, solver config),
so repricing the same chain with new params costs a single warm device
call.  Default ``vol_scaler`` is derived from the CHAIN (ATM vol), never
from the moving params, so the cache key is stable across parameter moves
— pass an explicit frozen ``vol_scaler`` to pin it yourself.  The cache is
bounded (FIFO) so pathological key churn cannot grow it without bound.
`delta`/`gamma` differentiate w.r.t. the per-maturity forwards: the
price panel row i depends only on `forwards[i]`, so a jvp against the
all-ones tangent reads out exactly dP_ij/dF_i (and a second jvp the
row-wise second derivative).  Parameter greeks are one jvp per scalar
parameter.  Calendar ``'theta'`` (dP/dt as calendar time passes, =
−dP/dttm) is a central finite difference in ttm between two cached
programs: maturities fix the per-slice ODE/MC step counts at trace time,
so ttm itself cannot be a traced input — but the two shifted-maturity
programs are built once and reused like any other.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.data.option_chain import ChainGrid, OptionChain

Array = jnp.ndarray

#: greek name -> the model parameter it aliases ('vega' is the vol state)
_LOGSV_VEGA = "sigma0"
_HESTON_VEGA = "v0"

_PROGRAM_CACHE: Dict[tuple, callable] = {}
_PROGRAM_CACHE_MAX = 64


def _resolve_names(greeks: Tuple[str, ...], vega_param: str,
                   param_names: Tuple[str, ...]) -> List[Tuple[str, str]]:
    """map requested greek names to (output key, target) pairs where target
    is 'delta'/'gamma' or a model parameter name ('theta_calendar' is
    handled separately by the callers via FD-in-ttm, never resolved here)."""
    out = []
    for g in greeks:
        target = vega_param if g == "vega" else g
        if target not in ("delta", "gamma") and target not in param_names:
            raise ValueError(f"unknown greek {g!r}; expected 'delta', 'gamma', "
                             f"'vega' or one of {param_names}")
        out.append((g, target))
    return out


def _theta_dt(ttms) -> float:
    """FD step for calendar theta: one day, capped so ttm-dt stays positive."""
    return float(min(1.0 / 365.0, 0.25 * float(np.min(ttms))))


def _chain_atm0(option_chain: OptionChain, fallback: float) -> float:
    """first-maturity ATM vol of the chain, falling back to a param-implied
    level only when the chain carries no usable vols.  Used for DEFAULT
    vol_scaler values so the greeks program cache key does not move with
    the params being differentiated.

    Note this makes the default-vol_scaler greeks program use a *market*
    -derived transform-grid span where ``LogSVPricer.price_chain`` at
    defaults derives it from ``params.sigma0`` — so ``greeks()['price']``
    can differ from ``price_chain`` at the quadrature-truncation level
    (~1e-10 on the BTC chain, far below MC/market noise).  Pass an explicit
    ``vol_scaler`` to both for bitwise agreement."""
    try:
        atm0 = float(option_chain.get_chain_atm_vols()[0])
    except (ValueError, TypeError, AttributeError, IndexError, KeyError):
        # chains without usable bid/ask vols: missing arrays (Attribute/
        # TypeError), empty slices (IndexError), non-numeric entries
        atm0 = float("nan")
    if not np.isfinite(atm0) or atm0 <= 0.0:
        atm0 = float(fallback)
    return atm0


def _invert_to_ivols(grid: ChainGrid, prices: Array) -> Array:
    from stochvolmodels_tpu.ops import bsm
    return bsm.infer_bsm_implied_vol_fast(
        forward=grid.forwards[:, None], ttm=grid.ttms[:, None],
        strike=grid.strikes, given_price=prices,
        discfactor=grid.discfactors[:, None], optiontype=grid.optioncodes)


def _greeks_program(price_fn, names: List[Tuple[str, str]],
                    in_vols: bool = False):
    """build fn(grid, params_dict) -> {'price': panel, greek: panel, ...}.

    ``price_fn(grid, params_dict) -> (n_ttm, max_strikes)`` must be a pure
    jax function of the grid leaves and the scalar params.  With
    ``in_vols`` the differentiated target is the BSM implied-vol panel
    (the inverter's implicit-function custom_jvp carries the tangents, so
    e.g. the IV delta dIV/dF correctly combines the model price move with
    the moneyness shift of the Black formula); outputs gain an ``'ivol'``
    panel and every greek is an IV sensitivity.
    """
    targets = {t for _, t in names}

    def program(grid: ChainGrid, params: Dict[str, Array]):
        import dataclasses

        def target_of(g, p):
            prices = price_fn(g, p)
            return _invert_to_ivols(g, prices) if in_vols else prices

        def f_of_forwards(fwds):
            g = dataclasses.replace(grid, forwards=fwds)
            return target_of(g, params)

        ones = jnp.ones_like(grid.forwards)
        out: Dict[str, Array] = {}
        base = None
        if "delta" in targets or "gamma" in targets:
            base, delta = jax.jvp(f_of_forwards, (grid.forwards,), (ones,))
            if "delta" in targets:
                out["delta"] = delta
            if "gamma" in targets:
                def dfn(fwds):
                    return jax.jvp(f_of_forwards, (fwds,),
                                   (jnp.ones_like(fwds),))[1]
                out["gamma"] = jax.jvp(dfn, (grid.forwards,), (ones,))[1]
        for _, target in names:
            if target in ("delta", "gamma") or target in out:
                continue
            def f_of_param(v, target=target):
                return target_of(grid, {**params, target: v})
            base_p, sens = jax.jvp(f_of_param, (params[target],),
                                   (jnp.ones_like(params[target]),))
            if base is None:
                base = base_p
            out[target] = sens
        if in_vols:
            prices = price_fn(grid, params)
            out["price"] = prices
            out["ivol"] = base if base is not None \
                else _invert_to_ivols(grid, prices)
        else:
            out["price"] = base if base is not None \
                else price_fn(grid, params)
        return out

    return jax.jit(program)


def _unpad(panel: Array, grid: ChainGrid) -> List[np.ndarray]:
    mask = np.asarray(grid.mask)
    p = np.asarray(panel)
    return [p[i, mask[i]] for i in range(p.shape[0])]


def _run(cache_key: tuple, price_fn, names, grid: ChainGrid,
         params: Dict[str, float], greeks: Tuple[str, ...],
         in_vols: bool = False) -> Dict[str, List[np.ndarray]]:
    cache_key = cache_key + (in_vols,)
    program = _PROGRAM_CACHE.get(cache_key)
    if program is None:
        program = _greeks_program(price_fn, names, in_vols=in_vols)
        while len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        _PROGRAM_CACHE[cache_key] = program
    par = {k: jnp.asarray(v, dtype=jnp.float64) for k, v in params.items()}
    panels = program(grid, par)
    out = {"price": _unpad(panels["price"], grid)}
    if in_vols:
        out["ivol"] = _unpad(panels["ivol"], grid)
    for g, target in names:
        out[g] = _unpad(panels[target], grid)
    return out


def _calendar_theta(make_price_fn, key_prefix: tuple, grid: ChainGrid,
                    values: Dict[str, float],
                    ttms_static: Tuple[float, ...],
                    in_vols: bool) -> List[np.ndarray]:
    """calendar theta dP/dt (= −dP/dttm) by central finite difference in
    maturity between two cached price-only programs.

    Conventions: forwards are held fixed (driftless theta) and discount
    factors are re-expressed at FIXED continuous rates
    ``df(ttm±dt) = exp(−r·(ttm±dt))`` with ``r = −ln(df)/ttm``, so the
    carry component of theta is the model's own discounting, not a curve
    move.  The two shifted-maturity programs enter the same bounded
    program cache as every other greek program, so warm repricing stays a
    constant number of device calls.  Extends the reference's BSM-only
    theta (analytic/bsm.py:357-384) to the model-consistent chain level.
    """
    import dataclasses
    dt = _theta_dt(np.asarray(ttms_static))
    ttms_np = np.asarray(grid.ttms)
    rates = -np.log(np.asarray(grid.discfactors)) / ttms_np
    sides = []
    for sign in (1.0, -1.0):
        ttms_s = tuple(float(t) + sign * dt for t in ttms_static)
        g = dataclasses.replace(
            grid,
            ttms=jnp.asarray(np.asarray(ttms_s), dtype=grid.ttms.dtype),
            discfactors=jnp.asarray(np.exp(-rates * np.asarray(ttms_s)),
                                    dtype=grid.discfactors.dtype))
        out = _run(key_prefix + (ttms_s,), make_price_fn(ttms_s), [], g,
                   values, (), in_vols=in_vols)
        sides.append(out["ivol" if in_vols else "price"])
    return [np.asarray(-(up - dn) / (2.0 * dt))
            for up, dn in zip(sides[0], sides[1])]


def logsv_chain_greeks(option_chain: OptionChain,
                       params,
                       greeks: Tuple[str, ...] = ("delta", "gamma", "vega"),
                       vol_scaler: Optional[float] = None,
                       is_spot_measure: bool = True,
                       expansion_order=None,
                       year_steps: int = 240,
                       in_vols: bool = False,
                       ) -> Dict[str, List[np.ndarray]]:
    """model-consistent greeks of the LogSV analytic chain prices.

    ``greeks`` may contain ``'delta'`` (dP/dF per maturity), ``'gamma'``
    (d2P/dF2), ``'vega'`` (alias for ``sigma0``) or any of the parameter
    names ``sigma0/theta/kappa1/kappa2/beta/volvol``.  Returns
    ``{'price': [...], greek: [...]}`` as per-maturity arrays matching the
    chain's ragged strikes.  The underlying pricer is
    :func:`stochvolmodels_tpu.models.logsv.pricer.logsv_chain_price_grid`
    (reference semantics logsv_pricer.py:562-632) — prices and greeks come
    from the SAME program, so they are mutually consistent to machine
    precision.

    ``in_vols=True`` expresses every greek in BSM implied-vol space (adds
    an ``'ivol'`` panel): ``'delta'`` becomes the model's smile dynamics
    dIV/dF — the total derivative combining the model price move with the
    fixed-strike moneyness shift, i.e. how the quoted smile point moves
    when the forward moves — and parameter greeks become dIV/dparam (the
    IV-space calibration Jacobian row).  Gamma is supported in vol space
    too (second total derivative).

    ``'theta_calendar'`` is the calendar time decay dP/dt (central FD in
    ttm between two cached shifted-maturity programs, see
    :func:`_calendar_theta`); the vol backbone etas are held at the
    unshifted maturities.  It is named explicitly because the bare name
    ``'theta'`` already denotes the sensitivity to the model's mean vol
    level parameter.
    """
    from stochvolmodels_tpu.models.logsv import affine as afe
    from stochvolmodels_tpu.models.logsv.pricer import (
        logsv_chain_price_grid, set_vol_scaler)

    if expansion_order is None:
        expansion_order = afe.ExpansionOrder.SECOND
    if vol_scaler is None:
        vol_scaler = set_vol_scaler(
            sigma0=_chain_atm0(option_chain, fallback=params.sigma0),
            ttm=np.min(option_chain.ttms))
    grid = option_chain.to_grid()
    ttms_static = tuple(float(t) for t in option_chain.ttms)
    etas = tuple(float(e) for e in
                 params.get_vol_backbone_etas(ttms=option_chain.ttms))
    greeks = tuple(greeks)
    want_theta = "theta_calendar" in greeks
    rest = tuple(g for g in greeks if g != "theta_calendar")
    param_names = ("sigma0", "theta", "kappa1", "kappa2", "beta", "volvol")
    names = _resolve_names(rest, _LOGSV_VEGA, param_names)
    need = tuple(sorted({t for _, t in names}))

    def make_price_fn(tts: Tuple[float, ...]):
        def price_fn(g: ChainGrid, p: Dict[str, Array]) -> Array:
            return logsv_chain_price_grid(
                g, sigma0=p["sigma0"], theta=p["theta"], kappa1=p["kappa1"],
                kappa2=p["kappa2"], beta=p["beta"], volvol=p["volvol"],
                vol_backbone_etas=np.asarray(etas),
                vol_scaler=float(vol_scaler),
                ttms_static=tts, is_spot_measure=is_spot_measure,
                expansion_order=expansion_order, year_steps=year_steps)
        return price_fn

    key = ("logsv", ttms_static, grid.max_strikes, need, float(vol_scaler),
           is_spot_measure, expansion_order, year_steps, etas)
    values = {"sigma0": params.sigma0, "theta": params.theta,
              "kappa1": params.kappa1, "kappa2": params.kappa2,
              "beta": params.beta, "volvol": params.volvol}
    out = _run(key, make_price_fn(ttms_static), names, grid, values, rest,
               in_vols=in_vols)
    if want_theta:
        key_theta = ("logsv-theta", grid.max_strikes, float(vol_scaler),
                     is_spot_measure, expansion_order, year_steps, etas)
        out["theta_calendar"] = _calendar_theta(
            make_price_fn, key_theta, grid, values, ttms_static, in_vols)
    return out


def logsv_mc_chain_greeks(option_chain: OptionChain,
                          params,
                          greeks: Tuple[str, ...] = ("delta", "vega"),
                          nb_path: int = 100000,
                          nb_steps_per_year: int = 360,
                          seed=None,
                          is_spot_measure: bool = True,
                          dtype=jnp.float64,
                          ) -> Dict[str, List[np.ndarray]]:
    """pathwise Monte-Carlo greeks by AD through the LogSV scan simulation.

    The whole chain MC — threefry normals, the Euler path loop under
    ``lax.scan``, terminal-state chaining across maturities, forward
    recentring, payoff and discounting — is one differentiable program, so
    a jvp at a FIXED key gives the classic pathwise (infinitesimal
    perturbation) estimator of dPrice/dF and dPrice/dparam.  This is
    impossible in the reference: its MC kernels are numba loops over a
    mutated RNG (logsv_pricer.py:843-940).

    Valid greeks: ``'delta'`` and any of
    ``sigma0/theta/kappa1/kappa2/beta/volvol`` (``'vega'`` = sigma0).
    ``'gamma'`` is intentionally rejected — the pathwise estimator of a
    second derivative of a kinked payoff is biased (the kink's delta
    function is never sampled); use the analytic :func:`logsv_chain_greeks`
    for gamma.

    Estimator notes: payoffs are Lipschitz in the terminal state (vanilla
    and inverse), so the pathwise estimator is unbiased; like-for-like FD
    at the same key agrees to o(eps).  MC noise on a greek is O(1/sqrt(P))
    like the price itself.
    """
    from stochvolmodels_tpu.models.logsv.pricer import (
        simulate_logsv_terminal)
    from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff
    from stochvolmodels_tpu.ops.random import key_from_seed

    if "gamma" in greeks:
        raise ValueError("pathwise MC gamma is biased for kinked payoffs; "
                         "use logsv_chain_greeks for gamma")
    param_names = ("sigma0", "theta", "kappa1", "kappa2", "beta", "volvol")
    names = _resolve_names(tuple(greeks), _LOGSV_VEGA, param_names)
    grid = option_chain.to_grid()
    ttms_static = tuple(float(t) for t in option_chain.ttms)
    etas = tuple(float(e) for e in
                 params.get_vol_backbone_etas(ttms=option_chain.ttms))
    key = key_from_seed(seed)

    def price_fn(g: ChainGrid, p: Dict[str, Array]) -> Array:
        x = jnp.zeros(nb_path, dtype=dtype)
        sigma = jnp.full(nb_path, p["sigma0"], dtype=dtype)
        qvar = jnp.zeros(nb_path, dtype=dtype)
        ttm0 = 0.0
        rows = []
        for i, ttm in enumerate(ttms_static):
            slice_key = jax.random.fold_in(key, i)
            x, sigma, qvar = simulate_logsv_terminal(
                key=slice_key, x0=x, sigma0=sigma, qvar0=qvar,
                ttm=ttm - ttm0, theta=p["theta"], kappa1=p["kappa1"],
                kappa2=p["kappa2"], beta=p["beta"], volvol=p["volvol"],
                vol_backbone_eta=etas[i], is_spot_measure=is_spot_measure,
                nb_steps_per_year=nb_steps_per_year, dtype=dtype)
            ttm0 = ttm
            prices, _ = compute_mc_vars_payoff(
                x0=x, sigma0=sigma, qvar0=qvar, ttm=ttm,
                forward=g.forwards[i], strikes_ttm=g.strikes[i],
                optiontypes_ttm=g.optioncodes[i], discfactor=g.discfactors[i])
            rows.append(prices)
        return jnp.stack(rows, axis=0)

    cache_key = ("logsv_mc", ttms_static, grid.max_strikes,
                 tuple(sorted({t for _, t in names})), nb_path,
                 nb_steps_per_year, str(seed), is_spot_measure,
                 jnp.dtype(dtype).name, etas)
    values = {"sigma0": params.sigma0, "theta": params.theta,
              "kappa1": params.kappa1, "kappa2": params.kappa2,
              "beta": params.beta, "volvol": params.volvol}
    return _run(cache_key, price_fn, names, grid, values, tuple(greeks))


def swaption_cube_greeks(params,
                         slices,
                         forwards,
                         strikes_slices,
                         greeks: Tuple[str, ...] = ("vega", "beta_shift",
                                                    "volvol_shift"),
                         traced: bool = False,
                         **cube_kwargs):
    """model-consistent swaption-cube sensitivities for the factor-HJM
    rate LogSV model, by jvp over the batched differentiable cube pricer
    (:func:`..factor_hjm.rate_logsv_pricer.make_swaption_cube_fn`).

    Greeks:

    - ``'vega'``          dP/d(sigma0) — volatility-state vega;
    - ``'beta_shift'``    dP/d(parallel shift of the skew term structure
                          beta(t), all segments and factors bumped +1
                          together);
    - ``'volvol_shift'``  dP/d(parallel shift of volvol(t)).

    Returns ``(panels, mask)``: ``panels['price']`` and one (P, K_max)
    panel per greek (annuity-normalized price units, matching the cube
    pricer), ``mask`` the strike-validity panel.  The whole bundle is one
    device program per greek on the SAME frozen structural panels, so
    warm repricing across parameter moves costs one call each.  The
    reference has no rate greeks at all (its factor-HJM pricer is a host
    scipy loop, rate_logsv_pricer.py:148-244, not differentiable).

    ``traced=True`` routes through ``make_swaption_cube_fn_traced``
    instead: the QA structural panels (mean-state ODE, swap gradient,
    annuity log-derivative, factor vols C) are INSIDE the trace, so every
    greek is exact through the structure rather than a jvp around frozen
    panels, and three additional greeks become available:

    - ``'A_shift'``      dP/d(parallel shift of the factor-vol levels A);
    - ``'kappa1'``       dP/d(kappa1);
    - ``'kappa2'``       dP/d(kappa2).
    """
    allowed = ("vega", "beta_shift", "volvol_shift")
    allowed_traced = allowed + ("A_shift", "kappa1", "kappa2")
    for g in greeks:
        if g not in (allowed_traced if traced else allowed):
            raise ValueError(
                f"unknown greek {g!r}; expected one of "
                f"{allowed_traced if traced else allowed}"
                + ("" if traced else " (A_shift/kappa1/kappa2 need traced=True)"))
    sigma0 = jnp.asarray(float(params.sigma0))
    beta_xs = jnp.asarray(params.beta.xs)
    volvol_xs = jnp.asarray(params.volvol.xs)
    zero_s = jnp.zeros_like(sigma0)
    zero_b = jnp.zeros_like(beta_xs)
    zero_v = jnp.zeros_like(volvol_xs)
    if traced:
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn_traced)
        cube_fn, mask = make_swaption_cube_fn_traced(
            params, slices, forwards, strikes_slices, **cube_kwargs)
        A_xs = jnp.asarray(params.A)
        kappa1 = jnp.asarray(float(params.kappa1))
        kappa2 = jnp.asarray(float(params.kappa2))
        zero_a = jnp.zeros_like(A_xs)
        zero_k = jnp.zeros_like(kappa1)
        primals = (sigma0, A_xs, beta_xs, volvol_xs, kappa1, kappa2)
        tangents = {
            "vega": (jnp.ones_like(sigma0), zero_a, zero_b, zero_v,
                     zero_k, zero_k),
            "A_shift": (zero_s, jnp.ones_like(A_xs), zero_b, zero_v,
                        zero_k, zero_k),
            "beta_shift": (zero_s, zero_a, jnp.ones_like(beta_xs), zero_v,
                           zero_k, zero_k),
            "volvol_shift": (zero_s, zero_a, zero_b,
                             jnp.ones_like(volvol_xs), zero_k, zero_k),
            "kappa1": (zero_s, zero_a, zero_b, zero_v,
                       jnp.ones_like(kappa1), zero_k),
            "kappa2": (zero_s, zero_a, zero_b, zero_v, zero_k,
                       jnp.ones_like(kappa2)),
        }
    else:
        from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
            make_swaption_cube_fn)
        cube_fn, mask = make_swaption_cube_fn(params, slices, forwards,
                                              strikes_slices, **cube_kwargs)
        primals = (sigma0, beta_xs, volvol_xs)
        tangents = {
            "vega": (jnp.ones_like(sigma0), zero_b, zero_v),
            "beta_shift": (zero_s, jnp.ones_like(beta_xs), zero_v),
            "volvol_shift": (zero_s, zero_b, jnp.ones_like(volvol_xs)),
        }
    panels: Dict[str, np.ndarray] = {}
    for g in greeks:
        price, sens = jax.jvp(cube_fn, primals, tangents[g])
        panels.setdefault("price", np.asarray(price))
        panels[g] = np.asarray(sens)
    if "price" not in panels:
        panels["price"] = np.asarray(cube_fn(*primals))
    return panels, np.asarray(mask)


def heston_chain_greeks(option_chain: OptionChain,
                        params,
                        greeks: Tuple[str, ...] = ("delta", "gamma", "vega"),
                        vol_scaler: Optional[float] = None,
                        is_spot_measure: bool = True,
                        in_vols: bool = False,
                        ) -> Dict[str, List[np.ndarray]]:
    """model-consistent greeks of the Heston analytic chain prices.

    ``'vega'`` aliases ``v0`` (dP/dv0, variance units); other parameter
    names: ``v0/theta/kappa/rho/volvol``; ``'theta_calendar'`` is the
    calendar time decay (same FD contract as :func:`logsv_chain_greeks`).
    Pricer =
    :func:`stochvolmodels_tpu.models.heston.heston_chain_price_grid`
    (reference heston_pricer.py:203-262).
    """
    from stochvolmodels_tpu.models.heston import heston_chain_price_grid

    if vol_scaler is None:
        atm0 = _chain_atm0(option_chain, fallback=np.sqrt(params.v0))
        vol_scaler = float(np.minimum(
            0.3, atm0 * np.sqrt(float(np.min(option_chain.ttms)))))
    grid = option_chain.to_grid()
    ttms_static = tuple(float(t) for t in option_chain.ttms)
    greeks = tuple(greeks)
    want_theta = "theta_calendar" in greeks
    rest = tuple(g for g in greeks if g != "theta_calendar")
    param_names = ("v0", "theta", "kappa", "rho", "volvol")
    names = _resolve_names(rest, _HESTON_VEGA, param_names)
    need = tuple(sorted({t for _, t in names}))

    def make_price_fn(tts: Tuple[float, ...]):
        # the Heston MGF is closed-form in ttm, so only the traced
        # grid.ttms leaves matter; tts only keys the cache.
        del tts

        def price_fn(g: ChainGrid, p: Dict[str, Array]) -> Array:
            return heston_chain_price_grid(
                g, v0=p["v0"], theta=p["theta"], kappa=p["kappa"],
                volvol=p["volvol"], rho=p["rho"],
                vol_scaler=float(vol_scaler),
                is_spot_measure=is_spot_measure)
        return price_fn

    key = ("heston", ttms_static, grid.max_strikes, need, float(vol_scaler),
           is_spot_measure)
    values = {"v0": params.v0, "theta": params.theta, "kappa": params.kappa,
              "rho": params.rho, "volvol": params.volvol}
    out = _run(key, make_price_fn(ttms_static), names, grid, values, rest,
               in_vols=in_vols)
    if want_theta:
        key_theta = ("heston-theta", grid.max_strikes, float(vol_scaler),
                     is_spot_measure)
        out["theta_calendar"] = _calendar_theta(
            make_price_fn, key_theta, grid, values, ttms_static, in_vols)
    return out
