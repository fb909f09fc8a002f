"""
Swaption and rate-futures pricers for the factor HJM model with a LogSV driver
(Sepp & Rakhmonov 2025, RDR 28:12).

Rebuild of /root/reference/stochvolmodels/pricers/factor_hjm/rate_logsv_pricer.py:
the DE-quadrature chain pricer (swaptions on the normal-moneyness kernel
1/(pi phi^2), futures on the log-shifted kernel 1/(pi phi (phi+1)) with the
convexity-adjustment ODE of Theorem 3.3), the ModelPricer classes, and the
joint factor/vol Monte Carlo under risk-neutral / annuity / T-forward
measures as a ``lax.scan`` over precomputed per-step coefficient panels.
"""
from __future__ import annotations

from enum import Enum
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.models.factor_hjm.conv_adj import (
    conv_adj_linear_block,
    solve_conv_adj,
)
from stochvolmodels_tpu.models.factor_hjm.double_exp_pricer import de_pricer
from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
    UnderlyingType,
    compute_logsv_a_mgf_grid,
)
from stochvolmodels_tpu.models.factor_hjm.rate_factor_basis import NelsonSiegel
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_params import (
    MultiFactRateLogSvParams,
    RateLogSvParams,
)
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder
from stochvolmodels_tpu.models.model_pricer import ModelPricer
from stochvolmodels_tpu.ops.bachelier import infer_normal_ivols_from_slice_prices
from stochvolmodels_tpu.ops.random import key_from_seed
from stochvolmodels_tpu.utils.cplx import Cplx
from stochvolmodels_tpu.utils.funcs import set_time_grid
from stochvolmodels_tpu.utils.rate_core import (
    bracket,
    get_default_swap_term_structure,
    get_futures_start_and_pmt,
)

Array = jnp.ndarray


class Measure(Enum):
    """pricing measure: risk-neutral, annuity (Q^A), or T-forward."""
    RISK_NEUTRAL = 1
    ANNUITY = 2
    FORWARD = 3


class FutSettleType(Enum):
    """settlement convention of the rate futures contract."""
    EURODOLLAR = 1
    SOFR = 2


# ----------------------------------------------------------------------------
# futures convexity adjustment (Theorem 3.3 / 3.5)
# ----------------------------------------------------------------------------

def futures_conv_adj(t_start: float,
                     basis_type: str,
                     params: MultiFactRateLogSvParams,
                     t0: float,
                     Delta: float,
                     settlement_type: FutSettleType,
                     expansion_order: ExpansionOrder,
                     dense_output: bool = False,
                     t_grid: Optional[np.ndarray] = None) -> Tuple[np.ndarray, ...]:
    """futures convexity adjustment, analytic form of Theorem 3.5
    (reference behavior: rate_logsv_pricer.py:58-227, a 13-dim per-call
    solve_ivp; here the linear bond-coefficient block is closed form and
    only the 2-3-dim h-system is integrated — one jitted ``lax.scan`` RK4
    with exact stage coefficients, see ``conv_adj.py``).

    Returns (b1, b2, h1, h2, h0) at ``tau_eval = t_start - t0`` (EURODOLLAR;
    plus Delta for SOFR), or dense arrays over ``tau = t_start - t_grid``
    when ``dense_output`` is set.
    """
    assert basis_type == "NELSON-SIEGEL"
    assert t0 <= t_start
    if expansion_order == ExpansionOrder.FIRST:
        if settlement_type == FutSettleType.SOFR:
            raise NotImplementedError
    elif expansion_order != ExpansionOrder.ZERO:
        raise NotImplementedError
    if settlement_type not in (FutSettleType.EURODOLLAR, FutSettleType.SOFR):
        raise NotImplementedError

    is_sofr = settlement_type == FutSettleType.SOFR
    tau_S = t_start - t0
    tau_E = tau_S + Delta
    tau_eval = max(tau_S, 1e-4) if not is_sofr else max(tau_E, 1e-4)

    taus, h_traj = solve_conv_adj(
        params, t_start=t_start, Delta=Delta, tau_end=tau_eval,
        settlement_is_sofr=is_sofr, expansion_order=expansion_order)
    h_traj = np.asarray(h_traj)

    if dense_output:
        assert t_grid is not None
        tau_req = t_start - np.asarray(t_grid, dtype=float)
        b1, b2 = conv_adj_linear_block(params.basis.meanrev, tau_req, Delta,
                                       is_sofr)
        h1 = np.interp(tau_req, taus, h_traj[:, 0])
        h2 = (np.interp(tau_req, taus, h_traj[:, 1])
              if expansion_order == ExpansionOrder.FIRST
              else np.zeros_like(tau_req))
        h0 = np.interp(tau_req, taus, h_traj[:, 2])
        return np.asarray(b1), np.asarray(b2), h1, h2, h0

    b1e, b2e = conv_adj_linear_block(params.basis.meanrev, tau_eval, Delta,
                                     is_sofr)
    # the reference reports the linear block net of the closed-form
    # bond-coefficient increment over the accrual period
    b1 = np.asarray(b1e) - (params.basis.bond_coeffs(tau_E)[0]
                            - params.basis.bond_coeffs(tau_S)[0])
    b2 = np.asarray(b2e) - (params.basis.bond_coeffs(tau_E)[1]
                            - params.basis.bond_coeffs(tau_S)[1])
    h1, h2, h0 = h_traj[-1, 0], h_traj[-1, 1], h_traj[-1, 2]
    if expansion_order != ExpansionOrder.FIRST:
        h2 = 0.0
    return b1, b2, h1, h2, h0


def calc_futures_rate(ccy: str,
                      basis_type: str,
                      params: MultiFactRateLogSvParams,
                      x0: np.ndarray,
                      y0: np.ndarray,
                      sigma0: np.ndarray,
                      t0: float,
                      t_start: float,
                      t_end: float,
                      Delta: float,
                      settlement_type: FutSettleType,
                      expansion_order: ExpansionOrder) -> Tuple[np.ndarray, ...]:
    """futures rate with convexity (Eqs. 44-46; rate_logsv_pricer.py:230-271)."""
    assert basis_type == "NELSON-SIEGEL"
    assert 0 <= t0 <= t_start
    q = params.theta if params.q is None else params.q
    v0 = sigma0[:, 0] - q
    b1, b2, h1, h2, h0 = futures_conv_adj(
        t_start=t_start, basis_type=basis_type, params=params, t0=t0,
        Delta=Delta, settlement_type=settlement_type,
        expansion_order=expansion_order)
    c_tau = np.exp(b1 @ np.transpose(x0) + b2 @ np.transpose(y0)
                   + h0 + h1 * v0 + h2 * v0 * v0)
    P_t_Ts_Te = (params.basis.bond(t=t0, T=t_end, x=x0, y=y0, ccy=ccy, m=0)
                 / params.basis.bond(t=t0, T=t_start, x=x0, y=y0, ccy=ccy, m=0))
    x00 = np.zeros(params.basis.get_nb_factors())
    y00 = np.zeros(params.basis.get_nb_aux_factors())
    P_0_Ts_Te = (params.basis.bond(t=t0, T=t_end, x=x00, y=y00, ccy=ccy, m=0)[0]
                 / params.basis.bond(t=t0, T=t_start, x=x00, y=y00, ccy=ccy, m=0)[0])
    futures_analyt_ae1 = 1.0 / Delta * (1.0 / P_t_Ts_Te * c_tau - 1.0)
    return futures_analyt_ae1, c_tau, P_t_Ts_Te, P_0_Ts_Te


# ----------------------------------------------------------------------------
# DE-quadrature chain pricer
# ----------------------------------------------------------------------------

def logsv_chain_de_pricer(params: MultiFactRateLogSvParams,
                          t_grid: np.ndarray,
                          ttms: np.ndarray,
                          forwards,
                          strikes_ttms,
                          optiontypes_ttms,
                          underlying_type: UnderlyingType = UnderlyingType.SWAP,
                          expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                          x0: Optional[np.ndarray] = None,
                          y0: Optional[np.ndarray] = None,
                          **kwargs) -> Tuple[list, list]:
    """price swaption / futures-option slices by tanh-sinh quadrature of the
    inversion integral (rate_logsv_pricer.py:274-437)."""
    settlement_type = kwargs.get('settlement_type', FutSettleType.EURODOLLAR)
    model_prices_tenors, model_ivs_tenors = [], []
    t_grid0 = t_grid
    if underlying_type == UnderlyingType.SWAP:
        assert params.basis.key_terms.size == len(forwards)
        assert ttms.size == 1 and len(optiontypes_ttms) == 1
        ttms_ = np.ones_like(params.basis.key_terms) * ttms[0]
        optiontypes_ttms_ = [optiontypes_ttms[0] for _ in params.basis.key_terms]
        rng_ttm = params.basis.key_terms
    elif underlying_type == UnderlyingType.FUTURES:
        assert len(forwards) == 1
        assert ttms.size == 1 and len(optiontypes_ttms) == 1
        ttms_ = ttms
        optiontypes_ttms_ = optiontypes_ttms
        rng_ttm = ['FUTURES_DUMMY_TENOR']
    else:
        raise NotImplementedError

    for idx_tenor, _ in enumerate(rng_ttm):
        model_prices_ttms, model_ivs_ttms = [], []
        tenor = rng_ttm[idx_tenor] if underlying_type == UnderlyingType.SWAP else np.nan
        for ttm, forward, strikes_ttm, optiontypes_ttm in zip(
                ttms_, forwards[idx_tenor], strikes_ttms[idx_tenor],
                optiontypes_ttms_):
            if underlying_type == UnderlyingType.SWAP:
                a, kappa0, kappa1, kappa2, beta, volvol, _ = params.transform_QA_params(
                    expiry=ttm, t_grid=t_grid0, tenor=tenor, x0=x0, y0=y0)
                a0 = a
                a1 = np.zeros_like(kappa0)
                b = np.zeros_like(kappa0)
                frac = np.nan
            else:
                tenor = 0.25
                start, end = get_futures_start_and_pmt(t0=ttm, lag=0.0,
                                                       libor_tenor=tenor)
                frac = end - start
                a, eta, kappa0, kappa1, kappa2, beta, volvol = params.transform_QT_params(
                    expiry=ttm, t_grid=t_grid0, t_start=start, t_end=end)
                _, _, h1, _, _ = futures_conv_adj(
                    t_start=start, basis_type="NELSON-SIEGEL", params=params,
                    t0=0.0, Delta=tenor, expansion_order=ExpansionOrder.ZERO,
                    dense_output=True, t_grid=t_grid0[:np.where(t_grid0 == ttm)[0][0] + 1],
                    settlement_type=settlement_type)
                a0 = a + np.einsum('i,ij->ij', h1, beta)
                a1 = np.multiply(h1, volvol)
                b = (np.einsum('ij,ij->i', a0, eta)
                     + 0.5 * np.einsum('ij,ij->i', a0, a0))
            itemindex = np.where(t_grid0 == ttm)[0][0]
            times = t_grid0[:itemindex + 1]

            q_eff = params.theta if params.q is None else params.q

            def ff(p: np.ndarray) -> np.ndarray:
                phi_grid = Cplx(jnp.full(p.shape, -0.5), jnp.asarray(p))
                _, log_mgf = compute_logsv_a_mgf_grid(
                    ttm=float(ttm), phi_grid=phi_grid, sigma0=params.sigma0,
                    q=q_eff, times=times, a0=a0, a1=a1, kappa0=kappa0,
                    kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
                    b=b, underlying_type=underlying_type,
                    expansion_order=expansion_order)
                phi = Cplx(jnp.full(p.shape, -0.5), jnp.asarray(p))
                if underlying_type == UnderlyingType.SWAP:
                    moneyness = jnp.asarray(strikes_ttm - forward)
                    p_payoff = (phi * phi).__rtruediv__(1.0 / np.pi)   # 1/(pi phi^2)
                    z = Cplx(moneyness[None, :] * phi.re[:, None] + log_mgf.re[:, None],
                             moneyness[None, :] * phi.im[:, None] + log_mgf.im[:, None])
                    e = jnp.exp(z.re)
                    integrand = e * (p_payoff.re[:, None] * jnp.cos(z.im)
                                     - p_payoff.im[:, None] * jnp.sin(z.im))
                else:
                    moneyness = jnp.log((jnp.asarray(strikes_ttm) + 1.0 / frac)
                                        / (forward + 1.0 / frac))
                    p_payoff = (phi * (phi + 1.0)).__rtruediv__(1.0 / np.pi)
                    z = Cplx(moneyness[None, :] * phi.re[:, None] + log_mgf.re[:, None],
                             moneyness[None, :] * phi.im[:, None] + log_mgf.im[:, None])
                    e = jnp.exp(z.re)
                    scale = -(jnp.asarray(strikes_ttm) + 1.0 / frac)
                    integrand = scale[None, :] * e * (
                        p_payoff.re[:, None] * jnp.cos(z.im)
                        - p_payoff.im[:, None] * jnp.sin(z.im))
                return np.asarray(integrand)

            if underlying_type == UnderlyingType.SWAP:
                def ff_transf(model_prices: np.ndarray):
                    normal_ivols = infer_normal_ivols_from_slice_prices(
                        ttm=ttm, forward=forward, strikes=strikes_ttm,
                        model_prices=np.asarray(model_prices),
                        optiontypes=np.repeat('C', strikes_ttm.size),
                        discfactor=1.0)
                    return model_prices, np.asarray(normal_ivols)
            else:
                def ff_transf(capped_prices: np.ndarray):
                    call_prices = forward + 1.0 / frac - np.asarray(capped_prices)
                    normal_ivols = infer_normal_ivols_from_slice_prices(
                        ttm=ttm, forward=forward, strikes=strikes_ttm,
                        model_prices=call_prices,
                        optiontypes=np.repeat('C', strikes_ttm.size),
                        discfactor=1.0)
                    return call_prices, np.asarray(normal_ivols)

            model_prices_ttm, model_ivs_ttm = de_pricer(ff, ff_transf)
            model_prices_ttms.append(np.asarray(model_prices_ttm))
            model_ivs_ttms.append(np.asarray(model_ivs_ttm))
        model_prices_tenors.append(model_prices_ttms)
        model_ivs_tenors.append(model_ivs_ttms)
    return model_prices_tenors, model_ivs_tenors


def make_swaption_slice_fn(params: MultiFactRateLogSvParams,
                           t_grid: np.ndarray,
                           ttm: float,
                           tenor: float,
                           forward: float,
                           strikes: np.ndarray,
                           expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                           x0: Optional[np.ndarray] = None,
                           y0: Optional[np.ndarray] = None,
                           h: float = 0.125,
                           x_max: float = 2.75,
                           engine: str = "auto"):
    """jitted, end-to-end differentiable swaption slice pricer.

    ``engine``: Riccati-scan arithmetic — 'f64' / 'df32' / 'auto' (df32 on
    TPU; the 45-lane rates df32 family is measured exempt from the tunnel
    compile-after-run hazard — PARITY.md "Double-float32 swaption cube").

    Returns ``price(sigma0, beta_xs, volvol_xs) -> (n_strikes,)`` jnp prices,
    with gradient support w.r.t. all three arguments — the reference's
    DE pricer (double_exp_pricer.py:20-72) refines adaptively on host and is
    not differentiable; here the tanh-sinh panel is fixed
    (``tanh_sinh_nodes``), the QA structural panels (mean states, swap
    gradient, annuity log-derivative, factor vols C) are frozen at the
    current parameters, and everything downstream — coefficient assembly,
    Riccati scan, inversion integral — is traced jax.  Gradient-based rate
    calibration plugs ``jax.grad`` of a loss over this directly.
    """
    from stochvolmodels_tpu.models.factor_hjm.double_exp_pricer import (
        tanh_sinh_nodes,
    )
    if engine == "auto":
        engine = "df32" if jax.devices()[0].platform != "cpu" else "f64"
    t_grid_cut, _, idx_t, swap_gr, loga_der, C_panel = \
        params.qa_structural_panels(expiry=float(ttm), tenor=tenor,
                                    t_grid=t_grid, x0=x0, y0=y0)
    p_nodes, w_nodes = tanh_sinh_nodes(h=h, x_max=x_max)
    theta, kappa1, kappa2 = params.theta, params.kappa1, params.kappa2
    CT_loga = jnp.asarray(np.einsum('tde,td->te', C_panel, loga_der))
    a_interp = jnp.asarray(np.einsum('td,tde->te', swap_gr, C_panel))
    moneyness = jnp.asarray(np.asarray(strikes, dtype=float) - forward)
    idx_t = jnp.asarray(idx_t)
    p_nodes_j = jnp.asarray(p_nodes)
    w_nodes_j = jnp.asarray(w_nodes)

    @jax.jit
    def price(sigma0, beta_xs, volvol_xs):
        beta_interp = jnp.asarray(beta_xs)[idx_t]          # (T, d)
        volvol_interp = jnp.asarray(volvol_xs)[idx_t]      # (T,)
        beta2 = jnp.einsum('td,td->t', beta_interp, CT_loga)
        kappa0_s = beta2 * theta * theta
        kappa1_s = kappa1 - kappa2 * theta + 2.0 * (kappa2 - beta2) * theta
        kappa2_s = kappa2 - beta2
        phi = Cplx(jnp.full(p_nodes_j.shape, -0.5), p_nodes_j)
        _, log_mgf = compute_logsv_a_mgf_grid(
            ttm=float(ttm), phi_grid=phi, sigma0=sigma0, q=theta,
            times=t_grid_cut, a0=a_interp, a1=jnp.zeros_like(kappa0_s),
            kappa0=kappa0_s, kappa1=kappa1_s, kappa2=kappa2_s,
            beta=beta_interp, volvol=volvol_interp,
            b=jnp.zeros_like(kappa0_s), underlying_type=UnderlyingType.SWAP,
            expansion_order=expansion_order, engine=engine)
        p_payoff = (phi * phi).__rtruediv__(1.0 / np.pi)   # 1/(pi phi^2)
        z = Cplx(moneyness[None, :] * phi.re[:, None] + log_mgf.re[:, None],
                 moneyness[None, :] * phi.im[:, None] + log_mgf.im[:, None])
        e = jnp.exp(z.re)
        integrand = e * (p_payoff.re[:, None] * jnp.cos(z.im)
                         - p_payoff.im[:, None] * jnp.sin(z.im))
        return w_nodes_j @ integrand

    return price


def make_swaption_cube_fn(params: MultiFactRateLogSvParams,
                          slices,
                          forwards,
                          strikes_slices,
                          expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                          nb_grid_pts: int = 31,
                          year_steps: int = 48,
                          h: float = 0.125,
                          x_max: float = 2.75,
                          x0: Optional[np.ndarray] = None,
                          y0: Optional[np.ndarray] = None,
                          mesh=None,
                          panel_rtol: float = 1e-3,
                          panel_atol: float = 1e-6,
                          engine: str = "auto"):
    """jitted whole-cube swaption pricer: every (expiry, tenor) slice in ONE
    device program.

    ``engine`` selects the Riccati-scan arithmetic: ``'f64'`` (plain f64
    scans — the CPU default), ``'df32'`` (double-float32 carrier,
    ~1e-13-accurate, runs on the fused f32 scan path that is ~200x cheaper
    per step on the axon TPU backend), or ``'auto'`` (df32 on TPU, f64 on
    CPU).  See rate_affine_expansion.solve_a_ode_grid_batch_df32 and
    PARITY.md "Double-float32 exact engine".

    ``panel_rtol``/``panel_atol`` control the host solve_ivp that freezes
    the QA structural panels (defaults = scipy defaults, like the
    reference); tighten for high-accuracy oracles.

    ``year_steps`` defaults to 48: the Riccati coefficients are piecewise-
    linear interpolations of a ~31-point panel, so the shared-step RK4 is
    far inside its convergence plateau — measured on the 12-slice USD cube
    (scripts/bench_cube_breakdown.py, real TPU): max|dP| vs year_steps=120
    is 5.9e-12 at 48 and 1.0e-10 at 24, while warm wall-clock is linear in
    the step count (the TPU scan is per-step latency-bound, ~2.8 ms/step
    for this body): 4.9 s at 360, 672 ms at 48, 352 ms at 24.

    ``slices`` is a sequence of (expiry, tenor) pairs, ``forwards[p]`` /
    ``strikes_slices[p]`` the forward swap rate and strike grid of slice p.
    Returns ``(price, mask)`` where ``price(sigma0, beta_xs, volvol_xs) ->
    (P, K_max)`` jnp call prices (undiscounted, annuity-normalized) and
    ``mask`` is the (P, K_max) validity panel of the padded strike axis.

    Per-slice structural panels are frozen on host exactly as in
    :func:`make_swaption_slice_fn`; the P Riccati systems then integrate as
    one ``vmap(lax.scan)`` (``solve_a_ode_grid_batch``) with a shared step
    count and per-slice dt, and the tanh-sinh inversion broadcasts over
    (P, N, K).  The reference reprices a cube as a nested Python loop of
    adaptive DE refinements, one scipy solve_ivp call per grid point per
    slice (rate_logsv_pricer.py:148-244, double_exp_pricer.py:20-72);
    end-to-end differentiable here, so the joint cube calibration
    (fast_calibration.calibrate_rate_logsv_cube_lm_on_device) runs LM over
    it entirely on device.

    ``mesh``: optional ``jax.sharding.Mesh`` — the slice axis P is then
    sharded over the mesh's first axis (``with_sharding_constraint`` on the
    stage-coefficient panel and the price panel), so the P independent
    Riccati scans and the (P, N, K) inversion split across devices with no
    hand-written collectives; parameter gradients reduce over ICI psums
    that XLA inserts.  Slices are independent, so uneven P is fine (XLA
    pads internally).
    """
    from stochvolmodels_tpu.models.factor_hjm.double_exp_pricer import (
        tanh_sinh_nodes,
    )
    from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
        _scalar_series,
        get_expansion_n,
        solve_a_ode_grid_batch,
        solve_a_ode_grid_batch_df32,
    )
    from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid

    if engine == "auto":
        engine = "df32" if jax.devices()[0].platform != "cpu" else "f64"
    solve_batch = (solve_a_ode_grid_batch_df32 if engine == "df32"
                   else solve_a_ode_grid_batch)

    P = len(slices)
    assert len(forwards) == P and len(strikes_slices) == P
    p_nodes, w_nodes = tanh_sinh_nodes(h=h, x_max=x_max)
    theta, kappa1, kappa2 = params.theta, params.kappa1, params.kappa2
    n = get_expansion_n(expansion_order)

    # shared RK4 step count: every slice runs S steps of its own dt
    ttms = np.array([float(e) for e, _ in slices])
    S = max(int(np.ceil(year_steps * float(np.max(ttms)))), 16)

    # host-frozen per-slice panels (ragged in T — consumed at trace time)
    per_slice = []
    for (expiry, tenor) in slices:
        t_grid = generate_ttms_grid(np.array([float(expiry)]),
                                    nb_pts=nb_grid_pts)
        t_grid_cut, _, idx_t, swap_gr, loga_der, C_panel = \
            params.qa_structural_panels(expiry=float(expiry),
                                        tenor=float(tenor),
                                        t_grid=t_grid, x0=x0, y0=y0,
                                        rtol=panel_rtol, atol=panel_atol)
        CT_loga = jnp.asarray(np.einsum('tde,td->te', C_panel, loga_der))
        a_interp = jnp.asarray(np.einsum('td,tde->te', swap_gr, C_panel))
        dt = float(expiry) / S
        tau0 = np.arange(S) * dt
        stage_taus = np.stack([tau0, tau0 + 0.5 * dt, tau0 + dt], axis=1)
        t_eval = jnp.asarray(float(expiry) - stage_taus)     # (S, 3)
        per_slice.append((jnp.asarray(idx_t), CT_loga, a_interp,
                          jnp.asarray(np.asarray(t_grid_cut, dtype=float)),
                          t_eval, dt))

    K_max = max(len(s) for s in strikes_slices)
    moneyness = np.zeros((P, K_max))
    mask = np.zeros((P, K_max), dtype=bool)
    for p, (strikes, fwd) in enumerate(zip(strikes_slices, forwards)):
        k = len(strikes)
        moneyness[p, :k] = np.asarray(strikes, dtype=float) - float(fwd)
        mask[p, :k] = True
    moneyness_j = jnp.asarray(moneyness)
    p_nodes_j = jnp.asarray(p_nodes)
    w_nodes_j = jnp.asarray(w_nodes)
    dts = jnp.asarray([ps[5] for ps in per_slice])
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PSpec
        slice_sharding = NamedSharding(mesh, PSpec(mesh.axis_names[0]))
    else:
        slice_sharding = None

    @jax.jit
    def price(sigma0, beta_xs, volvol_xs):
        beta_xs = jnp.asarray(beta_xs)
        volvol_xs = jnp.asarray(volvol_xs)
        coeffs_all = []
        for idx_t, CT_loga, a_interp, times_f, t_eval, _dt in per_slice:
            beta_interp = beta_xs[idx_t]                     # (T, d)
            volvol_interp = volvol_xs[idx_t]                 # (T,)
            beta2 = jnp.einsum('td,td->t', beta_interp, CT_loga)
            kappa0_s = beta2 * theta * theta
            kappa1_s = kappa1 - kappa2 * theta + 2.0 * (kappa2 - beta2) * theta
            kappa2_s = kappa2 - beta2
            series = _scalar_series(
                times_f, a_interp, jnp.zeros_like(kappa0_s), kappa0_s,
                kappa1_s, kappa2_s, beta_interp, volvol_interp,
                jnp.zeros_like(kappa0_s), UnderlyingType.SWAP)  # (7, T)
            coeffs = jax.vmap(
                lambda s: jnp.interp(t_eval.ravel(), times_f, s))(series)
            coeffs_all.append(jnp.moveaxis(coeffs.reshape(7, S, 3), 0, 1))
        stage_coeffs = jnp.stack(coeffs_all)                 # (P, S, 7, 3)
        if slice_sharding is not None:
            stage_coeffs = jax.lax.with_sharding_constraint(
                stage_coeffs, slice_sharding)

        phi = Cplx(jnp.full(p_nodes_j.shape, -0.5), p_nodes_j)
        a_t1 = solve_batch(phi, dts, stage_coeffs, q=theta,
                           expansion_order=expansion_order)
        y = sigma0 - theta
        if n == 3:
            ys = jnp.stack([jnp.ones_like(y), y, y * y])
        else:
            y2 = y * y
            ys = jnp.stack([jnp.ones_like(y), y, y2, y2 * y, y2 * y2])
        mgf_re = a_t1.re @ ys                                # (P, N)
        mgf_im = a_t1.im @ ys
        p_payoff = (phi * phi).__rtruediv__(1.0 / np.pi)     # 1/(pi phi^2)
        z_re = (moneyness_j[:, None, :] * phi.re[None, :, None]
                + mgf_re[:, :, None])                        # (P, N, K)
        z_im = (moneyness_j[:, None, :] * phi.im[None, :, None]
                + mgf_im[:, :, None])
        e = jnp.exp(z_re)
        integrand = e * (p_payoff.re[None, :, None] * jnp.cos(z_im)
                         - p_payoff.im[None, :, None] * jnp.sin(z_im))
        out = jnp.einsum('n,pnk->pk', w_nodes_j, integrand)
        if slice_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, slice_sharding)
        return out

    return price, jnp.asarray(mask)


def make_swaption_cube_fn_traced(params: MultiFactRateLogSvParams,
                                 slices,
                                 forwards,
                                 strikes_slices,
                                 expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                                 nb_grid_pts: int = 31,
                                 year_steps: int = 48,
                                 h: float = 0.125,
                                 x_max: float = 2.75,
                                 x0: Optional[np.ndarray] = None,
                                 y0: Optional[np.ndarray] = None,
                                 mesh=None,
                                 n_sub: int = 2,
                                 engine: str = "auto"):
    """whole-cube swaption pricer with the QA structural panels TRACED.

    ``engine``: Riccati-scan arithmetic — 'f64' / 'df32' / 'auto' (df32 on
    TPU); see :func:`make_swaption_cube_fn`.

    Same inversion engine as :func:`make_swaption_cube_fn`, but the
    annuity-measure structural pipeline — factor vols C(A), the frozen-drift
    mean-state ODE, swap gradient / annuity log-derivative panels — runs on
    device through :mod:`.qa_traced` instead of being frozen host constants
    (reference construction: rate_logsv_params.py:390-503 on scipy
    solve_ivp).  Consequences:

    * ``A_xs``, ``kappa1``, ``kappa2`` and ``sigma0`` are CALIBRATABLE
      inputs: gradients flow through the structure (exact A-greeks), and
      an A-prefit iterates ONE cached program instead of re-freezing and
      re-tracing the cube per outer step
      (fast_calibration.prefit_A_to_atm).
    * panel accuracy is the fixed-step RK4 of the mean ODE (n_sub
      substeps per grid interval, ~1e-9 vs a tight solve_ivp at n_sub=2),
      where the host path inherits scipy defaults (rtol 1e-3).

    Returns ``(price, mask)`` with
    ``price(sigma0, A_xs, beta_xs, volvol_xs, kappa1, kappa2) -> (P, K_max)``.
    """
    from stochvolmodels_tpu.models.factor_hjm.double_exp_pricer import (
        tanh_sinh_nodes,
    )
    from stochvolmodels_tpu.models.factor_hjm.qa_traced import (
        build_qa_geometry,
        qa_panels_traced,
    )
    from stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion import (
        get_expansion_n,
        solve_a_ode_grid_batch,
        solve_a_ode_grid_batch_df32,
    )

    if engine == "auto":
        engine = "df32" if jax.devices()[0].platform != "cpu" else "f64"
    solve_batch = (solve_a_ode_grid_batch_df32 if engine == "df32"
                   else solve_a_ode_grid_batch)

    P = len(slices)
    assert len(forwards) == P and len(strikes_slices) == P
    p_nodes, w_nodes = tanh_sinh_nodes(h=h, x_max=x_max)
    theta = float(params.theta)          # static: the ODE templates fix q
    n = get_expansion_n(expansion_order)

    geom = build_qa_geometry(params, slices, nb_grid_pts=nb_grid_pts,
                             n_sub=n_sub)
    x0_j = None if x0 is None else jnp.asarray(np.asarray(x0, dtype=float))
    y0_j = None if y0 is None else jnp.asarray(np.asarray(y0, dtype=float))

    # shared RK4 step count for the Riccati stage (same policy as the
    # frozen-panel cube fn)
    ttms = np.array([float(e) for e, _ in slices])
    S = max(int(np.ceil(year_steps * float(np.max(ttms)))), 16)
    t_eval = np.zeros((P, S, 3))
    dts = np.zeros(P)
    for p, expiry in enumerate(ttms):
        dt = float(expiry) / S
        tau0 = np.arange(S) * dt
        stage_taus = np.stack([tau0, tau0 + 0.5 * dt, tau0 + dt], axis=1)
        t_eval[p] = float(expiry) - stage_taus
        dts[p] = dt
    t_eval_j = jnp.asarray(t_eval.reshape(P, S * 3))
    times_j = jnp.asarray(geom.t_grids)                       # (P, T)
    dts_j = jnp.asarray(dts)

    K_max = max(len(s) for s in strikes_slices)
    moneyness = np.zeros((P, K_max))
    mask = np.zeros((P, K_max), dtype=bool)
    for p, (strikes, fwd) in enumerate(zip(strikes_slices, forwards)):
        k = len(strikes)
        moneyness[p, :k] = np.asarray(strikes, dtype=float) - float(fwd)
        mask[p, :k] = True
    moneyness_j = jnp.asarray(moneyness)
    p_nodes_j = jnp.asarray(p_nodes)
    w_nodes_j = jnp.asarray(w_nodes)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PSpec
        slice_sharding = NamedSharding(mesh, PSpec(mesh.axis_names[0]))
    else:
        slice_sharding = None

    @jax.jit
    def price(sigma0, A_xs, beta_xs, volvol_xs, kappa1, kappa2):
        a_p, k0_p, k1_p, k2_p, beta_p, volvol_p = qa_panels_traced(
            geom, jnp.asarray(A_xs), jnp.asarray(kappa1),
            jnp.asarray(kappa2), theta, jnp.asarray(sigma0),
            jnp.asarray(beta_xs), jnp.asarray(volvol_xs),
            x0=x0_j, y0=y0_j)
        # seven scalar Riccati series per slice (rate_affine_expansion
        # _scalar_series, batched over P)
        vartheta2 = jnp.einsum('ptd,ptd->pt', beta_p, beta_p) + volvol_p ** 2
        apb = jnp.einsum('ptd,ptd->pt', a_p, beta_p)
        apa = jnp.einsum('ptd,ptd->pt', a_p, a_p)
        zeros = jnp.zeros_like(k0_p)
        series = jnp.stack([k0_p, k1_p, k2_p, vartheta2, apb, apa, zeros],
                           axis=1)                            # (P, 7, T)
        coeffs = jax.vmap(                                    # over slices
            lambda te, tf, sr: jax.vmap(
                lambda s: jnp.interp(te, tf, s))(sr)
        )(t_eval_j, times_j, series)                          # (P, 7, S*3)
        stage_coeffs = jnp.moveaxis(
            coeffs.reshape(P, 7, S, 3), 1, 2)                 # (P, S, 7, 3)
        if slice_sharding is not None:
            stage_coeffs = jax.lax.with_sharding_constraint(
                stage_coeffs, slice_sharding)

        phi = Cplx(jnp.full(p_nodes_j.shape, -0.5), p_nodes_j)
        a_t1 = solve_batch(phi, dts_j, stage_coeffs, q=theta,
                           expansion_order=expansion_order)
        y = sigma0 - theta
        if n == 3:
            ys = jnp.stack([jnp.ones_like(y), y, y * y])
        else:
            y2 = y * y
            ys = jnp.stack([jnp.ones_like(y), y, y2, y2 * y, y2 * y2])
        mgf_re = a_t1.re @ ys
        mgf_im = a_t1.im @ ys
        p_payoff = (phi * phi).__rtruediv__(1.0 / np.pi)      # 1/(pi phi^2)
        z_re = (moneyness_j[:, None, :] * phi.re[None, :, None]
                + mgf_re[:, :, None])
        z_im = (moneyness_j[:, None, :] * phi.im[None, :, None]
                + mgf_im[:, :, None])
        e = jnp.exp(z_re)
        integrand = e * (p_payoff.re[None, :, None] * jnp.cos(z_im)
                         - p_payoff.im[None, :, None] * jnp.sin(z_im))
        out = jnp.einsum('n,pnk->pk', w_nodes_j, integrand)
        if slice_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, slice_sharding)
        return out

    return price, jnp.asarray(mask)


# ----------------------------------------------------------------------------
# pricer classes
# ----------------------------------------------------------------------------

class RateLogSVPricer(ModelPricer):
    """swaption pricer (Corollary 4.2 on the Theorem 6.1 expansion)."""

    def price_chain(self, option_chain, params, is_spot_measure: bool = True,
                    **kwargs) -> list:
        t_grid = kwargs['t_grid']
        idxs = kwargs['idxs']
        ttms = np.array(option_chain.ttms[idxs])
        forwards = [option_chain.forwards[i][idxs] for i, _ in enumerate(option_chain.tenors)]
        strikes_ttms = [option_chain.strikes_ttms[i][idxs] for i, _ in enumerate(option_chain.tenors)]
        optiontypes_ttms = option_chain.optiontypes_ttms[idxs]
        return logsv_chain_de_pricer(params=params, t_grid=t_grid, ttms=ttms,
                                     forwards=forwards, strikes_ttms=strikes_ttms,
                                     optiontypes_ttms=optiontypes_ttms,
                                     expansion_order=ExpansionOrder.FIRST)[1]

    def model_mc_price_chain(self, option_chain, params, nb_path: int = 100000,
                             **kwargs):
        raise NotImplementedError("use factor_hjm_pricer.calc_mc_vols")

    def calibrate_model_params_to_chain(self, option_chain, params0,
                                        max_expiry: Optional[float] = None,
                                        nb_iters: int = 24,
                                        year_steps: int = 360,
                                        **kwargs):
        """joint on-device LM fit of the (beta, volvol) term structure to a
        SwOptionChain cube — beyond the reference, which has no factor-HJM
        calibration engine (its papers embed offline fits).  Returns
        ``(fitted MultiFactRateLogSvParams, LM cost)``."""
        from stochvolmodels_tpu.models.factor_hjm.fast_calibration import (
            calibrate_rate_logsv_cube_lm_on_device,
            swaption_chain_to_cube,
        )
        if max_expiry is None:
            max_expiry = float(params0.ts[-1])
        slices, forwards, strikes_slices, ivols_slices = \
            swaption_chain_to_cube(option_chain, max_expiry=max_expiry)
        return calibrate_rate_logsv_cube_lm_on_device(
            params0, slices, forwards, strikes_slices, ivols_slices,
            nb_iters=nb_iters, year_steps=year_steps, **kwargs)


class RateFutLogSVPricer(ModelPricer):
    """pricer for rate futures and options on rate futures (Sec. 4.2)."""

    def price_chain(self, option_chain, params, is_spot_measure: bool = True,
                    **kwargs) -> list:
        t_grid = kwargs['t_grid']
        idxs = kwargs['idxs']
        ttms = np.array(option_chain.ttms[idxs])
        forwards = [option_chain.forwards[idxs]]
        strikes_ttms = [option_chain.strikes_ttms[idxs]]
        optiontypes_ttms = [option_chain.optiontypes_ttms[0]]
        return logsv_chain_de_pricer(
            params=params, t_grid=t_grid, ttms=ttms, forwards=forwards,
            strikes_ttms=strikes_ttms, optiontypes_ttms=optiontypes_ttms,
            underlying_type=UnderlyingType.FUTURES,
            expansion_order=kwargs.get('expansion_order', ExpansionOrder.FIRST),
            x0=kwargs.get('x0'), y0=kwargs.get('y0'))[1]

    def model_mc_price_chain(self, option_chain, params, nb_path: int = 100000,
                             **kwargs):
        raise NotImplementedError

    @classmethod
    def populate_betas(cls, beta: float, basis: NelsonSiegel) -> np.ndarray:
        """per-factor volatility betas from a scalar (rate_logsv_pricer.py:549-557)."""
        if basis.get_nb_factors() == 3:
            return np.array([beta, -0.5 * beta, 0.0])
        if basis.get_nb_factors() == 1:
            return np.array([beta])
        raise NotImplementedError


# ----------------------------------------------------------------------------
# multi-factor Monte Carlo (Eq. 124 scheme) under lax.scan
# ----------------------------------------------------------------------------

def make_mc_array(x: np.ndarray, nb_path: int) -> np.ndarray:
    """broadcast an initial state vector to a (path, state) panel."""
    return np.tile(np.asarray(x, dtype=float), (nb_path, 1))


def simulate_logsv_MF(ttms: np.ndarray,
                      x0: np.ndarray,
                      y0: np.ndarray,
                      I0: np.ndarray,
                      sigma0: np.ndarray,
                      theta: float,
                      kappa1: float,
                      kappa2: float,
                      ts: np.ndarray,
                      A: np.ndarray,
                      R: np.ndarray,
                      C: np.ndarray,
                      Omega: np.ndarray,
                      betaxs: np.ndarray,
                      volvolxs: np.ndarray,
                      basis: NelsonSiegel,
                      ts_sw: Optional[np.ndarray],
                      T_fwd: Optional[float],
                      ccy: str,
                      measure_type: Measure = Measure.RISK_NEUTRAL,
                      nb_path: int = 100000,
                      seed: Optional[int] = None,
                      year_days: int = 360,
                      bxs: Optional[np.ndarray] = None,
                      W: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                      **kwargs
                      ) -> Tuple[list, list, list, list]:
    """joint Euler of (X, Y, I, ln sigma) under the selected measure
    (rate_logsv_pricer.py:864-1037), as a lax.scan over per-step coefficient
    panels precomputed on host.

    ``bxs`` switches on the displaced-log-normal (DLN) skew branch
    (rate_logsv_pricer.py:1001-1023): per-path factor-vol matrices
    C_p = B^-1 diag(A_t + b .. y_p) chol(R) built from the simulated key-tenor
    yields y_p, and per-path Omega drift.  The reference loops over paths to
    form each (d, d) matrix; here the products collapse algebraically —
    the diffusion shock is B^-1 (v .. (chol(R) w)) and Omega is a fixed
    (aux, d, d) bilinear form in v — so the whole branch stays inside the
    jitted scan with no per-path matrices materialised.

    ``W`` optionally injects pre-drawn *unscaled* standard normals
    ((S, P, d), (S, P)) in place of the on-device threefry stream — the
    reference's matched-randoms hook (rate_logsv_pricer.py:885,946-948),
    used by the oracle-parity tests.
    """
    ttm = float(ttms[-1])
    nb_factors = basis.get_nb_factors()
    nb_aux = basis.get_nb_aux_factors()
    if x0.ndim == 1:
        x0 = make_mc_array(x0, nb_path)
    if y0.ndim == 1:
        y0 = make_mc_array(y0, nb_path)
    if I0.shape[0] == 1:
        I0 = np.zeros(nb_path)
    if sigma0.ndim == 2:
        sigma0 = sigma0[:, 0]
    if sigma0.shape[0] == 1:
        sigma0 = sigma0 * np.ones(nb_path)

    nb_steps, dt, grid_t = set_time_grid(ttm=ttm, nb_steps_per_year=year_days)
    sdt = float(np.sqrt(dt))
    key = key_from_seed(seed if seed is not None else 16)

    # per-step coefficient panels
    idx_ts = np.array([bracket(ts[1:], float(t), True) for t in grid_t[:nb_steps]])
    beta_steps = jnp.asarray(betaxs[idx_ts])           # (S, d)
    volvol_steps = jnp.asarray(volvolxs[idx_ts])       # (S,)
    C_steps = jnp.asarray(C[idx_ts])                   # (S, d, d)
    Omega_steps = jnp.asarray(Omega[idx_ts])           # (S, m)
    vartheta2_steps = jnp.einsum('sd,sd->s', beta_steps, beta_steps) + volvol_steps ** 2

    D_X = jnp.asarray(basis.get_generating_matrix())
    D_Y = jnp.asarray(basis.get_aux_generating_matrix())
    B0_X = jnp.asarray(basis.get_basis(0.0))
    B0_Y = jnp.asarray(basis.get_aux_basis(0.0))

    is_dln = bxs is not None
    if is_dln:
        # mirrors the reference preconditions (rate_logsv_pricer.py:911-914):
        # skew comes only from the DLN displacement, the SV driver is frozen.
        assert measure_type == Measure.RISK_NEUTRAL
        assert np.all(np.abs(betaxs) <= 1e-8) and np.all(volvolxs <= 1e-8)
        assert abs(kappa1) <= 1e-8 and abs(kappa2) <= 1e-8
        bxs = np.asarray(bxs, dtype=float)
        assert bxs.shape == (nb_factors,)
        from stochvolmodels_tpu.utils.rate_core import df_fast
        inv_B = np.linalg.inv(basis.get_matrix_B())
        R_chol = np.linalg.cholesky(np.asarray(R, dtype=float))
        key_terms = np.asarray(basis.key_terms, dtype=float)
        # key-tenor yields are affine in the state: y_i = c_i(t) + KX_i.x + KY_i.y
        # with constant coefficient rows B_P(tau_i)/tau_i (bond is
        # time-homogeneous up to the deterministic df ratio)
        BPX_tenor = np.stack([basis.bond_coeffs(tau)[0] for tau in key_terms])
        BPY_tenor = np.stack([basis.bond_coeffs(tau)[1] for tau in key_terms])
        KX = jnp.asarray(BPX_tenor / key_terms[:, None])
        KY = jnp.asarray(BPY_tenor / key_terms[:, None])
        y_const = np.zeros((nb_steps, nb_factors))
        for s, t in enumerate(grid_t[:nb_steps]):
            for i, tau in enumerate(key_terms):
                y_const[s, i] = -np.log(df_fast(t + tau, ccy) / df_fast(t, ccy)) / tau
        y_const_steps = jnp.asarray(y_const)
        A_steps = jnp.asarray(np.asarray(A, dtype=float)[idx_ts])   # (S, d)
        # Omega_p = calc_Omega(B^-1 diag(v_p) R diag(v_p) B^-T) is a bilinear
        # form in v_p: precompute its (aux, d, d) coefficient tensor once.
        OmegaG = np.zeros((nb_aux, nb_factors, nb_factors))
        for kk in range(nb_factors):
            for ll in range(nb_factors):
                E = np.zeros((nb_factors, nb_factors))
                E[kk, ll] = 1.0
                OmegaG[:, kk, ll] = basis.calc_Omega(inv_B @ E @ inv_B.T)
        OmegaGR = jnp.asarray(OmegaG * np.asarray(R, dtype=float)[None, :, :])
        inv_B_j = jnp.asarray(inv_B)
        R_chol_j = jnp.asarray(R_chol)
        bxs_j = jnp.asarray(bxs)

    # measure-dependent precomputations
    if measure_type == Measure.ANNUITY:
        assert ts_sw is not None
        from stochvolmodels_tpu.utils.rate_core import df_fast
        n_pmt = ts_sw.size - 1
        dcfs = jnp.asarray(ts_sw[1:] - ts_sw[:-1])
        BPX_pmt = np.zeros((nb_steps, n_pmt, nb_factors))
        BPY_pmt = np.zeros((nb_steps, n_pmt, nb_aux))
        df_ratio = np.zeros((nb_steps, n_pmt))
        for s, t in enumerate(grid_t[:nb_steps]):
            for i in range(1, ts_sw.size):
                bx, by = basis.bond_coeffs(ts_sw[i] - t)
                BPX_pmt[s, i - 1] = bx
                BPY_pmt[s, i - 1] = by
                df_ratio[s, i - 1] = df_fast(ts_sw[i], ccy) / df_fast(t, ccy)
        BPX_pmt, BPY_pmt, df_ratio = map(jnp.asarray, (BPX_pmt, BPY_pmt, df_ratio))
    elif measure_type == Measure.FORWARD:
        assert T_fwd is not None
        BPX_fwd = np.zeros((nb_steps, nb_factors))
        for s, t in enumerate(grid_t[:nb_steps]):
            BPX_fwd[s] = basis.bond_coeffs(T_fwd - t)[0]
        BPX_fwd = jnp.asarray(BPX_fwd)

    def step(carry, inp):
        x, y, I, log_vol = carry
        step_idx, beta_t, volvol_t, C_t, Omega_t, vartheta2 = inp[:6]
        if W is not None:
            w0, w1 = inp[-2], inp[-1]
        else:
            k = jax.random.fold_in(key, step_idx.astype(jnp.int32))
            k0, k1 = jax.random.split(k)
            w0 = jax.random.normal(k0, (nb_path, nb_factors)) * sdt
            w1 = jax.random.normal(k1, (nb_path,)) * sdt
        sigma = jnp.exp(log_vol)
        sigma2 = sigma * sigma

        if measure_type == Measure.ANNUITY:
            BPX_t, BPY_t, dfr_t = inp[6], inp[7], inp[8]
            bonds = dfr_t[None, :] * jnp.exp(-jnp.einsum('pd,id->pi', x, BPX_t)
                                             - jnp.einsum('pm,im->pi', y, BPY_t))
            ann0 = jnp.einsum('i,pi->p', dcfs, bonds)
            ann1 = -jnp.einsum('i,pi,id->pd', dcfs, bonds, BPX_t)
            d_loga_dx = ann1 / ann0[:, None]
            adj_x_drift = jnp.einsum('pd,ed->pe', d_loga_dx, C_t @ C_t.T) * sigma2[:, None]
            adj_vol_drift = sigma * (d_loga_dx @ (C_t @ beta_t))
        elif measure_type == Measure.FORWARD:
            BPX_t = inp[6]
            CxCxB_P = (C_t @ C_t.T) @ BPX_t
            adj_x_drift = -CxCxB_P[None, :] * sigma2[:, None]
            adj_vol_drift = -sigma * (BPX_t @ C_t @ beta_t)
        else:
            adj_x_drift = 0.0
            adj_vol_drift = 0.0

        I = I + dt * (x @ B0_X + y @ B0_Y)
        if is_dln:
            # per-path DLN factor vols C_p = B^-1 diag(v_p) chol(R) with
            # v_p = A_t + b .. (key-tenor yields of path p); the SV driver is
            # frozen (log_vol drift and shocks vanish under the asserted
            # preconditions, matching rate_logsv_pricer.py:1016-1023 where the
            # log-vol update is skipped in the bxs branch)
            A_t, yconst_t = inp[6], inp[7]
            ys = yconst_t[None, :] + x @ KX.T + y @ KY.T          # (P, d)
            v = A_t[None, :] + bxs_j[None, :] * ys                # (P, d)
            omega_p = jnp.einsum('mkl,pk,pl->pm', OmegaGR, v, v)  # (P, aux)
            shock = (v * (w0 @ R_chol_j.T)) @ inv_B_j.T           # (P, d)
            y = y + dt * (y @ D_Y.T + omega_p)
            x = x + dt * x @ D_X.T + shock * sigma[:, None] + adj_x_drift * dt
        else:
            y = y + dt * (y @ D_Y.T + Omega_t[None, :] * sigma2[:, None])
            x = x + dt * x @ D_X.T + (w0 @ C_t.T) * sigma[:, None] + adj_x_drift * dt
            log_vol = (log_vol + ((kappa1 * theta / sigma)
                                  - (kappa1 - kappa2 * theta + 0.5 * vartheta2)
                                  - kappa2 * sigma) * dt
                       + w0 @ beta_t + volvol_t * w1 + adj_vol_drift * dt)
        return (x, y, I, log_vol), None

    # assemble scan inputs
    base_inputs = [jnp.arange(nb_steps), beta_steps, volvol_steps, C_steps,
                   Omega_steps, vartheta2_steps]
    if measure_type == Measure.ANNUITY:
        base_inputs += [BPX_pmt, BPY_pmt, df_ratio]
    elif measure_type == Measure.FORWARD:
        base_inputs += [BPX_fwd]
    if is_dln:
        base_inputs += [A_steps, y_const_steps]
    if W is not None:
        base_inputs += [jnp.asarray(W[0]) * sdt, jnp.asarray(W[1]) * sdt]
    inputs = tuple(base_inputs)

    idx_ttms = [int(np.where(np.isclose(grid_t, t))[0][0]) for t in ttms]
    x0s, y0s, I0s, sigma0s = [], [], [], []
    carry = (jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(I0),
             jnp.log(jnp.asarray(sigma0)))
    if 0 in idx_ttms:
        x0s.append(np.asarray(carry[0])), y0s.append(np.asarray(carry[1]))
        I0s.append(np.asarray(carry[2])), sigma0s.append(np.exp(np.asarray(carry[3])))

    # run the scan in segments ending at each requested maturity
    seg_start = 0
    scan_fn = jax.jit(lambda c, inp: jax.lax.scan(step, c, inp))
    for idx_ttm in idx_ttms:
        if idx_ttm == 0:
            continue
        seg = tuple(inp[seg_start:idx_ttm] for inp in inputs)
        carry, _ = scan_fn(carry, seg)
        seg_start = idx_ttm
        x0s.append(np.asarray(carry[0]))
        y0s.append(np.asarray(carry[1]))
        I0s.append(np.asarray(carry[2]))
        sigma0s.append(np.exp(np.asarray(carry[3]))[:, None])
    return x0s, y0s, I0s, sigma0s


def simulate_logsv_futures_MF(params: MultiFactRateLogSvParams,
                              ttm: float,
                              t_start: float,
                              t_end: float,
                              basis_type: str = "NELSON-SIEGEL",
                              f0: Optional[float] = None,
                              nb_path: int = 100000,
                              seed: Optional[int] = None,
                              year_steps: int = 720) -> np.ndarray:
    """terminal futures rates F_ttm simulated under the T-forward measure
    (rate_logsv_pricer.py:1040-1144): the log-shifted rate
    zeta = ln(F + 1/Delta) follows an exponential martingale with loadings
    a0(t) = a(t) + beta(t) h1(t), a1(t) = volvol(t) h1(t) from the
    QT-transform and the convexity-adjustment ODE's dense output, and the
    vol drift picks up the measure-change term beta . eta."""
    Delta = t_end - t_start
    nb_steps, dt, grid_t = set_time_grid(ttm=float(ttm), nb_steps_per_year=year_steps)
    sdt = float(np.sqrt(dt))
    key = key_from_seed(seed if seed is not None else 16)
    d = params.basis.nb_factors

    _, _, h1_dense, _, _ = futures_conv_adj(
        t_start=t_start, basis_type=basis_type, params=params, t0=0.0,
        Delta=Delta, settlement_type=FutSettleType.EURODOLLAR,
        expansion_order=ExpansionOrder.ZERO, dense_output=True, t_grid=grid_t)
    a, eta, _, _, _, beta, volvol = params.transform_QT_params(
        expiry=float(ttm), t_start=t_start, t_end=t_end, t_grid=grid_t)

    if f0 is None:
        f0 = float(np.asarray(calc_futures_rate(
            ccy=params.ccy, basis_type=basis_type, params=params,
            x0=np.zeros((1, d)), y0=np.zeros((1, params.basis.nb_aux_factors)),
            sigma0=params.sigma0 * np.ones((1, 1)), t0=0.0,
            t_start=t_start, t_end=t_end, Delta=Delta,
            settlement_type=FutSettleType.EURODOLLAR,
            expansion_order=ExpansionOrder.FIRST)[0]).ravel()[0])

    # per-step panels at the step start times
    S = nb_steps
    a0 = jnp.asarray(a[:S] + beta[:S] * np.asarray(h1_dense)[:S, None])   # (S, d)
    a1 = jnp.asarray(volvol[:S] * np.asarray(h1_dense)[:S])               # (S,)
    adj = jnp.asarray(np.einsum('sd,sd->s', beta[:S], eta[:S]))           # (S,)
    eta_s = jnp.asarray(eta[:S])
    beta_s = jnp.asarray(beta[:S])
    volvol_s = jnp.asarray(volvol[:S])
    vartheta2_s = jnp.asarray(np.einsum('sd,sd->s', beta[:S], beta[:S])
                              + volvol[:S] ** 2)
    inputs = (jnp.arange(S), a0, a1, adj, eta_s, beta_s, volvol_s, vartheta2_s)
    init = (jnp.full(nb_path, np.log(f0 + 1.0 / Delta)),
            jnp.full(nb_path, np.log(params.sigma0)))
    zeta, _ = _futures_scan(init, inputs, key,
                            jnp.asarray(params.theta), jnp.asarray(params.kappa1),
                            jnp.asarray(params.kappa2), dt=float(dt), sdt=sdt,
                            nb_path=nb_path, d=d)
    return np.asarray(jnp.exp(zeta) - 1.0 / Delta)


@partial(jax.jit, static_argnames=("dt", "sdt", "nb_path", "d"))
def _futures_scan(init, inputs, key, theta, kappa1, kappa2, *, dt, sdt,
                  nb_path, d):
    """module-level jitted scan so repeated futures-MC calls with the same
    (step count, path count) reuse one compiled program."""

    def step(carry, inp):
        zeta, log_vol = carry
        step_idx, a0_t, a1_t, adj_t, eta_t, beta_t, volvol_t, vartheta2 = inp
        k = jax.random.fold_in(key, step_idx.astype(jnp.int32))
        k0, k1 = jax.random.split(k)
        w0 = jax.random.normal(k0, (nb_path, d)) * sdt
        w1 = jax.random.normal(k1, (nb_path,)) * sdt
        sigma = jnp.exp(log_vol)
        sigma2 = sigma * sigma
        drift = -(a0_t @ a0_t) * 0.5 - 0.5 * a1_t * a1_t - (a0_t @ eta_t)
        zeta = zeta + drift * sigma2 * dt + sigma * (w0 @ a0_t) + sigma * w1 * a1_t
        log_vol = log_vol + ((kappa1 * theta / sigma)
                             - (kappa1 - kappa2 * theta + 0.5 * vartheta2)
                             - (kappa2 + adj_t) * sigma) * dt \
            + w0 @ beta_t + volvol_t * w1
        return (zeta, log_vol), None

    return jax.lax.scan(step, init, inputs)[0]


def calc_futures_mc_vols(params: MultiFactRateLogSvParams,
                         ttm: float,
                         t_start: float,
                         t_end: float,
                         strikes: np.ndarray,
                         optiontypes: np.ndarray,
                         basis_type: str = "NELSON-SIEGEL",
                         nb_path: int = 100000,
                         seed: Optional[int] = None
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(f0, MC normal vols, MC stderr-of-price) for futures options: simulate
    F_ttm under Q^T, average the payoffs, and imply Bachelier vols."""
    f_t = simulate_logsv_futures_MF(params=params, ttm=ttm, t_start=t_start,
                                    t_end=t_end, basis_type=basis_type,
                                    nb_path=nb_path, seed=seed)
    f0 = float(np.mean(f_t))
    strikes = np.asarray(strikes)
    is_call = np.asarray([str(o) == 'C' for o in np.asarray(optiontypes)])
    payoff = np.where(is_call[:, None],
                      np.maximum(f_t[None, :] - strikes[:, None], 0.0),
                      np.maximum(strikes[:, None] - f_t[None, :], 0.0))
    prices = payoff.mean(axis=1)
    stderrs = payoff.std(axis=1) / np.sqrt(nb_path)
    vols = np.asarray(infer_normal_ivols_from_slice_prices(
        ttm=ttm, forward=f0, strikes=strikes, optiontypes=np.asarray(optiontypes),
        model_prices=prices, discfactor=1.0))
    return f0, vols, stderrs
