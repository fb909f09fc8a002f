"""
Pricer for the log-normal beta SV model with quadratic drift — the flagship
model (Sepp & Rakhmonov, IJTAF 2024).

TPU rebuild of /root/reference/stochvolmodels/pricers/logsv_pricer.py.
Vanillas/inverse options are valued by Fourier inversion of the affine
expansion (batched RK4 ODE solve over the whole transform grid, see
models/logsv/affine.py), Monte Carlo runs the Eq. (3.59) Euler scheme under
``lax.scan``, and calibration uses scipy SLSQP driven by jax gradients
through pricer + implied-vol inversion (replacing the reference's
finite-difference SLSQP, logsv_pricer.py:205-453).
"""
from __future__ import annotations

from enum import Enum
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.optimize import minimize

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.option_chain import ChainGrid, OptionChain
from stochvolmodels_tpu.models.logsv import affine as afe
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.vol_moments import (
    compute_analytic_qvar_jnp,
    fit_model_vol_backbone_to_varswaps,
)
from stochvolmodels_tpu.models.model_pricer import ModelPricer
from stochvolmodels_tpu.ops import bsm, mgf
from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff
from stochvolmodels_tpu.ops.random import (antithetic_step_normals,
                                           key_from_seed, step_normals)
from stochvolmodels_tpu.utils.cplx import Cplx
from stochvolmodels_tpu.utils.funcs import set_time_grid, timer

Array = jnp.ndarray


class LogsvModelCalibrationType(Enum):
    """which parameters the calibration solves for (logsv_pricer.py:51-62)."""
    PARAMS4 = 1               # sigma0, theta, beta, volvol; kappa1/kappa2 fixed
    PARAMS5 = 2               # sigma0, theta, kappa1, beta, volvol; kappa2 = kappa1/theta
    PARAMS6 = 3               # all six
    PARAMS_WITH_VARSWAP_FIT = 4  # beta, volvol; backbone fit to varswap strikes


class ConstraintsType(Enum):
    """martingale/moment constraints of Theorem 3.7 (logsv_pricer.py:65-82)."""
    UNCONSTRAINT = 1
    MMA_MARTINGALE = 2           # kappa2 >= beta
    INVERSE_MARTINGALE = 3       # kappa2 >= 2 beta
    MMA_MARTINGALE_MOMENT4 = 4
    INVERSE_MARTINGALE_MOMENT4 = 5


class CalibrationEngine(Enum):
    """model-vol engine inside the calibration objective (logsv_pricer.py:85-94)."""
    ANALYTIC = 1
    MC = 2
    ROUGH_MC = 3


LOGSV_BTC_PARAMS = LogSvParams(sigma0=0.8376, theta=1.0413, kappa1=3.1844,
                               kappa2=3.058, beta=0.1514, volvol=1.8458)


def set_vol_scaler(sigma0: float, ttm: float) -> float:
    """transform-grid scaler; lower bound two weeks (logsv_pricer.py:557-559)."""
    return sigma0 * np.sqrt(np.minimum(np.min(ttm), 0.5 / 12.0))


def v0_implied(atm: float, beta: float, volvol: float, theta: float,
               kappa1: float, ttm: float) -> float:
    """short-maturity ATM vol inversion (logsv_pricer.py:532-554)."""
    beta2 = beta * beta
    volvol2 = volvol * volvol
    vartheta2 = beta2 + volvol2
    if np.abs(beta) > 1.0:
        return atm - vartheta2 * ttm / 4.0
    numer = (-24.0 - beta2 * ttm - 2.0 * vartheta2 * ttm + 12.0 * kappa1 * ttm
             + np.sqrt(np.square(24.0 + beta2 * ttm + 2.0 * vartheta2 * ttm
                                 - 12.0 * kappa1 * ttm)
                       - 288.0 * beta * ttm * (-2.0 * atm + theta * kappa1 * ttm)))
    denumer = 12.0 * beta * ttm
    if np.abs(denumer) > 1e-10:
        return numer / denumer
    return atm - vartheta2 * ttm / 4.0


# ----------------------------------------------------------------------------
# analytic chain pricing over the padded grid
# ----------------------------------------------------------------------------

def logsv_chain_price_grid(grid: ChainGrid,
                           sigma0,
                           theta,
                           kappa1,
                           kappa2,
                           beta,
                           volvol,
                           vol_backbone_etas: Optional[np.ndarray] = None,
                           vol_scaler=None,
                           ttms_static: Optional[Tuple[float, ...]] = None,
                           variable_type: VariableType = VariableType.LOG_RETURN,
                           expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                           is_spot_measure: bool = True,
                           is_simpson: bool = True,
                           year_steps: int = 720,
                           unroll: int = 4,
                           solve_f32: bool = False,
                           mixed_quad: bool = False,
                           solve_df32: bool = False
                           ) -> Array:
    """price the padded chain panel; returns (n_ttm, max_strikes) prices.

    Chains the ODE state A across maturities exactly as the reference
    (logsv_pricer.py:588-632).  ``ttms_static`` must be the concrete maturities
    (they fix the per-slice ODE step counts at trace time); params and
    vol_scaler may be traced for gradient-based calibration.

    ``solve_f32=True`` is the mixed-precision fast mode: the A(tau) RK4
    scans (the hot loop) run f32.  The all-f32 path's 5.1e-5 relative price
    error is ENTIRELY the f32 quadrature sum (the f32 solve contributes
    7e-7; scripts/logsv_fast_floor.py, PARITY.md "Fourier fast floors"), so
    the fast path keeps the quadrature out of f32 — but a FULL f64
    quadrature is ~10x slower warm on a chip with no native f64 (every
    emulated transcendental counts on the latency-bound axon backend):
    ``mixed_quad=True`` selects the f64-phase / f32-transcendental / f64-sum
    reduction (:func:`stochvolmodels_tpu.ops.mgf._nansum_re_mixed`, ~3e-6
    relative) instead of the all-f64 one (7e-7, slow).  Under an
    x64-disabled trace the lifts degrade to no-ops (all-f32 — what the f32
    LM path uses).
    """
    if ttms_static is None:
        ttms_static = tuple(float(t) for t in np.asarray(grid.ttms))
    if vol_backbone_etas is None:
        vol_backbone_etas = np.ones(len(ttms_static))
    phi_grid, psi_grid, theta_grid = mgf.get_transform_var_grid(
        variable_type=variable_type, is_spot_measure=is_spot_measure,
        vol_scaler=vol_scaler if vol_scaler is not None else 0.28)

    if solve_f32:
        f32 = jnp.float32

        def _c32(c: Cplx) -> Cplx:
            return Cplx(c.re.astype(f32), c.im.astype(f32))

        phi_s, psi_s, theta_s = _c32(phi_grid), _c32(psi_grid), _c32(theta_grid)
        theta_p, kappa1_p, kappa2_p, beta_p, volvol_p = (
            jnp.asarray(theta, f32), jnp.asarray(kappa1, f32),
            jnp.asarray(kappa2, f32), jnp.asarray(beta, f32),
            jnp.asarray(volvol, f32))
        etas_p = np.asarray(vol_backbone_etas, np.float32)
    else:
        phi_s, psi_s, theta_s = phi_grid, psi_grid, theta_grid
        theta_p, kappa1_p, kappa2_p, beta_p, volvol_p = (
            theta, kappa1, kappa2, beta, volvol)
        etas_p = vol_backbone_etas
    dt_q = phi_grid.re.dtype

    n_terms = afe.get_expansion_n(expansion_order)
    a_t = afe.get_init_conditions_a(phi_grid=phi_s, psi_grid=psi_s,
                                    theta_grid=theta_s, n_terms=n_terms,
                                    variable_type=variable_type)
    ttm0 = 0.0
    prices = []
    for i, ttm in enumerate(ttms_static):
        if solve_df32:
            # f64-class accuracy on the fast f32 scan path (see
            # solve_a_ode_grid_df32; the f64 scan is per-op-latency-bound
            # on the axon backend)
            a_t = afe.solve_a_ode_grid_df32(
                ttm=ttm - ttm0, theta=theta_p, kappa1=kappa1_p,
                kappa2=kappa2_p, beta=beta_p, volvol=volvol_p,
                phi_grid=phi_s, psi_grid=psi_s, a_t0=a_t,
                is_spot_measure=is_spot_measure,
                expansion_order=expansion_order,
                vol_backbone_eta=etas_p[i], year_steps=year_steps)
        else:
            a_t = afe.solve_a_ode_grid(
                ttm=ttm - ttm0, theta=theta_p, kappa1=kappa1_p,
                kappa2=kappa2_p, beta=beta_p, volvol=volvol_p,
                phi_grid=phi_s, psi_grid=psi_s, a_t0=a_t,
                is_spot_measure=is_spot_measure,
                expansion_order=expansion_order,
                vol_backbone_eta=etas_p[i], year_steps=year_steps,
                unroll=unroll)
        a_q = Cplx(a_t.re.astype(dt_q), a_t.im.astype(dt_q))
        y = sigma0 - theta
        y2 = y * y
        if expansion_order == ExpansionOrder.FIRST:
            ys = jnp.stack([jnp.ones_like(jnp.asarray(y)), y, y2])
        else:
            ys = jnp.stack([jnp.ones_like(jnp.asarray(y)), y, y2, y2 * y, y2 * y2])
        log_mgf = Cplx(a_q.re @ ys, a_q.im @ ys)

        if variable_type == VariableType.LOG_RETURN:
            slice_prices = mgf.vanilla_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, phi_grid=phi_grid,
                forwards=grid.forwards[i], strikes=grid.strikes[i],
                optiontypes=grid.optioncodes[i], discfactors=grid.discfactors[i],
                is_spot_measure=is_spot_measure, is_simpson=is_simpson,
                mixed_quad=mixed_quad)
        elif variable_type == VariableType.Q_VAR:
            slice_prices = mgf.qvar_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, psi_grid=psi_grid, ttms=grid.ttms[i],
                strikes=grid.strikes[i], optiontypes=grid.optioncodes[i],
                forwards=grid.forwards[i], discfactors=grid.discfactors[i],
                is_simpson=is_simpson, is_spot_measure=is_spot_measure)
        else:
            raise NotImplementedError(f"variable_type={variable_type}")
        prices.append(slice_prices)
        ttm0 = ttm
    return jnp.stack(prices, axis=0)


# ----------------------------------------------------------------------------
# Monte Carlo (Eq. 3.59 scheme)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ttm", "is_spot_measure",
                                   "nb_steps_per_year", "dtype", "antithetic"))
def simulate_logsv_terminal(key: jax.Array,
                            x0: Array,
                            sigma0: Array,
                            qvar0: Array,
                            ttm: float,
                            theta,
                            kappa1,
                            kappa2,
                            beta,
                            volvol,
                            vol_backbone_eta=1.0,
                            is_spot_measure: bool = True,
                            nb_steps_per_year: int = 360,
                            dtype=jnp.float64,
                            antithetic: bool = False
                            ) -> Tuple[Array, Array, Array]:
    """explicit Euler on (X, ln sigma, I) to horizon ttm
    (logsv_pricer.py:843-940).  Jitted with the model params traced so
    calibration-style repricing over perturbed params reuses one compiled
    program per (ttm, path-count) shape.

    Exact reference discretization: X uses the pre-update sigma, the
    log-volatility drift is (kappa1 theta/sigma - kappa1) + kappa2(theta -
    sigma) + adj sigma - 0.5 vartheta^2 with adj = beta*eta under the inverse
    measure, and the quadratic variance accumulates trapezoidally over the
    pre/post-update sigmas.
    """
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    sdt = float(np.sqrt(dt))
    if is_spot_measure:
        alpha, adj = -1.0, 0.0
    else:
        alpha, adj = 1.0, beta * vol_backbone_eta
    vartheta2 = beta * beta + volvol * volvol
    eta2 = vol_backbone_eta * vol_backbone_eta
    nb_path = x0.shape[0]
    carry_dtype = x0.dtype

    draw = antithetic_step_normals if antithetic else step_normals

    def step(carry, step_idx):
        x, log_sigma, sigma, qvar = carry
        w = draw(key, step_idx, (2, nb_path), dtype=dtype) * sdt
        w0, w1 = w[0], w[1]
        sigma_2dt = eta2 * sigma * sigma * dt
        x = x + alpha * 0.5 * sigma_2dt + vol_backbone_eta * sigma * w0
        log_sigma = log_sigma + ((kappa1 * theta / sigma - kappa1)
                                 + kappa2 * (theta - sigma) + adj * sigma
                                 - 0.5 * vartheta2) * dt + beta * w0 + volvol * w1
        sigma_new = jnp.exp(log_sigma)
        qvar = qvar + 0.5 * (sigma_2dt + eta2 * sigma_new * sigma_new * dt)
        return (x.astype(carry_dtype), log_sigma.astype(carry_dtype),
                sigma_new.astype(carry_dtype), qvar.astype(carry_dtype)), None

    init = (x0, jnp.log(sigma0), sigma0, qvar0)
    (x, _, sigma, qvar), _ = jax.lax.scan(step, init, jnp.arange(nb_steps),
                                          unroll=4)
    return x, sigma, qvar


@partial(jax.jit, static_argnames=("dt", "is_spot_measure", "dtype",
                                   "nb_replicates"))
def _simulate_logsv_terminal_qmc_core(v_tot: Array,
                                      shift_tot: Array,
                                      v_steps: Array,
                                      shifts: Array,
                                      x0: Array,
                                      sigma0: Array,
                                      qvar0: Array,
                                      dt: float,
                                      theta,
                                      kappa1,
                                      kappa2,
                                      beta,
                                      volvol,
                                      vol_backbone_eta,
                                      is_spot_measure: bool = True,
                                      dtype=jnp.float64,
                                      nb_replicates: int = 0
                                      ) -> Tuple[Array, Array, Array]:
    """QMC variant of ``simulate_logsv_terminal``: identical Euler
    discretization, but the two per-step normals come from randomized Sobol
    columns (dims = time steps, points = paths) generated inside the scan,
    with each Brownian stream's slice-total stratified onto the slice's
    leading Sobol dims (ops/qmc.py stratified_increment_shift).  Two passes:
    pass 1 re-generates the raw columns to accumulate their sums (columns
    are pure functions of (dim, path) — nothing is materialized), pass 2
    runs the Euler recursion on the conditioned increments.

    ``nb_replicates=R > 0``: the path axis holds R contiguous replicate
    groups, each the SAME Sobol point set under an independent digital
    shift (shift panels carry a trailing (R,) axis, expanded to per-path
    words on the fly) — the replicated-randomization construction whose
    group means admit an honest iid standard error."""
    from stochvolmodels_tpu.ops.qmc import (gray_codes, qmc_step_normals,
                                            replicated_gray_codes,
                                            stratified_increment_shift)

    nb_steps = v_steps.shape[0]
    sdt = float(np.sqrt(dt))
    if is_spot_measure:
        alpha, adj = -1.0, 0.0
    else:
        alpha, adj = 1.0, beta * vol_backbone_eta
    vartheta2 = beta * beta + volvol * volvol
    eta2 = vol_backbone_eta * vol_backbone_eta
    carry_dtype = x0.dtype
    nb_path = x0.shape[0]
    if nb_replicates:
        gray = replicated_gray_codes(nb_path, nb_replicates)
        per_rep = nb_path // nb_replicates

        def expand(shift_step):
            return jnp.repeat(shift_step, per_rep, axis=-1)
    else:
        gray = gray_codes(nb_path)

        def expand(shift_step):
            return shift_step

    def presum(sums, xs):
        v_step, shift_step = xs
        z0, z1 = qmc_step_normals(gray, v_step, expand(shift_step), dtype)
        return (sums[0] + z0, sums[1] + z1), None

    zero = jnp.zeros(x0.shape, dtype=dtype)
    (s0, s1), _ = jax.lax.scan(presum, (zero, zero), (v_steps, shifts),
                               unroll=2)
    t0, t1 = qmc_step_normals(gray, v_tot, expand(shift_tot), dtype)
    c0 = stratified_increment_shift(t0, s0, nb_steps)
    c1 = stratified_increment_shift(t1, s1, nb_steps)

    def step(carry, xs):
        v_step, shift_step = xs
        x, log_sigma, sigma, qvar = carry
        z0, z1 = qmc_step_normals(gray, v_step, expand(shift_step), dtype)
        w0, w1 = (z0 + c0) * sdt, (z1 + c1) * sdt
        sigma_2dt = eta2 * sigma * sigma * dt
        x = x + alpha * 0.5 * sigma_2dt + vol_backbone_eta * sigma * w0
        log_sigma = log_sigma + ((kappa1 * theta / sigma - kappa1)
                                 + kappa2 * (theta - sigma) + adj * sigma
                                 - 0.5 * vartheta2) * dt + beta * w0 + volvol * w1
        sigma_new = jnp.exp(log_sigma)
        qvar = qvar + 0.5 * (sigma_2dt + eta2 * sigma_new * sigma_new * dt)
        return (x.astype(carry_dtype), log_sigma.astype(carry_dtype),
                sigma_new.astype(carry_dtype), qvar.astype(carry_dtype)), None

    init = (x0, jnp.log(sigma0), sigma0, qvar0)
    (x, _, sigma, qvar), _ = jax.lax.scan(step, init, (v_steps, shifts),
                                          unroll=2)
    return x, sigma, qvar


def simulate_logsv_terminal_qmc(key: jax.Array,
                                x0: Array,
                                sigma0: Array,
                                qvar0: Array,
                                ttm: float,
                                theta,
                                kappa1,
                                kappa2,
                                beta,
                                volvol,
                                vol_backbone_eta=1.0,
                                is_spot_measure: bool = True,
                                nb_steps_per_year: int = 360,
                                dtype=jnp.float64,
                                dim_offset: int = 0,
                                nb_replicates: int = 0
                                ) -> Tuple[Array, Array, Array]:
    """terminal (x, sigma, qvar) by randomized quasi-Monte Carlo.

    Same dynamics and discretization as ``simulate_logsv_terminal``
    (reference logsv_pricer.py:843-940) with Sobol normals: path i is Sobol
    point i; the slice's first two dims stratify each Brownian stream's
    total, the rest map to steps.  ``dim_offset`` is the number of Sobol
    dimensions consumed by earlier slices of a chained run
    (``ops.qmc.qmc_dims_per_slice`` per slice), so a chain continues one
    low-discrepancy sequence across maturities.  The digital shift (and
    thus the whole draw) is reproducible from ``key``.

    ``nb_replicates=R > 0`` runs R independently-randomized copies of the
    (nb_path/R)-point set on one path axis (contiguous groups); reduce with
    ``compute_mc_vars_payoff(nb_replicates=R)`` for honest RQMC standard
    errors.
    """
    from stochvolmodels_tpu.ops.qmc import qmc_scan_panels

    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    v_tot, shift_tot, v_steps, shifts = qmc_scan_panels(
        key, nb_steps, per_step=2, dim_offset=dim_offset,
        nb_replicates=nb_replicates)
    return _simulate_logsv_terminal_qmc_core(
        v_tot, shift_tot, v_steps, shifts, x0, sigma0, qvar0, dt=float(dt),
        theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta, volvol=volvol,
        vol_backbone_eta=vol_backbone_eta, is_spot_measure=is_spot_measure,
        dtype=dtype, nb_replicates=nb_replicates)


def logsv_mc_chain_pricer(ttms: np.ndarray,
                          forwards: np.ndarray,
                          discfactors: np.ndarray,
                          strikes_ttms,
                          optiontypes_ttms,
                          v0: float,
                          theta: float,
                          kappa1: float,
                          kappa2: float,
                          beta: float,
                          volvol: float,
                          vol_backbone_etas: Optional[np.ndarray] = None,
                          is_spot_measure: bool = True,
                          nb_path: int = 100000,
                          nb_steps_per_year: int = 360,
                          variable_type: VariableType = VariableType.LOG_RETURN,
                          seed=None,
                          dtype=jnp.float64,
                          engine: str = "scan",
                          antithetic: bool = False,
                          qmc_replicates: int = 8
                          ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """chain MC with the terminal state carried across maturities
    (logsv_pricer.py:699-760).

    ``engine='pallas'`` runs each slice through the on-chip-PRNG Pallas
    kernel (float32, ~9.5e9 path-steps/s on a v5e chip vs ~1e9 for the f64
    scan) — use for large-path pricing where f32 MC noise dominates f32
    rounding; 'scan' (default) keeps the reference-parity f64 path.

    ``antithetic=True`` (scan engine only) couples path i with i + P/2 by
    mirrored Brownian increments and computes the standard error over pair
    averages — a variance reduction the reference does not offer.

    ``engine='qmc'`` replaces the threefry normals with randomized Sobol
    points (ops/qmc.py): near-O(1/N) error on smooth payoffs, so far fewer
    paths are needed per price.  The path budget is split into
    ``qmc_replicates`` independently-randomized copies of one Sobol point
    set (digital shifts; one low-discrepancy sequence spans the whole
    chain, dimensions continuing across maturities), and the reported stds
    are the standard error over the replicate means — an HONEST RQMC error
    estimate (the iid per-path formula would overstate it ~10-100x).  Set
    ``qmc_replicates=0`` for one unreplicated sequence with upper-bound
    stds.  Like the antithetic case, ``nb_path`` is silently padded up to a
    multiple of ``qmc_replicates``.  Tradeoff of the replicated default:
    each replicate is a shorter Sobol set, so the point estimate carries
    slightly more QMC error than one unreplicated run at the same budget —
    the price of an honest confidence interval."""
    if vol_backbone_etas is None:
        vol_backbone_etas = np.ones_like(np.asarray(ttms))
    if engine not in ("scan", "pallas", "qmc"):
        raise NotImplementedError(f"engine={engine}")
    if antithetic and engine != "scan":
        raise NotImplementedError("antithetic variates require engine='scan' "
                                  "(Pallas generates randoms on-chip; Sobol "
                                  "points are already stratified)")
    if antithetic and nb_path % 2:
        nb_path += 1
    qmc_replicates = int(qmc_replicates) if engine == "qmc" else 0
    if qmc_replicates == 1:
        qmc_replicates = 0
    if qmc_replicates and nb_path % qmc_replicates:
        nb_path += qmc_replicates - nb_path % qmc_replicates
    if engine == "pallas":
        from stochvolmodels_tpu.ops.pallas_mc import (
            pallas_engine_setup, simulate_logsv_terminal_pallas)
        nb_pad, base_seed, on_cpu = pallas_engine_setup(seed, nb_path)
        x = jnp.zeros(nb_pad, dtype=jnp.float32)
        sigma = jnp.full(nb_pad, v0, dtype=jnp.float32)
        qvar = jnp.zeros(nb_pad, dtype=jnp.float32)
        ttm0 = 0.0
        option_prices_ttm, option_std_ttm = [], []
        for i, ttm in enumerate(ttms):
            x, sigma, qvar = simulate_logsv_terminal_pallas(
                seed=base_seed + 7919 * i, x0=x, sigma0=sigma, qvar0=qvar,
                ttm=float(ttm - ttm0), theta=theta, kappa1=kappa1,
                kappa2=kappa2, beta=beta, volvol=volvol,
                vol_backbone_eta=float(vol_backbone_etas[i]),
                is_spot_measure=is_spot_measure,
                nb_steps_per_year=nb_steps_per_year,
                interpret=on_cpu)
            ttm0 = float(ttm)
            prices, stds = compute_mc_vars_payoff(
                x0=x[:nb_path], sigma0=sigma[:nb_path], qvar0=qvar[:nb_path],
                ttm=ttm, forward=forwards[i],
                strikes_ttm=jnp.asarray(strikes_ttms[i]),
                optiontypes_ttm=optiontypes_ttms[i],
                discfactor=discfactors[i], variable_type=variable_type)
            option_prices_ttm.append(np.asarray(prices))
            option_std_ttm.append(np.asarray(stds))
        return option_prices_ttm, option_std_ttm
    key = key_from_seed(seed)
    x = jnp.zeros(nb_path, dtype=dtype)
    sigma = jnp.full(nb_path, v0, dtype=dtype)
    qvar = jnp.zeros(nb_path, dtype=dtype)
    ttm0 = 0.0
    dim_offset = 0
    option_prices_ttm, option_std_ttm = [], []
    for i, ttm in enumerate(ttms):
        if engine == "qmc":
            from stochvolmodels_tpu.ops.qmc import qmc_dims_per_slice

            x, sigma, qvar = simulate_logsv_terminal_qmc(
                key=key, x0=x, sigma0=sigma, qvar0=qvar, ttm=float(ttm - ttm0),
                theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                volvol=volvol, vol_backbone_eta=float(vol_backbone_etas[i]),
                is_spot_measure=is_spot_measure,
                nb_steps_per_year=nb_steps_per_year, dtype=dtype,
                dim_offset=dim_offset, nb_replicates=qmc_replicates)
            dim_offset += qmc_dims_per_slice(set_time_grid(
                ttm=float(ttm - ttm0),
                nb_steps_per_year=nb_steps_per_year)[0])
        else:
            slice_key = jax.random.fold_in(key, i)
            x, sigma, qvar = simulate_logsv_terminal(
                key=slice_key, x0=x, sigma0=sigma, qvar0=qvar,
                ttm=float(ttm - ttm0),
                theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
                volvol=volvol, vol_backbone_eta=float(vol_backbone_etas[i]),
                is_spot_measure=is_spot_measure,
                nb_steps_per_year=nb_steps_per_year, dtype=dtype,
                antithetic=antithetic)
        ttm0 = float(ttm)
        prices, stds = compute_mc_vars_payoff(
            x0=x, sigma0=sigma, qvar0=qvar, ttm=ttm, forward=forwards[i],
            strikes_ttm=jnp.asarray(strikes_ttms[i]),
            optiontypes_ttm=optiontypes_ttms[i], discfactor=discfactors[i],
            variable_type=variable_type, antithetic=antithetic,
            nb_replicates=qmc_replicates)
        option_prices_ttm.append(np.asarray(prices))
        option_std_ttm.append(np.asarray(stds))
    return option_prices_ttm, option_std_ttm


@partial(jax.jit, static_argnames=("dt", "is_spot_measure"))
def simulate_logsv_terminal_fixed(W0: Array,
                                  W1: Array,
                                  dt: float,
                                  x0: Array,
                                  sigma0: Array,
                                  qvar0: Array,
                                  theta,
                                  kappa1,
                                  kappa2,
                                  beta,
                                  volvol,
                                  vol_backbone_eta=1.0,
                                  is_spot_measure: bool = True
                                  ) -> Tuple[Array, Array, Array]:
    """Euler step over pre-drawn unscaled normal blocks (steps, paths) —
    the reference's fixed-randoms contract (logsv_pricer.py:914-923).
    Jitted with traced params: the MC calibration engine reprices this every
    optimizer iteration with the same frozen blocks."""
    sdt = float(np.sqrt(dt))
    if is_spot_measure:
        alpha, adj = -1.0, 0.0
    else:
        alpha, adj = 1.0, beta * vol_backbone_eta
    vartheta2 = beta * beta + volvol * volvol
    eta2 = vol_backbone_eta * vol_backbone_eta
    carry_dtype = x0.dtype

    def step(carry, ws):
        x, log_sigma, sigma, qvar = carry
        w0 = ws[0] * sdt
        w1 = ws[1] * sdt
        sigma_2dt = eta2 * sigma * sigma * dt
        x = x + alpha * 0.5 * sigma_2dt + vol_backbone_eta * sigma * w0
        log_sigma = log_sigma + ((kappa1 * theta / sigma - kappa1)
                                 + kappa2 * (theta - sigma) + adj * sigma
                                 - 0.5 * vartheta2) * dt + beta * w0 + volvol * w1
        sigma_new = jnp.exp(log_sigma)
        qvar = qvar + 0.5 * (sigma_2dt + eta2 * sigma_new * sigma_new * dt)
        return (x.astype(carry_dtype), log_sigma.astype(carry_dtype),
                sigma_new.astype(carry_dtype), qvar.astype(carry_dtype)), None

    ws = jnp.stack([jnp.asarray(W0), jnp.asarray(W1)], axis=1)  # (steps, 2, paths)
    init = (x0, jnp.log(sigma0), sigma0, qvar0)
    (x, _, sigma, qvar), _ = jax.lax.scan(step, init, ws)
    return x, sigma, qvar


def get_randoms_for_chain_valuation(ttms: np.ndarray,
                                    nb_path: int = 100000,
                                    nb_steps_per_year: int = 360,
                                    seed: int = 10):
    """pre-draw per-slice normal blocks frozen across calibration iterations
    (logsv_pricer.py:944-966; numpy global RNG, matching the reference)."""
    np.random.seed(seed)
    W0s, W1s, dts = [], [], []
    ttm0 = 0.0
    for ttm in ttms:
        nb_steps_, dt, _ = set_time_grid(ttm=ttm - ttm0,
                                         nb_steps_per_year=nb_steps_per_year)
        W0s.append(np.random.normal(0, 1, size=(nb_steps_, nb_path)))
        W1s.append(np.random.normal(0, 1, size=(nb_steps_, nb_path)))
        dts.append(dt)
        ttm0 = ttm
    return W0s, W1s, dts


def get_qmc_randoms_for_chain_valuation(ttms: np.ndarray,
                                        nb_path: int = 100000,
                                        nb_steps_per_year: int = 360,
                                        seed: int = 10):
    """randomized-Sobol analogue of ``get_randoms_for_chain_valuation``:
    the same (W0s, W1s, dts) contract, but each block is a stratified-totals
    QMC panel (ops/qmc.py) — drop-in for
    ``logsv_mc_chain_pricer_fixed_randoms`` with ~40x less MC noise at
    matched paths.  Draws are frozen given ``seed``."""
    from stochvolmodels_tpu.ops.qmc import qmc_normal_blocks

    key = key_from_seed(seed)
    nb_steps_list, dts = [], []
    ttm0 = 0.0
    for ttm in ttms:
        nb_steps_, dt, _ = set_time_grid(ttm=ttm - ttm0,
                                         nb_steps_per_year=nb_steps_per_year)
        nb_steps_list.append(nb_steps_)
        dts.append(dt)
        ttm0 = ttm
    blocks = qmc_normal_blocks(key, nb_path, nb_steps_list)
    W0s = [b[0] for b in blocks]
    W1s = [b[1] for b in blocks]
    return W0s, W1s, dts


def logsv_mc_chain_pricer_fixed_randoms(ttms: np.ndarray,
                                        forwards: np.ndarray,
                                        discfactors: np.ndarray,
                                        strikes_ttms,
                                        optiontypes_ttms,
                                        W0s,
                                        W1s,
                                        dts,
                                        v0: float,
                                        theta: float,
                                        kappa1: float,
                                        kappa2: float,
                                        beta: float,
                                        volvol: float,
                                        vol_backbone_etas: Optional[np.ndarray] = None,
                                        is_spot_measure: bool = True,
                                        variable_type: VariableType = VariableType.LOG_RETURN
                                        ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """chain valuation on fixed randoms (logsv_pricer.py:992-1054)."""
    if vol_backbone_etas is None:
        vol_backbone_etas = np.ones_like(np.asarray(ttms))
    nb_path = W0s[0].shape[1]
    x = jnp.zeros(nb_path)
    sigma = jnp.full(nb_path, v0)
    qvar = jnp.zeros(nb_path)
    option_prices_ttm, option_std_ttm = [], []
    for i, ttm in enumerate(ttms):
        x, sigma, qvar = simulate_logsv_terminal_fixed(
            W0=W0s[i], W1=W1s[i], dt=float(dts[i]), x0=x, sigma0=sigma,
            qvar0=qvar, theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
            volvol=volvol, vol_backbone_eta=float(vol_backbone_etas[i]),
            is_spot_measure=is_spot_measure)
        prices, stds = compute_mc_vars_payoff(
            x0=x, sigma0=sigma, qvar0=qvar, ttm=ttm, forward=forwards[i],
            strikes_ttm=jnp.asarray(strikes_ttms[i]),
            optiontypes_ttm=optiontypes_ttms[i], discfactor=discfactors[i],
            variable_type=variable_type)
        option_prices_ttm.append(np.asarray(prices))
        option_std_ttm.append(np.asarray(stds))
    return option_prices_ttm, option_std_ttm


def get_randoms_for_rough_vol_chain_valuation(ttms: np.ndarray,
                                              nb_path: int = 100000,
                                              nb_steps_per_year: int = 360,
                                              seed: int = 10):
    """shared normal block for the rough chain (logsv_pricer.py:968-989)."""
    np.random.seed(seed)
    grid_ttms = []
    nb_steps_ttms = np.zeros(len(ttms), dtype=int)
    for i, ttm in enumerate(ttms):
        nb_steps, _, grid_t = set_time_grid(ttm, nb_steps_per_year or 360)
        nb_steps_ttms[i] = nb_steps
        grid_ttms.append(grid_t)
    Z0 = np.random.normal(0, 1, size=(nb_steps_ttms[-1], nb_path))
    Z1 = np.random.normal(0, 1, size=(nb_steps_ttms[-1], nb_path))
    return Z0, Z1, grid_ttms


def rough_logsv_mc_chain_pricer_fixed_randoms(ttms: np.ndarray,
                                              forwards: np.ndarray,
                                              discfactors: np.ndarray,
                                              strikes_ttms,
                                              optiontypes_ttms,
                                              Z0: np.ndarray,
                                              Z1: np.ndarray,
                                              sigma0: float,
                                              theta: float,
                                              kappa1: float,
                                              kappa2: float,
                                              beta: float,
                                              orthog_vol: float,
                                              weights: np.ndarray,
                                              nodes: np.ndarray,
                                              timegrids,
                                              variable_type: VariableType = VariableType.LOG_RETURN,
                                              debug: bool = False
                                              ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """rough chain valuation on a shared fixed normal block
    (logsv_pricer.py:1056-1119): each slice restarts from t = 0 using a
    truncated prefix of the block."""
    from stochvolmodels_tpu.models.rough.simulation import (
        log_spot_full_combined_fixed,
    )
    vartheta = float(np.sqrt(beta ** 2 + orthog_vol ** 2))
    rho = float(beta / vartheta)
    option_prices_ttm, option_std_ttm = [], []
    for ttm, forward, discfactor, strikes, types, timegrid in zip(
            ttms, forwards, discfactors, strikes_ttms, optiontypes_ttms,
            timegrids):
        nb_steps = timegrid.size - 1
        log_s, v, y = log_spot_full_combined_fixed(
            nodes=nodes, weights=weights, sigma0=sigma0, theta=theta,
            kappa1=kappa1, kappa2=kappa2, rho=rho, volvol=vartheta,
            timegrid=np.asarray(timegrid), Z0=Z0[:nb_steps], Z1=Z1[:nb_steps])
        sigma_terminal = jnp.sum(jnp.asarray(weights)[:, None] * v, axis=0)
        prices, stds = compute_mc_vars_payoff(
            x0=log_s, sigma0=sigma_terminal, qvar0=y, ttm=ttm,
            forward=forward, strikes_ttm=jnp.asarray(strikes),
            optiontypes_ttm=types, discfactor=discfactor,
            variable_type=variable_type)
        option_prices_ttm.append(np.asarray(prices))
        option_std_ttm.append(np.asarray(stds))
    return option_prices_ttm, option_std_ttm


def simulate_vol_paths(ttm: float,
                       v0: float,
                       theta: float,
                       kappa1: float,
                       kappa2: float,
                       beta: float,
                       volvol: float,
                       is_spot_measure: bool = True,
                       nb_path: int = 100000,
                       nb_steps_per_year: int = 360,
                       seed=None,
                       **kwargs
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """full (steps+1, paths) volatility path array (logsv_pricer.py:763-840)."""
    nb_steps, dt, grid_t = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    sdt = float(np.sqrt(dt))
    if is_spot_measure:
        adj = 0.0
    else:
        adj = beta
    vartheta2 = beta * beta + volvol * volvol
    vartheta = np.sqrt(vartheta2)
    key = key_from_seed(seed)

    def step(carry, step_idx):
        log_sigma, sigma = carry
        w1 = step_normals(key, step_idx, (nb_path,), dtype=jnp.float64) * sdt
        log_sigma = log_sigma + ((kappa1 * theta / sigma - kappa1)
                                 + kappa2 * (theta - sigma) + adj * sigma
                                 - 0.5 * vartheta2) * dt + vartheta * w1
        sigma = jnp.exp(log_sigma)
        return (log_sigma, sigma), sigma

    sigma0 = jnp.full(nb_path, v0)
    (_, _), sigma_path = jax.lax.scan(step, (jnp.log(sigma0), sigma0),
                                      jnp.arange(nb_steps))
    sigma_t = jnp.concatenate([sigma0[None, :], sigma_path], axis=0)
    return np.asarray(sigma_t), grid_t


# ----------------------------------------------------------------------------
# pricer class
# ----------------------------------------------------------------------------

class LogSVPricer(ModelPricer):
    """ModelPricer for the LogSV model of Eq. (3.12)."""

    def compute_chain_greeks(self, option_chain: OptionChain,
                             params: LogSvParams,
                             greeks=("delta", "gamma", "vega"),
                             **kwargs):
        """model-consistent chain greeks by AD through the analytic pricer;
        see models/greeks.py (beyond-reference feature — the reference only
        has BSM-formula greeks, bsm.py:148-384)."""
        from stochvolmodels_tpu.models.greeks import logsv_chain_greeks
        return logsv_chain_greeks(option_chain=option_chain, params=params,
                                  greeks=greeks, **kwargs)

    def price_chain(self, option_chain: OptionChain, params: LogSvParams,
                    is_spot_measure: bool = True,
                    variable_type: VariableType = VariableType.LOG_RETURN,
                    expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                    vol_scaler: Optional[float] = None,
                    precision: str = "exact",
                    **kwargs) -> List[np.ndarray]:
        """``precision='exact'`` (default) runs the ODE grid in float64 at 240
        steps/yr; ``'fast'`` is mixed precision at 360 steps/yr — f32 A(tau)
        RK4 scans (the hot loop; several times faster on a v5e chip, which
        has no native f64) with the Fourier quadrature kept f64, ~7e-7
        relative price accuracy (the former all-f32 path's 5.1e-5 error was
        entirely the f32 quadrature sum; scripts/logsv_fast_floor.py,
        PARITY.md "Fourier fast floors").  360 — not 180 — because the f32
        RK4 sits right on its stability boundary at 180 steps/yr for
        low-kappa params (observed: kappa1~2.2 at ttm 0.43 diverges in f32
        at dt=1/180 while f64 at the same dt is fine; f32 at 1/360 is
        stable with margin).

        Exact-path step count (measured, scripts/bench_exact_path.py +
        tests/test_logsv.py::TestExactStepConvergence): the f64 RK4 is deep
        in its convergence plateau — 240 steps/yr agrees with 2880 steps/yr
        to 4e-9 rel at the reference-parity params and 2e-7 at an extreme
        (volvol=3, kappa=5, 2y) corner, while the warm TPU reprice drops
        1116 -> 419 ms (the f64 scan is per-step-latency-bound, so
        wall-clock is linear in steps).  720 steps/yr before this study;
        pass ``year_steps=`` to override.

        Exact-path ENGINE: on TPU the vanilla exact path defaults to the
        double-float32 RK4 (``exact_engine='df32'``; affine.py
        solve_a_ode_grid_df32) — same scheme and step count, f32-pair
        arithmetic, 5.5e-14 max relative price agreement with the f64
        engine on the BTC chain measured on-device, and 35 ms instead of
        ~420 ms warm because f64 scan bodies execute per-op-latency-bound
        on the axon backend while f32 bodies run fused (PARITY.md
        "Double-float32 exact engine", incl. the FP-contraction hazard
        the engine is hardened against).  Pass ``exact_engine='f64'`` to
        force the plain-f64 scans (the CPU default, where f64 scans are
        fast and the df32 trace compiles slowly)."""
        if vol_scaler is None:
            vol_scaler = set_vol_scaler(sigma0=params.sigma0,
                                        ttm=np.min(option_chain.ttms))
        grid = option_chain.to_grid()
        etas = params.get_vol_backbone_etas(ttms=option_chain.ttms)
        exact_engine = kwargs.pop("exact_engine", "auto")
        solve_df32 = False
        if precision == "fast":
            year_steps = kwargs.pop("year_steps", 360)
            solve_f32 = True
        elif precision == "exact":
            year_steps = kwargs.pop("year_steps", 240)
            solve_f32 = False
            if exact_engine == "auto":
                on_tpu = jax.devices()[0].platform != "cpu"
                # Q_VAR deliberately stays f64 under 'auto': the 40k-lane
                # df32 QVAR program is correct (3.8e-12 vs f64) and 60x
                # faster warm (36.6 s -> 0.6 s), but running it leaves the
                # axon tunnel in a state where executables compiled
                # AFTERWARD in the same process fail on re-execution with
                # INVALID_ARGUMENT (reproduced 7x, chunked and unchunked;
                # pre-compiled programs are unaffected — PARITY.md "df32
                # compile-after-run hazard").  Users can opt in with
                # exact_engine='df32' for batch QVAR workloads.
                exact_engine = ("df32" if on_tpu
                                and variable_type == VariableType.LOG_RETURN
                                else "f64")
            solve_df32 = (exact_engine == "df32"
                          and variable_type in (VariableType.LOG_RETURN,
                                                VariableType.Q_VAR))
        else:
            raise NotImplementedError(f"precision={precision}")
        prices = _logsv_chain_price_grid_jit(
            grid, float(params.sigma0), float(params.theta), float(params.kappa1),
            float(params.kappa2), float(params.beta), float(params.volvol),
            tuple(float(e) for e in etas),
            float(vol_scaler), tuple(float(t) for t in option_chain.ttms),
            variable_type, expansion_order, is_spot_measure, year_steps,
            solve_f32, solve_df32)
        return option_chain.unpad_panel(prices)

    def compute_model_ivols_for_chain(self, option_chain: OptionChain,
                                      params: LogSvParams,
                                      precision: str = "exact",
                                      **kwargs) -> List[np.ndarray]:
        """model implied vols for the chain.

        ``precision='fast'`` fuses pricing (f32 ODE scans, f64 quadrature)
        and the f64 bisect+Newton BSM inversion into ONE device program
        (single dispatch, single host fetch) — on a remote TPU the generic
        price-then-invert path pays two extra host<->device roundtrips
        plus a 200-iteration emulated-f64 bisection, ~15x slower
        end-to-end.  'exact' keeps the generic reference-parity path
        (f64 prices, 200-iteration bisection)."""
        if precision != "fast":
            return super().compute_model_ivols_for_chain(
                option_chain=option_chain, params=params,
                precision=precision, **kwargs)
        variable_type = kwargs.pop("variable_type", VariableType.LOG_RETURN)
        expansion_order = kwargs.pop("expansion_order", ExpansionOrder.SECOND)
        is_spot_measure = kwargs.pop("is_spot_measure", True)
        vol_scaler = kwargs.pop("vol_scaler", None)
        if vol_scaler is None:
            vol_scaler = set_vol_scaler(sigma0=params.sigma0,
                                        ttm=np.min(option_chain.ttms))
        grid = option_chain.to_grid()
        etas = params.get_vol_backbone_etas(ttms=option_chain.ttms)
        vols = _logsv_chain_ivols_grid_jit(
            grid, float(params.sigma0), float(params.theta),
            float(params.kappa1), float(params.kappa2),
            float(params.beta), float(params.volvol),
            tuple(float(e) for e in etas), float(vol_scaler),
            tuple(float(t) for t in option_chain.ttms),
            variable_type, expansion_order, is_spot_measure, 360, True)
        return option_chain.unpad_panel(vols)

    @timer
    def model_mc_price_chain(self, option_chain: OptionChain, params: LogSvParams,
                             is_spot_measure: bool = True,
                             variable_type: VariableType = VariableType.LOG_RETURN,
                             nb_path: int = 100000,
                             nb_steps: Optional[int] = None,
                             seed=None,
                             **kwargs) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        if kwargs.get('use_rough_mc'):
            from stochvolmodels_tpu.models.rough.simulation import rough_logsv_mc_chain_pricer
            assert params.nodes is not None and params.weights is not None, \
                "call params.approximate_kernel(T) first"
            return rough_logsv_mc_chain_pricer(
                ttms=option_chain.ttms, forwards=option_chain.forwards,
                discfactors=option_chain.discfactors,
                strikes_ttms=option_chain.strikes_ttms,
                optiontypes_ttms=option_chain.optiontypes_ttms,
                sigma0=params.sigma0, theta=params.theta, kappa1=params.kappa1,
                kappa2=params.kappa2, beta=params.beta, volvol=params.volvol,
                weights=params.weights, nodes=params.nodes, nb_path=nb_path,
                nb_steps_per_year=nb_steps or 360,
                variable_type=variable_type,
                seed=seed if seed is not None else kwargs.get('seed'),
                engine=kwargs.get('engine', 'scan'))
        vol_backbone_etas = params.get_vol_backbone_etas(ttms=option_chain.ttms)
        return logsv_mc_chain_pricer(
            v0=params.sigma0, theta=params.theta, kappa1=params.kappa1,
            kappa2=params.kappa2, beta=params.beta, volvol=params.volvol,
            vol_backbone_etas=vol_backbone_etas, ttms=option_chain.ttms,
            forwards=option_chain.forwards, discfactors=option_chain.discfactors,
            strikes_ttms=option_chain.strikes_ttms,
            optiontypes_ttms=option_chain.optiontypes_ttms,
            is_spot_measure=is_spot_measure, variable_type=variable_type,
            nb_path=nb_path, seed=seed,
            nb_steps_per_year=nb_steps or int(360 * np.max(option_chain.ttms)) + 1,
            engine=kwargs.get('engine', 'scan'),
            antithetic=kwargs.get('antithetic', False))

    def set_vol_scaler(self, option_chain: OptionChain) -> float:
        """grid scaler from the first ATM vol, frozen across calibration
        iterations (logsv_pricer.py:194-203)."""
        atm0 = option_chain.get_chain_atm_vols()[0]
        return set_vol_scaler(sigma0=atm0, ttm=option_chain.ttms[0])

    @timer
    def simulate_vol_paths(self, params: LogSvParams, ttm: float = 1.0,
                           nb_path: int = 100000, is_spot_measure: bool = True,
                           nb_steps: Optional[int] = None, year_days: int = 360,
                           seed=None, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
        nb_steps = nb_steps or int(np.ceil(year_days * ttm))
        return simulate_vol_paths(ttm=ttm, v0=params.sigma0, theta=params.theta,
                                  kappa1=params.kappa1, kappa2=params.kappa2,
                                  beta=params.beta, volvol=params.volvol,
                                  nb_path=nb_path, is_spot_measure=is_spot_measure,
                                  nb_steps_per_year=nb_steps, seed=seed, **kwargs)

    @timer
    def simulate_terminal_values(self, params: LogSvParams, ttm: float = 1.0,
                                 nb_path: int = 100000,
                                 is_spot_measure: bool = True, seed=None,
                                 **kwargs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        key = key_from_seed(seed)
        x, sigma, qvar = simulate_logsv_terminal(
            key=key, x0=jnp.zeros(nb_path),
            sigma0=jnp.full(nb_path, params.sigma0), qvar0=jnp.zeros(nb_path),
            ttm=ttm, theta=params.theta, kappa1=params.kappa1,
            kappa2=params.kappa2, beta=params.beta, volvol=params.volvol,
            is_spot_measure=is_spot_measure)
        return np.asarray(x), np.asarray(sigma), np.asarray(qvar)

    @timer
    def logsv_pdfs(self, params: LogSvParams, ttm: float, space_grid: np.ndarray,
                   is_spot_measure: bool = True,
                   expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                   variable_type: VariableType = VariableType.LOG_RETURN,
                   vol_scaler: Optional[float] = None, **kwargs) -> np.ndarray:
        return logsv_pdfs(params=params, ttm=ttm, space_grid=space_grid,
                          is_spot_measure=is_spot_measure,
                          expansion_order=expansion_order,
                          variable_type=variable_type, vol_scaler=vol_scaler)

    @timer
    def calibrate_model_params_to_chain(self,
                                        option_chain: OptionChain,
                                        params0: LogSvParams,
                                        params_min: LogSvParams = LogSvParams(
                                            sigma0=0.1, theta=0.1, kappa1=0.25,
                                            kappa2=0.25, beta=-3.0, volvol=0.2),
                                        params_max: LogSvParams = LogSvParams(
                                            sigma0=1.5, theta=1.5, kappa1=10.0,
                                            kappa2=10.0, beta=3.0, volvol=3.0),
                                        is_vega_weighted: bool = True,
                                        is_unit_ttm_vega: bool = False,
                                        model_calibration_type: LogsvModelCalibrationType = LogsvModelCalibrationType.PARAMS5,
                                        constraints_type: ConstraintsType = ConstraintsType.UNCONSTRAINT,
                                        calibration_engine: CalibrationEngine = CalibrationEngine.ANALYTIC,
                                        nb_path: int = 100000,
                                        nb_steps: int = 360,
                                        seed: int = 10,
                                        use_float32: Optional[bool] = None,
                                        **kwargs) -> LogSvParams:
        """fit to the vega-weighted IV MSE of Eq. (6.3) under Theorem 3.7
        constraints, with jax gradients replacing finite differences
        (logsv_pricer.py:205-453).

        ``use_float32`` (default: True on TPU) traces the objective in
        float32 — ~100x faster per iteration on v5e, objective agreement
        ~1e-4 relative.
        """
        if use_float32 is None:
            use_float32 = use_float32_default()
        method = kwargs.pop('method', 'slsqp')
        if method not in ('slsqp', 'lm'):
            raise ValueError(f"method must be 'slsqp' or 'lm', got {method!r}")
        if method == 'lm':
            # on-device Levenberg-Marquardt: whole fit in one jit dispatch,
            # sub-second warm on a v5e chip; same least-squares objective
            if (calibration_engine != CalibrationEngine.ANALYTIC or
                    model_calibration_type != LogsvModelCalibrationType.PARAMS5):
                raise NotImplementedError(
                    "method='lm' supports the ANALYTIC PARAMS5 calibration")
            from stochvolmodels_tpu.models.logsv.fast_calibration import (
                calibrate_logsv_lm_on_device)
            fit, _ = calibrate_logsv_lm_on_device(
                option_chain=option_chain, params0=params0,
                constraints_type=constraints_type, use_float32=use_float32,
                is_vega_weighted=is_vega_weighted,
                params_min=params_min, params_max=params_max,
                nb_iters=kwargs.pop('nb_iters', 16),
                year_steps=kwargs.pop('year_steps', 180))
            return fit
        vol_scaler = self.set_vol_scaler(option_chain=option_chain)
        grid = option_chain.to_grid()
        market_vols_panel = _pad_panel(option_chain.get_mid_vols(), grid)
        if is_vega_weighted:
            vegas_ttms = option_chain.get_chain_vegas(is_unit_ttm_vega=is_unit_ttm_vega)
            vegas_ttms = [v / np.sum(v) for v in vegas_ttms]
            weights_panel = _pad_panel(vegas_ttms, grid)
        else:
            weights_panel = np.ones_like(market_vols_panel)
        mask = np.asarray(grid.mask)
        weights = jnp.asarray(np.where(mask, weights_panel, 0.0))
        market_vols = jnp.asarray(np.where(mask, market_vols_panel, 0.0))
        if use_float32:
            grid = _grid_to_f32(grid)
            weights = weights.astype(jnp.float32)
            market_vols = market_vols.astype(jnp.float32)
        ttms_static = tuple(float(t) for t in option_chain.ttms)

        if model_calibration_type == LogsvModelCalibrationType.PARAMS_WITH_VARSWAP_FIT:
            varswap_strikes = option_chain.get_slice_varswap_strikes(floor_with_atm_vols=True)
            varswap_arr = jnp.asarray(varswap_strikes.to_numpy())
        else:
            varswap_strikes = None
            varswap_arr = None

        mct = model_calibration_type

        def expand_pars(pars):
            """map the optimizer vector to (sigma0, theta, kappa1, kappa2,
            beta, volvol, backbone_etas or None) with traced values."""
            if mct == LogsvModelCalibrationType.PARAMS4:
                return (pars[0], pars[1], params0.kappa1, params0.kappa2,
                        pars[2], pars[3], None)
            if mct == LogsvModelCalibrationType.PARAMS5:
                return (pars[0], pars[1], pars[2], pars[2] / pars[1],
                        pars[3], pars[4], None)
            if mct == LogsvModelCalibrationType.PARAMS6:
                return (pars[0], pars[1], pars[2], pars[3], pars[4], pars[5], None)
            if mct == LogsvModelCalibrationType.PARAMS_WITH_VARSWAP_FIT:
                beta, volvol = pars[0], pars[1]
                etas = _backbone_etas_jnp(
                    sigma0=params0.sigma0, theta=params0.theta,
                    kappa1=params0.kappa1, kappa2=params0.kappa2,
                    beta=beta, volvol=volvol, ttms=np.asarray(option_chain.ttms),
                    varswap_strikes=varswap_arr)
                return (params0.sigma0, params0.theta, params0.kappa1,
                        params0.kappa2, beta, volvol, etas)
            raise NotImplementedError(f"{mct}")

        if calibration_engine == CalibrationEngine.ANALYTIC:
            def loss_fn(pars):
                sigma0, theta, kappa1, kappa2, beta, volvol, etas = expand_pars(pars)
                prices = logsv_chain_price_grid(
                    grid, sigma0=sigma0, theta=theta, kappa1=kappa1,
                    kappa2=kappa2, beta=beta, volvol=volvol,
                    vol_backbone_etas=etas, vol_scaler=vol_scaler,
                    ttms_static=ttms_static)
                model_vols = bsm.infer_bsm_ivols_from_model_chain_prices(
                    ttms=grid.ttms, forwards=grid.forwards,
                    discfactors=grid.discfactors, strikes_ttms=grid.strikes,
                    optiontypes_ttms=grid.optioncodes, model_prices_ttms=prices)
                # mask NaN vols BEFORE squaring: where(isnan(r), 0, r) alone
                # leaves a 0*NaN=NaN in the VJP and poisons the gradient
                nan_mask = jnp.isnan(model_vols)
                clean = jnp.where(nan_mask, market_vols, model_vols)
                resid = weights * jnp.square(clean - market_vols)
                return jnp.sum(jnp.where(nan_mask, 0.0, resid))
        elif calibration_engine == CalibrationEngine.MC:
            key = key_from_seed(seed)
            mc_engine = kwargs.pop('mc_engine', 'scan')
            if mc_engine not in ('scan', 'qmc'):
                raise NotImplementedError(f"mc_engine={mc_engine}")
            if mc_engine == 'qmc':
                # randomized-Sobol objective: the frozen-randoms contract
                # holds (fixed key -> fixed draws across iterations) with
                # ~40x less MC noise at matched paths (ops/qmc.py), so far
                # fewer paths are needed for a stable MC calibration
                from stochvolmodels_tpu.ops.qmc import qmc_dims_per_slice
                dim_offsets, off, ttm0_ = [], 0, 0.0
                for ttm in ttms_static:
                    dim_offsets.append(off)
                    off += qmc_dims_per_slice(set_time_grid(
                        ttm=ttm - ttm0_, nb_steps_per_year=nb_steps)[0])
                    ttm0_ = ttm

            def loss_fn(pars):
                sigma0, theta, kappa1, kappa2, beta, volvol, etas = expand_pars(pars)
                x = jnp.zeros(nb_path)
                sig = sigma0 * jnp.ones(nb_path)
                qv = jnp.zeros(nb_path)
                ttm0 = 0.0
                resid_total = 0.0
                for i, ttm in enumerate(ttms_static):
                    slice_key = jax.random.fold_in(key, i)
                    eta_i = 1.0 if etas is None else etas[i]
                    if mc_engine == 'qmc':
                        x, sig, qv = simulate_logsv_terminal_qmc(
                            key=key, x0=x, sigma0=sig, qvar0=qv,
                            ttm=ttm - ttm0, theta=theta, kappa1=kappa1,
                            kappa2=kappa2, beta=beta, volvol=volvol,
                            vol_backbone_eta=eta_i,
                            nb_steps_per_year=nb_steps,
                            dim_offset=dim_offsets[i])
                    else:
                        x, sig, qv = simulate_logsv_terminal(
                            key=slice_key, x0=x, sigma0=sig, qvar0=qv,
                            ttm=ttm - ttm0, theta=theta, kappa1=kappa1,
                            kappa2=kappa2, beta=beta, volvol=volvol,
                            vol_backbone_eta=eta_i, nb_steps_per_year=nb_steps)
                    ttm0 = ttm
                    prices, _ = compute_mc_vars_payoff(
                        x0=x, sigma0=sig, qvar0=qv, ttm=grid.ttms[i],
                        forward=grid.forwards[i], strikes_ttm=grid.strikes[i],
                        optiontypes_ttm=grid.optioncodes[i],
                        discfactor=grid.discfactors[i])
                    model_vols = bsm.infer_bsm_implied_vol(
                        forward=grid.forwards[i], ttm=grid.ttms[i],
                        strike=grid.strikes[i], given_price=prices,
                        discfactor=grid.discfactors[i],
                        optiontype=grid.optioncodes[i])
                    nan_mask = jnp.isnan(model_vols)
                    clean = jnp.where(nan_mask, market_vols[i], model_vols)
                    resid = weights[i] * jnp.square(clean - market_vols[i])
                    resid_total = resid_total + jnp.sum(
                        jnp.where(nan_mask, 0.0, resid))
                return resid_total
        elif calibration_engine == CalibrationEngine.ROUGH_MC:
            from stochvolmodels_tpu.models.rough.simulation import log_spot_full_combined
            assert params0.nodes is not None and params0.weights is not None, \
                "call params0.approximate_kernel(T) first"
            key = key_from_seed(seed)
            nodes_np, weights_np = params0.nodes, params0.weights

            def loss_fn(pars):
                sigma0, theta, kappa1, kappa2, beta, volvol, _ = expand_pars(pars)
                vartheta = jnp.sqrt(beta * beta + volvol * volvol)
                rho = beta / vartheta
                resid_total = 0.0
                for i, ttm in enumerate(ttms_static):
                    log_s, v, y = log_spot_full_combined(
                        nodes=nodes_np, weights=weights_np, sigma0=sigma0,
                        theta=theta, kappa1=kappa1, kappa2=kappa2, rho=rho,
                        volvol=vartheta, ttm=ttm, nb_path=nb_path, key=key,
                        nb_steps_per_year=nb_steps)
                    prices, _ = compute_mc_vars_payoff(
                        x0=log_s, sigma0=log_s, qvar0=y, ttm=grid.ttms[i],
                        forward=grid.forwards[i], strikes_ttm=grid.strikes[i],
                        optiontypes_ttm=grid.optioncodes[i],
                        discfactor=grid.discfactors[i])
                    model_vols = bsm.infer_bsm_implied_vol(
                        forward=grid.forwards[i], ttm=grid.ttms[i],
                        strike=grid.strikes[i], given_price=prices,
                        discfactor=grid.discfactors[i],
                        optiontype=grid.optioncodes[i])
                    nan_mask = jnp.isnan(model_vols)
                    clean = jnp.where(nan_mask, market_vols[i], model_vols)
                    resid = weights[i] * jnp.square(clean - market_vols[i])
                    resid_total = resid_total + jnp.sum(
                        jnp.where(nan_mask, 0.0, resid))
                return resid_total
        else:
            raise NotImplementedError(f"{calibration_engine}")

        if use_float32:
            base_loss = loss_fn

            def loss_fn(pars):
                with jax.enable_x64(False):
                    return base_loss(pars.astype(jnp.float32))

        obj_and_grad = jax.jit(jax.value_and_grad(loss_fn))

        def objective(pars: np.ndarray):
            v, g = obj_and_grad(jnp.asarray(pars))
            return float(v), np.asarray(g, dtype=np.float64)

        # optimizer vector layout per calibration type (logsv_pricer.py:391-414)
        if mct == LogsvModelCalibrationType.PARAMS4:
            p0 = np.array([params0.sigma0, params0.theta, params0.beta, params0.volvol])
            bounds = ((params_min.sigma0, params_max.sigma0),
                      (params_min.theta, params_max.theta),
                      (params_min.beta, params_max.beta),
                      (params_min.volvol, params_max.volvol))
        elif mct == LogsvModelCalibrationType.PARAMS5:
            p0 = np.array([params0.sigma0, params0.theta, params0.kappa1,
                           params0.beta, params0.volvol])
            bounds = ((params_min.sigma0, params_max.sigma0),
                      (params_min.theta, params_max.theta),
                      (params_min.kappa1, params_max.kappa1),
                      (params_min.beta, params_max.beta),
                      (params_min.volvol, params_max.volvol))
        elif mct == LogsvModelCalibrationType.PARAMS6:
            p0 = np.array([params0.sigma0, params0.theta, params0.kappa1,
                           params0.kappa2, params0.beta, params0.volvol])
            bounds = ((params_min.sigma0, params_max.sigma0),
                      (params_min.theta, params_max.theta),
                      (params_min.kappa1, params_max.kappa1),
                      (params_min.kappa2, params_max.kappa2),
                      (params_min.beta, params_max.beta),
                      (params_min.volvol, params_max.volvol))
        elif mct == LogsvModelCalibrationType.PARAMS_WITH_VARSWAP_FIT:
            p0 = np.array([params0.beta, params0.volvol])
            bounds = ((params_min.beta, params_max.beta),
                      (params_min.volvol, params_max.volvol))
        else:
            raise NotImplementedError(f"{mct}")

        def _np_expand(pars):
            sigma0, theta, kappa1, kappa2, beta, volvol, _ = expand_pars(jnp.asarray(pars))
            return (float(sigma0), float(theta), float(kappa1), float(kappa2),
                    float(beta), float(volvol))

        def martingale_measure(pars):
            _, _, _, kappa2, beta, _ = _np_expand(pars)
            return kappa2 - beta

        def inverse_measure(pars):
            _, _, _, kappa2, beta, _ = _np_expand(pars)
            return kappa2 - 2.0 * beta

        def vol_4thmoment_finite(pars):
            _, theta, kappa1, kappa2, beta, volvol = _np_expand(pars)
            kappa = kappa1 + kappa2 * theta
            return kappa - 1.5 * (beta * beta + volvol * volvol)

        if constraints_type == ConstraintsType.UNCONSTRAINT:
            constraints = None
        elif constraints_type == ConstraintsType.MMA_MARTINGALE:
            constraints = ({'type': 'ineq', 'fun': martingale_measure})
        elif constraints_type == ConstraintsType.INVERSE_MARTINGALE:
            constraints = ({'type': 'ineq', 'fun': inverse_measure})
        elif constraints_type == ConstraintsType.MMA_MARTINGALE_MOMENT4:
            constraints = ({'type': 'ineq', 'fun': martingale_measure},
                           {'type': 'ineq', 'fun': vol_4thmoment_finite})
        elif constraints_type == ConstraintsType.INVERSE_MARTINGALE_MOMENT4:
            constraints = ({'type': 'ineq', 'fun': inverse_measure},
                           {'type': 'ineq', 'fun': vol_4thmoment_finite})
        else:
            raise NotImplementedError

        # f32 objectives have ~1e-7 noise floor; a tighter ftol just
        # burns iterations without improving the fit
        options = {'ftol': 1e-6 if use_float32 else 1e-8, 'maxiter': 200}
        if constraints is not None:
            res = minimize(objective, p0, jac=True, method='SLSQP',
                           constraints=constraints, bounds=bounds, options=options)
        else:
            res = minimize(objective, p0, jac=True, method='SLSQP',
                           bounds=bounds, options=options)

        sigma0, theta, kappa1, kappa2, beta, volvol = _np_expand(res.x)
        fit_params = LogSvParams(sigma0=sigma0, theta=theta, kappa1=kappa1,
                                 kappa2=kappa2, beta=beta, volvol=volvol,
                                 H=params0.H, nodes=params0.nodes,
                                 weights=params0.weights)
        if mct == LogsvModelCalibrationType.PARAMS_WITH_VARSWAP_FIT:
            vol_backbone = fit_model_vol_backbone_to_varswaps(
                log_sv_params=fit_params, varswap_strikes=varswap_strikes)
            fit_params.set_vol_backbone(vol_backbone=vol_backbone)
        return fit_params


def logsv_chain_pricer(params: LogSvParams,
                       ttms: np.ndarray,
                       forwards: np.ndarray,
                       discfactors: np.ndarray,
                       strikes_ttms,
                       optiontypes_ttms,
                       is_spot_measure: bool = True,
                       expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                       variable_type: VariableType = VariableType.LOG_RETURN,
                       vol_scaler: Optional[float] = None,
                       **kwargs) -> List[np.ndarray]:
    """functional chain pricer mirroring the reference signature
    (logsv_pricer.py:562-632)."""
    chain = OptionChain(ttms=np.asarray(ttms), forwards=np.asarray(forwards),
                        discfactors=np.asarray(discfactors),
                        strikes_ttms=list(strikes_ttms),
                        optiontypes_ttms=list(optiontypes_ttms))
    return LogSVPricer().price_chain(option_chain=chain, params=params,
                                     is_spot_measure=is_spot_measure,
                                     expansion_order=expansion_order,
                                     variable_type=variable_type,
                                     vol_scaler=vol_scaler)


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _logsv_pdfs_jit(sigma0, theta, kappa1, kappa2, beta, volvol,
                    ttm, vol_scaler, variable_type, expansion_order,
                    is_spot_measure, engine, space_grid):
    phi_grid, psi_grid, theta_grid = mgf.get_transform_var_grid(
        variable_type=variable_type, is_spot_measure=is_spot_measure,
        vol_scaler=vol_scaler)
    _, log_mgf = afe.compute_logsv_a_mgf_grid(
        ttm=ttm, phi_grid=phi_grid, psi_grid=psi_grid, theta_grid=theta_grid,
        sigma0=sigma0, theta=theta, kappa1=kappa1,
        kappa2=kappa2, beta=beta, volvol=volvol,
        variable_type=variable_type, expansion_order=expansion_order,
        is_spot_measure=is_spot_measure, engine=engine)
    if variable_type == VariableType.LOG_RETURN:
        transform_var_grid, shift, scale = phi_grid, 0.0, 1.0
    elif variable_type == VariableType.Q_VAR:
        transform_var_grid, shift, scale = psi_grid, 0.0, 1.0 / ttm
    elif variable_type == VariableType.SIGMA:
        transform_var_grid, shift, scale = theta_grid, theta, 1.0
    else:
        raise NotImplementedError(f"variable_type={variable_type}")
    pdf = mgf.pdf_with_mgf_grid(log_mgf_grid=log_mgf,
                                transform_var_grid=transform_var_grid,
                                space_grid=space_grid, shift=shift, scale=scale)
    return pdf / scale


def logsv_pdfs(params: LogSvParams,
               ttm: float,
               space_grid: np.ndarray,
               is_spot_measure: bool = True,
               expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
               variable_type: VariableType = VariableType.LOG_RETURN,
               vol_scaler: Optional[float] = None,
               engine: str = "auto",
               **kwargs) -> np.ndarray:
    """model density of X / QV / sigma by transform inversion
    (logsv_pricer.py:635-696).

    One jitted program per (ttm, variable_type, grid) — the former eager
    assembly dispatched every op through the remote-TPU tunnel and cost
    10-27 s per density (measured r05; PARITY.md "Exact f64 surfaces").
    ``engine='auto'`` runs the transform-ODE solve on the df32 carrier on
    TPU (graded warmup included — the SIGMA seed A^(1)(0) = -Θ and the
    QVAR forcing both carry over); 'f64' forces the plain scans (the CPU
    default)."""
    if vol_scaler is None:
        vol_scaler = set_vol_scaler(sigma0=params.sigma0, ttm=ttm)
    if engine == "auto":
        # pdfs default to jitted f64 even on TPU: a SECOND distinct df32
        # program compiled after another df32 program has executed fails
        # on re-execution (axon tunnel bug, PARITY.md "df32
        # compile-after-run hazard"), and the exact vanilla chain — the
        # hot path — already holds the process's df32 slot.  Jitted f64
        # pdfs are still 4.7-20x faster than the old eager assembly
        # (SIGMA 5.8 s vs 27.4 s; LOG_RETURN ~0.5 s vs 10.1 s warm);
        # ``engine='df32'`` opts in to ~0.1 s densities for batch
        # workloads that dedicate a process to them.
        engine = "f64"
    # warmup-schedule construction (SIGMA/QVAR) needs concrete params
    # host-side; the pdf paths always pass concrete floats
    pdf = _logsv_pdfs_jit(float(params.sigma0), float(params.theta),
                          float(params.kappa1), float(params.kappa2),
                          float(params.beta), float(params.volvol),
                          float(ttm), float(vol_scaler), variable_type,
                          expansion_order, is_spot_measure, engine,
                          jnp.asarray(space_grid))
    return np.asarray(pdf)


def use_float32_default() -> bool:
    """calibration objectives default to float32 on TPU: v5e has no native
    f64 (emulation is ~10-100x slower and blows up remote compile times);
    the f32 objective agrees with f64 to ~1e-4 relative, far below market
    fit tolerance."""
    return jax.devices()[0].platform != "cpu"


def _grid_to_f32(grid: ChainGrid) -> ChainGrid:
    import dataclasses
    return dataclasses.replace(
        grid,
        ttms=grid.ttms.astype(jnp.float32),
        forwards=grid.forwards.astype(jnp.float32),
        discfactors=grid.discfactors.astype(jnp.float32),
        strikes=grid.strikes.astype(jnp.float32))


def _pad_panel(ragged, grid: ChainGrid) -> np.ndarray:
    t, k = grid.mask.shape
    out = np.zeros((t, k))
    for i, a in enumerate(ragged):
        out[i, :len(np.asarray(a))] = np.asarray(a)
    return out


def _backbone_etas_jnp(sigma0, theta, kappa1, kappa2, beta, volvol,
                       ttms: np.ndarray, varswap_strikes: Array) -> Array:
    """differentiable varswap-backbone fit on the chain maturities
    (vol_moments.py fit_model_vol_backbone_to_varswaps, traced params)."""
    market_qvar_dt = jnp.asarray(ttms) * jnp.square(varswap_strikes)
    model_qvar_dt = jnp.stack([
        compute_analytic_qvar_jnp(sigma0, theta, kappa1, kappa2, beta, volvol,
                                  ttm=float(t)) * float(t) for t in ttms])
    d_market = jnp.diff(market_qvar_dt, prepend=0.0)
    d_model = jnp.diff(model_qvar_dt, prepend=0.0)
    etas = d_market / d_model
    etas = jnp.where(etas > 0.0, etas, 1.0)
    etas = jnp.where(jnp.asarray(ttms) < 0.06, jnp.sqrt(etas), etas)
    return etas


@partial(jax.jit, static_argnums=(7, 9, 10, 11, 12, 13, 14))
def _logsv_chain_ivols_grid_jit(grid, sigma0, theta, kappa1, kappa2, beta,
                                volvol, vol_backbone_etas, vol_scaler,
                                ttms_static, variable_type, expansion_order,
                                is_spot_measure, year_steps=360,
                                solve_f32=False):
    """fused chain reprice + BSM implied-vol inversion, one device program.

    The inversion is the short bisect+Newton solver (the LM fast-path one,
    ops/bsm.py infer_bsm_implied_vol_fast) — ~1e-6 vol accuracy, plenty for
    the fast mode, and 7x fewer sequential stages than the reference's
    200-iteration bisection."""
    prices = logsv_chain_price_grid(grid, sigma0=sigma0, theta=theta,
                                    kappa1=kappa1, kappa2=kappa2, beta=beta,
                                    volvol=volvol,
                                    vol_backbone_etas=np.asarray(vol_backbone_etas),
                                    vol_scaler=vol_scaler,
                                    ttms_static=ttms_static,
                                    variable_type=variable_type,
                                    expansion_order=expansion_order,
                                    is_spot_measure=is_spot_measure,
                                    year_steps=year_steps,
                                    solve_f32=solve_f32)
    vols = bsm.infer_bsm_implied_vol_fast(
        forward=grid.forwards[:, None], ttm=grid.ttms[:, None],
        strike=grid.strikes, given_price=prices,
        discfactor=grid.discfactors[:, None], optiontype=grid.optioncodes)
    return grid.masked(vols)


@partial(jax.jit, static_argnums=(7, 9, 10, 11, 12, 13, 14, 15))
def _logsv_chain_price_grid_jit(grid, sigma0, theta, kappa1, kappa2, beta,
                                volvol, vol_backbone_etas, vol_scaler,
                                ttms_static, variable_type, expansion_order,
                                is_spot_measure, year_steps=720,
                                solve_f32=False, solve_df32=False):
    return logsv_chain_price_grid(grid, sigma0=sigma0, theta=theta,
                                  kappa1=kappa1, kappa2=kappa2, beta=beta,
                                  volvol=volvol,
                                  vol_backbone_etas=np.asarray(vol_backbone_etas),
                                  vol_scaler=vol_scaler,
                                  ttms_static=ttms_static,
                                  variable_type=variable_type,
                                  expansion_order=expansion_order,
                                  is_spot_measure=is_spot_measure,
                                  year_steps=year_steps,
                                  solve_f32=solve_f32,
                                  solve_df32=solve_df32)
