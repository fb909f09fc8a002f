"""
Heston stochastic-volatility model: analytic Fourier pricing, Monte Carlo,
and gradient-based calibration.

TPU-native rebuild of /root/reference/stochvolmodels/pricers/heston_pricer.py.
The closed-form MGF (Sepp 2007, formula 14; heston_pricer.py:169-200) is pure
elementwise complex math evaluated over the whole 1000-point transform grid as
(re, im) float64 pairs; maturities are chained by carrying the Riccati state
(a, b) across slices exactly as the reference does (heston_pricer.py:223-260).
Monte Carlo runs a full-truncation Euler scheme under ``lax.scan`` with
stateless per-step threefry normals (no (steps x paths) materialization).
Calibration replaces finite-difference SLSQP with scipy SLSQP driven by
``jax.value_and_grad`` through pricer + implied-vol inversion.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.option_chain import ChainGrid, OptionChain
from stochvolmodels_tpu.models.model_pricer import ModelParams, ModelPricer
from stochvolmodels_tpu.ops import bsm
from stochvolmodels_tpu.ops import lm, mgf
from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff
from stochvolmodels_tpu.ops.random import (antithetic_step_normals,
                                           key_from_seed, step_normals)
from stochvolmodels_tpu.utils.cplx import Cplx, cexp, clog, csqrt
from stochvolmodels_tpu.utils.funcs import set_time_grid, timer

Array = jnp.ndarray

VAR_FLOOR = 1e-4  # full-truncation floor (heston_pricer.py:357)


@dataclass
class HestonParams(ModelParams):
    """Heston parameters: dv = kappa (theta - v) dt + volvol sqrt(v) dW,
    rho the return-variance correlation (heston_pricer.py:26-43)."""
    v0: float = 0.04
    theta: float = 0.04
    kappa: float = 4.0
    rho: float = -0.5
    volvol: float = 0.4

    def to_array(self) -> np.ndarray:
        return np.array([self.v0, self.theta, self.kappa, self.rho, self.volvol])


BTC_HESTON_PARAMS = HestonParams(v0=0.8, theta=1.0, kappa=2.0, rho=0.0, volvol=2.0)


def compute_heston_mgf_grid(v0,
                            theta,
                            kappa,
                            volvol,
                            rho,
                            ttm,
                            phi_grid: Cplx,
                            psi_grid: Cplx,
                            a_t0: Optional[Cplx] = None,
                            b_t0: Optional[Cplx] = None
                            ) -> Tuple[Cplx, Cplx, Cplx]:
    """closed-form Heston log-MGF on the transform grid (heston_pricer.py:169-200).

    (a_t0, b_t0) chain the Riccati solution across maturities; ``ttm`` is the
    *increment* from the previous slice.  Returns (log_mgf, a_t1, b_t1).
    """
    volvol2 = volvol * volvol
    b1 = phi_grid * (rho * volvol) + kappa
    b0 = phi_grid * (phi_grid + 1.0) * 0.5 - psi_grid
    zeta = csqrt(b1 * b1 - b0 * (2.0 * volvol2))
    exp_zeta = cexp(-zeta * ttm)
    psi_p = -b1 + zeta
    psi_m = b1 + zeta
    two_zeta = zeta * 2.0
    if b_t0 is None:
        c_p, c_m = psi_p / two_zeta, psi_m / two_zeta
    else:
        c_p = (psi_p + b_t0 * volvol2) / two_zeta
        c_m = (psi_m - b_t0 * volvol2) / two_zeta
    denom = c_p * exp_zeta + c_m
    b_t1 = -(psi_m * c_p * exp_zeta * (-1.0) + psi_p * c_m) / (denom * volvol2)
    a_t1 = (psi_p * ttm + clog(denom) * 2.0) * (-(theta * kappa / volvol2))
    if a_t0 is not None:
        a_t1 = a_t1 + a_t0
    log_mgf_grid = a_t1 + b_t1 * v0
    return log_mgf_grid, a_t1, b_t1


def heston_chain_price_grid(grid: ChainGrid,
                            v0,
                            theta,
                            kappa,
                            volvol,
                            rho,
                            vol_scaler=None,
                            variable_type: VariableType = VariableType.LOG_RETURN,
                            is_spot_measure: bool = True,
                            is_simpson: bool = True,
                            solve_f32: bool = False
                            ) -> Array:
    """price the padded chain panel; returns (n_ttm, max_strikes) prices.

    Jit-compatible: params and vol_scaler may be traced; the maturity loop
    unrolls at trace time carrying the chained (a, b) state
    (heston_pricer.py:203-262).

    ``solve_f32=True`` is the mixed-precision fast mode: the closed-form
    Riccati MGF evaluates f32 while the Fourier quadrature stays f64
    (~8e-6 relative vs 2.8e-5 all-f32 — the quadrature sum dominates the
    f32 error here too; PARITY.md "Fourier fast floors").  Under an
    x64-disabled trace the lift degrades to a no-op (all-f32).
    """
    if vol_scaler is None:
        vol_scaler = jnp.minimum(0.3, jnp.sqrt(v0 * grid.ttms[0]))
    phi_grid, psi_grid, _ = mgf.get_transform_var_grid(
        variable_type=variable_type, is_spot_measure=is_spot_measure,
        vol_scaler=vol_scaler)

    if solve_f32:
        f32 = jnp.float32

        def _c32(c: Cplx) -> Cplx:
            return Cplx(c.re.astype(f32), c.im.astype(f32))

        phi_s, psi_s = _c32(phi_grid), _c32(psi_grid)
        v0_p, theta_p, kappa_p, volvol_p, rho_p = (
            jnp.asarray(v0, f32), jnp.asarray(theta, f32),
            jnp.asarray(kappa, f32), jnp.asarray(volvol, f32),
            jnp.asarray(rho, f32))
    else:
        phi_s, psi_s = phi_grid, psi_grid
        v0_p, theta_p, kappa_p, volvol_p, rho_p = v0, theta, kappa, volvol, rho
    dt_q = phi_grid.re.dtype

    a_t, b_t = None, None
    ttm0 = 0.0
    prices = []
    for i in range(grid.n_ttms):
        ttm = grid.ttms[i]
        log_mgf, a_t, b_t = compute_heston_mgf_grid(
            v0=v0_p, theta=theta_p, kappa=kappa_p, volvol=volvol_p, rho=rho_p,
            ttm=(ttm - ttm0).astype(f32) if solve_f32 else ttm - ttm0,
            phi_grid=phi_s, psi_grid=psi_s, a_t0=a_t, b_t0=b_t)
        log_mgf = Cplx(log_mgf.re.astype(dt_q), log_mgf.im.astype(dt_q))
        if variable_type == VariableType.LOG_RETURN:
            slice_prices = mgf.vanilla_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, phi_grid=phi_grid,
                forwards=grid.forwards[i], strikes=grid.strikes[i],
                optiontypes=grid.optioncodes[i],
                discfactors=grid.discfactors[i],
                is_spot_measure=is_spot_measure, is_simpson=is_simpson)
        elif variable_type == VariableType.Q_VAR:
            slice_prices = mgf.qvar_prices_with_mgf_grid(
                log_mgf_grid=log_mgf, psi_grid=psi_grid, ttms=ttm,
                strikes=grid.strikes[i], optiontypes=grid.optioncodes[i],
                forwards=grid.forwards[i], discfactors=grid.discfactors[i],
                is_simpson=is_simpson, is_spot_measure=is_spot_measure)
        else:
            raise NotImplementedError(f"variable_type={variable_type}")
        prices.append(slice_prices)
        ttm0 = ttm
    return jnp.stack(prices, axis=0)


# ----------------------------------------------------------------------------
# Monte Carlo
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ttm", "nb_steps_per_year", "dtype",
                                   "antithetic"))
def simulate_heston_terminal(key: jax.Array,
                             x0: Array,
                             var0: Array,
                             qvar0: Array,
                             ttm: float,
                             theta,
                             kappa,
                             rho,
                             volvol,
                             nb_steps_per_year: int = 360,
                             dtype=jnp.float64,
                             antithetic: bool = False
                             ) -> Tuple[Array, Array, Array]:
    """full-truncation Euler to the horizon ``ttm`` (heston_pricer.py:312-359).

    ttm must be concrete (static step count).  State arrays are (nb_path,).
    Per-step normals are derived from ``key`` by folding in the step index.
    Jitted with the model params traced, so repricing over perturbed params
    reuses one compiled program per (ttm, path-count).
    """
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    sqrt_dt = float(np.sqrt(dt))
    rho_1 = jnp.sqrt(1.0 - rho * rho)
    nb_path = x0.shape[0]
    carry_dtype = x0.dtype

    draw = antithetic_step_normals if antithetic else step_normals

    def step(carry, step_idx):
        x, var, qvar = carry
        w = draw(key, step_idx, (2, nb_path), dtype=dtype) * sqrt_dt
        w0, w1 = w[0], w[1]
        sigma = jnp.sqrt(var)
        var_dt = var * dt
        x = x - 0.5 * var_dt + sigma * w0
        qvar = qvar + var_dt
        var = var + kappa * (theta - var) * dt + sigma * volvol * (rho * w0 + rho_1 * w1)
        var = jnp.maximum(var, VAR_FLOOR)
        # params may be traced at a wider dtype than the state (e.g. f64
        # params driving an f32 simulation); keep the carry dtype stable
        return (x.astype(carry_dtype), var.astype(carry_dtype),
                qvar.astype(carry_dtype)), None

    (x, var, qvar), _ = jax.lax.scan(step, (x0, var0, qvar0),
                                     jnp.arange(nb_steps), unroll=4)
    return x, var, qvar


@partial(jax.jit, static_argnames=("dt", "dtype", "nb_replicates"))
def _simulate_heston_terminal_qmc_core(v_tot: Array,
                                       shift_tot: Array,
                                       v_steps: Array,
                                       shifts: Array,
                                       x0: Array,
                                       var0: Array,
                                       qvar0: Array,
                                       dt: float,
                                       theta,
                                       kappa,
                                       rho,
                                       volvol,
                                       dtype=jnp.float64,
                                       nb_replicates: int = 0
                                       ) -> Tuple[Array, Array, Array]:
    """QMC variant of ``simulate_heston_terminal``: identical full-truncation
    Euler, normals from randomized Sobol columns generated inside the scan
    with each Brownian stream's slice-total stratified onto the slice's
    leading dims (ops/qmc.py stratified_increment_shift; two passes — the
    raw columns are re-generated to accumulate their sums, nothing is
    materialized).  ``nb_replicates=R > 0`` makes the path axis R contiguous
    replicate groups of one Sobol point set under independent digital
    shifts (see the LogSV twin for details)."""
    from stochvolmodels_tpu.ops.qmc import (gray_codes, qmc_step_normals,
                                            replicated_gray_codes,
                                            stratified_increment_shift)

    nb_steps = v_steps.shape[0]
    sqrt_dt = float(np.sqrt(dt))
    rho_1 = jnp.sqrt(1.0 - rho * rho)
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
        x, var, qvar = carry
        z0, z1 = qmc_step_normals(gray, v_step, expand(shift_step), dtype)
        w0, w1 = (z0 + c0) * sqrt_dt, (z1 + c1) * sqrt_dt
        sigma = jnp.sqrt(var)
        var_dt = var * dt
        x = x - 0.5 * var_dt + sigma * w0
        qvar = qvar + var_dt
        var = var + kappa * (theta - var) * dt + sigma * volvol * (rho * w0 + rho_1 * w1)
        var = jnp.maximum(var, VAR_FLOOR)
        return (x.astype(carry_dtype), var.astype(carry_dtype),
                qvar.astype(carry_dtype)), None

    (x, var, qvar), _ = jax.lax.scan(step, (x0, var0, qvar0),
                                     (v_steps, shifts), unroll=2)
    return x, var, qvar


def simulate_heston_terminal_qmc(key: jax.Array,
                                 x0: Array,
                                 var0: Array,
                                 qvar0: Array,
                                 ttm: float,
                                 theta,
                                 kappa,
                                 rho,
                                 volvol,
                                 nb_steps_per_year: int = 360,
                                 dtype=jnp.float64,
                                 dim_offset: int = 0,
                                 nb_replicates: int = 0
                                 ) -> Tuple[Array, Array, Array]:
    """terminal (x, var, qvar) by randomized quasi-Monte Carlo: path i is
    Sobol point i; the slice's first two dims stratify each Brownian
    stream's total, the rest map to steps.  ``dim_offset`` continues the
    sequence across chained maturities; ``nb_replicates`` runs R
    independently-randomized replicate groups (see ops/qmc.py)."""
    from stochvolmodels_tpu.ops.qmc import qmc_scan_panels

    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    v_tot, shift_tot, v_steps, shifts = qmc_scan_panels(
        key, nb_steps, per_step=2, dim_offset=dim_offset,
        nb_replicates=nb_replicates)
    return _simulate_heston_terminal_qmc_core(
        v_tot, shift_tot, v_steps, shifts, x0, var0, qvar0, dt=float(dt),
        theta=theta, kappa=kappa, rho=rho, volvol=volvol, dtype=dtype,
        nb_replicates=nb_replicates)


def heston_mc_chain_pricer(ttms: np.ndarray,
                           forwards: np.ndarray,
                           discfactors: np.ndarray,
                           strikes_ttms,
                           optiontypes_ttms,
                           v0: float,
                           theta: float,
                           kappa: float,
                           rho: float,
                           volvol: float,
                           nb_path: int = 100000,
                           variable_type: VariableType = VariableType.LOG_RETURN,
                           seed=None,
                           dtype=jnp.float64,
                           engine: str = "scan",
                           antithetic: bool = False,
                           qmc_replicates: int = 8
                           ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """chain MC with terminal state carried across maturities
    (heston_pricer.py:265-309).  Returns ragged (prices, stderrs) lists.

    ``engine='pallas'`` runs each slice through the on-chip-PRNG Pallas
    kernel (float32); 'scan' (default) keeps the reference-parity f64 path.
    ``engine='qmc'`` uses randomized Sobol normals (ops/qmc.py) — near
    O(1/N) error on smooth payoffs; the path budget is split into
    ``qmc_replicates`` independently-randomized replicate groups and the
    reported stds are the standard error over replicate means (honest
    RQMC error; ``qmc_replicates=0`` keeps one unreplicated sequence with
    upper-bound iid stds).  ``nb_path`` is silently padded up to a multiple
    of ``qmc_replicates``; each replicate is a shorter Sobol set, trading a
    little point-estimate accuracy for the honest confidence interval.
    ``antithetic=True`` (scan engine only) couples path i with i + P/2 by
    mirrored Brownian increments; stderr is over pair averages."""
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
    key = key_from_seed(seed)
    if engine == "pallas":
        from stochvolmodels_tpu.ops.pallas_mc import (
            pallas_engine_setup, simulate_heston_terminal_pallas)
        nb_pad, base_seed, on_cpu = pallas_engine_setup(seed, nb_path)
        x = jnp.zeros(nb_pad, dtype=jnp.float32)
        var = jnp.full(nb_pad, v0, dtype=jnp.float32)
        qvar = jnp.zeros(nb_pad, dtype=jnp.float32)
        ttm0 = 0.0
        option_prices_ttm, option_std_ttm = [], []
        for i, ttm in enumerate(ttms):
            x, var, qvar = simulate_heston_terminal_pallas(
                seed=base_seed + 7919 * i, x0=x, var0=var, qvar0=qvar,
                ttm=float(ttm - ttm0), theta=theta, kappa=kappa, rho=rho,
                volvol=volvol, interpret=on_cpu)
            ttm0 = float(ttm)
            prices, stds = compute_mc_vars_payoff(
                x0=x[:nb_path], sigma0=jnp.sqrt(var[:nb_path]),
                qvar0=qvar[:nb_path], ttm=ttm, forward=forwards[i],
                strikes_ttm=jnp.asarray(strikes_ttms[i]),
                optiontypes_ttm=optiontypes_ttms[i],
                discfactor=discfactors[i], variable_type=variable_type)
            option_prices_ttm.append(np.asarray(prices))
            option_std_ttm.append(np.asarray(stds))
        return option_prices_ttm, option_std_ttm
    x = jnp.zeros(nb_path, dtype=dtype)
    var = jnp.full(nb_path, v0, dtype=dtype)
    qvar = jnp.zeros(nb_path, dtype=dtype)
    ttm0 = 0.0
    dim_offset = 0
    option_prices_ttm, option_std_ttm = [], []
    for i, ttm in enumerate(ttms):
        if engine == "qmc":
            from stochvolmodels_tpu.ops.qmc import qmc_dims_per_slice

            x, var, qvar = simulate_heston_terminal_qmc(
                key=key, x0=x, var0=var, qvar0=qvar, ttm=float(ttm - ttm0),
                theta=theta, kappa=kappa, rho=rho, volvol=volvol, dtype=dtype,
                dim_offset=dim_offset, nb_replicates=qmc_replicates)
            dim_offset += qmc_dims_per_slice(set_time_grid(
                ttm=float(ttm - ttm0), nb_steps_per_year=360)[0])
        else:
            slice_key = jax.random.fold_in(key, i)
            x, var, qvar = simulate_heston_terminal(
                key=slice_key, x0=x, var0=var, qvar0=qvar, ttm=float(ttm - ttm0),
                theta=theta, kappa=kappa, rho=rho, volvol=volvol, dtype=dtype,
                antithetic=antithetic)
        ttm0 = float(ttm)
        prices, stds = compute_mc_vars_payoff(
            x0=x, sigma0=jnp.sqrt(var), qvar0=qvar, ttm=ttm,
            forward=forwards[i], strikes_ttm=jnp.asarray(strikes_ttms[i]),
            optiontypes_ttm=optiontypes_ttms[i],
            discfactor=discfactors[i], variable_type=variable_type,
            antithetic=antithetic, nb_replicates=qmc_replicates)
        option_prices_ttm.append(np.asarray(prices))
        option_std_ttm.append(np.asarray(stds))
    return option_prices_ttm, option_std_ttm


# ----------------------------------------------------------------------------
# pricer class
# ----------------------------------------------------------------------------

class HestonPricer(ModelPricer):
    """ModelPricer for Heston, valued by Fourier inversion of the analytic MGF."""

    def compute_chain_greeks(self, option_chain: OptionChain,
                             params: HestonParams,
                             greeks=("delta", "gamma", "vega"),
                             **kwargs):
        """model-consistent chain greeks by AD through the analytic pricer;
        see models/greeks.py (beyond-reference feature — the reference only
        has BSM-formula greeks, bsm.py:148-384)."""
        from stochvolmodels_tpu.models.greeks import heston_chain_greeks
        return heston_chain_greeks(option_chain=option_chain, params=params,
                                   greeks=greeks, **kwargs)

    def price_chain(self, option_chain: OptionChain, params: HestonParams,
                    variable_type: VariableType = VariableType.LOG_RETURN,
                    vol_scaler: Optional[float] = None,
                    precision: str = "exact",
                    **kwargs) -> List[np.ndarray]:
        """``precision='fast'`` evaluates the closed-form Riccati MGF in
        float32 with the Fourier quadrature kept f64 (~8e-6 relative — the
        all-f32 path's 2.8e-5 error was dominated by the f32 quadrature
        sum, PARITY.md "Fourier fast floors"); 'exact' (default) is the
        f64 reference-parity path."""
        grid = option_chain.to_grid()
        if vol_scaler is None:
            vol_scaler = float(np.minimum(0.3, np.sqrt(params.v0 * float(grid.ttms[0]))))
        if precision == "fast":
            prices = _heston_chain_price_grid_jit(
                grid, params.v0, params.theta, params.kappa, params.volvol,
                params.rho, vol_scaler, variable_type, True)
        elif precision == "exact":
            prices = _heston_chain_price_grid_jit(
                grid, params.v0, params.theta, params.kappa, params.volvol,
                params.rho, vol_scaler, variable_type)
        else:
            raise NotImplementedError(f"precision={precision}")
        return option_chain.unpad_panel(prices)

    def compute_model_ivols_for_chain(self, option_chain: OptionChain,
                                      params: HestonParams,
                                      precision: str = "exact",
                                      **kwargs) -> List[np.ndarray]:
        """``precision='fast'`` fuses the mixed-precision chain reprice
        (f32 MGF, f64 quadrature) and the f64 bisect+Newton BSM inversion
        into ONE device program (single dispatch + host fetch — the
        latency-optimal form on a remote TPU); 'exact' keeps the generic
        price-then-invert path."""
        if precision != "fast":
            return super().compute_model_ivols_for_chain(
                option_chain=option_chain, params=params,
                precision=precision, **kwargs)
        variable_type = kwargs.pop("variable_type", VariableType.LOG_RETURN)
        vol_scaler = kwargs.pop("vol_scaler", None)
        grid = option_chain.to_grid()
        if vol_scaler is None:
            vol_scaler = float(np.minimum(0.3, np.sqrt(params.v0 * float(grid.ttms[0]))))
        vols = _heston_chain_ivols_grid_jit(
            grid, params.v0, params.theta, params.kappa, params.volvol,
            params.rho, vol_scaler, variable_type, True)
        return option_chain.unpad_panel(vols)

    def model_mc_price_chain(self, option_chain: OptionChain, params: HestonParams,
                             nb_path: int = 100000,
                             variable_type: VariableType = VariableType.LOG_RETURN,
                             seed=None,
                             **kwargs) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        return heston_mc_chain_pricer(ttms=option_chain.ttms,
                                      forwards=option_chain.forwards,
                                      discfactors=option_chain.discfactors,
                                      strikes_ttms=option_chain.strikes_ttms,
                                      optiontypes_ttms=option_chain.optiontypes_ttms,
                                      v0=params.v0, theta=params.theta,
                                      kappa=params.kappa, rho=params.rho,
                                      volvol=params.volvol, nb_path=nb_path,
                                      variable_type=variable_type, seed=seed,
                                      engine=kwargs.get('engine', 'scan'),
                                      antithetic=kwargs.get('antithetic', False))

    @timer
    def simulate_terminal_values(self, params: HestonParams, ttm: float = 1.0,
                                 nb_path: int = 100000, seed=None, **kwargs
                                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        key = key_from_seed(seed)
        x, var, qvar = simulate_heston_terminal(
            key=key, x0=jnp.zeros(nb_path), var0=params.v0 * jnp.ones(nb_path),
            qvar0=jnp.zeros(nb_path), ttm=ttm, theta=params.theta,
            kappa=params.kappa, rho=params.rho, volvol=params.volvol)
        return np.asarray(x), np.asarray(var), np.asarray(qvar)

    @timer
    def calibrate_model_params_to_chain(self,
                                        option_chain: OptionChain,
                                        params0: HestonParams = None,
                                        is_vega_weighted: bool = True,
                                        is_unit_ttm_vega: bool = False,
                                        use_float32: Optional[bool] = None,
                                        **kwargs) -> HestonParams:
        """SLSQP fit of (v0, theta, kappa, rho, volvol) with the Feller
        inequality, using jax gradients through pricer + IV inversion
        (heston_pricer.py:109-166 replaces finite differences).

        ``use_float32`` (default: True on TPU) traces the objective in
        float32 — v5e has no native f64."""
        if use_float32 is None:
            use_float32 = jax.devices()[0].platform != "cpu"
        method = kwargs.pop('method', 'slsqp')
        if method not in ('slsqp', 'lm'):
            raise ValueError(f"method must be 'slsqp' or 'lm', got {method!r}")
        if params0 is not None:
            p0 = params0.to_array()
        else:
            p0 = np.array([0.1, 0.1, 2.0, -0.2, 1.0])
        bounds = ((0.01, 2.0), (0.01, 2.0), (0.1, 30.0), (-0.99, 0.99), (0.1, 5.0))

        grid = option_chain.to_grid()
        mid_vols = option_chain.get_mid_vols()
        market_vols, _ = _pad_like(mid_vols, grid)
        if is_vega_weighted:
            vegas_ttms = option_chain.get_chain_vegas(is_unit_ttm_vega=is_unit_ttm_vega)
            vegas_ttms = [v / np.sum(v) for v in vegas_ttms]
            weights, _ = _pad_like(vegas_ttms, grid)
        else:
            weights = np.ones_like(market_vols)
        weights = jnp.asarray(np.where(np.asarray(grid.mask), weights, 0.0))
        market_vols = jnp.asarray(np.where(np.asarray(grid.mask), market_vols, 0.0))
        if use_float32:
            from stochvolmodels_tpu.models.logsv.pricer import _grid_to_f32
            grid = _grid_to_f32(grid)
            weights = weights.astype(jnp.float32)
            market_vols = market_vols.astype(jnp.float32)
        # freeze the transform grid across iterations (reference contract,
        # heston_pricer.py:221 via logsv_pricer.py:194-203)
        vol_scaler = float(np.minimum(0.3, np.sqrt(p0[0] * option_chain.ttms[0])))

        if method == 'lm':
            # on-device Levenberg-Marquardt: the whole fit in one jit
            # dispatch (ops/lm.py); Feller enters as a penalty residual
            dtype = jnp.float32 if use_float32 else jnp.float64
            best, _ = _heston_lm_run(
                jnp.asarray(p0, dtype=dtype), grid,
                market_vols.astype(dtype), jnp.sqrt(weights).astype(dtype),
                jnp.asarray([b[0] for b in bounds], dtype=dtype),
                jnp.asarray([b[1] for b in bounds], dtype=dtype),
                jnp.asarray(vol_scaler, dtype=dtype),
                nb_iters=kwargs.pop('nb_iters', 16), use_float32=use_float32)
            best = np.asarray(best, dtype=np.float64)
            return HestonParams(v0=best[0], theta=best[1], kappa=best[2],
                                rho=best[3], volvol=best[4])
        loss = partial(_heston_calibration_objective, grid=grid,
                       market_vols=market_vols, weights=weights,
                       vol_scaler=vol_scaler)
        if use_float32:
            base_loss = loss

            def loss(pars):
                with jax.enable_x64(False):
                    return base_loss(pars.astype(jnp.float32))

        obj_and_grad = jax.jit(jax.value_and_grad(loss))

        def objective(pars: np.ndarray) -> Tuple[float, np.ndarray]:
            v, g = obj_and_grad(jnp.asarray(pars))
            return float(v), np.asarray(g, dtype=np.float64)

        def feller(pars: np.ndarray) -> float:
            return 2.0 * pars[2] * pars[1] - pars[4] * pars[4]

        constraints = ({'type': 'ineq', 'fun': feller,
                        'jac': lambda p: np.array([0.0, 2.0 * p[2], 2.0 * p[1], 0.0, -2.0 * p[4]])})
        options = {'ftol': 1e-6 if use_float32 else 1e-8, 'maxiter': 200}
        res = minimize(objective, p0, jac=True, method='SLSQP',
                       constraints=constraints, bounds=bounds, options=options)
        v0, theta, kappa, rho, volvol = res.x
        return HestonParams(v0=v0, theta=theta, kappa=kappa, rho=rho, volvol=volvol)



@partial(jax.jit, static_argnames=("nb_iters", "use_float32"))
def _heston_lm_run(p0, grid, market, sqrtw, lower, upper, vol_scaler, *,
                   nb_iters, use_float32):
    """whole Heston LM fit in one dispatch; see ops/lm.py."""
    def _run():
        def residuals(pars):
            v0, theta, kappa, rho, volvol = (pars[0], pars[1], pars[2],
                                             pars[3], pars[4])
            prices = heston_chain_price_grid(grid, v0=v0, theta=theta,
                                             kappa=kappa, volvol=volvol,
                                             rho=rho, vol_scaler=vol_scaler)
            vols = bsm.infer_bsm_implied_vol_fast(
                forward=grid.forwards[:, None], ttm=grid.ttms[:, None],
                strike=grid.strikes, given_price=prices,
                discfactor=grid.discfactors[:, None],
                optiontype=grid.optioncodes)
            nan_mask = jnp.isnan(vols)
            clean = jnp.where(nan_mask, market, vols)
            r = (sqrtw * (clean - market)).ravel()
            # Feller inequality 2*kappa*theta >= volvol^2 as a one-sided
            # penalty residual (the SLSQP path enforces it as an SLSQP
            # inequality constraint)
            feller = jnp.maximum(volvol * volvol - 2.0 * kappa * theta, 0.0)
            return jnp.concatenate([r, jnp.sqrt(10.0) * feller[None]])

        return lm.lm_minimize(residuals, p0, lower, upper, nb_iters=nb_iters)

    if use_float32:
        with jax.enable_x64(False):
            return _run()
    return _run()


def _pad_like(ragged, grid: ChainGrid) -> Tuple[np.ndarray, np.ndarray]:
    """pad a ragged list to the grid's (T, K) panel with zeros."""
    t, k = grid.mask.shape
    out = np.zeros((t, k))
    for i, a in enumerate(ragged):
        out[i, :len(a)] = np.asarray(a)
    return out, np.asarray(grid.mask)


def _heston_calibration_objective(pars: Array, grid: ChainGrid,
                                  market_vols: Array, weights: Array,
                                  vol_scaler: float) -> Array:
    """vega-weighted sum of squared IV residuals; NaN residuals dropped
    (nansum semantics of heston_pricer.py:145)."""
    v0, theta, kappa, rho, volvol = pars[0], pars[1], pars[2], pars[3], pars[4]
    prices = heston_chain_price_grid(grid, v0=v0, theta=theta, kappa=kappa,
                                     volvol=volvol, rho=rho, vol_scaler=vol_scaler)
    model_vols = bsm.infer_bsm_ivols_from_model_chain_prices(
        ttms=grid.ttms, forwards=grid.forwards, discfactors=grid.discfactors,
        strikes_ttms=grid.strikes, optiontypes_ttms=grid.optioncodes,
        model_prices_ttms=prices)
    nan_mask = jnp.isnan(model_vols)
    clean = jnp.where(nan_mask, market_vols, model_vols)
    resid = weights * jnp.square(clean - market_vols)
    return jnp.sum(jnp.where(nan_mask, 0.0, resid))


@partial(jax.jit, static_argnums=(7, 8))
def _heston_chain_price_grid_jit(grid, v0, theta, kappa, volvol, rho,
                                 vol_scaler, variable_type, solve_f32=False):
    return heston_chain_price_grid(grid, v0=v0, theta=theta, kappa=kappa,
                                   volvol=volvol, rho=rho, vol_scaler=vol_scaler,
                                   variable_type=variable_type,
                                   solve_f32=solve_f32)


@partial(jax.jit, static_argnums=(7, 8))
def _heston_chain_ivols_grid_jit(grid, v0, theta, kappa, volvol, rho,
                                 vol_scaler, variable_type, solve_f32=False):
    """fused chain reprice + BSM implied-vol inversion, one device program
    (the short bisect+Newton solver, ops/bsm.py infer_bsm_implied_vol_fast)."""
    prices = heston_chain_price_grid(grid, v0=v0, theta=theta, kappa=kappa,
                                     volvol=volvol, rho=rho,
                                     vol_scaler=vol_scaler,
                                     variable_type=variable_type,
                                     solve_f32=solve_f32)
    vols = bsm.infer_bsm_implied_vol_fast(
        forward=grid.forwards[:, None], ttm=grid.ttms[:, None],
        strike=grid.strikes, given_price=prices,
        discfactor=grid.discfactors[:, None], optiontype=grid.optioncodes)
    return grid.masked(vols)


def v0_implied(v0: float, volvol: float, ttm: float) -> float:
    """short-maturity v0 adjustment placeholder (heston_pricer.py:362-368)."""
    return v0 - volvol * volvol * ttm / 8.0
