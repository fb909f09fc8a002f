"""
Hawkes jump-diffusion pricer with self- and cross-exciting jump intensities
(Liu, Packham & Sepp 2025, arXiv:2510.21297).

TPU rebuild of /root/reference/stochvolmodels/pricers/hawkes_jd_pricer.py.
The model is affine: the MGF solves a 3-dim complex Riccati system with the
jump-size MGFs evaluated at shifted transforms.  Where the reference loops
500 ``scipy.solve_ivp`` calls per maturity (hawkes_jd_pricer.py:553-581),
the system is integrated for the whole grid at once by batched RK4 on
(re, im) pairs.  Monte Carlo uses intensity thinning at 1800 steps/yr under
``lax.scan`` with stateless uniforms/exponentials.
"""
from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any, Dict, List, Optional, Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.option_chain import ChainGrid, OptionChain
from stochvolmodels_tpu.models.model_pricer import ModelParams, ModelPricer
from stochvolmodels_tpu.ops import bsm, mgf
from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff
from stochvolmodels_tpu.ops.random import key_from_seed
from stochvolmodels_tpu.utils.cplx import Cplx, cexp, cexpm1
from stochvolmodels_tpu.utils.funcs import set_time_grid, timer, to_flat_np_array

Array = jnp.ndarray

MAX_PHI = 500  # transform grid size (hawkes_jd_pricer.py:40)
MC_STEPS_PER_YEAR = 5 * 360  # small dt for large intensities (:756)


@dataclass
class HawkesJDParams(ModelParams):
    """2-factor Hawkes JD parameters; BTC daily-frequency defaults
    (hawkes_jd_pricer.py:43-121)."""
    mu: float = 0.0
    sigma: float = 0.45
    shift_p: float = 0.06
    mean_p: float = 0.03
    shift_m: float = -0.06
    mean_m: float = -0.03
    lambda_p: float = 6.55
    theta_p: float = 6.55
    kappa_p: float = 22.29
    beta1_p: float = 76.0
    beta2_p: float = -67.58
    lambda_m: float = 8.50
    theta_m: float = 8.50
    kappa_m: float = 29.0
    beta1_m: float = 104.55
    beta2_m: float = -109.6
    risk_premia_gamma: Optional[float] = None

    def __post_init__(self):
        self.compensator_p = np.exp(self.shift_p) / (1.0 - self.mean_p) - 1.0
        self.compensator_m = np.exp(self.shift_m) / (1.0 - self.mean_m) - 1.0

    def to_dict(self) -> Dict[str, Any]:
        d = asdict(self)
        d.pop('compensator_p', None)
        d.pop('compensator_m', None)
        return d

    def print(self) -> None:
        for k, v in self.to_dict().items():
            print(f"{k}={v}")
        print('conditions')
        print(f"jump1={self.jump1_cond:0.4f} > 0")
        print(f"jump2={self.jump2_cond:0.4f} > 0")

    @property
    def exp_jump_p(self) -> float:
        return self.shift_p + self.mean_p

    @property
    def exp_jump_m(self) -> float:
        return self.shift_m + self.mean_m

    @property
    def jump1_cond(self) -> float:
        """stationarity margin of the positive-jump intensity."""
        return self.kappa_p - self.beta1_p * self.exp_jump_p - self.beta2_p * self.exp_jump_m

    @property
    def jump2_cond(self) -> float:
        """stationarity margin of the negative-jump intensity."""
        return self.kappa_m - self.beta2_m * self.exp_jump_m - self.beta1_m * self.exp_jump_p

    @property
    def jumps_var_p(self) -> float:
        return float(np.square(self.shift_p) + np.square(self.mean_p))

    @property
    def jumps_var_m(self) -> float:
        return float(np.square(self.shift_m) + np.square(self.mean_m))


def set_vol_scaler(sigma0: float, ttm: float) -> float:
    """grid scaler clipped to [0.2, 0.5] (hawkes_jd_pricer.py:363-365)."""
    return np.clip(sigma0, 0.2, 0.5) * np.sqrt(np.minimum(ttm, 1.0 / 12.0))


# ----------------------------------------------------------------------------
# Riccati ODE over the transform grid
# ----------------------------------------------------------------------------

def _hawkes_rhs(A: Cplx, phi: Cplx, psi: Cplx, p: Dict[str, float]) -> Cplx:
    """Riccati RHS for the whole (N, 3) panel (hawkes_jd_pricer.py:610-629)."""
    a1 = Cplx(A.re[:, 1], A.im[:, 1])
    a2 = Cplx(A.re[:, 2], A.im[:, 2])

    def jump_mgf_minus_one(shift, mean, arg: Cplx) -> Cplx:
        # e^{-s a}/(1 + m a) - 1 = (expm1(-s a) - m a)/(1 + m a): the
        # cancellation-free form.  In f32 the naive cexp(.)/(1+ma) - 1
        # loses ~5e-5 absolute near the arg~0 lanes, which integrates to a
        # ~8e-5 relative price error over the Riccati solve; this form
        # cuts the fast path's solve error to ~1e-5 at identical op count
        # (scripts/hawkes_fast_floor.py, PARITY.md "Hawkes fast floor").
        ma = arg * mean
        return (cexpm1(arg * (-shift)) - ma) / (ma + 1.0)

    arg_p = phi - a1 * p['beta1_p'] - a2 * p['beta1_m']
    arg_m = phi - a1 * p['beta2_p'] - a2 * p['beta2_m']
    j_p = jump_mgf_minus_one(p['shift_p'], p['mean_p'], arg_p)
    j_m = jump_mgf_minus_one(p['shift_m'], p['mean_m'], arg_m)

    sigma2 = p['sigma'] * p['sigma']
    r0 = (a1 * (p['kappa_p'] * p['theta_p']) + a2 * (p['kappa_m'] * p['theta_m'])
          + (phi * (phi + 1.0) * 0.5 - psi) * sigma2)
    r1 = j_p - a1 * p['kappa_p'] + phi * p['compensator_p']
    r2 = j_m - a2 * p['kappa_m'] + phi * p['compensator_m']
    return Cplx(jnp.stack([r0.re, r1.re, r2.re], axis=1),
                jnp.stack([r0.im, r1.im, r2.im], axis=1))


def solve_a_ode_grid(phi_grid: Cplx,
                     ttm: float,
                     model_params: HawkesJDParams,
                     psi_grid: Optional[Cplx] = None,
                     a_t0: Optional[Cplx] = None,
                     nb_steps: Optional[int] = None,
                     year_steps: int = 1440
                     ) -> Cplx:
    """batched RK4 for the Riccati system over the Phi grid.

    Replaces the reference's per-point solve_ivp loop; validated against a
    tight-tolerance scipy solve in tests/test_hawkes.py.
    """
    n_grid = phi_grid.shape[0]
    if psi_grid is None:
        psi_grid = Cplx(jnp.zeros(n_grid), jnp.zeros(n_grid))
    if a_t0 is None:
        a_t0 = Cplx(jnp.zeros((n_grid, 3)), jnp.zeros((n_grid, 3)))
    if nb_steps is None:
        nb_steps = max(int(np.ceil(year_steps * float(ttm))), 16)
    dt = float(ttm) / nb_steps

    p = {k: model_params.to_dict()[k] for k in
         ('sigma', 'shift_p', 'mean_p', 'shift_m', 'mean_m', 'kappa_p',
          'theta_p', 'beta1_p', 'beta2_p', 'kappa_m', 'theta_m', 'beta1_m',
          'beta2_m')}
    p['compensator_p'] = model_params.compensator_p
    p['compensator_m'] = model_params.compensator_m
    return _solve_a_ode_grid_p(phi_grid, psi_grid, a_t0, nb_steps, dt, p)


def _solve_a_ode_grid_p(phi_grid: Cplx, psi_grid: Cplx, a_t0: Cplx,
                        nb_steps: int, dt: float, p: Dict) -> Cplx:
    """RK4 core over a params DICT — values may be traced jax scalars, so
    the on-device LM can differentiate through the Riccati solve."""

    def rk4_step(carry, _):
        a_re, a_im = carry
        A = Cplx(a_re, a_im)
        k1 = _hawkes_rhs(A, phi_grid, psi_grid, p)
        k2 = _hawkes_rhs(A + k1 * (0.5 * dt), phi_grid, psi_grid, p)
        k3 = _hawkes_rhs(A + k2 * (0.5 * dt), phi_grid, psi_grid, p)
        k4 = _hawkes_rhs(A + k3 * dt, phi_grid, psi_grid, p)
        A1 = A + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (dt / 6.0)
        return (A1.re, A1.im), None

    (a_re, a_im), _ = jax.lax.scan(rk4_step, (a_t0.re, a_t0.im),
                                   None, length=nb_steps)
    return Cplx(a_re, a_im)


def compute_hawkes_a_mgf_grid(ttm: float,
                              phi_grid: Cplx,
                              model_params: HawkesJDParams,
                              psi_grid: Optional[Cplx] = None,
                              a_t0: Optional[Cplx] = None,
                              year_steps: int = 1440,
                              **kwargs
                              ) -> Tuple[Cplx, Cplx]:
    """(A(tau), log MGF = A0 + A1 lambda_p + A2 lambda_m)
    (hawkes_jd_pricer.py:521-549)."""
    a_t1 = solve_a_ode_grid(phi_grid=phi_grid, psi_grid=psi_grid, ttm=ttm,
                            model_params=model_params, a_t0=a_t0,
                            year_steps=year_steps)
    log_mgf = Cplx(a_t1.re[:, 0] + a_t1.re[:, 1] * model_params.lambda_p
                   + a_t1.re[:, 2] * model_params.lambda_m,
                   a_t1.im[:, 0] + a_t1.im[:, 1] * model_params.lambda_p
                   + a_t1.im[:, 2] * model_params.lambda_m)
    return a_t1, log_mgf


# ----------------------------------------------------------------------------
# chain pricers
# ----------------------------------------------------------------------------

def hawkesjd_chain_pricer(model_params: HawkesJDParams,
                          ttms: np.ndarray,
                          forwards: np.ndarray,
                          discfactors: np.ndarray,
                          strikes_ttms,
                          optiontypes_ttms,
                          is_spot_measure: bool = True,
                          variable_type: VariableType = VariableType.LOG_RETURN,
                          vol_scaler: Optional[float] = None,
                          year_steps: int = 1440,
                          **kwargs) -> List[np.ndarray]:
    """Fourier chain pricing with chained ODE state (hawkes_jd_pricer.py:368-420)."""
    if variable_type != VariableType.LOG_RETURN:
        raise NotImplementedError
    if vol_scaler is None:
        vol_scaler = set_vol_scaler(sigma0=model_params.sigma, ttm=np.min(ttms))
    phi_grid, _, _ = mgf.get_transform_var_grid(variable_type=variable_type,
                                                max_phi=MAX_PHI,
                                                vol_scaler=vol_scaler)
    a_t0 = None
    ttm0 = 0.0
    out = []
    for ttm, forward, discfactor, strikes, types in zip(ttms, forwards,
                                                        discfactors,
                                                        strikes_ttms,
                                                        optiontypes_ttms):
        a_t0, log_mgf = compute_hawkes_a_mgf_grid(ttm=float(ttm - ttm0),
                                                  phi_grid=phi_grid,
                                                  model_params=model_params,
                                                  a_t0=a_t0,
                                                  year_steps=year_steps)
        prices = mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=float(forward),
            strikes=np.asarray(strikes), optiontypes=types,
            discfactors=float(discfactor), is_spot_measure=is_spot_measure)
        out.append(np.asarray(prices))
        ttm0 = float(ttm)
    return out


def hawkesjd_forwards_under_risk_kernel(model_params: HawkesJDParams,
                                        risk_premia_gamma: float,
                                        ttms: np.ndarray,
                                        forwards: np.ndarray,
                                        **kwargs
                                        ) -> Tuple[np.ndarray, np.ndarray]:
    """normalizers and gamma-forwards from the real MGF at -gamma and -gamma-1
    (hawkes_jd_pricer.py:490-518)."""
    phi0 = Cplx(jnp.array([-risk_premia_gamma]), jnp.array([0.0]))
    phi1 = Cplx(jnp.array([-risk_premia_gamma - 1.0]), jnp.array([0.0]))
    normalizers, gamma_forwards = np.ones_like(ttms), np.ones_like(ttms)
    for idx, (ttm, forward) in enumerate(zip(ttms, forwards)):
        _, lm0 = compute_hawkes_a_mgf_grid(ttm=float(ttm), phi_grid=phi0,
                                           model_params=model_params)
        _, lm1 = compute_hawkes_a_mgf_grid(ttm=float(ttm), phi_grid=phi1,
                                           model_params=model_params)
        normalizer = 1.0 / np.exp(float(lm0.re[0]))
        gamma_forwards[idx] = forward * np.exp(float(lm1.re[0])) * normalizer
        normalizers[idx] = normalizer
    return normalizers, gamma_forwards


def hawkesjd_chain_pricer_with_risk_premia(model_params: HawkesJDParams,
                                           ttms: np.ndarray,
                                           forwards: np.ndarray,
                                           discfactors: np.ndarray,
                                           strikes_ttms,
                                           optiontypes_ttms,
                                           is_spot_measure: bool = True,
                                           variable_type: VariableType = VariableType.LOG_RETURN,
                                           vol_scaler: Optional[float] = None,
                                           year_steps: int = 1440,
                                           **kwargs) -> List[np.ndarray]:
    """risk-premia-gamma chain pricing (hawkes_jd_pricer.py:423-487).

    NOTE: the K^(1+gamma) payoff kernel is only dimensionally consistent on
    forward-normalized chains (strikes ~ 1); pass the chain through
    ``OptionChain.to_forward_normalised_strikes`` first, as the reference's
    risk-premia studies do.  At gamma=0 this reduces exactly to the standard
    pricer.
    """
    if variable_type != VariableType.LOG_RETURN:
        raise NotImplementedError
    if vol_scaler is None:
        vol_scaler = set_vol_scaler(sigma0=model_params.sigma, ttm=np.min(ttms))
    gamma = model_params.risk_premia_gamma
    normalizers, gamma_forwards = hawkesjd_forwards_under_risk_kernel(
        model_params=model_params, forwards=forwards,
        risk_premia_gamma=gamma, ttms=ttms)
    phi_grid, _, _ = mgf.get_transform_var_grid(
        variable_type=variable_type, max_phi=MAX_PHI, vol_scaler=vol_scaler,
        real_phi=-0.5 - gamma)
    a_t0 = None
    ttm0 = 0.0
    out = []
    for ttm, forward, strikes, types, normalizer, gamma_forward in zip(
            ttms, forwards, strikes_ttms, optiontypes_ttms, normalizers,
            gamma_forwards):
        a_t0, log_mgf = compute_hawkes_a_mgf_grid(ttm=float(ttm - ttm0),
                                                  phi_grid=phi_grid,
                                                  model_params=model_params,
                                                  a_t0=a_t0,
                                                  year_steps=year_steps)
        prices = mgf.slice_pricer_with_mgf_grid_with_gamma(
            log_mgf_grid=log_mgf, phi_grid=phi_grid, risk_premia_gamma=gamma,
            ttm=float(ttm), forward=float(forward), normalizer=float(normalizer),
            gamma_forward=float(gamma_forward), strikes=np.asarray(strikes),
            optiontypes=types, is_spot_measure=is_spot_measure)
        out.append(np.asarray(prices))
        ttm0 = float(ttm)
    return out


# ----------------------------------------------------------------------------
# Monte Carlo with intensity thinning
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ttm", "nb_steps_per_year"))
def simulate_hawkesjd_terminal(key,
                               ttm: float,
                               x0: Array,
                               lambda_p0: Array,
                               lambda_m0: Array,
                               mu: float,
                               sigma: float,
                               shift_p: float,
                               mean_p: float,
                               shift_m: float,
                               mean_m: float,
                               theta_p: float,
                               kappa_p: float,
                               beta1_p: float,
                               beta2_p: float,
                               theta_m: float,
                               kappa_m: float,
                               beta1_m: float,
                               beta2_m: float,
                               nb_steps_per_year: int = MC_STEPS_PER_YEAR
                               ) -> Tuple[Array, Array, Array]:
    """Euler + thinning: a jump fires when lambda > -ln(U)/dt
    (hawkes_jd_pricer.py:718-779)."""
    nb_steps, dt, _ = set_time_grid(ttm=ttm, nb_steps_per_year=nb_steps_per_year)
    sdt = float(np.sqrt(dt))
    nb_path = x0.shape[0]
    compensator_p_dt = dt * (jnp.exp(shift_p) / (1.0 - mean_p) - 1.0)
    compensator_m_dt = dt * (jnp.exp(shift_m) / (1.0 - mean_m) - 1.0)
    drift_dt = (mu - 0.5 * sigma * sigma) * dt

    def step(carry, step_idx):
        x, lam_p, lam_m = carry
        k = jax.random.fold_in(key, step_idx)
        k0, k1, k2, k3, k4 = jax.random.split(k, 5)
        w0 = jax.random.normal(k0, (nb_path,)) * sdt
        u_p = -jnp.log(jax.random.uniform(k1, (nb_path,), minval=1e-16)) / dt
        u_m = -jnp.log(jax.random.uniform(k2, (nb_path,), minval=1e-16)) / dt
        j_p = shift_p + jax.random.exponential(k3, (nb_path,)) * mean_p
        j_m = shift_m - jax.random.exponential(k4, (nb_path,)) * (-mean_m)

        diffusion = drift_dt - compensator_p_dt * lam_p - compensator_m_dt * lam_m + sigma * w0
        jump_p = jnp.where(lam_p > u_p, j_p, 0.0)
        jump_m = jnp.where(lam_m > u_m, j_m, 0.0)
        x = x + diffusion + jump_p + jump_m
        load_p = beta1_p * jump_p + beta2_p * jump_m
        load_m = beta1_m * jump_p + beta2_m * jump_m
        lam_p = lam_p + kappa_p * (theta_p - lam_p) * dt + load_p
        lam_m = lam_m + kappa_m * (theta_m - lam_m) * dt + load_m
        return (x, lam_p, lam_m), None

    (x, lam_p, lam_m), _ = jax.lax.scan(step, (x0, lambda_p0, lambda_m0),
                                        jnp.arange(nb_steps), unroll=2)
    return x, lam_p, lam_m


def hawkesjd_mc_chain_pricer(ttms: np.ndarray,
                             forwards: np.ndarray,
                             discfactors: np.ndarray,
                             strikes_ttms,
                             optiontypes_ttms,
                             lambda_p: float,
                             lambda_m: float,
                             mu: float,
                             sigma: float,
                             shift_p: float,
                             mean_p: float,
                             shift_m: float,
                             mean_m: float,
                             theta_p: float,
                             kappa_p: float,
                             beta1_p: float,
                             beta2_p: float,
                             theta_m: float,
                             kappa_m: float,
                             beta1_m: float,
                             beta2_m: float,
                             risk_premia_gamma: float = 0.0,
                             nb_path: int = 100000,
                             variable_type: VariableType = VariableType.LOG_RETURN,
                             seed=None,
                             **kwargs
                             ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """chain MC with state carried across maturities (hawkes_jd_pricer.py:647-714).

    ``engine='pallas'`` (kwargs) runs each slice through the on-chip-PRNG
    thinning kernel (float32); 'scan' (default) keeps the f64 path."""
    engine = kwargs.get("engine", "scan")
    if engine not in ("scan", "pallas"):
        raise NotImplementedError(f"engine={engine}")
    key = key_from_seed(seed)
    sim_params = dict(mu=mu, sigma=sigma, shift_p=shift_p, mean_p=mean_p,
                      shift_m=shift_m, mean_m=mean_m, theta_p=theta_p,
                      kappa_p=kappa_p, beta1_p=beta1_p, beta2_p=beta2_p,
                      theta_m=theta_m, kappa_m=kappa_m, beta1_m=beta1_m,
                      beta2_m=beta2_m)
    if engine == "pallas":
        from stochvolmodels_tpu.ops.pallas_mc import (
            pallas_engine_setup, simulate_hawkesjd_terminal_pallas)
        nb_real = nb_path
        nb_path, base_seed, on_cpu = pallas_engine_setup(seed, nb_path)
    x = jnp.zeros(nb_path, dtype=jnp.float32 if engine == "pallas" else None)
    lam_p = jnp.full(nb_path, lambda_p, dtype=x.dtype)
    lam_m = jnp.full(nb_path, lambda_m, dtype=x.dtype)
    ttm0 = 0.0
    option_prices_ttm, option_std_ttm = [], []
    for i, ttm in enumerate(ttms):
        if engine == "pallas":
            x, lam_p, lam_m = simulate_hawkesjd_terminal_pallas(
                seed=base_seed + 7919 * i, ttm=float(ttm - ttm0), x0=x,
                lambda_p0=lam_p, lambda_m0=lam_m, interpret=on_cpu,
                **sim_params)
        else:
            slice_key = jax.random.fold_in(key, i)
            x, lam_p, lam_m = simulate_hawkesjd_terminal(
                key=slice_key, ttm=float(ttm - ttm0), x0=x, lambda_p0=lam_p,
                lambda_m0=lam_m, **sim_params)
        ttm0 = float(ttm)
        xp = x[:nb_real] if engine == "pallas" else x
        prices, stds = compute_mc_vars_payoff(
            x0=xp, sigma0=xp, qvar0=xp, ttm=ttm, forward=forwards[i],
            strikes_ttm=jnp.asarray(strikes_ttms[i]),
            optiontypes_ttm=optiontypes_ttms[i], discfactor=discfactors[i],
            variable_type=variable_type)
        option_prices_ttm.append(np.asarray(prices))
        option_std_ttm.append(np.asarray(stds))
    return option_prices_ttm, option_std_ttm


# ----------------------------------------------------------------------------
# pricer class
# ----------------------------------------------------------------------------

class HawkesJDPricer(ModelPricer):
    """ModelPricer for the Hawkes jump-diffusion model."""

    def price_chain(self, option_chain: OptionChain, params: HawkesJDParams,
                    is_spot_measure: bool = True, **kwargs) -> List[np.ndarray]:
        """``precision='fast'`` (kwargs) runs the whole chain as one
        mixed-precision device program — f32 Riccati scans at 720
        steps/yr, f64 Fourier quadrature (~1e-5 relative accuracy, see
        PARITY.md "Hawkes fast floor"); only for the standard measure (no
        risk-premia gamma)."""
        precision = kwargs.pop('precision', 'exact')
        if precision == 'fast' and params.risk_premia_gamma is None:
            return _hawkes_fast_call(option_chain, params,
                                     vol_scaler=kwargs.pop('vol_scaler', None),
                                     year_steps=kwargs.pop('year_steps', 720),
                                     fused=False)
        if precision not in ('exact', 'fast'):
            raise NotImplementedError(f"precision={precision}")
        if params.risk_premia_gamma is not None:
            return hawkesjd_chain_pricer_with_risk_premia(
                model_params=params, ttms=option_chain.ttms,
                forwards=option_chain.forwards,
                discfactors=option_chain.discfactors,
                strikes_ttms=option_chain.strikes_ttms,
                optiontypes_ttms=option_chain.optiontypes_ttms,
                is_spot_measure=is_spot_measure, **kwargs)
        return hawkesjd_chain_pricer(
            model_params=params, ttms=option_chain.ttms,
            forwards=option_chain.forwards, discfactors=option_chain.discfactors,
            strikes_ttms=option_chain.strikes_ttms,
            optiontypes_ttms=option_chain.optiontypes_ttms,
            is_spot_measure=is_spot_measure, **kwargs)

    def compute_model_ivols_for_chain(self, option_chain: OptionChain,
                                      params: HawkesJDParams,
                                      precision: str = "exact",
                                      **kwargs) -> List[np.ndarray]:
        """``precision='fast'``: mixed-precision chain reprice (f32
        Riccati scans, f64 quadrature) + f64 bisect/Newton BSM inversion
        fused into ONE device program (standard measure only)."""
        if precision == "fast" and params.risk_premia_gamma is None:
            return _hawkes_fast_call(option_chain, params,
                                     vol_scaler=kwargs.pop('vol_scaler', None),
                                     year_steps=kwargs.pop('year_steps', 720),
                                     fused=True)
        return super().compute_model_ivols_for_chain(
            option_chain=option_chain, params=params, **kwargs)

    @timer
    def model_mc_price_chain(self, option_chain: OptionChain,
                             params: HawkesJDParams, nb_path: int = 100000,
                             seed=None, **kwargs
                             ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        return hawkesjd_mc_chain_pricer(ttms=option_chain.ttms,
                                        forwards=option_chain.forwards,
                                        discfactors=option_chain.discfactors,
                                        strikes_ttms=option_chain.strikes_ttms,
                                        optiontypes_ttms=option_chain.optiontypes_ttms,
                                        nb_path=nb_path, seed=seed,
                                        engine=kwargs.get('engine', 'scan'),
                                        **params.to_dict())

    def compute_chain_prices_with_vols(self, option_chain: OptionChain,
                                       params: HawkesJDParams, **kwargs
                                       ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """overridden: under the risk kernel, IVs are implied against the
        gamma-forwards (hawkes_jd_pricer.py:176-194)."""
        model_prices = self.price_chain(option_chain=option_chain, params=params, **kwargs)
        if params.risk_premia_gamma is not None:
            _, model_forwards = hawkesjd_forwards_under_risk_kernel(
                model_params=params, risk_premia_gamma=params.risk_premia_gamma,
                ttms=option_chain.ttms, forwards=option_chain.forwards)
        else:
            model_forwards = None
        model_ivols = option_chain.compute_model_ivols_from_chain_data(
            model_prices=model_prices, forwards=model_forwards)
        return model_prices, model_ivols

    @timer
    def simulate_terminal_values(self, params: HawkesJDParams, ttm: float = 1.0,
                                 nb_path: int = 100000, seed=None, **kwargs
                                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        key = key_from_seed(seed)
        d = params.to_dict()
        d.pop('mu')
        d.pop('lambda_p')
        d.pop('lambda_m')
        d.pop('risk_premia_gamma')
        x, lam_p, lam_m = simulate_hawkesjd_terminal(
            key=key, ttm=ttm, x0=jnp.zeros(nb_path),
            lambda_p0=jnp.full(nb_path, params.lambda_p),
            lambda_m0=jnp.full(nb_path, params.lambda_m), mu=params.mu, **d)
        return np.asarray(x), np.asarray(lam_p), np.asarray(lam_m)

    @timer
    def calibrate_model_params_to_chain(self,
                                        option_chain: OptionChain,
                                        params0: HawkesJDParams,
                                        is_vega_weighted: bool = True,
                                        is_unit_ttm_vega: bool = False,
                                        **kwargs) -> HawkesJDParams:
        """8-param SLSQP with the stationarity constraint
        (hawkes_jd_pricer.py:232-304); finite-difference gradients (the
        chained host-side ODE pricer is cheap enough at 500 grid points).

        ``method='lm'`` (kwargs) instead runs the whole fit on device
        (:func:`calibrate_hawkesjd_lm_on_device`)."""
        method = kwargs.pop('method', 'slsqp')
        if method == 'lm':
            fit, _ = calibrate_hawkesjd_lm_on_device(
                option_chain=option_chain, params0=params0,
                is_vega_weighted=is_vega_weighted,
                nb_iters=kwargs.pop('nb_iters', 16),
                year_steps=kwargs.pop('year_steps', 720),
                use_float32=kwargs.pop('use_float32', None))
            return fit
        if method != 'slsqp':
            raise ValueError(f"method must be 'slsqp' or 'lm', got {method!r}")
        _, y = option_chain.get_chain_data_as_xy()
        market_vols = to_flat_np_array(y)
        if is_vega_weighted:
            vegas_ttms = option_chain.get_chain_vegas(is_unit_ttm_vega=is_unit_ttm_vega)
            weights = to_flat_np_array([v / np.sum(v) for v in vegas_ttms])
        else:
            weights = np.ones_like(market_vols)

        p0 = np.array([params0.sigma, params0.mean_p, params0.mean_m,
                       params0.theta_p, params0.theta_m,
                       0.5 * (params0.kappa_p + params0.kappa_m),
                       0.5 * (params0.beta1_p - params0.beta2_p),
                       0.5 * (params0.beta2_p - params0.beta2_m)])
        bounds = ((0.10, 2.0), (0.01, 0.99), (-0.99, -0.01), (0.01, 100.0),
                  (0.01, 100.0), (1.0, 100.0), (1.0, 100.0), (1.0, 100.0))
        vol_scaler = set_vol_scaler(sigma0=params0.sigma, ttm=np.min(option_chain.ttms))

        def unpack_pars(pars: np.ndarray) -> HawkesJDParams:
            sigma, mean_p, mean_m, theta_p, theta_m, kappa, beta_p, beta_m = pars
            return HawkesJDParams(mu=0.0, sigma=sigma, shift_p=params0.shift_p,
                                  mean_p=mean_p, shift_m=params0.shift_m,
                                  mean_m=mean_m, lambda_p=params0.lambda_p,
                                  theta_p=theta_p, kappa_p=kappa, beta1_p=beta_p,
                                  beta2_p=-beta_p, lambda_m=params0.lambda_m,
                                  theta_m=theta_m, kappa_m=kappa, beta1_m=beta_m,
                                  beta2_m=-beta_m)

        def objective(pars: np.ndarray, args=None) -> float:
            params = unpack_pars(pars=pars)
            model_vols = self.compute_model_ivols_for_chain(
                option_chain=option_chain, params=params, vol_scaler=vol_scaler)
            return float(np.nansum(weights * np.square(
                to_flat_np_array(model_vols) - market_vols)))

        def jump_cond(pars: np.ndarray) -> float:
            params = unpack_pars(pars=pars)
            return params.jump1_cond + params.jump2_cond

        constraints = ({'type': 'ineq', 'fun': jump_cond})
        options = {'ftol': 1e-8, 'maxiter': 100}
        res = minimize(objective, p0, args=None, method='SLSQP',
                       constraints=constraints, bounds=bounds, options=options)
        return unpack_pars(pars=res.x)

    @timer
    def calibrate_risk_premia_gamma_to_chain(self,
                                             option_chain: OptionChain,
                                             params0: HawkesJDParams,
                                             is_vega_weighted: bool = True,
                                             is_unit_ttm_vega: bool = False,
                                             maxiter: int = 100,
                                             print_iter: bool = False,
                                             **kwargs) -> HawkesJDParams:
        """2-param (sigma, gamma/8) risk-premia fit (hawkes_jd_pricer.py:306-360)."""
        _, y = option_chain.get_chain_data_as_xy()
        market_vols = to_flat_np_array(y)
        if is_vega_weighted:
            vegas_ttms = option_chain.get_chain_vegas(is_unit_ttm_vega=is_unit_ttm_vega)
            weights = 10000.0 * to_flat_np_array([v / np.sum(v) for v in vegas_ttms])
        else:
            weights = 10000.0 * np.ones_like(market_vols)

        gamma_scaler = 8.0
        p0 = np.array([params0.sigma, params0.risk_premia_gamma / gamma_scaler])
        bounds = ((0.01, 1.5), (-1.0, 1.0))

        def unpack_pars(pars: np.ndarray) -> HawkesJDParams:
            model_params = params0
            model_params.sigma = pars[0]
            model_params.risk_premia_gamma = gamma_scaler * pars[1]
            if print_iter:
                print(f"unpack_pars: sigma={pars[0]}, gamma={model_params.risk_premia_gamma}")
            return model_params

        def objective(pars: np.ndarray, args=None) -> float:
            params = unpack_pars(pars=pars)
            model_vols = self.compute_model_ivols_for_chain(
                option_chain=option_chain, params=params)
            return float(np.nansum(weights * np.square(
                to_flat_np_array(model_vols) - market_vols)))

        options = {'ftol': 1e-16, 'maxiter': maxiter, 'eps': 0.025}
        res = minimize(objective, p0, args=None, method='SLSQP', bounds=bounds,
                       options=options, tol=1e-16)
        return unpack_pars(pars=res.x)


# ----------------------------------------------------------------------------
# on-device Levenberg-Marquardt calibration (TPU fast path)
# ----------------------------------------------------------------------------

HAWKES_LM_LOWER = np.array([0.10, 0.01, -0.99, 0.01, 0.01, 1.0, 1.0, 1.0])
HAWKES_LM_UPPER = np.array([2.0, 0.99, -0.01, 100.0, 100.0, 100.0, 100.0,
                            100.0])


def _pars8_to_dict(pars, shift_p, shift_m):
    """params dict from the traced 8-param vector
    [sigma, mean_p, mean_m, theta_p, theta_m, kappa, beta_p, beta_m]
    (the PARAMS8 reduction of the SLSQP path, hawkes_jd_pricer.py:232-304)."""
    sigma, mean_p, mean_m, theta_p, theta_m, kappa, beta_p, beta_m = (
        pars[0], pars[1], pars[2], pars[3], pars[4], pars[5], pars[6], pars[7])
    return dict(sigma=sigma, shift_p=shift_p, mean_p=mean_p, shift_m=shift_m,
                mean_m=mean_m, kappa_p=kappa, theta_p=theta_p, beta1_p=beta_p,
                beta2_p=-beta_p, kappa_m=kappa, theta_m=theta_m,
                beta1_m=beta_m, beta2_m=-beta_m,
                compensator_p=jnp.exp(shift_p) / (1.0 - mean_p) - 1.0,
                compensator_m=jnp.exp(shift_m) / (1.0 - mean_m) - 1.0)


def _hawkes_chain_price_panel(p, grid: ChainGrid, *, ttms_static,
                              lambda_p, lambda_m, vol_scaler, year_steps,
                              solve_f32: bool = False):
    """padded price panel from a (possibly traced) params dict ``p`` — the
    13 dynamics values + compensators, as consumed by _solve_a_ode_grid_p.

    ``solve_f32=True`` is the mixed-precision fast mode: the Riccati scans
    (the ~720·ttm-step hot loop) run f32 while the Fourier quadrature and
    everything after it stay f64.  The f32 quadrature was the whole fast-
    path error (4.8e-4 rel price, step-/Kahan-independent); with the f64
    quadrature + expm1 jump MGF the fast path lands ~1e-5
    (scripts/hawkes_fast_floor.py, PARITY.md "Hawkes fast floor").  Under
    an x64-disabled trace the f64 lift degrades to a no-op (all-f32, the
    pre-study behavior), which is what the f32 LM path uses.
    """
    phi_grid, _, _ = mgf.get_transform_var_grid(
        variable_type=VariableType.LOG_RETURN, max_phi=MAX_PHI,
        vol_scaler=vol_scaler)
    n_grid = phi_grid.shape[0]
    if solve_f32:
        f32 = jnp.float32
        phi_s = Cplx(phi_grid.re.astype(f32), phi_grid.im.astype(f32))
        p_s = {k: jnp.asarray(v, f32) for k, v in p.items()}
    else:
        phi_s, p_s = phi_grid, p
    dt_s = phi_s.re.dtype
    psi_grid = Cplx(jnp.zeros(n_grid, dt_s), jnp.zeros(n_grid, dt_s))
    a_t = Cplx(jnp.zeros((n_grid, 3), dt_s), jnp.zeros((n_grid, 3), dt_s))
    ttm0 = 0.0
    prices = []
    for i, ttm in enumerate(ttms_static):
        dttm = ttm - ttm0
        nb_steps = max(int(np.ceil(year_steps * dttm)), 16)
        a_t = _solve_a_ode_grid_p(phi_s, psi_grid, a_t, nb_steps,
                                  dttm / nb_steps, p_s)
        dt_q = phi_grid.re.dtype
        a_q = Cplx(a_t.re.astype(dt_q), a_t.im.astype(dt_q))
        log_mgf = Cplx(a_q.re[:, 0] + a_q.re[:, 1] * lambda_p
                       + a_q.re[:, 2] * lambda_m,
                       a_q.im[:, 0] + a_q.im[:, 1] * lambda_p
                       + a_q.im[:, 2] * lambda_m)
        prices.append(mgf.vanilla_prices_with_mgf_grid(
            log_mgf_grid=log_mgf, phi_grid=phi_grid,
            forwards=grid.forwards[i], strikes=grid.strikes[i],
            optiontypes=grid.optioncodes[i], discfactors=grid.discfactors[i]))
        ttm0 = ttm
    return jnp.stack(prices, axis=0)


def _hawkes_chain_vols_panel(p, grid: ChainGrid, **kw):
    """fused price panel + BSM inversion (one traced program)."""
    price_panel = _hawkes_chain_price_panel(p, grid, **kw)
    return bsm.infer_bsm_implied_vol_fast(
        forward=grid.forwards[:, None], ttm=grid.ttms[:, None],
        strike=grid.strikes, given_price=price_panel,
        discfactor=grid.discfactors[:, None], optiontype=grid.optioncodes)


@partial(jax.jit, static_argnames=("ttms_static", "year_steps", "nb_iters",
                                   "use_float32"))
def _hawkes_lm_run(p0, grid, market, sqrtw, lower, upper, consts, *,
                   ttms_static, year_steps, nb_iters, use_float32):
    """whole 8-param Hawkes LM fit in one dispatch (ops/lm.py).

    consts = [shift_p, shift_m, lambda_p, lambda_m, vol_scaler]."""
    from stochvolmodels_tpu.ops import lm

    shift_p, shift_m, lambda_p, lambda_m, vol_scaler = (
        consts[0], consts[1], consts[2], consts[3], consts[4])

    def _run():
        def residuals(pars):
            vols = _hawkes_chain_vols_panel(
                _pars8_to_dict(pars, shift_p, shift_m), grid,
                ttms_static=ttms_static, lambda_p=lambda_p, lambda_m=lambda_m,
                vol_scaler=vol_scaler, year_steps=year_steps)
            nan_mask = jnp.isnan(vols)
            clean = jnp.where(nan_mask, market, vols)
            r = (sqrtw * (clean - market)).ravel()
            # stationarity of the jump intensities (the SLSQP inequality
            # jump1_cond + jump2_cond >= 0) as a one-sided penalty residual
            exp_jp = shift_p + pars[1]
            exp_jm = shift_m + pars[2]
            j1 = pars[5] - pars[6] * exp_jp + pars[6] * exp_jm
            j2 = pars[5] - pars[7] * exp_jp + pars[7] * exp_jm
            penalty = jnp.maximum(-(j1 + j2), 0.0)
            return jnp.concatenate([r, jnp.sqrt(10.0) * penalty[None]])

        return lm.lm_minimize(residuals, p0, lower, upper, nb_iters=nb_iters)

    if use_float32:
        with jax.enable_x64(False):
            return _run()
    return _run()


def calibrate_hawkesjd_lm_on_device(option_chain: OptionChain,
                                    params0: HawkesJDParams,
                                    nb_iters: int = 16,
                                    year_steps: int = 720,
                                    use_float32: Optional[bool] = None,
                                    is_vega_weighted: bool = True,
                                    ) -> Tuple[HawkesJDParams, float]:
    """PARAMS8 Hawkes calibration by on-device Levenberg-Marquardt.

    The whole fit — chained Riccati solves over the transform grid, Fourier
    pricing, implied-vol inversion, Gauss-Newton updates — runs as ONE jit
    dispatch, replacing the finite-difference SLSQP host loop (~100
    iterations x 9 FD evaluations of the chain pricer).  Returns
    (params, final weighted cost)."""
    from stochvolmodels_tpu.models.logsv.pricer import (
        _grid_to_f32,
        _pad_panel,
        use_float32_default,
    )

    if use_float32 is None:
        use_float32 = use_float32_default()
    dtype = jnp.float32 if use_float32 else jnp.float64
    grid = option_chain.to_grid()
    market_panel = _pad_panel(option_chain.get_mid_vols(), grid)
    if is_vega_weighted:
        vegas = [v / np.sum(v) for v in option_chain.get_chain_vegas()]
        weights_panel = _pad_panel(vegas, grid)
    else:
        weights_panel = np.ones_like(market_panel)
    mask = np.asarray(grid.mask)
    sqrtw = jnp.asarray(np.sqrt(np.where(mask, weights_panel, 0.0)), dtype=dtype)
    market = jnp.asarray(np.where(mask, market_panel, 0.0), dtype=dtype)
    if use_float32:
        grid = _grid_to_f32(grid)

    p0 = np.array([params0.sigma, params0.mean_p, params0.mean_m,
                   params0.theta_p, params0.theta_m,
                   0.5 * (params0.kappa_p + params0.kappa_m),
                   params0.beta1_p, params0.beta1_m])
    vol_scaler = set_vol_scaler(sigma0=params0.sigma,
                                ttm=np.min(option_chain.ttms))
    consts = jnp.asarray([params0.shift_p, params0.shift_m, params0.lambda_p,
                          params0.lambda_m, float(vol_scaler)], dtype=dtype)
    best, cost = _hawkes_lm_run(
        jnp.asarray(p0, dtype=dtype), grid, market, sqrtw,
        jnp.asarray(HAWKES_LM_LOWER, dtype=dtype),
        jnp.asarray(HAWKES_LM_UPPER, dtype=dtype), consts,
        ttms_static=tuple(float(t) for t in option_chain.ttms),
        year_steps=year_steps, nb_iters=nb_iters, use_float32=use_float32)
    b = np.asarray(best, dtype=np.float64)
    fit = HawkesJDParams(mu=0.0, sigma=b[0], shift_p=params0.shift_p,
                         mean_p=b[1], shift_m=params0.shift_m, mean_m=b[2],
                         lambda_p=params0.lambda_p, theta_p=b[3],
                         kappa_p=b[5], beta1_p=b[6], beta2_p=-b[6],
                         lambda_m=params0.lambda_m, theta_m=b[4],
                         kappa_m=b[5], beta1_m=b[7], beta2_m=-b[7])
    return fit, float(cost)


_PKEYS = ('sigma', 'shift_p', 'mean_p', 'shift_m', 'mean_m', 'kappa_p',
          'theta_p', 'beta1_p', 'beta2_p', 'kappa_m', 'theta_m', 'beta1_m',
          'beta2_m', 'compensator_p', 'compensator_m')


@partial(jax.jit, static_argnames=("ttms_static", "year_steps", "fused"))
def _hawkes_chain_fast_jit(pvec, grid, lambda_p, lambda_m, vol_scaler, *,
                           ttms_static, year_steps, fused):
    """mixed-precision chain panel: f32 Riccati scans, f64 quadrature +
    BSM inversion; prices, or fused implied vols (one device program).
    ``pvec`` is the 15-vector of _PKEYS values."""
    p = dict(zip(_PKEYS, [pvec[i] for i in range(len(_PKEYS))]))
    kw = dict(ttms_static=ttms_static, lambda_p=lambda_p, lambda_m=lambda_m,
              vol_scaler=vol_scaler, year_steps=year_steps, solve_f32=True)
    if fused:
        return grid.masked(_hawkes_chain_vols_panel(p, grid, **kw))
    return _hawkes_chain_price_panel(p, grid, **kw)


def _hawkes_fast_call(option_chain: OptionChain, params: HawkesJDParams,
                      vol_scaler, year_steps: int, fused: bool):
    if vol_scaler is None:
        vol_scaler = set_vol_scaler(sigma0=params.sigma,
                                    ttm=np.min(option_chain.ttms))
    d = params.to_dict()
    d['compensator_p'] = params.compensator_p
    d['compensator_m'] = params.compensator_m
    pvec = np.asarray([d[k] for k in _PKEYS], dtype=np.float64)
    grid = option_chain.to_grid()
    panel = _hawkes_chain_fast_jit(
        jnp.asarray(pvec), grid, float(params.lambda_p),
        float(params.lambda_m), float(vol_scaler),
        ttms_static=tuple(float(t) for t in option_chain.ttms),
        year_steps=year_steps, fused=fused)
    return option_chain.unpad_panel(panel)
