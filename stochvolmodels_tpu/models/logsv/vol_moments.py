"""
Volatility moments and expected quadratic variance for the LogSV model
(Proposition 3.3 / Corollary 3.4 of Sepp & Rakhmonov 2024).

Rebuild of /root/reference/stochvolmodels/pricers/logsv/vol_moments_ode.py.
The truncated moment system d_tau M = Lambda M + C is solved in closed form by
matrix exponentiation; `jax.scipy.linalg.expm` keeps it differentiable so the
varswap-backbone fit can sit inside a gradient-based calibration objective.
"""
from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np
import pandas as pd

from stochvolmodels_tpu.models.logsv.params import LogSvParams


def compute_analytic_vol_moments(params: LogSvParams,
                                 t: float = 1.0,
                                 n_terms: int = 4,
                                 is_qvar: bool = False
                                 ) -> np.ndarray:
    """moments of Y_tau = sigma_tau - theta (or their integrals over [0, tau])
    by the closed-form Eq. (3.49)/(3.54) (vol_moments_ode.py:37-115).

    Host-side numpy/scipy: a k* x k* (default 4x4) system — not worth a device
    round-trip, and XLA:TPU has no f64 LU for the inverse.  The differentiable
    device path is :func:`compute_analytic_qvar_jnp`.
    """
    import scipy.linalg as ssla
    lambda_m = params.get_vol_moments_lambda(n_terms=n_terms)
    y = params.sigma0 - params.theta
    y0 = np.power(y, np.arange(1, n_terms + 1, dtype=np.float64))
    if np.isclose(np.abs(t), 0.0):
        return y0

    rhs = np.zeros(n_terms)
    rhs[1] = params.vartheta2 * params.theta2
    # closure of Eq. (3.51): (k*+1)th moment frozen at its initial value
    rhs[-1] = -n_terms * params.kappa2 * np.power(y, n_terms + 1)

    i_m = np.linalg.inv(lambda_m)
    e_m = ssla.expm(lambda_m * t)
    m_rhs = i_m @ (e_m - np.eye(n_terms))

    if is_qvar:
        sol1 = m_rhs @ y0
        intm2 = i_m @ (m_rhs - t * np.eye(n_terms))
        sol2 = intm2 @ rhs
    else:
        sol1 = e_m @ y0
        sol2 = m_rhs @ rhs
    return sol1 + sol2


def compute_analytic_qvar(params: LogSvParams,
                          ttm: float = 1.0,
                          n_terms: int = 4
                          ) -> float:
    """annualized expected quadratic variance, Eq. (3.53) — the model fair
    value of a variance swap (vol_moments_ode.py:118-154)."""
    if np.isclose(ttm, 0.0):
        return float(np.square(params.sigma0))
    int_moments = compute_analytic_vol_moments(params=params, t=ttm,
                                               n_terms=n_terms, is_qvar=True)
    return float((int_moments[1] + 2.0 * params.theta * int_moments[0]) / ttm
                 + params.theta2)


def compute_vol_moments_t(params: LogSvParams, ttm: np.ndarray, n_terms: int = 4,
                          is_print: bool = False) -> np.ndarray:
    """moments over an array of maturities."""
    moments = np.zeros((len(ttm), n_terms))
    for idx, t_ in enumerate(ttm):
        moments[idx, :] = compute_analytic_vol_moments(t=float(t_), params=params,
                                                       n_terms=n_terms)
        if is_print:
            print(f"t={t_}: {moments[idx]}")
    return moments


def compute_expected_vol_t(params: LogSvParams, t: np.ndarray, n_terms: int = 4
                           ) -> np.ndarray:
    """E[sigma_tau] = E[Y_tau] + theta over maturities."""
    return np.array([compute_analytic_vol_moments(t=float(t_), params=params,
                                                  n_terms=n_terms)[0] + params.theta
                     for t_ in t])


def compute_sqrt_qvar_t(params: LogSvParams, t: np.ndarray, n_terms: int = 4
                        ) -> np.ndarray:
    """model var-swap rate sqrt(E[QV]) over maturities."""
    return np.array([np.sqrt(compute_analytic_qvar(ttm=float(t_), params=params,
                                                   n_terms=n_terms)) for t_ in t])


def _vol_moments_lambda_jnp(theta, kappa1, kappa2, beta, volvol, n_terms: int = 4):
    """traced-parameter version of LogSvParams.get_vol_moments_lambda."""
    vartheta2 = beta * beta + volvol * volvol
    kappa = kappa1 + kappa2 * theta
    theta2 = theta * theta

    def c(n: int):
        return 0.5 * vartheta2 * n * (n - 1.0)

    lm = jnp.zeros((n_terms, n_terms))
    lm = lm.at[0, 0].set(-kappa).at[0, 1].set(-kappa2)
    lm = lm.at[1, 0].set(2.0 * c(2) * theta).at[1, 1].set(c(2) - 2.0 * kappa)
    lm = lm.at[1, 2].set(-2.0 * kappa2)
    for n_ in range(2, n_terms):
        n = n_ + 1
        c_n = c(n)
        lm = lm.at[n_, n_ - 2].set(c_n * theta2)
        lm = lm.at[n_, n_ - 1].set(2.0 * c_n * theta)
        lm = lm.at[n_, n_].set(c_n - n * kappa)
        if n_ + 1 < n_terms:
            lm = lm.at[n_, n_ + 1].set(-n * kappa2)
    return lm


def expm_taylor(A, squarings: int = 12, order: int = 14):
    """solve-free matrix exponential (Taylor + scaling-and-squaring).

    ``jax.scipy.linalg.expm`` Pade needs an LU solve, which XLA:TPU lacks for
    f64.  For the small well-scaled moment generators here, Taylor at A/2^s
    followed by s squarings is exact to f64 roundoff and uses only matmuls —
    TPU-safe and differentiable.
    """
    A = A / (2.0 ** squarings)
    n = A.shape[-1]
    E = jnp.eye(n, dtype=A.dtype)
    term = jnp.eye(n, dtype=A.dtype)
    for k in range(1, order + 1):
        term = term @ A / k
        E = E + term
    for _ in range(squarings):
        E = E @ E
    return E


def compute_analytic_qvar_jnp(sigma0, theta, kappa1, kappa2, beta, volvol,
                              ttm: float, n_terms: int = 4):
    """differentiable (traced-parameter) version of :func:`compute_analytic_qvar`,
    for use inside jitted calibration objectives (varswap-backbone fit).

    Uses the Van Loan augmented-matrix identity to obtain
    Phi1 = Lambda^-1 (e^{Lambda t} - I) and Phi2 = Lambda^-1 (Phi1 - t I)
    from one solve-free matrix exponential (no LU on TPU):

        expm([[L, I, 0], [0, 0, I], [0, 0, 0]] t)[0, :] = [e^{Lt}, Phi1, Phi2].
    """
    lambda_m = _vol_moments_lambda_jnp(theta, kappa1, kappa2, beta, volvol, n_terms)
    y = sigma0 - theta
    y0 = jnp.stack([y ** k for k in range(1, n_terms + 1)])
    rhs = jnp.zeros(n_terms)
    rhs = rhs.at[1].set((beta * beta + volvol * volvol) * theta * theta)
    rhs = rhs.at[-1].set(-n_terms * kappa2 * y ** (n_terms + 1))

    n = n_terms
    eye = jnp.eye(n)
    zero = jnp.zeros((n, n))
    aug = jnp.block([[lambda_m, eye, zero],
                     [zero, zero, eye],
                     [zero, zero, zero]])
    E = expm_taylor(aug * ttm)
    phi1 = E[:n, n:2 * n]          # int_0^t e^{L s} ds = m_rhs
    phi2 = E[:n, 2 * n:]           # int_0^t int_0^s e^{L u} du ds = intm2
    sol1 = phi1 @ y0
    sol2 = phi2 @ rhs
    int_moments = sol1 + sol2
    return (int_moments[1] + 2.0 * theta * int_moments[0]) / ttm + theta * theta


def fit_model_vol_backbone_to_varswaps(log_sv_params: LogSvParams,
                                       varswap_strikes: pd.Series,
                                       n_terms: int = 4,
                                       verbose: bool = False
                                       ) -> pd.Series:
    """fit the backbone eta so the model reproduces market varswap strikes,
    with the reference's forward-difference bootstrap and the ad-hoc sqrt
    adjustment for ttm < 0.06 (vol_moments_ode.py:194-225)."""
    ttms = varswap_strikes.index.to_numpy()
    market_qvar_dt = ttms * np.square(varswap_strikes.to_numpy())
    model_forwards = np.array([compute_analytic_qvar(params=log_sv_params,
                                                     ttm=float(ttm), n_terms=n_terms)
                               for ttm in ttms])
    model_qvar_dt = model_forwards * ttms
    model_eta = np.ones_like(ttms)
    for idx in range(len(ttms)):
        if idx == 0:
            model_eta[idx] = market_qvar_dt[idx] / model_qvar_dt[idx]
        else:
            model_eta[idx] = ((market_qvar_dt[idx] - market_qvar_dt[idx - 1])
                              / (model_qvar_dt[idx] - model_qvar_dt[idx - 1]))
    model_eta = np.where(model_eta > 0.0, model_eta, 1.0)
    model_eta = np.where(ttms < 0.06, np.sqrt(model_eta), model_eta)
    model_eta = pd.Series(model_eta, index=ttms)
    if verbose:
        print(f"market_qvar_dt={market_qvar_dt}\nmodel_qvar_dt={model_qvar_dt}\n"
              f"model_eta={model_eta}")
    return model_eta
