"""
Figure 5 of the quadratic-drift LogSV paper: the steady-state distribution of
the volatility is generalized inverse Gaussian (GIG), with closed-form
moments, skewness and excess kurtosis via modified Bessel functions K_nu.

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/steady_state_pdf.py
against the TPU framework. The GIG exponent eta matches
LogSvParams.eta (stochvolmodels_tpu/models/logsv/params.py).
"""
from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Dict

import matplotlib.pyplot as plt
import matplotlib.ticker as mticker
import numpy as np
import pandas as pd
import scipy.special as sps
import seaborn as sns

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import LogSvParams

VOLVOL = 1.5

SS_PDF_PARAMS = {
    r"$(\kappa_{1}=4, \kappa_{2}=0)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=0.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=4)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=8)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=8.0, beta=0.0, volvol=VOLVOL),
}

SS_PARAMS = {
    r"$\kappa_{1}=1$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=1.0, kappa2=0.0, beta=0.0, volvol=VOLVOL),
    r"$\kappa_{1}=4$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=VOLVOL),
    r"$\kappa_{1}=8$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=8.0, kappa2=8.0, beta=0.0, volvol=VOLVOL),
}


def _gig_abc(params: LogSvParams):
    """(nu, q, b) of the GIG steady state g(sigma) ~ sigma^(nu-1) exp(-q/sigma - b*sigma)."""
    nu = 2.0 * (params.kappa2 * params.theta - params.kappa1) / params.vartheta2 - 1.0
    q = 2.0 * params.kappa1 * params.theta / params.vartheta2
    b = 2.0 * params.kappa2 / params.vartheta2
    return nu, q, b


def steady_state(sigma: np.ndarray, params: LogSvParams) -> np.ndarray:
    """normalized GIG steady-state density of the volatility."""
    nu, q, b = _gig_abc(params)
    if params.kappa1 < 1e-6:
        raise NotImplementedError("kappa1 = 0 is not implemented")
    if params.kappa2 >= 1e-6:
        c = np.power(b / q, nu / 2.0) / (2.0 * sps.kv(nu, 2.0 * np.sqrt(q * b)))
    else:
        c = np.power(q, -nu) / sps.gamma(-nu)
    return c * np.power(sigma, nu - 1.0) * np.exp(-q / sigma - b * sigma)


def vol_moment(params: LogSvParams, r: int = 1) -> float:
    """r-th steady-state moment E[sigma^r] via Bessel-K ratios (kappa2 > 0):
    for g(sigma) ~ sigma^(nu-1) exp(-q/sigma - b*sigma),
    E[sigma^r] = (q/b)^(r/2) K_{nu+r}(2 sqrt(qb)) / K_nu(2 sqrt(qb))."""
    nu, q, b = _gig_abc(params)
    arg = 2.0 * np.sqrt(q * b)
    return float(np.power(q / b, r / 2.0) * sps.kv(nu + r, arg) / sps.kv(nu, arg))


def vol_skewness(params: LogSvParams) -> float:
    m1 = vol_moment(params, 1)
    m2_r = vol_moment(params, 2)
    m3_r = vol_moment(params, 3)
    m2 = m2_r - m1 * m1
    return (m3_r - 3.0 * m1 * m2 - m1 ** 3) / np.power(m2, 1.5)


def excess_kurtosis(params: LogSvParams, kappa2: float) -> float:
    """excess kurtosis of log-returns under the steady state for given kappa2."""
    nu = 2.0 * (kappa2 * params.theta - params.kappa1) / params.vartheta2 - 1.0
    q = 2.0 * params.kappa1 * params.theta / params.vartheta2
    b = 2.0 * kappa2 / params.vartheta2
    arg = 2.0 * np.sqrt(q * b)
    return 3.0 * sps.kv(nu + 4.0, arg) * sps.kv(nu, arg) / np.square(sps.kv(nu + 2.0, arg)) - 3.0


def steady_state_x_pdf(x_grid: np.ndarray, sigma: np.ndarray,
                       g_sigma: np.ndarray) -> np.ndarray:
    """pdf of x = sigma*Z mixed over the steady-state law of sigma (vectorized
    over the x grid; the reference loops per point)."""
    inv = 1.0 / sigma
    den = inv / np.sqrt(2.0 * np.pi)
    kernel = den[None, :] * np.exp(-0.5 * np.square(x_grid[:, None] * inv[None, :]))
    return np.nansum(kernel * g_sigma[None, :], axis=1)


def plot_steady_state(params_dict: Dict[str, LogSvParams] = SS_PDF_PARAMS,
                      title: str = None, ax: plt.Subplot = None) -> None:
    sigma = np.linspace(1e-4, 4.0, 1000)
    df = pd.concat([pd.Series(steady_state(sigma, p), index=sigma, name=k)
                    for k, p in params_dict.items()], axis=1)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_xlim(left=0.0)
    ax.set_ylim(bottom=0.0)
    ax.set_title(title, color="darkblue")
    ax.set_xlabel(r"$\sigma$", fontsize=12)
    ax.xaxis.set_major_formatter(mticker.FuncFormatter(lambda z, _: f"{z:.2f}"))


def plot_steady_state_x(params_dict: Dict[str, LogSvParams] = SS_PDF_PARAMS,
                        title: str = None, ax: plt.Subplot = None) -> None:
    sigma = np.linspace(1e-4, 5.0, 1000)
    x = np.linspace(-5.0, 5.0, 200)
    df = pd.concat([pd.Series(steady_state_x_pdf(x, sigma, steady_state(sigma, p)),
                              index=x, name=k)
                    for k, p in params_dict.items()], axis=1)
    sns.lineplot(data=df, ax=ax)
    ax.set_ylim(bottom=0.0)
    ax.set_title(title, color="darkblue")


def plot_vol_skew(params_dict: Dict[str, LogSvParams] = SS_PARAMS,
                  title: str = r"Skewness of volatility as function of $\kappa_{2}$",
                  ax: plt.Subplot = None) -> None:
    kappa2s = np.linspace(0.5, 10.0, 100)
    qs = []
    for key, params in params_dict.items():
        skew = np.array([vol_skewness(dataclasses.replace(params, kappa2=k2))
                         for k2 in kappa2s])
        qs.append(pd.Series(skew, index=kappa2s, name=key))
    sns.lineplot(data=pd.concat(qs, axis=1), dashes=False, ax=ax)
    ax.set_xlabel(r"$\kappa_{2}$")
    if title is not None:
        ax.set_title(title, fontsize=12, color="darkblue")


def plot_ss_kurtosis(params_dict: Dict[str, LogSvParams] = SS_PARAMS,
                     title: str = r"Excess kurtosis of log-returns as function of $\kappa_{2}$",
                     ax: plt.Subplot = None) -> None:
    kappa2s = np.linspace(0.5, 10.0, 100)
    qs = []
    for key, params in params_dict.items():
        kurt = np.array([excess_kurtosis(params, k2) for k2 in kappa2s])
        qs.append(pd.Series(kurt, index=kappa2s, name=key))
    sns.lineplot(data=pd.concat(qs, axis=1), dashes=False, ax=ax)
    ax.set_xlabel(r"$\kappa_{2}$")
    if title is not None:
        ax.set_title(title, fontsize=12, color="darkblue")


class UnitTests(Enum):
    PLOT_VOL_STEADY_STATE = 1
    PLOT_SS_PDF = 2
    PLOT_X_PDF = 3
    PLOT_KURT = 4
    JOINT_FIGURE = 5
    SKEWNESS = 6


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.PLOT_VOL_STEADY_STATE:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(18, 10), tight_layout=True)
        plot_steady_state(title=r"Steady state distribution of volatility with $\kappa_{1}=4$", ax=ax)
    elif unit_test == UnitTests.PLOT_SS_PDF:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
        plot_steady_state(ax=ax)
    elif unit_test == UnitTests.PLOT_X_PDF:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
        plot_steady_state_x(ax=ax)
    elif unit_test == UnitTests.PLOT_KURT:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(6, 6), tight_layout=True)
        plot_ss_kurtosis(ax=ax)
    elif unit_test == UnitTests.SKEWNESS:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(6, 6), tight_layout=True)
        plot_vol_skew(ax=ax)
    elif unit_test == UnitTests.JOINT_FIGURE:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 3, figsize=(18, 6), tight_layout=True)
        plot_steady_state(title="(A) Steady state distribution of the volatility", ax=axs[0])
        plot_vol_skew(title=r"(B) Skewness of volatility as function of $\kappa_{2}$", ax=axs[1])
        plot_ss_kurtosis(title=r"(C) Excess kurtosis of log-returns as function of $\kappa_{2}$", ax=axs[2])
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="vol_steady_state")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.JOINT_FIGURE)
