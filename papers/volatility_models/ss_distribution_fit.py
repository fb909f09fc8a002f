"""
Steady-state distribution fits for "What Is a Robust Stochastic Volatility
Model": the LogSV GIG steady state vs the Heston gamma steady state vs a
normal benchmark, fitted to the histogram of (log) volatility.

Reproduces /root/reference/papers/volatility_models/ss_distribution_fit.py
against the TPU framework.
"""
from __future__ import annotations

from enum import Enum
from typing import Optional

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import scipy.special as sps
import seaborn as sns
from scipy.optimize import minimize
from scipy.stats import norm

from papers.volatility_models.load_data import fetch_ohlc_vol
from stochvolmodels_tpu import HestonParams, LogSvParams


def lognormal_sv_ss_pdf(sigma: np.ndarray, params: LogSvParams) -> np.ndarray:
    """GIG steady state of the LogSV volatility (paper eq. for g(sigma))."""
    nu = 2.0 * (params.kappa2 * params.theta - params.kappa1) / params.vartheta2 - 1.0
    q = 2.0 * params.kappa1 * params.theta / params.vartheta2
    b = 2.0 * params.kappa2 / params.vartheta2
    if params.kappa1 < 1e-6:
        raise NotImplementedError("kappa1 = 0 is not implemented")
    if params.kappa2 >= 1e-6:
        c = np.power(b / q, nu / 2.0) / (2.0 * sps.kv(nu, 2.0 * np.sqrt(q * b)))
    else:
        c = np.power(q, -nu) / sps.gamma(-nu)
    return c * np.power(sigma, nu - 1.0) * np.exp(-q / sigma - b * sigma)


def lognormal_sv_ss_log_pdf(log_sigma: np.ndarray, params: LogSvParams) -> np.ndarray:
    sigma = np.exp(log_sigma)
    return sigma * lognormal_sv_ss_pdf(sigma=sigma, params=params)


def heston_ss_pdf(var: np.ndarray, params: HestonParams) -> np.ndarray:
    """gamma steady state of the Heston variance."""
    alpha = np.square(params.volvol) / (2.0 * params.kappa)
    beta = params.theta / alpha
    c = np.power(alpha, beta) * sps.gamma(beta)
    return np.power(var, beta - 1.0) * np.exp(-var / alpha) / c


def heston_ss_log_vol_pdf(log_sigma: np.ndarray, params: HestonParams) -> np.ndarray:
    var = np.exp(2.0 * log_sigma)
    return 2.0 * var * heston_ss_pdf(var=var, params=params)


def compute_vol_histogram(vol: pd.Series, bins: int = 100) -> pd.Series:
    y, x = np.histogram(vol.to_numpy(), bins=bins, density=True)
    x = (x + np.roll(x, -1))[:-1] / 2.0
    return pd.Series(y / np.sum(y), index=x)


def fit_distribution_log_sv(vol: pd.Series, bins: int = 50) -> LogSvParams:
    """(theta, kappa=kappa1=kappa2, volvol) histogram fit of the GIG steady
    state in log-vol space (reference :125-150)."""
    log_sigma = np.log(vol).replace([np.inf, -np.inf], np.nan).dropna()
    hist = compute_vol_histogram(vol=log_sigma, bins=bins)
    dv = hist.index[1] - hist.index[0]

    def unpack(pars) -> LogSvParams:
        theta, kappa1, volvol = pars
        return LogSvParams(sigma0=theta, theta=theta, kappa1=kappa1, kappa2=kappa1,
                           beta=0.0, volvol=volvol)

    def objective(pars, args=None) -> float:
        analytic = lognormal_sv_ss_log_pdf(hist.index.to_numpy(), unpack(pars)) * dv
        return float(np.nansum(np.square(hist.to_numpy() - analytic)))

    res = minimize(objective, np.abs([0.15, 4.0, 1.0]), method="SLSQP",
                   bounds=((0.05, 1.0), (0.5, 10), (0.1, 5.0)),
                   options={"disp": False, "ftol": 1e-8})
    return unpack(res.x)


def fit_distribution_log_sv_fixed_kappa(vol: pd.Series,
                                        kappa1: float,
                                        kappa2: float,
                                        bins: int = 50) -> LogSvParams:
    """given (kappa1, kappa2), fit (theta, volvol) (reference :152-181)."""
    log_sigma = np.log(vol).replace([np.inf, -np.inf], np.nan).dropna()
    hist = compute_vol_histogram(vol=log_sigma, bins=bins)
    dv = hist.index[1] - hist.index[0]

    def unpack(pars) -> LogSvParams:
        theta, volvol = pars
        return LogSvParams(sigma0=theta, theta=theta, kappa1=kappa1, kappa2=kappa2,
                           beta=0.0, volvol=volvol)

    def objective(pars, args=None) -> float:
        analytic = lognormal_sv_ss_log_pdf(hist.index.to_numpy(), unpack(pars)) * dv
        return float(np.nansum(np.square(hist.to_numpy() - analytic)))

    res = minimize(objective, np.array([0.3, 1.0]), method="SLSQP",
                   bounds=((0.05, 1.0), (0.25, 5.0)),
                   options={"disp": False, "ftol": 1e-8})
    return unpack(res.x)


def fit_distribution_heston(vol: pd.Series, bins: int = 50) -> HestonParams:
    """(theta, kappa, volvol) histogram fit of the Heston gamma steady state
    (reference :184-208)."""
    log_sigma = np.log(vol).replace([np.inf, -np.inf], np.nan).dropna()
    hist = compute_vol_histogram(vol=log_sigma, bins=bins)
    dv = hist.index[1] - hist.index[0]

    def unpack(pars) -> HestonParams:
        theta, kappa, volvol = pars
        return HestonParams(v0=theta, theta=theta, kappa=kappa, rho=0.0, volvol=volvol)

    def objective(pars, args=None) -> float:
        analytic = heston_ss_log_vol_pdf(hist.index.to_numpy(), unpack(pars)) * dv
        return float(np.nansum(np.square(hist.to_numpy() - analytic)))

    res = minimize(objective, np.abs([0.04, 4.0, 1.0]), method="SLSQP",
                   bounds=((0.001, 0.5), (0.5, 10), (0.1, 5.0)),
                   options={"disp": False, "ftol": 1e-8})
    return unpack(res.x)


def plot_estimated_svs(vol: pd.Series,
                       logsv_params: LogSvParams,
                       heston_params: Optional[HestonParams] = None,
                       bins: int = 100,
                       title: str = None,
                       ax: plt.Subplot = None) -> None:
    """empirical log-vol histogram vs LogSV / Heston / normal steady states
    on a log scale (reference :211-261)."""
    log_sigma = np.log(vol).replace([np.inf, -np.inf], np.nan).dropna()
    hist = compute_vol_histogram(vol=log_sigma, bins=bins)
    hist_range = hist.index.to_numpy()
    dv = hist_range[1] - hist_range[0]
    curves = [pd.Series(lognormal_sv_ss_log_pdf(hist_range, logsv_params) * dv,
                        index=hist_range, name="LogNormal")]
    if heston_params is not None:
        curves.append(pd.Series(heston_ss_log_vol_pdf(hist_range, heston_params) * dv,
                                index=hist_range, name="Heston"))
    curves.append(pd.Series(norm.pdf(hist_range, loc=np.mean(log_sigma),
                                     scale=np.std(log_sigma)) * dv,
                            index=hist_range, name="Normal PDF"))
    df = pd.concat(curves, axis=1)

    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(18, 10), tight_layout=True)
    ax.plot(hist.index, hist.to_numpy(), "*", color="red", label="Empirical")
    for col in df.columns:
        ax.plot(df.index, df[col].to_numpy(), label=col)
    ax.set_yscale("log")
    ax.set_ylim((1e-10, None))
    ax.set_xlabel("Log volatility")
    ax.legend(loc="lower center", framealpha=0.90)
    if title is not None:
        ax.set_title(title, color="darkblue")


def produce_joint_report(vol: pd.Series, bins: int = 100) -> None:
    logsv_params = fit_distribution_log_sv(vol=vol, bins=bins)
    print(logsv_params)
    heston_params = fit_distribution_heston(vol=vol, bins=bins)
    print(heston_params)
    plot_estimated_svs(vol=vol, logsv_params=logsv_params, heston_params=heston_params,
                       bins=bins)


class UnitTests(Enum):
    FETCH_VOL = 1
    FIT_LOGSV = 2
    FIT_HESTON = 3
    JOINT = 4


def run_unit_test(unit_test: UnitTests):
    vol, _ = fetch_ohlc_vol(ticker="VIX")
    if unit_test == UnitTests.FETCH_VOL:
        print(vol.describe())
    elif unit_test == UnitTests.FIT_LOGSV:
        print(fit_distribution_log_sv(vol=vol))
    elif unit_test == UnitTests.FIT_HESTON:
        print(fit_distribution_heston(vol=vol))
    elif unit_test == UnitTests.JOINT:
        with sns.axes_style("darkgrid"):
            produce_joint_report(vol=vol)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.JOINT)
