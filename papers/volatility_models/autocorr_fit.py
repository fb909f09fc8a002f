"""
Autocorrelation fits for the robust-SV study: empirical volatility ACF vs the
LogSV model ACF (from MC vol paths with frozen Brownians) vs the rough
power-law ACF 1 - c t^(2 alpha + 1).

Reproduces /root/reference/papers/volatility_models/autocorr_fit.py against
the TPU framework; the MC vol paths run the same Euler scheme as
stochvolmodels_tpu.models.logsv.pricer.simulate_vol_paths but with supplied
Brownians, preserving the reference's fixed-randoms fitting contract.
"""
from __future__ import annotations

from enum import Enum
from typing import Tuple

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns
from scipy.optimize import minimize

import papers.volatility_models.ss_distribution_fit as ssd
from papers.volatility_models.load_data import fetch_ohlc_vol
from stochvolmodels_tpu import LogSvParams


def compute_path_autocorr(a: np.ndarray, num_lags: int = 20) -> np.ndarray:
    """ACF per column up to num_lags; (num_lags,) for 1-d input, else
    (num_lags, n_paths)."""
    a = np.asarray(a, dtype=float)
    squeeze = a.ndim == 1
    if squeeze:
        a = a[:, None]
    a = a - np.nanmean(a, axis=0, keepdims=True)
    denom = np.nansum(a * a, axis=0)
    acfs = np.empty((num_lags, a.shape[1]))
    for lag in range(num_lags):
        if lag == 0:
            acfs[0] = 1.0
        else:
            acfs[lag] = np.nansum(a[lag:] * a[:-lag], axis=0) / denom
    return acfs[:, 0] if squeeze else acfs


def compute_autocorr_power(alpha: float = 0.1, c: float = 1.0,
                           num_lags: int = 20) -> np.ndarray:
    """rough-volatility power-law ACF 1 - c (dt)^(2 alpha + 1)."""
    dts = np.arange(0, num_lags) / 260.0
    return 1.0 - c * np.power(dts, 2.0 * alpha + 1.0)


def fit_autocorr_power(vol: pd.Series, num_lags: int = 60) -> Tuple[float, float]:
    empirical = compute_path_autocorr(a=vol.to_numpy(), num_lags=num_lags)

    def objective(pars, args=None) -> float:
        model = compute_autocorr_power(alpha=pars[0], c=pars[1], num_lags=num_lags)
        return float(np.nansum(np.square(model - empirical)))

    res = minimize(objective, np.array([0.1, 0.99]), method="SLSQP",
                   bounds=((-0.5, 0.5), (0.01, 1.5)),
                   options={"disp": False, "ftol": 1e-8})
    return float(res.x[0]), float(res.x[1])


def simulate_vol_paths_with_brownians(params: LogSvParams,
                                      brownians: np.ndarray) -> np.ndarray:
    """Euler vol paths on the supplied (nb_steps, nb_path) Brownian panel
    (dW already scaled by sqrt(dt))."""
    dt = 1.0 / 260.0
    vartheta2 = params.vartheta2
    vartheta = np.sqrt(vartheta2)
    log_sigma = np.full(brownians.shape[1], np.log(params.theta))
    sigma = np.exp(log_sigma)
    out = np.empty((brownians.shape[0] + 1, brownians.shape[1]))
    out[0] = sigma
    for i in range(brownians.shape[0]):
        log_sigma = log_sigma + ((params.kappa1 * params.theta / sigma - params.kappa1)
                                 + params.kappa2 * (params.theta - sigma)
                                 - 0.5 * vartheta2) * dt + vartheta * brownians[i]
        sigma = np.exp(log_sigma)
        out[i + 1] = sigma
    return out


def simulate_autocorr(params: LogSvParams,
                      brownians: np.ndarray = None,
                      nb_path: int = 1000,
                      nb_steps: int = 260,
                      num_lags: int = 20) -> np.ndarray:
    if brownians is None:
        brownians = get_brownians(nb_steps=nb_steps, nb_path=nb_path)
    sigma_t = simulate_vol_paths_with_brownians(params=params, brownians=brownians)
    return compute_path_autocorr(a=sigma_t, num_lags=num_lags)


def get_brownians(nb_steps: int, nb_path: int) -> np.ndarray:
    """module-cached frozen Brownians (fixed-randoms fitting contract)."""
    try:
        return get_brownians.brownians
    except AttributeError:
        rng = np.random.default_rng(24)
        get_brownians.brownians = np.sqrt(1.0 / 260.0) * rng.standard_normal(
            size=(nb_steps, nb_path))
        return get_brownians.brownians


def fit_autocorr_logsv(vol: pd.Series,
                       nb_path: int = 1000,
                       num_lags: int = 60,
                       ttm: float = 10.0) -> LogSvParams:
    """fit (kappa1, kappa2) to the empirical ACF, with (theta, volvol)
    re-fitted to the steady-state histogram at each iterate (reference
    :73-111)."""
    nb_steps = int(260 * ttm)
    brownians = get_brownians(nb_steps=nb_steps, nb_path=nb_path)
    empirical = compute_path_autocorr(a=vol.to_numpy(), num_lags=num_lags)

    def unpack(pars) -> LogSvParams:
        return ssd.fit_distribution_log_sv_fixed_kappa(vol=vol, kappa1=pars[0],
                                                       kappa2=pars[1])

    def objective(pars, args=None) -> float:
        model_acfs = simulate_autocorr(params=unpack(pars), brownians=brownians,
                                       num_lags=num_lags)
        return float(np.nansum(np.square(np.mean(model_acfs, axis=1) - empirical)))

    res = minimize(objective, np.array([2.0, 2.0]), method="SLSQP",
                   bounds=((0.2, 10), (0.2, 10)),
                   options={"disp": False, "ftol": 1e-8})
    return unpack(res.x)


def autocorr_fit_report_logsv(vol: pd.Series,
                              params: LogSvParams,
                              nb_path: int = 5000,
                              num_lags: int = 90,
                              ttm: float = 10.0,
                              title: str = None,
                              ax: plt.Subplot = None) -> None:
    """empirical vs LogSV vs rough power-law ACF panel (reference :114-163)."""
    index = range(0, num_lags)
    empirical = pd.Series(compute_path_autocorr(a=vol.to_numpy(), num_lags=num_lags),
                          index=index, name="Empirical")
    nb_steps = int(260 * ttm)
    brownians = get_brownians(nb_steps=nb_steps, nb_path=nb_path)
    model_acfs = simulate_autocorr(params=params, brownians=brownians,
                                   num_lags=num_lags)
    model_acf = pd.Series(np.mean(model_acfs, axis=1), index=index, name="Log SV")
    alpha, c = fit_autocorr_power(vol=vol, num_lags=num_lags)
    pf_power = pd.Series(compute_autocorr_power(alpha=alpha, c=c, num_lags=num_lags),
                         index=index, name=r"Rough $\alpha$" + f"={alpha:0.2f}")
    df = pd.concat([empirical, model_acf, pf_power], axis=1)
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(18, 10), tight_layout=True)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_xlabel("Lag")
    if title is not None:
        ax.set_title(title, color="darkblue")


class UnitTests(Enum):
    EMPIRICAL_AUTOCORR = 1
    AUTOCORR_POWER = 2
    FIT_AUTOCORR_LOGSV = 3
    FIT_REPORT = 4


def run_unit_test(unit_test: UnitTests):
    vol, _ = fetch_ohlc_vol(ticker="VIX")
    if unit_test == UnitTests.EMPIRICAL_AUTOCORR:
        print(compute_path_autocorr(a=vol.to_numpy(), num_lags=20))
    elif unit_test == UnitTests.AUTOCORR_POWER:
        alpha, c = fit_autocorr_power(vol=vol)
        print(f"alpha={alpha}, c={c}")
    elif unit_test == UnitTests.FIT_AUTOCORR_LOGSV:
        print(fit_autocorr_logsv(vol=vol))
    elif unit_test == UnitTests.FIT_REPORT:
        params = ssd.fit_distribution_log_sv(vol=vol)
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 7), tight_layout=True)
        autocorr_fit_report_logsv(vol=vol, params=params, ax=ax)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.FIT_REPORT)
