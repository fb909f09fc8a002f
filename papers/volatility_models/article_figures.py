"""
Entry point for "What Is a Robust Stochastic Volatility Model" (SSRN 4647027):
vol time series, steady-state distribution fits, autocorrelation fits and
rolling vol betas across assets.

Reproduces /root/reference/papers/volatility_models/article_figures.py against
the TPU framework.  With yfinance absent the data layer substitutes simulated
LogSV series (papers/volatility_models/load_data.py), keeping every fit and
figure runnable offline.
"""
from __future__ import annotations

import string
from enum import Enum
from typing import List

import matplotlib.pyplot as plt
import pandas as pd
import seaborn as sns

import papers.volatility_models.ss_distribution_fit as ssd
import stochvolmodels_tpu.plotting.plots as plot
from papers.volatility_models.autocorr_fit import autocorr_fit_report_logsv
from papers.volatility_models.load_data import fetch_ohlc_vol
from papers.volatility_models.vol_beta import estimate_vol_beta

TICKERS = ["VIX", "OVX", "MOVE"]


def plot_vols(tickers: List[str] = TICKERS) -> plt.Figure:
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(len(tickers), 1, figsize=(14, 12), tight_layout=True)
    for idx, ticker in enumerate(tickers):
        vol, _ = fetch_ohlc_vol(ticker=ticker)
        vol.plot(ax=axs[idx])
        axs[idx].set_title(f"({string.ascii_uppercase[idx]}) {ticker}", color="darkblue")
    return fig


def plot_ss_distributions(tickers: List[str] = TICKERS) -> plt.Figure:
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, len(tickers), figsize=(18, 6), tight_layout=True)
    for idx, ticker in enumerate(tickers):
        vol, _ = fetch_ohlc_vol(ticker=ticker)
        logsv_params = ssd.fit_distribution_log_sv(vol=vol)
        heston_params = ssd.fit_distribution_heston(vol=vol)
        ssd.plot_estimated_svs(vol=vol, logsv_params=logsv_params,
                               heston_params=heston_params,
                               title=f"({string.ascii_uppercase[idx]}) {ticker}",
                               ax=axs[idx])
    return fig


def plot_autocorrs(tickers: List[str] = TICKERS) -> plt.Figure:
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, len(tickers), figsize=(18, 6), tight_layout=True)
    for idx, ticker in enumerate(tickers):
        vol, _ = fetch_ohlc_vol(ticker=ticker)
        params = ssd.fit_distribution_log_sv(vol=vol)
        autocorr_fit_report_logsv(vol=vol, params=params, nb_path=1000,
                                  title=f"({string.ascii_uppercase[idx]}) {ticker}",
                                  ax=axs[idx])
    return fig


def vol_beta_plots(tickers: List[str] = TICKERS, span: int = 65) -> plt.Figure:
    betas = []
    for ticker in tickers:
        vol, returns = fetch_ohlc_vol(ticker=ticker)
        betas.append(estimate_vol_beta(vol=vol, returns=returns, span=span).rename(ticker))
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(len(tickers), 1, figsize=(14, 12), tight_layout=True)
    for idx, beta in enumerate(betas):
        beta.plot(ax=axs[idx])
        axs[idx].set_title(f"({string.ascii_uppercase[idx]}) {tickers[idx]} vol beta",
                           color="darkblue")
    return fig


class UnitTests(Enum):
    PLOT_VOLS = 1
    SS_DISTRIBUTIONS = 2
    AUTOCORRS = 3
    VOL_BETAS = 4


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    local_path = None
    if is_save:
        from papers import local_path as lp
        local_path = lp.get_output_path()
    if unit_test == UnitTests.PLOT_VOLS:
        fig = plot_vols()
        name = "robust_sv_vols"
    elif unit_test == UnitTests.SS_DISTRIBUTIONS:
        fig = plot_ss_distributions()
        name = "robust_sv_ss_distributions"
    elif unit_test == UnitTests.AUTOCORRS:
        fig = plot_autocorrs()
        name = "robust_sv_autocorrs"
    elif unit_test == UnitTests.VOL_BETAS:
        fig = vol_beta_plots()
        name = "robust_sv_vol_betas"
    if is_save:
        plot.save_fig(fig=fig, local_path=local_path, file_name=name)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.SS_DISTRIBUTIONS)
