"""
Entry point reproducing the figures of "Log-normal Stochastic Volatility
Model with Quadratic Drift" (Sepp & Rakhmonov, IJTAF 26(8), 2450003).

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/article_figures.py
against the TPU framework. The reference pulls a live BTC chain through
``option-chain-analytics``; here the bundled 21Oct2021 BTC snapshot
(reference data/sample_option_chains.py:14-69) is used so every figure runs
offline. Figures 1-5 delegate to the sibling modules; 6-10 are built here.
"""
from __future__ import annotations

import string
from enum import Enum
from typing import List, Tuple

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import papers.logsv_model_with_quadratic_drift.moments_vol_qvar as mvq
import papers.logsv_model_with_quadratic_drift.ode_sol_in_time as osi
import papers.logsv_model_with_quadratic_drift.steady_state_pdf as ssp
import stochvolmodels_tpu.data.sample_chains as chains
import stochvolmodels_tpu.plotting.plots as plot
from papers import local_path as lp
from stochvolmodels_tpu import (
    ExpansionOrder,
    LogSvParams,
    LogSVPricer,
    OptionChain,
    VariableType,
    compute_analytic_qvar,
    compute_histogram_data,
)

# reference fit at the 2023-06-30 BTC snapshot (article_figures.py:168)
ARTICLE_PARAMS = LogSvParams(sigma0=0.4083, theta=0.3789, kappa1=2.21, kappa2=2.18,
                             beta=0.5010, volvol=3.0633)
# fit to the bundled 21Oct2021 chain (calibrations.py:32)
BTC_PARAMS = LogSvParams(sigma0=0.8327, theta=1.0139, kappa1=4.8609, kappa2=4.7940,
                         beta=0.1988, volvol=2.3694)


def plot_fitted_model(option_chain: OptionChain,
                      params: LogSvParams,
                      figsize: Tuple[float, float] = (18, 7),
                      fontsize: int = 14,
                      nb_path: int = 400000) -> Tuple[plt.Figure, plt.Figure]:
    """figures 8/9: bid-ask fit and MMA-vs-inverse MC comparison."""
    pricer = LogSVPricer()
    vol_scaler = pricer.set_vol_scaler(option_chain=option_chain)
    kwargs = dict(fontsize=fontsize, xvar_format="{:,.0f}")
    fig1 = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain, params=params,
                                              vol_scaler=vol_scaler, figsize=figsize, **kwargs)
    fig2 = pricer.plot_comp_mma_inverse_options_with_mc(option_chain=option_chain, params=params,
                                                        nb_path=nb_path, vol_scaler=vol_scaler,
                                                        figsize=figsize, **kwargs)
    return fig1, fig2


def plot_qvar_figure(params: LogSvParams, fontsize: int = 14,
                     nb_path: int = 200000) -> plt.Figure:
    """figure 10: options on quadratic variance, Fourier vs MC, with forwards
    set to the closed-form E[QV] (vol_moments.py / reference :118-154)."""
    pricer = LogSVPricer()
    ttms = {"1w": 7.0 / 365.0, "2w": 14.0 / 365.0, "1m": 1.0 / 12.0}
    option_chain = chains.get_qv_options_test_chain_data()
    option_chain = OptionChain.get_slices_as_chain(option_chain, ids=list(ttms.keys()))
    forwards = np.array([compute_analytic_qvar(params=params, ttm=ttm, n_terms=4)
                         for ttm in ttms.values()])
    print(f"QV forwards = {forwards}")
    option_chain.forwards = forwards
    option_chain.strikes_ttms = [forward * strikes for forward, strikes in
                                 zip(option_chain.forwards, option_chain.strikes_ttms)]
    return pricer.plot_comp_mma_inverse_options_with_mc(
        option_chain=option_chain, params=params, is_plot_vols=True,
        variable_type=VariableType.Q_VAR, figsize=(18, 7), nb_path=nb_path,
        fontsize=fontsize)


def plot_var_pdfs(params: LogSvParams,
                  ttm: float = 1.0,
                  axs: List[plt.Subplot] = None,
                  n: int = 200,
                  vol_scaler: float = None,
                  nb_path: int = 400000,
                  fontsize: int = 14) -> None:
    """figure 6: first/second-order expansion pdfs of (X, QV/t, sigma) vs MC."""
    pricer = LogSVPricer()
    x0, sigma0, qvar0 = pricer.simulate_terminal_values(ttm=ttm, params=params, nb_path=nb_path)
    qvar0 = np.asarray(qvar0) / ttm
    var_datas = {(r"Log-return $X_{\tau}$", VariableType.LOG_RETURN): np.asarray(x0),
                 (r"Quadratic Variance $\frac{I_{\tau}}{\tau}$", VariableType.Q_VAR): qvar0,
                 (r"Volatility $\sigma_{\tau}$", VariableType.SIGMA): np.asarray(sigma0)}
    if axs is None:
        with sns.axes_style("darkgrid"):
            _, axs = plt.subplots(1, 3, figsize=(18, 7), tight_layout=True)
    for idx, ((label, variable_type), mc_data) in enumerate(var_datas.items()):
        space_grid = params.get_variable_space_grid(variable_type=variable_type, ttm=ttm,
                                                    n=n, n_stdevs=4.5)
        pdfs = []
        for order, name in ((ExpansionOrder.FIRST, "1st order Expansion"),
                            (ExpansionOrder.SECOND, "2nd order Expansion")):
            xpdf = pricer.logsv_pdfs(params=params, ttm=ttm, space_grid=space_grid,
                                     variable_type=variable_type, expansion_order=order,
                                     vol_scaler=vol_scaler)
            pdfs.append(pd.Series(np.asarray(xpdf), index=space_grid, name=name))
        mc = compute_histogram_data(data=mc_data, x_grid=space_grid, name="MC")
        df = pd.concat([mc] + pdfs, axis=1)
        ax = axs[idx]
        sns.lineplot(data=df, dashes=False, palette=["lightblue", "green", "brown"], ax=ax)
        ax.fill_between(df.index, np.zeros_like(mc.to_numpy()), mc.to_numpy(),
                        facecolor="lightblue", step="mid", alpha=0.8, lw=1.0)
        ax.set_title(f"({string.ascii_uppercase[idx]}) {label}", color="darkblue")
        ax.set_ylim((0.0, None))
        if variable_type in (VariableType.Q_VAR, VariableType.SIGMA):
            ax.set_xlim((0.0, None))
        ax.set_xlabel(label, fontsize=fontsize)


class UnitTests(Enum):
    FIGURE1_STEADY_STATE = 1
    FIGURE2_VOL_MOMENTS = 2
    FIGURE3_QVAR_EXP = 3
    FIGURE4_FIRST_ORDER = 4
    FIGURE5_SECOND_ORDER = 5
    FIGURE6_JOINT_PDF = 6
    FIGURE8_9_FITTED_MODEL = 89
    FIGURE10_QVAR = 10


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    local_path = lp.get_output_path() if is_save else None
    option_chain = chains.get_btc_test_chain_data()

    if unit_test == UnitTests.FIGURE1_STEADY_STATE:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 3, figsize=(18, 6), tight_layout=True)
        ssp.plot_steady_state(title="(A) Steady state distribution of the volatility", ax=axs[0])
        ssp.plot_vol_skew(title=r"(B) Skewness of volatility as function of $\kappa_{2}$", ax=axs[1])
        ssp.plot_ss_kurtosis(title=r"(C) Excess kurtosis of log-returns as function of $\kappa_{2}$", ax=axs[2])
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure1_steady_state")
    elif unit_test == UnitTests.FIGURE2_VOL_MOMENTS:
        params = LogSvParams(sigma0=1.5, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=1.0)
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 2, figsize=(18, 6), tight_layout=True)
        mvq.plot_vol_moments_vs_mc(params=params, n_terms=4, n_terms_to_display=4,
                                   title=r"(A) Volatility moments with $k^{*}=4$", ax=ax[0])
        mvq.plot_vol_moments_vs_mc(params=params, n_terms=8, n_terms_to_display=4,
                                   title=r"(B) Volatility moments with $k^{*}=8$", ax=ax[1])
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure2_vol_moments")
    elif unit_test == UnitTests.FIGURE3_QVAR_EXP:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(18, 6), tight_layout=True)
        mvq.plot_qvar_vs_mc(params=(mvq.TEST_PARAMS | mvq.TEST_PARAMS2), ttm=2.0, is_vol=False,
                            title=r"Expected quadratic variance at time $\tau$", n_terms=4, ax=ax)
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure3_qvar_exp")
    elif unit_test == UnitTests.FIGURE4_FIRST_ORDER:
        fig = osi.plot_ode_solutions(params=ARTICLE_PARAMS, expansion_order=ExpansionOrder.FIRST)
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure4_first_order")
    elif unit_test == UnitTests.FIGURE5_SECOND_ORDER:
        fig = osi.plot_ode_solutions(params=ARTICLE_PARAMS, expansion_order=ExpansionOrder.SECOND)
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure5_second_order")
    elif unit_test == UnitTests.FIGURE6_JOINT_PDF:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 3, figsize=(18, 7), tight_layout=True)
        plot_var_pdfs(params=BTC_PARAMS, ttm=0.25, axs=axs)
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure6_joint_pdf")
    elif unit_test == UnitTests.FIGURE8_9_FITTED_MODEL:
        fig1, fig2 = plot_fitted_model(option_chain=option_chain, params=BTC_PARAMS)
        if is_save:
            plot.save_fig(fig=fig1, local_path=local_path, file_name="figure8_fit")
            plot.save_fig(fig=fig2, local_path=local_path, file_name="figure9_mma_inverse")
    elif unit_test == UnitTests.FIGURE10_QVAR:
        fig = plot_qvar_figure(params=BTC_PARAMS)
        if is_save:
            plot.save_fig(fig=fig, local_path=local_path, file_name="figure10_qvar")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.FIGURE8_9_FITTED_MODEL)
