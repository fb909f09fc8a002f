"""
Illustrations for the Student-t terminal-distribution option pricer: implied
drift / model forward / default probability term structures, and implied-vol
smiles as functions of nu and vol.

Reproduces /root/reference/papers/t_distribution/illustrations.py against the
TPU framework (closed-form t-dist pricer: stochvolmodels_tpu/ops/tdist.py,
reference pricers/analytic/tdist.py:116-157).
"""
from __future__ import annotations

from enum import Enum
from typing import List

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import (
    compute_default_prob_tdist,
    compute_forward_tdist,
    compute_vanilla_price_tdist,
    imply_drift_tdist,
    infer_bsm_ivols_from_slice_prices,
    infer_normal_ivols_from_slice_prices,
)


def plot_implied_drift_forward_defaultp(spot: float = 1.0, vol: float = 0.2,
                                        nu: float = 3.0) -> plt.Figure:
    ttms = np.linspace(0.004, 1.0, 20)
    rf_rates = np.linspace(0.0, 0.05, 6)
    mus_ttm, forwards_ttm, default_prob_ttm = {}, {}, {}
    for rf_rate in rf_rates:
        mus = np.array([imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=t) for t in ttms])
        fwd = np.array([compute_forward_tdist(spot=spot, rf_rate=rf_rate, vol=vol, nu=nu, ttm=t) for t in ttms])
        dp = np.array([compute_default_prob_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=t) for t in ttms])
        key = f"rf_rate={rf_rate:,.2%}"
        mus_ttm[key] = pd.Series(mus, index=ttms)
        forwards_ttm[key] = pd.Series(fwd, index=ttms)
        default_prob_ttm[key] = pd.Series(dp, index=ttms)

    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(3, 1, figsize=(14, 14), tight_layout=True)
    for ax, (title, data) in zip(axs, [("(A) Implied Drift", mus_ttm),
                                       ("(B) Model Forward", forwards_ttm),
                                       ("(C) Model Default prob", default_prob_ttm)]):
        sns.lineplot(data=pd.DataFrame(data), dashes=False, ax=ax)
        ax.set_title(title, color="darkblue")
        ax.set_xlabel("ttm")
    return fig


def plot_tdist_ivols_vs_bsm_normal(spot: float = 1.0, vol: float = 0.5,
                                   nu: float = 2.5, ttm: float = 1.0 / 12.0,
                                   rf_rate: float = 0.0,
                                   ax: plt.Subplot = None) -> None:
    strikes = np.linspace(0.5, 1.5, 40)
    optiontypes = np.where(strikes <= 1.0, "P", "C")
    prices = compute_vanilla_price_tdist(spot=spot, strikes=strikes, optiontypes=optiontypes,
                                         ttm=ttm, vol=vol, nu=nu, rf_rate=rf_rate)
    discfactor = np.exp(-rf_rate * ttm)
    forward = np.exp(rf_rate * ttm) * spot
    bsm = infer_bsm_ivols_from_slice_prices(ttm=ttm, forward=forward, strikes=strikes,
                                            optiontypes=optiontypes, model_prices=prices,
                                            discfactor=discfactor)
    nrm = infer_normal_ivols_from_slice_prices(ttm=ttm, forward=forward, strikes=strikes,
                                               optiontypes=optiontypes, model_prices=prices,
                                               discfactor=discfactor)
    vols = pd.concat([pd.Series(np.asarray(bsm), index=strikes, name="BSM implied vol"),
                      pd.Series(np.asarray(nrm), index=strikes, name="Normal implied vol")], axis=1)
    sns.lineplot(data=vols, dashes=False, ax=ax)
    ax.set_title(f"t-distribution implied vols, nu = {nu:0.2f}", color="darkblue")


def plot_tdist_ivols_nu(spot: float = 1.0, vol: float = 0.2,
                        ttm: float = 1.0 / 12.0,
                        nus: List[float] = (2.5, 3.0, 4.0, 5.0, 10.0, 20.0),
                        rf_rate: float = 0.0,
                        ax: plt.Subplot = None) -> None:
    forward = spot * np.exp(ttm * rf_rate)
    discfactor = np.exp(-ttm * rf_rate)
    strikes = np.linspace(0.5, 1.5, 100)
    optiontypes = np.where(strikes <= 1.0, "P", "C")
    bsm_vols = {}
    for nu in nus:
        prices = compute_vanilla_price_tdist(spot=spot, strikes=strikes, optiontypes=optiontypes,
                                             ttm=ttm, vol=vol, nu=nu, rf_rate=rf_rate)
        bsm_vols[f"nu={nu:0.2f}"] = np.asarray(
            infer_bsm_ivols_from_slice_prices(ttm=ttm, forward=forward, discfactor=discfactor,
                                              strikes=strikes, optiontypes=optiontypes,
                                              model_prices=prices))
    df = pd.DataFrame(bsm_vols, index=strikes)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_title(f"t-distribution implied BSM vols, ttm={ttm:0.2f}", color="darkblue")
    ax.set_xlabel("% strike")
    ax.set_ylabel("Implied vol")


def plot_tdist_ivols_vol(vols: List[float] = (0.2, 0.3, 0.4, 0.8),
                         ttm: float = 1.0 / 12.0, nu: float = 2.5,
                         ax: plt.Subplot = None) -> None:
    strikes = np.linspace(0.5, 1.5, 100)
    optiontypes = np.where(strikes <= 1.0, "P", "C")
    bsm_vols = {}
    for vol in vols:
        prices = compute_vanilla_price_tdist(spot=1.0, strikes=strikes, optiontypes=optiontypes,
                                             ttm=ttm, vol=vol, nu=nu)
        bsm_vols[f"vol={vol:0.2f}"] = np.asarray(
            infer_bsm_ivols_from_slice_prices(ttm=ttm, forward=1.0, discfactor=1.0,
                                              strikes=strikes, optiontypes=optiontypes,
                                              model_prices=prices))
    df = pd.DataFrame(bsm_vols, index=strikes)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_title(f"t-distribution implied BSM vols, ttm={ttm:0.2f}", color="darkblue")
    ax.set_xlabel("% strike")
    ax.set_ylabel("Implied vol")


class UnitTests(Enum):
    PLOT_IMPLIED_DRIFT_FORWARD_DEFAULTPROB = 1
    PLOT_IMPLIED_VOLS_VS_BSM_NORMAL = 2
    PLOT_IVOLS_NU = 3
    PLOT_IVOLS_VOL = 4


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    from papers import local_path as lp
    local_path = lp.get_output_path() if is_save else None

    if unit_test == UnitTests.PLOT_IMPLIED_DRIFT_FORWARD_DEFAULTPROB:
        fig = plot_implied_drift_forward_defaultp()
        if is_save:
            plot.save_fig(fig=fig, file_name="mus", local_path=local_path)
    elif unit_test == UnitTests.PLOT_IMPLIED_VOLS_VS_BSM_NORMAL:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(14, 6), tight_layout=True)
        plot_tdist_ivols_vs_bsm_normal(vol=0.5, nu=2.5, ax=axs[0])
        plot_tdist_ivols_vs_bsm_normal(vol=0.5, nu=5.0, ax=axs[1])
    elif unit_test == UnitTests.PLOT_IVOLS_NU:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(14, 6), tight_layout=True)
        plot_tdist_ivols_nu(vol=0.2, ttm=5.0 / 252.0, ax=axs[0])
        plot_tdist_ivols_nu(vol=0.2, ttm=1.0 / 12.0, ax=axs[1])
        plot.align_y_limits_axs(axs)
        if is_save:
            plot.save_fig(fig=fig, file_name="vols_in_nu", local_path=local_path)
    elif unit_test == UnitTests.PLOT_IVOLS_VOL:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(14, 6), tight_layout=True)
        plot_tdist_ivols_vol(nu=2.5, ttm=5.0 / 252.0, ax=axs[0])
        plot_tdist_ivols_vol(nu=2.5, ttm=1.0 / 12.0, ax=axs[1])
        plot.align_y_limits_axs(axs)
        if is_save:
            plot.save_fig(fig=fig, file_name="vols_in_vol", local_path=local_path)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.PLOT_IVOLS_NU)
