"""
Figures 5/6/7 of "Stochastic volatility for factor Heath-Jarrow-Morton
framework" (Sepp & Rakhmonov, Review of Derivatives Research 28:12):
calibrated Nelson-Siegel multi-factor LogSV swaption smiles vs the USD
swaption surface of 18 August 2023, and the analytic (DE quadrature) vs
Monte-Carlo benchmark.

Reproduces /root/reference/papers/sv_for_factor_hjm/calibration_fig_5_6_7.py
against the TPU framework. The market snapshot (forwards, strikes, normal
ivols) and the paper's fitted parameters are data constants from the
reference (:109-215).
"""
from __future__ import annotations

from enum import Enum
from typing import Dict, List

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.ops.bachelier as bachel
from stochvolmodels_tpu import (
    MultiFactRateLogSvParams,
    NelsonSiegel,
    SwOptionChain,
    TermStructure,
)
from stochvolmodels_tpu.models.factor_hjm import logsv_chain_de_pricer
from stochvolmodels_tpu.models.factor_hjm.factor_hjm_pricer import calc_mc_vols
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder
from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid


def get_swaption_data(ccy: str = "USD") -> SwOptionChain:
    """USD swaption normal-vol cube of 18 August 2023 (reference :109-168)."""
    ttms_ids = ["1y", "2y", "3y", "5y", "7y", "10y"]
    ttms = np.array([1.0, 2.0, 3.0, 5.0, 7.0, 10.0])
    tenors = np.array([2.0, 5.0, 10.0])
    tenors_ids = ["2y", "5y", "10y"]
    forwards = [np.array([4.0750, 4.0350, 4.0550, 4.1150, 4.1550, 4.1000]) * 0.01,
                np.array([4.0750, 4.0350, 4.0500, 4.1150, 4.1550, 4.1000]) * 0.01,
                np.array([4.0750, 4.0300, 4.0500, 4.1150, 4.1500, 4.1000]) * 0.01]
    ivs = [[np.array([164.82, 159.85, 156.28, 153.48, 151.6, 150.76, 151, 152.28, 154.51]) * 1e-4,
            np.array([137.84, 137.23, 137.64, 139.12, 141.67, 145.16, 149.44, 154.33, 159.7]) * 1e-4,
            np.array([123.88, 123.76, 124.84, 127.2, 130.75, 135.3, 140.61, 146.47, 152.7]) * 1e-4,
            np.array([109.39, 108.57, 109.15, 111.27, 114.8, 119.48, 124.97, 130.99, 137.34]) * 1e-4,
            np.array([99.54, 98.4, 98.57, 100.24, 103.34, 107.59, 112.66, 118.27, 124.2]) * 1e-4,
            np.array([90.59, 88.27, 87.23, 87.26, 90.24, 94.11, 99.04, 104.62, 110.57]) * 1e-4],
           [np.array([139.42, 136.82, 135.02, 134.17, 134.47, 135.62, 137.86, 140.94, 144.72]) * 1e-4,
            np.array([123.91, 122.97, 123.11, 124.43, 126.89, 130.35, 134.64, 139.55, 144.91]) * 1e-4,
            np.array([112.89, 112.6, 113.52, 115.7, 119.04, 123.33, 128.34, 133.86, 139.71]) * 1e-4,
            np.array([102.3, 101.56, 102.1, 104.02, 107.22, 111.46, 116.44, 121.92, 127.71]) * 1e-4,
            np.array([93.71, 92.57, 92.67, 94.16, 96.98, 100.9, 105.6, 110.81, 116.34]) * 1e-4,
            np.array([84.25, 82.31, 81.6, 82.41, 84.79, 88.48, 93.08, 98.26, 103.77]) * 1e-4],
           [np.array([116.41, 115.51, 115.54, 116.59, 118.62, 121.54, 125.2, 129.44, 134.11]) * 1e-4,
            np.array([108.04, 107.74, 108.47, 110.25, 113.03, 116.65, 120.93, 125.68, 130.78]) * 1e-4,
            np.array([101.43, 101.38, 102.35, 104.34, 107.29, 111.01, 115.32, 120.05, 125.07]) * 1e-4,
            np.array([91.69, 91.41, 92.33, 94.48, 97.72, 101.83, 106.54, 111.65, 117]) * 1e-4,
            np.array([84.28, 83.64, 84.33, 86.47, 89.89, 94.28, 99.32, 104.76, 110.4]) * 1e-4,
            np.array([74.54, 73.66, 74.14, 76.14, 79.51, 83.87, 88.87, 94.22, 99.75]) * 1e-4]]
    strikes_ttms = [[np.array([2.56, 2.93875, 3.3175, 3.69625, 4.075, 4.45375, 4.8325, 5.21125, 5.59]) * 0.01,
                     np.array([2.03, 2.53125, 3.0325, 3.53375, 4.035, 4.53625, 5.0375, 5.53875, 6.04]) * 0.01,
                     np.array([1.79, 2.35625, 2.9225, 3.48875, 4.055, 4.62125, 5.1875, 5.75375, 6.32]) * 0.01,
                     np.array([1.55, 2.19125, 2.8325, 3.47375, 4.115, 4.75625, 5.3975, 6.03875, 6.68]) * 0.01,
                     np.array([1.42, 2.10375, 2.7875, 3.47125, 4.155, 4.83875, 5.5225, 6.20625, 6.89]) * 0.01,
                     np.array([1.25, 1.9625, 2.675, 3.3875, 4.1, 4.8125, 5.525, 6.2375, 6.95]) * 0.01],
                    [np.array([2.73, 3.06625, 3.4025, 3.73875, 4.075, 4.41125, 4.7475, 5.08375, 5.42]) * 0.01,
                     np.array([2.24, 2.68875, 3.1375, 3.58625, 4.035, 4.48375, 4.9325, 5.38125, 5.83]) * 0.01,
                     np.array([1.99, 2.505, 3.02, 3.535, 4.05, 4.565, 5.08, 5.595, 6.11]) * 0.01,
                     np.array([1.72, 2.31875, 2.9175, 3.51625, 4.115, 4.71375, 5.3125, 5.91125, 6.51]) * 0.01,
                     np.array([1.59, 2.23125, 2.8725, 3.51375, 4.155, 4.79625, 5.4375, 6.07875, 6.72]) * 0.01,
                     np.array([1.42, 2.09, 2.76, 3.43, 4.1, 4.77, 5.44, 6.11, 6.78]) * 0.01],
                    [np.array([2.89, 3.18625, 3.4825, 3.77875, 4.075, 4.37125, 4.6675, 4.96375, 5.26]) * 0.01,
                     np.array([2.43, 2.83, 3.23, 3.63, 4.03, 4.43, 4.83, 5.23, 5.63]) * 0.01,
                     np.array([2.19, 2.655, 3.12, 3.585, 4.05, 4.515, 4.98, 5.445, 5.91]) * 0.01,
                     np.array([1.93, 2.47625, 3.0225, 3.56875, 4.115, 4.66125, 5.2075, 5.75375, 6.3]) * 0.01,
                     np.array([1.77, 2.365, 2.96, 3.555, 4.15, 4.745, 5.34, 5.935, 6.53]) * 0.01,
                     np.array([1.59, 2.2175, 2.845, 3.4725, 4.1, 4.7275, 5.355, 5.9825, 6.61]) * 0.01]]
    return SwOptionChain.create_swaption_chain_MF(
        ccy=ccy, tenors=tenors, tenors_ids=tenors_ids, ttms=ttms, ttms_ids=ttms_ids,
        forwards=forwards, strikes_ttms=strikes_ttms, ivs=ivs, ticker="USD_aug_23")


def get_calib_rate_logsv_params() -> Dict[str, MultiFactRateLogSvParams]:
    """the paper's fitted Nelson-Siegel parameters (reference :171-215)."""
    ttms = np.array([1.0, 2.0, 3.0, 5.0])
    R_corr = np.array([[1.0, 0.99, 0.97], [0.99, 1.0, 0.98], [0.97, 0.98, 1.0]])
    nelson_siegel = NelsonSiegel(meanrev=0.55, key_terms=np.array([2.0, 5.0, 10.0]))
    times = np.concatenate((0, ttms), axis=None)
    params0 = MultiFactRateLogSvParams(
        sigma0=1.0, theta=1.0, kappa1=0.25, kappa2=0.25,
        beta=TermStructure.create_multi_fact_from_vec(times, np.array([0.2, 0.2, 0.2])),
        volvol=TermStructure.create_from_scalar(times, 0.2),
        A=np.array([0.01, 0.01, 0.01]), R=R_corr, basis=nelson_siegel,
        ccy="USD", vol_interpolation="BY_YIELD")
    params0.update_params(idx=0,
                          A_idx=np.array([0.0145520600966057, 0.0129872854900715, 0.0113053431415981]),
                          beta_idx=np.array([1.5175197006627835e-02, 1.0634920321914283e-01, 6.6674118846722419e-01]),
                          volvol_idx=0.0972782445446557)
    params0.update_params(idx=1,
                          A_idx=np.array([0.0134748570248017, 0.0128907769293694, 0.0112651548589306]),
                          beta_idx=np.array([4.8368206184131085e-01, 1.7547946297795609e-02, -2.8323520431018540e-01]),
                          volvol_idx=0.1071198215096482)
    params0.update_params(idx=2,
                          A_idx=np.array([0.011573352659394, 0.0122196017111508, 0.010764379038105]),
                          beta_idx=np.array([6.5149765993861006e-02, -8.1944955908784672e-02, -1.2933054838433659e-04]),
                          volvol_idx=0.0744932897602731)
    params0.update_params(idx=3,
                          A_idx=np.array([0.0070554411390967, 0.0097915826853067, 0.0086699569420959]),
                          beta_idx=np.array([4.0771895182424006e-01, -7.2998068741307848e-02, -4.0049869808018973e-01]),
                          volvol_idx=0.03)
    return {"USD": params0}


def plot_mkt_model_joint_smile_MF(swaption_chain: SwOptionChain,
                                  params0: MultiFactRateLogSvParams,
                                  ttms_ids: List[str],
                                  tenors: List[str]) -> plt.Figure:
    """model smiles (per expiry) vs market ivols, per tenor panel, on the
    put-delta axis (reference :27-102)."""
    idx_ttms = np.in1d(swaption_chain.ttms_ids, ttms_ids).nonzero()[0]
    ttms = np.array(swaption_chain.ttms)[range(np.max(idx_ttms) + 1)]
    t_grid = generate_ttms_grid(ttms)
    palettes = ["blue", "green", "magenta", "cyan", "orange"]

    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, len(tenors), figsize=(18, 5), tight_layout=True)

    for ttm, palette in zip(ttms, palettes):
        idx = int(np.where(swaption_chain.ttms == ttm)[0][0])
        forwards = [swaption_chain.forwards[i][[idx]]
                    for i, _ in enumerate(swaption_chain.tenors_ids)]
        strikes_ttms = [swaption_chain.strikes_ttms[i][slice(idx, idx + 1)]
                        for i, _ in enumerate(swaption_chain.tenors_ids)]
        optiontypes_ttms = [swaption_chain.optiontypes_ttms[idx]]
        _, model_ivs_ttms = logsv_chain_de_pricer(
            params=params0, t_grid=t_grid, ttms=ttms[idx:idx + 1],
            forwards=forwards, strikes_ttms=strikes_ttms,
            optiontypes_ttms=optiontypes_ttms,
            expansion_order=ExpansionOrder.FIRST)
        for idx_tenor, tenor_id in enumerate(tenors):
            ax = axs[idx_tenor]
            x_grid = bachel.strikes_to_delta(
                strikes=swaption_chain.strikes_ttms[idx_tenor][idx],
                ivols=swaption_chain.bid_ivs[idx_tenor][idx],
                f0=swaption_chain.forwards[idx_tenor][idx], ttm=ttm)
            mkt = SwOptionChain.remap_to_inc_delta(pd.Series(
                swaption_chain.bid_ivs[idx_tenor][idx], index=x_grid,
                name="market").sort_index())
            model = SwOptionChain.remap_to_inc_delta(pd.Series(
                np.asarray(model_ivs_ttms[idx_tenor][0]), index=x_grid,
                name=f"{swaption_chain.ttms_ids[idx]}: model").sort_index())
            sns.lineplot(data=pd.concat([model], axis=1), ax=ax, palette=[palette])
            sns.scatterplot(data=pd.concat([mkt], axis=1), ax=ax, palette=["red"])
    for idx_tenor, tenor_id in enumerate(tenors):
        ax = axs[idx_tenor]
        ax.set_xticks([-0.8, -0.65, -0.5, -0.35, -0.2])
        ax.set_xticklabels([f"{x:.2f}" for x in SwOptionChain.remap_to_pc_delta(
            np.asarray(ax.get_xticks()))])
        ax.set_title(f"USD: {tenor_id} market data", color="darkblue")
    return fig


def benchmark_analytic_vs_mc(swaption_chain: SwOptionChain,
                             params0: MultiFactRateLogSvParams,
                             ttm_id: str = "1y",
                             nb_path: int = 50000) -> pd.DataFrame:
    """DE-quadrature vols vs MC vols at the key-term tenors (reference
    benchmark(), :218-276)."""
    chain = swaption_chain.reduce_tenors(["2y", "5y", "10y"]).reduce_strikes(2)
    chain = chain.reduce_ttms([ttm_id])
    ttm = chain.ttms[-1]
    t_grid = generate_ttms_grid(np.asarray(chain.ttms))
    optiontypes = np.repeat("C", chain.strikes_ttms[0][0].size)

    _, de_ivols = logsv_chain_de_pricer(
        params=params0, t_grid=t_grid, ttms=np.array([ttm]),
        forwards=[f[-1:] for f in chain.forwards],
        strikes_ttms=[s[-1:] for s in chain.strikes_ttms],
        optiontypes_ttms=[optiontypes],
        expansion_order=ExpansionOrder.FIRST)
    _, mc_ivols, _, _ = calc_mc_vols(
        basis_type="NELSON-SIEGEL", params=params0, ttm=ttm,
        tenors=chain.tenors, forwards=[f[-1:] for f in chain.forwards],
        strikes_ttms=[s[-1:] for s in chain.strikes_ttms],
        optiontypes=optiontypes, is_annuity_measure=False, nb_path=nb_path)
    rows = {}
    for i, tenor_id in enumerate(chain.tenors_ids):
        rows[f"{tenor_id} DE (bp)"] = np.round(np.asarray(de_ivols[i][0]).ravel() * 1e4, 1)
        rows[f"{tenor_id} MC (bp)"] = np.round(np.asarray(mc_ivols[i]).ravel() * 1e4, 1)
    return pd.DataFrame(rows)


class UnitTests(Enum):
    PLOT_MKT_MODEL = 5
    BENCHMARK_ANALYTIC_VS_MC = 8


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    swaption_chain = get_swaption_data()
    params0 = get_calib_rate_logsv_params()["USD"]
    if unit_test == UnitTests.PLOT_MKT_MODEL:
        fig = plot_mkt_model_joint_smile_MF(swaption_chain=swaption_chain,
                                            params0=params0,
                                            ttms_ids=["1y", "2y", "3y", "5y"],
                                            tenors=["2y", "5y", "10y"])
        if is_save:
            from papers import local_path as lp
            import stochvolmodels_tpu.plotting.plots as plot
            plot.save_fig(fig=fig, local_path=lp.get_output_path(),
                          file_name="hjm_swaption_fit")
    elif unit_test == UnitTests.BENCHMARK_ANALYTIC_VS_MC:
        df = benchmark_analytic_vs_mc(swaption_chain=swaption_chain, params0=params0)
        print(df)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.BENCHMARK_ANALYTIC_VS_MC)
