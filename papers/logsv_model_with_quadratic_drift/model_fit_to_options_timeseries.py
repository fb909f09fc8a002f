"""
Calibration of the quadratic-drift LogSV model to a time series of option
chains, with per-date fit reports and a parameter time-series summary.

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/model_fit_to_options_timeseries.py
against the TPU framework. Live chain loading needs the optional
``option-chain-analytics`` package (reference article_figures.py:17-23); when
it is absent, the time-series demo runs on vol-scaled perturbations of the
bundled BTC snapshot so the reporting path stays exercised end-to-end.
"""
from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Dict, Tuple

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import (
    ConstraintsType,
    LogsvModelCalibrationType,
    LogSvParams,
    LogSVPricer,
    OptionChain,
    get_btc_test_chain_data,
)

try:  # optional live-data dependency, same gating as the reference
    from option_chain_analytics import OptionsDataDFs, create_chain_from_from_options_dfs  # noqa: F401
    from option_chain_analytics.ts_loaders import ts_data_loader_wrapper  # noqa: F401
    HAS_OCA = True
except ImportError:
    HAS_OCA = False


def calibrate_logsv_model_with_fixed_kappas(option_chain: OptionChain,
                                            kappa1: float = 2.21,
                                            kappa2: float = 2.18) -> LogSvParams:
    """4-param fit (sigma0, theta, beta, volvol) with kappas held fixed; the
    ATM vols and 40-delta skews of the chain seed the initial values/bounds."""
    pricer = LogSVPricer()
    atm_vols = option_chain.get_chain_atm_vols()
    skews = option_chain.get_chain_skews(delta=0.4)
    params0 = LogSvParams(sigma0=float(atm_vols[0]), theta=float(atm_vols[-1]),
                          kappa1=kappa1, kappa2=kappa2,
                          beta=-2.0 * float(np.nanmean(skews)), volvol=1.0)
    return pricer.calibrate_model_params_to_chain(
        option_chain=option_chain,
        params0=params0,
        params_min=LogSvParams(sigma0=0.9 * float(atm_vols[0]), theta=0.9 * float(atm_vols[-1]),
                               kappa1=0.25, kappa2=0.25, beta=-3.0, volvol=0.9),
        params_max=LogSvParams(sigma0=1.1 * float(atm_vols[0]), theta=1.1 * float(atm_vols[-1]),
                               kappa1=10.0, kappa2=10.0, beta=3.0, volvol=6.0),
        constraints_type=ConstraintsType.MMA_MARTINGALE,
        model_calibration_type=LogsvModelCalibrationType.PARAMS4)


def plot_calibration_report(option_chain: OptionChain,
                            params: LogSvParams,
                            value_time: pd.Timestamp,
                            nb_path: int = 100000,
                            ) -> Tuple[Dict[str, Any], Dict[str, plt.Figure]]:
    """per-date report: fit figure, MC-comparison figure, per-slice RMSEs,
    ATM vols and skews."""
    pricer = LogSVPricer()
    fig1 = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain, params=params)
    fig2 = pricer.plot_model_ivols_vs_mc(option_chain=option_chain, params=params,
                                         nb_path=nb_path)
    figs_dict = {f"fig1_{value_time}": fig1, f"fig2_{value_time}": fig2}

    vol_scaler = pricer.set_vol_scaler(option_chain=option_chain)
    model_ivols = pricer.compute_model_ivols_for_chain(option_chain=option_chain,
                                                       params=params, vol_scaler=vol_scaler)
    output: Dict[str, Any] = params.to_dict()
    ids = option_chain.ids if option_chain.ids is not None else [str(t) for t in option_chain.ttms]
    for idx, slice_id in enumerate(ids):
        output[f"slice-{idx + 1} id"] = slice_id
    mses, spreads = [], []
    for idx, _ in enumerate(option_chain.ttms):
        mid = 0.5 * (option_chain.bid_ivs[idx] + option_chain.ask_ivs[idx])
        spread = 0.5 * (option_chain.ask_ivs[idx] - option_chain.bid_ivs[idx])
        mse = float(np.sqrt(np.nanmean(np.square(np.asarray(model_ivols[idx]) - mid))))
        output[f"slice-{idx + 1} mse"] = mse
        mses.append(mse)
        spreads.append(float(np.nanmean(spread)))
    output["avg mse"] = float(np.nanmean(mses))
    output["avg vol-spread"] = float(np.nanmean(spreads))
    output.update({f"atm_vol-{i + 1}": v for i, v in enumerate(option_chain.get_chain_atm_vols())})
    output.update({f"skew-{i + 1}": s for i, s in enumerate(option_chain.get_chain_skews(delta=0.4))})
    return output, figs_dict


def _scaled_chain(chain: OptionChain, vol_scale: float) -> OptionChain:
    """synthetic time-series stand-in: the bundled chain with bid/ask vols scaled."""
    return dataclasses.replace(
        chain,
        bid_ivs=[vol_scale * iv for iv in chain.bid_ivs],
        ask_ivs=[vol_scale * iv for iv in chain.ask_ivs])


def run_calibration_time_series(dates: pd.DatetimeIndex = None,
                                vol_scales: np.ndarray = None) -> pd.DataFrame:
    """calibrate per date and collect the fit reports; without
    option-chain-analytics the chains are synthetic perturbations of the
    bundled BTC snapshot."""
    if not HAS_OCA:
        print("option-chain-analytics not installed: running the synthetic"
              " bundled-chain time-series demo")
    if dates is None:
        dates = pd.date_range("2023-06-01", periods=4, freq="W")
    if vol_scales is None:
        vol_scales = np.linspace(0.9, 1.15, len(dates))
    base_chain = get_btc_test_chain_data()
    outputs = []
    for date, scale in zip(dates, vol_scales):
        chain = _scaled_chain(base_chain, float(scale))
        params = calibrate_logsv_model_with_fixed_kappas(option_chain=chain)
        output, _ = plot_calibration_report(option_chain=chain, params=params,
                                            value_time=date, nb_path=10000)
        outputs.append(pd.Series(output, name=date))
        plt.close("all")
    return pd.concat(outputs, axis=1).T


def report_calibration_timeseries(df: pd.DataFrame) -> plt.Figure:
    """time series of fitted params + fit quality (reference :131-164)."""
    param_cols = ["sigma0", "theta", "beta", "volvol"]
    fig, axs = plt.subplots(len(param_cols) + 1, 1, figsize=(10, 12), tight_layout=True)
    for ax, col in zip(axs, param_cols):
        plot.model_param_ts(param_ts=df[col].astype(float), title=col, ax=ax)
    plot.model_param_ts(param_ts=df["avg mse"].astype(float), title="avg fit RMSE", ax=axs[-1])
    return fig


class UnitTests(Enum):
    SINGLE_FIT = 1
    TIME_SERIES = 2


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.SINGLE_FIT:
        chain = get_btc_test_chain_data()
        params = calibrate_logsv_model_with_fixed_kappas(option_chain=chain)
        output, figs = plot_calibration_report(option_chain=chain, params=params,
                                               value_time=pd.Timestamp("2021-10-21"))
        print(pd.Series(output))
        if is_save:
            from papers import local_path as lp
            plot.save_figs(figs=figs, local_path=lp.get_output_path())
    elif unit_test == UnitTests.TIME_SERIES:
        df = run_calibration_time_series()
        print(df)
        fig = report_calibration_timeseries(df)
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(),
                          file_name="calibration_timeseries")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.SINGLE_FIT)
