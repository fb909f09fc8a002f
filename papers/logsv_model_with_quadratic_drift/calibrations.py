"""
Figures 11, 12, 13 and the data for Table 1 of the quadratic-drift LogSV
paper: model calibration to the implied volatilities of five assets
(BTC, VIX, GLD, SQQQ, SPY) from the bundled market snapshots.

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/calibrations.py
against the TPU framework: calibration runs gradient-based on device
instead of finite-difference SLSQP.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import stochvolmodels_tpu.data.sample_chains as chains
import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import (
    ConstraintsType,
    LogsvModelCalibrationType,
    LogSvParams,
    LogSVPricer,
    OptionChain,
)


class Assets(str, Enum):
    BTC = "Bitcoin"
    VIX = "Vix"
    GLD = "Gold"
    SQQQ = "-3x Nasdaq"
    SPY = "S&P500"


# reference fitted values (calibrations.py:29-36) — parity oracles for ours
CALIBRATED_PARAMS: Dict[Assets, LogSvParams] = {
    Assets.VIX: LogSvParams(sigma0=0.9767, theta=0.5641, kappa1=4.9067, kappa2=8.6985, beta=2.3425, volvol=1.0163),
    Assets.SQQQ: LogSvParams(sigma0=0.9114, theta=0.9390, kappa1=4.9544, kappa2=5.2762, beta=1.3215, volvol=0.9964),
    Assets.BTC: LogSvParams(sigma0=0.8327, theta=1.0139, kappa1=4.8609, kappa2=4.7940, beta=0.1988, volvol=2.3694),
    Assets.GLD: LogSvParams(sigma0=0.1505, theta=0.1994, kappa1=2.2062, kappa2=11.0630, beta=0.1547, volvol=2.8011),
    Assets.SPY: LogSvParams(sigma0=0.2270, theta=0.2616, kappa1=4.9325, kappa2=18.8550, beta=-1.8123, volvol=0.9832),
}


def get_asset_chain_data(asset: Assets = Assets.BTC) -> OptionChain:
    loaders = {Assets.BTC: chains.get_btc_test_chain_data,
               Assets.VIX: chains.get_vix_test_chain_data,
               Assets.GLD: chains.get_gld_test_chain_data,
               Assets.SQQQ: chains.get_sqqq_test_chain_data,
               Assets.SPY: chains.get_spy_test_chain_data}
    return loaders[asset]()


def get_initial_guess(asset: Assets) -> tuple[LogSvParams, ConstraintsType]:
    guesses = {
        Assets.BTC: (LogSvParams(sigma0=0.84, theta=1.04, kappa1=5.0, kappa2=None, beta=0.15, volvol=1.85),
                     ConstraintsType.INVERSE_MARTINGALE),
        Assets.VIX: (LogSvParams(sigma0=0.8, theta=0.6, kappa1=5.0, kappa2=None, beta=2.0, volvol=1.0),
                     ConstraintsType.MMA_MARTINGALE_MOMENT4),
        Assets.GLD: (LogSvParams(sigma0=0.1530, theta=0.1960, kappa1=2.2068, kappa2=11.2584, beta=0.1580, volvol=2.8022),
                     ConstraintsType.UNCONSTRAINT),
        Assets.SQQQ: (LogSvParams(sigma0=1.0, theta=1.0, kappa1=5.0, kappa2=None, beta=1.0, volvol=1.0),
                      ConstraintsType.MMA_MARTINGALE_MOMENT4),
        Assets.SPY: (LogSvParams(sigma0=0.2, theta=0.2, kappa1=5.0, kappa2=None, beta=-1.0, volvol=1.0),
                     ConstraintsType.MMA_MARTINGALE_MOMENT4),
    }
    return guesses[asset]


def calibrate_logsv_model(asset: Assets = Assets.BTC,
                          model_calibration_type: LogsvModelCalibrationType = LogsvModelCalibrationType.PARAMS5,
                          ) -> tuple[LogSvParams, plt.Figure]:
    params0, constraints_type = get_initial_guess(asset)
    option_chain = get_asset_chain_data(asset=asset)
    pricer = LogSVPricer()
    fit_params = pricer.calibrate_model_params_to_chain(
        option_chain=option_chain, params0=params0,
        model_calibration_type=model_calibration_type,
        constraints_type=constraints_type)
    fit_params.print_vol_moments_stability()
    print(fit_params)
    fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain, params=fit_params,
                                             headers=("(A)", "(B)", "(C)", "(D)"))
    return fit_params, fig


def all_params_table(calibrate: bool = False) -> pd.DataFrame:
    """Table 1: fitted parameters per asset (recalibrated when calibrate=True,
    otherwise the reference fitted values)."""
    rows = {}
    for asset in Assets:
        p = calibrate_logsv_model(asset=asset)[0] if calibrate else CALIBRATED_PARAMS[asset]
        rows[asset.value] = {"sigma0": p.sigma0, "theta": p.theta, "kappa1": p.kappa1,
                             "kappa2": p.kappa2, "beta": p.beta, "volvol": p.volvol,
                             "kappa": p.kappa, "vartheta2": p.vartheta2}
    return pd.DataFrame(rows).T


class UnitTests(Enum):
    CHAIN_DATA = 0
    CALIBRATION = 1
    MODEL_COMPARISON_WITH_MC = 2
    ALL_PARAMS_TABLE = 3


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.CHAIN_DATA:
        option_chain = get_asset_chain_data(asset=Assets.BTC)
        print(option_chain)
        print(option_chain.get_chain_atm_vols())
    elif unit_test == UnitTests.CALIBRATION:
        _, fig = calibrate_logsv_model(asset=Assets.BTC)
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="btc_calibration")
    elif unit_test == UnitTests.MODEL_COMPARISON_WITH_MC:
        pricer = LogSVPricer()
        option_chain = get_asset_chain_data(asset=Assets.BTC)
        fig = pricer.plot_model_ivols_vs_mc(option_chain=option_chain,
                                            params=CALIBRATED_PARAMS[Assets.BTC],
                                            nb_path=100000)
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="btc_mc_comp")
    elif unit_test == UnitTests.ALL_PARAMS_TABLE:
        print(all_params_table())
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.ALL_PARAMS_TABLE)
