"""
Forward-variance study: fitting the LogSV vol backbone to variance-swap
strikes replicated from the BTC chain, the 4-param calibration, the
varswap-backbone calibration mode, and the MC comparison.

Reproduces /root/reference/papers/forward_var/calibrate_forward_var.py
against the TPU framework.
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import stochvolmodels_tpu as sv
import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import (
    ConstraintsType,
    LogsvModelCalibrationType,
    LogSvParams,
    LogSVPricer,
    fit_model_vol_backbone_to_varswaps,
)


class UnitTests(Enum):
    VARSWAP_FIT = 1
    CALIBRATE_4PARAM_MODEL = 2
    CALIBRATE_VARSWAP_PARAM_MODEL = 3
    COMPARE_MODEL_VOLS_TO_MC = 4


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    pricer = LogSVPricer()
    option_chain = sv.get_btc_test_chain_data()
    local_path = None
    if is_save:
        from papers import local_path as lp
        local_path = lp.get_output_path()

    if unit_test == UnitTests.VARSWAP_FIT:
        btc_log_params = LogSvParams(sigma0=0.88, theta=0.88, kappa1=2.214702576955766,
                                     kappa2=2.18028273418397, beta=0.0,
                                     volvol=0.921487415907961)
        vars_swaps = option_chain.get_slice_varswap_strikes()
        vars_swaps1 = pd.Series(np.square(option_chain.get_chain_atm_vols()),
                                index=option_chain.ttms)
        vars_swaps = np.maximum(vars_swaps, vars_swaps1)
        vol_backbone = fit_model_vol_backbone_to_varswaps(log_sv_params=btc_log_params,
                                                          varswap_strikes=vars_swaps,
                                                          verbose=True)
        btc_log_params.set_vol_backbone(vol_backbone=vol_backbone)
        fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain,
                                                 params=btc_log_params)
        if is_save:
            plot.save_fig(fig=fig, file_name="varswap_backbone_fit", local_path=local_path)

    elif unit_test == UnitTests.CALIBRATE_4PARAM_MODEL:
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.18,
                              beta=0.15, volvol=2.0)
        fitted = pricer.calibrate_model_params_to_chain(
            option_chain=option_chain, params0=params0,
            model_calibration_type=LogsvModelCalibrationType.PARAMS4,
            constraints_type=ConstraintsType.INVERSE_MARTINGALE)
        print(fitted)
        fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain, params=fitted)
        if is_save:
            plot.save_fig(fig=fig, file_name="four_param_model_fit", local_path=local_path)

    elif unit_test == UnitTests.CALIBRATE_VARSWAP_PARAM_MODEL:
        params0 = LogSvParams(sigma0=0.85, theta=0.85, kappa1=2.21, kappa2=2.18,
                              beta=0.15, volvol=1.5)
        fitted = pricer.calibrate_model_params_to_chain(
            option_chain=option_chain, params0=params0,
            params_min=LogSvParams(sigma0=0.1, theta=0.1, kappa1=0.25, kappa2=0.25,
                                   beta=0.0, volvol=1.5),
            model_calibration_type=LogsvModelCalibrationType.PARAMS_WITH_VARSWAP_FIT,
            constraints_type=ConstraintsType.INVERSE_MARTINGALE)
        print(fitted)
        fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=option_chain, params=fitted)
        if is_save:
            plot.save_fig(fig=fig, file_name="varswap_param_model_fit", local_path=local_path)

    elif unit_test == UnitTests.COMPARE_MODEL_VOLS_TO_MC:
        fitted = LogSvParams(sigma0=0.8626, theta=1.0417, kappa1=2.21, kappa2=2.18,
                             beta=0.13, volvol=1.6286)
        fig = pricer.plot_model_ivols_vs_mc(option_chain=option_chain, params=fitted,
                                            nb_path=100000)
        if is_save:
            plot.save_fig(fig=fig, file_name="model_vols_vs_mc", local_path=local_path)

    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.VARSWAP_FIT)
