"""
Full LogSV demo: calibration, MC-vs-analytic comparison, and measure
consistency on the BTC chain (counterpart of examples/run_lognormal_sv_pricer.py).
"""
from enum import Enum

import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm


class LocalTests(Enum):
    CHAIN_PRICER = 1
    CALIBRATOR = 2
    MC_COMPARISON = 3
    MMA_INVERSE_COMPARISON = 4


def run_local_test(local_test: LocalTests):
    chain = svm.get_btc_test_chain_data()
    pricer = svm.LogSVPricer()

    if local_test == LocalTests.CHAIN_PRICER:
        prices, ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain, params=svm.LOGSV_BTC_PARAMS)
        for id_, iv in zip(chain.ids, ivols):
            print(f"{id_}: {np.round(iv, 4)}")
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain,
                                           params=svm.LOGSV_BTC_PARAMS)

    elif local_test == LocalTests.CALIBRATOR:
        params0 = svm.LogSvParams(sigma0=0.8, theta=1.0, kappa1=3.0,
                                  kappa2=3.0, beta=0.15, volvol=1.85)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=params0,
            model_calibration_type=svm.LogsvModelCalibrationType.PARAMS5,
            constraints_type=svm.ConstraintsType.INVERSE_MARTINGALE)
        print(f"fit: {fit.to_str()}")
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=fit)

    elif local_test == LocalTests.MC_COMPARISON:
        pricer.plot_model_ivols_vs_mc(option_chain=chain,
                                      params=svm.LOGSV_BTC_PARAMS,
                                      nb_path=100000)

    elif local_test == LocalTests.MMA_INVERSE_COMPARISON:
        pricer.plot_comp_mma_inverse_options_with_mc(
            option_chain=chain, params=svm.LOGSV_BTC_PARAMS, nb_path=100000)

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.CHAIN_PRICER)
