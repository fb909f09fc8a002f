"""
Heston model demo: chain pricing, calibration and MC comparison
(counterpart of examples/run_heston.py and run_heston_sv_pricer.py).
"""
from enum import Enum

import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm


class LocalTests(Enum):
    CHAIN_PRICER = 1
    SLICE_PRICER = 2
    CALIBRATOR = 3
    MC_COMPARISON = 4


def run_local_test(local_test: LocalTests):
    chain = svm.get_btc_test_chain_data()
    pricer = svm.HestonPricer()
    params = svm.HestonParams(v0=0.85 ** 2, theta=1.4 ** 2, kappa=3.0,
                              volvol=2.0, rho=0.3)

    if local_test == LocalTests.CHAIN_PRICER:
        prices = pricer.price_chain(option_chain=chain, params=params)
        print(prices)
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=params)

    elif local_test == LocalTests.SLICE_PRICER:
        prices, vols = pricer.price_slice(params=params, ttm=1.0, forward=1.0,
                                          strikes=np.array([0.9, 1.0, 1.1]),
                                          optiontypes=np.array(['P', 'C', 'C']))
        print(np.asarray(prices))
        print(np.asarray(vols))

    elif local_test == LocalTests.CALIBRATOR:
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=svm.BTC_HESTON_PARAMS)
        print(fit)
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=fit)

    elif local_test == LocalTests.MC_COMPARISON:
        pricer.plot_model_ivols_vs_mc(option_chain=chain,
                                      params=svm.BTC_HESTON_PARAMS)

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.CHAIN_PRICER)
