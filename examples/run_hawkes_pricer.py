"""
Hawkes jump-diffusion demo (counterpart of examples/run_hawkes_pricer.py:
explicit 15-parameter spec on a uniform chain, plus the BTC-chain fit).
"""
from enum import Enum

import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm
from stochvolmodels_tpu import HawkesJDParams, OptionChain


class LocalTests(Enum):
    MODEL_IVOLS = 1
    BTC_CHAIN_FIT = 2


def run_local_test(local_test: LocalTests):
    pricer = svm.HawkesJDPricer()

    if local_test == LocalTests.MODEL_IVOLS:
        # fully explicit parameter spec (reference run_hawkes_pricer.py:37-52)
        params = HawkesJDParams(sigma=0.1,
                                shift_p=0.25, mean_p=0.00,
                                shift_m=-0.25, mean_m=-0.00,
                                lambda_p=1.0, theta_p=0.01, kappa_p=300.0,
                                beta1_p=0.0, beta2_p=0.0,
                                lambda_m=1.0, theta_m=0.01, kappa_m=300.0,
                                beta1_m=0.0, beta2_m=0.0)
        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([1.0 / 12.0]), ids=np.array(['1m']),
            forwards=np.array([100.0]),
            strikes=100.0 * np.linspace(0.5, 1.5, 30))
        pricer.plot_model_ivols(option_chain=option_chain, params=params)

    elif local_test == LocalTests.BTC_CHAIN_FIT:
        chain = svm.get_btc_test_chain_data()
        params = HawkesJDParams()  # BTC daily-frequency defaults
        params.print()
        prices, ivols = pricer.compute_chain_prices_with_vols(
            option_chain=chain, params=params)
        for id_, iv in zip(chain.ids, ivols):
            print(f"{id_}: {np.round(iv, 4)}")
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=params)

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.MODEL_IVOLS)
