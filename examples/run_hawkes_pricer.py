"""
Hawkes jump-diffusion demo (counterpart of examples/run_hawkes_pricer.py).
"""
import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm

if __name__ == '__main__':
    chain = svm.get_btc_test_chain_data()
    pricer = svm.HawkesJDPricer()
    params = svm.HawkesJDParams()  # BTC daily-frequency defaults
    params.print()
    prices, ivols = pricer.compute_chain_prices_with_vols(option_chain=chain,
                                                          params=params)
    for id_, iv in zip(chain.ids, ivols):
        print(f"{id_}: {np.round(iv, 4)}")
    pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=params)
    plt.show()
