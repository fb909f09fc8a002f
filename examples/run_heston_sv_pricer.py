"""
Heston model walkthrough (counterpart of examples/run_heston_sv_pricer.py:
vanilla/slice/chain pricing, smiles, parameter bootstraps, BTC fit and
calibration), plus MC comparison.
"""
from enum import Enum

import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm
from stochvolmodels_tpu import HestonParams, OptionChain


class LocalTests(Enum):
    HESTON_WALKTHROUGH = 1
    SLICE_PRICER = 2
    CALIBRATOR = 3
    MC_COMPARISON = 4


def run_local_test(local_test: LocalTests):
    pricer = svm.HestonPricer()
    params = HestonParams(v0=1.0, theta=1.0, kappa=5.0, volvol=1.0, rho=-0.5)

    if local_test == LocalTests.HESTON_WALKTHROUGH:
        # 1. one price
        model_price, vol = pricer.price_vanilla(params=params, ttm=0.25,
                                                forward=1.0, strike=1.0,
                                                optiontype='C')
        print(f"price={model_price:0.4f}, implied vol={vol: 0.2%}")

        # 2. price slice
        model_prices, vols = pricer.price_slice(
            params=params, ttm=0.25, forward=1.0,
            strikes=np.array([0.9, 1.0, 1.1]),
            optiontypes=np.array(['P', 'C', 'C']))
        print([f"{p:0.4f}, implied vol={v: 0.2%}"
               for p, v in zip(model_prices, vols)])

        # 3. prices for option chain with uniform strikes
        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([0.083, 0.25]), ids=np.array(['1m', '3m']),
            strikes=np.linspace(0.9, 1.1, 3))
        model_prices, vols = pricer.compute_chain_prices_with_vols(
            option_chain=option_chain, params=params)
        print(model_prices)
        print(vols)

        # 4. model smiles
        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([0.083, 0.25]), ids=np.array(['1m', '3m']),
            strikes=np.linspace(0.5, 1.5, 21))
        pricer.plot_model_ivols(option_chain=option_chain, params=params)

        # 5. slice smiles across parameter bootstraps
        params_dict = {
            'kappa=5': HestonParams(v0=1.0, theta=1.0, kappa=5.0,
                                    volvol=1.0, rho=-0.5),
            'kappa=10': HestonParams(v0=1.0, theta=1.0, kappa=10.0,
                                     volvol=1.0, rho=-0.5)}
        option_slice = option_chain.get_slice(id='1m')
        pricer.plot_model_slices_in_params(option_slice=option_slice,
                                           params_dict=params_dict)

        # 6. fit quality on the BTC chain + calibration from scratch
        btc_option_chain = svm.get_btc_test_chain_data()
        pricer.plot_model_ivols_vs_bid_ask(option_chain=btc_option_chain,
                                           params=svm.BTC_HESTON_PARAMS)
        params0 = HestonParams(v0=0.8, theta=1.0, kappa=5.0, volvol=1.0,
                               rho=-0.5)
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=btc_option_chain, params0=params0,
            constraints_type=svm.ConstraintsType.INVERSE_MARTINGALE)
        print(fit)
        pricer.plot_model_ivols_vs_bid_ask(option_chain=btc_option_chain,
                                           params=fit)

    elif local_test == LocalTests.SLICE_PRICER:
        prices, vols = pricer.price_slice(params=params, ttm=1.0, forward=1.0,
                                          strikes=np.array([0.9, 1.0, 1.1]),
                                          optiontypes=np.array(['P', 'C', 'C']))
        print(np.asarray(prices))
        print(np.asarray(vols))

    elif local_test == LocalTests.CALIBRATOR:
        chain = svm.get_btc_test_chain_data()
        fit = pricer.calibrate_model_params_to_chain(
            option_chain=chain, params0=svm.BTC_HESTON_PARAMS)
        print(fit)
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain, params=fit)

    elif local_test == LocalTests.MC_COMPARISON:
        chain = svm.get_btc_test_chain_data()
        pricer.plot_model_ivols_vs_mc(option_chain=chain,
                                      params=svm.BTC_HESTON_PARAMS)

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.HESTON_WALKTHROUGH)
