"""
Full LogSV demo — all ten scenarios of the reference's flagship example
(reference behavior: examples/run_lognormal_sv_pricer.py:16-26 LocalTests):
single/slice/chain pricing, smile plots, parameter bootstraps, MC vs
analytic, BTC-chain fits, analytic/MC/rough-MC calibration engines, and
both fixed-randoms MC pricers (regular and rough), ending with the
rough-vs-conventional benchmark figure.

Imports go through the ``stochvolmodels`` compat shim on purpose: a
reference user's scripts keep working verbatim on the TPU build.
"""
from enum import Enum

import matplotlib.pyplot as plt
import matplotlib.ticker as mticker
import numpy as np
import pandas as pd

import stochvolmodels as sv
from stochvolmodels import (
    CalibrationEngine,
    ConstraintsType,
    LogSvParams,
    LogSVPricer,
    LogsvModelCalibrationType,
    OptionChain,
)


class LocalTests(Enum):
    COMPUTE_MODEL_PRICES = 1
    PLOT_MODEL_IMPLIED_VOLS = 2
    PLOT_MODEL_VOLS_IN_PARAMS = 3
    COMPARE_MODEL_VOLS_TO_MC = 4
    PLOT_FIT_TO_BITCOIN_OPTION_CHAIN = 5
    CALIBRATE_MODEL_TO_BTC_OPTIONS = 6
    MC_WITH_FIXED_RANDOMS = 7
    CALIBRATE_MODEL_TO_BTC_OPTIONS_WITH_MC = 8
    ROUGH_MC_WITH_FIXED_RANDOMS = 9
    BENCHM_ROUGH_PRICER = 10


PARAMS = LogSvParams(sigma0=1.0, theta=1.0, kappa1=5.0, kappa2=5.0,
                     beta=0.2, volvol=2.0)
BTC_CALIBRATED = LogSvParams(sigma0=0.8327, theta=1.0139, kappa1=4.8609,
                             kappa2=4.7940, beta=0.1988, volvol=2.3694)


def _fixed_randoms_prices(chain: OptionChain, params0: LogSvParams,
                          nb_path: int = 10000):
    """chain prices on a frozen normal-increment block (scenario 7 core)."""
    W0s, W1s, dts = sv.get_randoms_for_chain_valuation(
        ttms=chain.ttms, nb_path=nb_path, nb_steps_per_year=360, seed=10)
    vol_backbone_etas = PARAMS.get_vol_backbone_etas(ttms=chain.ttms)
    return sv.logsv_mc_chain_pricer_fixed_randoms(
        ttms=chain.ttms, forwards=chain.forwards,
        discfactors=chain.discfactors, strikes_ttms=chain.strikes_ttms,
        optiontypes_ttms=chain.optiontypes_ttms, W0s=W0s, W1s=W1s, dts=dts,
        v0=params0.sigma0, theta=params0.theta, kappa1=params0.kappa1,
        kappa2=params0.kappa2, beta=params0.beta, volvol=params0.volvol,
        vol_backbone_etas=vol_backbone_etas)


def _rough_fixed_randoms_prices(chain: OptionChain, params0: LogSvParams,
                                nb_path: int = 10000, H: float = 0.1,
                                seed: int = 10):
    """chain prices from the rough (Markovian-lift) simulator on frozen
    randoms (scenario 9 core)."""
    Z0, Z1, grid_ttms = sv.get_randoms_for_rough_vol_chain_valuation(
        ttms=chain.ttms, nb_path=nb_path, nb_steps_per_year=360, seed=seed)
    params1 = LogSvParams.copy(params0)
    params1.H = H
    params1.approximate_kernel(T=chain.ttms[-1])
    return sv.rough_logsv_mc_chain_pricer_fixed_randoms(
        ttms=chain.ttms, forwards=chain.forwards,
        discfactors=chain.discfactors, strikes_ttms=chain.strikes_ttms,
        optiontypes_ttms=chain.optiontypes_ttms, Z0=Z0, Z1=Z1,
        sigma0=params0.sigma0, theta=params0.theta, kappa1=params0.kappa1,
        kappa2=params0.kappa2, beta=params0.beta, orthog_vol=params0.volvol,
        weights=params1.weights, nodes=params1.nodes, timegrids=grid_ttms)


def run_local_test(local_test: LocalTests):
    logsv_pricer = LogSVPricer()
    params = PARAMS

    if local_test == LocalTests.COMPUTE_MODEL_PRICES:
        model_price, vol = logsv_pricer.price_vanilla(
            params=params, ttm=0.25, forward=1.0, strike=1.0, optiontype='C')
        print(f"price={model_price:0.4f}, implied vol={vol: 0.2%}")

        model_prices, vols = logsv_pricer.price_slice(
            params=params, ttm=0.25, forward=1.0,
            strikes=np.array([0.9, 1.0, 1.1]),
            optiontypes=np.array(['P', 'C', 'C']))
        print([f"{p:0.4f}, implied vol={v: 0.2%}"
               for p, v in zip(model_prices, vols)])

        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([0.083, 0.25]), ids=np.array(['1m', '3m']),
            strikes=np.linspace(0.9, 1.1, 3))
        model_prices, vols = logsv_pricer.compute_chain_prices_with_vols(
            option_chain=option_chain, params=params)
        print(model_prices)
        print(vols)

    elif local_test == LocalTests.PLOT_MODEL_IMPLIED_VOLS:
        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([0.083, 0.25]), ids=np.array(['1m', '3m']),
            strikes=np.linspace(0.5, 1.5, 21))
        logsv_pricer.plot_model_ivols(option_chain=option_chain, params=params)

    elif local_test == LocalTests.PLOT_MODEL_VOLS_IN_PARAMS:
        option_chain = OptionChain.get_uniform_chain(
            ttms=np.array([0.083, 0.25]), ids=np.array(['1m', '3m']),
            strikes=np.linspace(0.5, 1.5, 21))
        params_dict = {
            'kappa2=5': LogSvParams(sigma0=1.0, theta=1.0, kappa1=5.0,
                                    kappa2=5.0, beta=0.2, volvol=2.0),
            'kappa2=10': LogSvParams(sigma0=1.0, theta=1.0, kappa1=5.0,
                                     kappa2=10.0, beta=0.2, volvol=2.0)}
        option_slice = option_chain.get_slice(id='1m')
        logsv_pricer.plot_model_slices_in_params(option_slice=option_slice,
                                                 params_dict=params_dict)

    elif local_test == LocalTests.COMPARE_MODEL_VOLS_TO_MC:
        btc_option_chain = sv.get_btc_test_chain_data()
        uniform_chain_data = OptionChain.to_uniform_strikes(
            obj=btc_option_chain, num_strikes=31)
        logsv_pricer.plot_model_ivols_vs_mc(option_chain=uniform_chain_data,
                                            params=BTC_CALIBRATED,
                                            nb_path=100000)
        logsv_pricer.plot_comp_mma_inverse_options_with_mc(
            option_chain=uniform_chain_data, params=BTC_CALIBRATED,
            nb_path=100000)

    elif local_test == LocalTests.PLOT_FIT_TO_BITCOIN_OPTION_CHAIN:
        btc_option_chain = sv.get_btc_test_chain_data()
        logsv_pricer.plot_model_ivols_vs_bid_ask(
            option_chain=btc_option_chain, params=BTC_CALIBRATED)

    elif local_test == LocalTests.CALIBRATE_MODEL_TO_BTC_OPTIONS:
        btc_option_chain = sv.get_btc_test_chain_data()
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21,
                              kappa2=2.18, beta=0.15, volvol=2.0)
        fit = logsv_pricer.calibrate_model_params_to_chain(
            option_chain=btc_option_chain, params0=params0,
            model_calibration_type=LogsvModelCalibrationType.PARAMS4,
            constraints_type=ConstraintsType.INVERSE_MARTINGALE)
        print(fit)
        logsv_pricer.plot_model_ivols_vs_bid_ask(
            option_chain=btc_option_chain, params=fit)

    elif local_test == LocalTests.MC_WITH_FIXED_RANDOMS:
        btc_option_chain = sv.get_btc_test_chain_data()
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21,
                              kappa2=2.18, beta=0.15, volvol=2.0)
        option_prices_ttm, option_std_ttm = _fixed_randoms_prices(
            btc_option_chain, params0)
        print(option_prices_ttm)

    elif local_test == LocalTests.CALIBRATE_MODEL_TO_BTC_OPTIONS_WITH_MC:
        btc_option_chain = sv.get_btc_test_chain_data()
        params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21,
                              kappa2=2.18, beta=0.15, volvol=2.0)
        params0.H = 0.2
        params0.approximate_kernel(T=btc_option_chain.ttms[-1])
        fit = logsv_pricer.calibrate_model_params_to_chain(
            option_chain=btc_option_chain, params0=params0,
            model_calibration_type=LogsvModelCalibrationType.PARAMS4,
            constraints_type=ConstraintsType.INVERSE_MARTINGALE,
            calibration_engine=CalibrationEngine.ROUGH_MC,
            nb_path=5000, seed=7)
        print(fit)
        logsv_pricer.plot_model_ivols_vs_bid_ask(
            option_chain=btc_option_chain, params=fit)

    elif local_test == LocalTests.ROUGH_MC_WITH_FIXED_RANDOMS:
        btc_option_chain = sv.get_btc_test_chain_data()
        params0 = LogSvParams(sigma0=0.377, theta=0.347, kappa1=1.29,
                              kappa2=1.93, beta=2.45, volvol=1.81)
        option_prices_ttm, option_std_ttm = _rough_fixed_randoms_prices(
            btc_option_chain, params0)
        print(option_prices_ttm)

    elif local_test == LocalTests.BENCHM_ROUGH_PRICER:
        btc_option_chain = sv.get_btc_test_chain_data()
        params0 = LogSvParams(sigma0=0.377, theta=0.347, kappa1=1.29,
                              kappa2=1.93, beta=2.45, volvol=1.81)
        H = 0.1
        rough_prices, _ = _rough_fixed_randoms_prices(
            btc_option_chain, params0, H=H, seed=1)
        regular_prices, _ = _fixed_randoms_prices(btc_option_chain, params0)
        ivols_rough = btc_option_chain.compute_model_ivols_from_chain_data(
            rough_prices)
        ivols_regular = btc_option_chain.compute_model_ivols_from_chain_data(
            regular_prices)

        nb_slices = btc_option_chain.ttms.size
        fig, axs = plt.subplots(2, (nb_slices + 1) // 2, figsize=(15, 9),
                                tight_layout=True)
        for i, ax in enumerate(np.asarray(axs).ravel()[:nb_slices]):
            data = pd.DataFrame(
                {"Rough Log-SV": ivols_rough[i], "Log-SV": ivols_regular[i]},
                index=np.log(btc_option_chain.strikes_ttms[i]
                             / btc_option_chain.forwards[i]))
            data.plot(ax=ax, marker='o')
            ax.set_title(f"Expiry: {btc_option_chain.ids[i]}")
            ax.yaxis.set_major_formatter(
                mticker.FuncFormatter(lambda z, _: f'{z:.0%}'))
            ax.xaxis.set_major_formatter(
                mticker.FuncFormatter(lambda z, _: f'{z:.2f}'))
        fig.suptitle(f"Conventional LogSV vs Rough LogSV, H={H:.2f} via "
                     f"Markovian approximation", color="darkblue", fontsize=14)

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.COMPUTE_MODEL_PRICES)
