"""
Valuation of options on quadratic variance: Fourier vs Monte Carlo under the
LogSV and Heston models, with forwards set to the closed-form E[QV].

TPU rebuild of
/root/reference/stochvolmodels/examples/run_pricing_options_on_qvar.py.
"""
import numpy as np
import matplotlib.pyplot as plt
from enum import Enum

import stochvolmodels_tpu.data.sample_chains as chains
from stochvolmodels_tpu import (
    HestonParams,
    HestonPricer,
    LogSvParams,
    LogSVPricer,
    OptionChain,
    VariableType,
    compute_analytic_qvar,
)


class LocalTests(Enum):
    QVAR_OPTIONS = 1


def run_local_test(local_test: LocalTests, nb_path: int = 200000) -> None:
    if local_test == LocalTests.QVAR_OPTIONS:
        # both calibrated to the same BTC chain; v0=theta=1 for a flat vol
        # term structure (reference run_pricing_options_on_qvar.py:23-25)
        logsv_params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=3.1844,
                                   kappa2=3.058, beta=0.1514, volvol=1.8458)
        heston_params = HestonParams(v0=1.0, theta=1.0, kappa=7.4565,
                                     rho=0.0919, volvol=4.0907)

        ttms = {'1w': 1.0 / 52.0, '1m': 1.0 / 12.0, '3m': 0.25, '6m': 0.5}
        option_chain = chains.get_qv_options_test_chain_data()
        option_chain = OptionChain.get_slices_as_chain(option_chain, ids=list(ttms.keys()))
        forwards = np.array([compute_analytic_qvar(params=logsv_params, ttm=ttm, n_terms=4)
                             for ttm in ttms.values()])
        print(f"QV forwards = {forwards}")
        option_chain.forwards = forwards
        option_chain.strikes_ttms = [forward * strikes_ttm for forward, strikes_ttm in
                                     zip(option_chain.forwards, option_chain.strikes_ttms)]

        fig1 = LogSVPricer().plot_model_ivols_vs_mc(option_chain=option_chain,
                                                    params=logsv_params,
                                                    variable_type=VariableType.Q_VAR,
                                                    nb_path=nb_path)
        fig1.suptitle('Implied variance skew by Log-Normal SV model')

        fig2 = HestonPricer().plot_model_ivols_vs_mc(option_chain=option_chain,
                                                     params=heston_params,
                                                     variable_type=VariableType.Q_VAR,
                                                     nb_path=nb_path)
        fig2.suptitle('Implied variance skew by Heston SV model')
        plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.QVAR_OPTIONS)
