"""
Fit of a 4-state Gaussian mixture to the bundled SPY implied vols, with
state-pdf and bid-ask-fit panels per maturity slice.

Reproduces /root/reference/papers/risk_premia_gmm/run_gmm_fit.py against the
TPU framework.
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import seaborn as sns

from papers.risk_premia_gmm.plot_gmm import plot_gmm_pdfs
from stochvolmodels_tpu import GmmPricer, OptionChain, get_spy_test_chain_data


class UnitTests(Enum):
    GMM_FIT = 1


def run_unit_test(unit_test: UnitTests) -> None:
    if unit_test == UnitTests.GMM_FIT:
        option_chain = get_spy_test_chain_data()
        gmm_pricer = GmmPricer()
        fit_params = gmm_pricer.calibrate_model_params_to_chain(option_chain=option_chain,
                                                                n_mixtures=4)
        ids = ["2m", "6m"]
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(len(ids), 2, figsize=(14, 12), tight_layout=True)
        current_ax = 0
        for key, params in fit_params.items():
            print(f"{key}: {params}")
            if key in ids:
                chain0 = OptionChain.get_slices_as_chain(option_chain, ids=[key])
                plot_gmm_pdfs(params=params, option_chain0=chain0, axs=axs[current_ax, :])
                axs[current_ax, 0].set_title(
                    f"{key}-slice: (A) State PDF and Aggregate Risk-Neutral PDF", color="darkblue")
                axs[current_ax, 1].set_title(
                    f"{key}-slice: Model to Market Bid/Ask vols", color="darkblue")
                current_ax += 1
        fig.suptitle("Fit of 4-state GMM to SPY implied vols @ 15_Jul_2022_10_23_09",
                     color="darkblue")
        plt.show()


if __name__ == "__main__":
    run_unit_test(unit_test=UnitTests.GMM_FIT)
