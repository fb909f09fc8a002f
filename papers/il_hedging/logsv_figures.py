"""
LogSV smile illustrations for the IL-hedging paper: model smiles across
volvol on a uniform 2-week slice.

Reproduces /root/reference/papers/il_hedging/logsv_figures.py against the
TPU framework.
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import numpy as np
import seaborn as sns

from stochvolmodels_tpu import LogSvParams, LogSVPricer, OptionChain


def plot_skews():
    pricer = LogSVPricer()
    option_chain = OptionChain.get_uniform_chain(ttms=np.array([14.0 / 365.0]),
                                                 ids=np.array(["2w"]),
                                                 strikes=np.linspace(0.6, 1.4, 21))
    sigma0 = 0.5
    params_dict = {
        "volvol=1.0": LogSvParams(sigma0=sigma0, theta=sigma0, kappa1=2.21, kappa2=2.18, beta=0.0, volvol=1.0),
        "volvol=2.0": LogSvParams(sigma0=sigma0 - 0.005, theta=sigma0 - 0.005, kappa1=2.21, kappa2=2.18, beta=0.0, volvol=2.0),
        "volvol=3.0": LogSvParams(sigma0=sigma0 - 0.01, theta=sigma0 - 0.01, kappa1=2.21, kappa2=2.18, beta=0.0, volvol=3.0),
    }
    option_slice = option_chain.get_slice(id="2w")
    pricer.plot_model_slices_in_params(option_slice=option_slice, params_dict=params_dict)


class UnitTests(Enum):
    PLOT_SKEWS = 1


def run_unit_test(unit_test: UnitTests):
    if unit_test == UnitTests.PLOT_SKEWS:
        with sns.axes_style("darkgrid"):
            plot_skews()
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.PLOT_SKEWS)
