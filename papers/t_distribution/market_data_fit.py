"""
Per-maturity Student-t fits to the bundled SPY / GLD / BTC market chains.

Reproduces /root/reference/papers/t_distribution/market_data_fit.py against
the TPU framework: TdistPricer.calibrate_model_params_to_chain returns a
dict of per-slice (vol, nu, drift) params (reference tdist_pricer.py:62-118).
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import seaborn as sns

import stochvolmodels_tpu.data.sample_chains as chains
import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import OptionChain, TdistPricer


class UnitTests(Enum):
    SPY_FIT = 1
    GOLD_FIT = 2
    BTC_FIT = 3


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.SPY_FIT:
        option_chain = chains.get_spy_test_chain_data()
    elif unit_test == UnitTests.GOLD_FIT:
        option_chain = chains.get_gld_test_chain_data()
    elif unit_test == UnitTests.BTC_FIT:
        option_chain = chains.get_btc_test_chain_data()
    else:
        raise NotImplementedError(unit_test)

    pricer = TdistPricer()
    fit_params = pricer.calibrate_model_params_to_chain(option_chain=option_chain)

    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(2, 2, figsize=(14, 12), tight_layout=True)
    axs = plot.to_flat_list(axs)

    for idx, (key, params) in enumerate(fit_params.items()):
        print(f"{key}: {params}")
        title = f"maturity-{key}: nu={params.nu:0.2f}, vol={params.vol:0.2f}, drift={params.drift:0.2%}"
        chain0 = OptionChain.get_slices_as_chain(option_chain, ids=[key])
        pricer.plot_model_ivols_vs_bid_ask(option_chain=chain0, params=params,
                                           title=title, axs=[axs[idx]])
    if is_save:
        from papers import local_path as lp
        plot.save_fig(fig, file_name=f"{unit_test.name.lower()}", local_path=lp.get_output_path())
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.GOLD_FIT)
