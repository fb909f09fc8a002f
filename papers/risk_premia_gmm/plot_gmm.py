"""
Illustrations of GMM state pdfs and the model fit to market vols.

Reproduces /root/reference/papers/risk_premia_gmm/plot_gmm.py against the
TPU framework GmmPricer (stochvolmodels_tpu/models/gmm.py).
"""
from __future__ import annotations

from typing import List

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from stochvolmodels_tpu import GmmParams, GmmPricer, OptionChain


def plot_gmm_pdfs(params: GmmParams,
                  option_chain0: OptionChain,
                  nstdev: float = 10.0,
                  axs: List[plt.Subplot] = None) -> plt.Figure:
    """state pdfs + aggregate risk-neutral pdf on the left, fit on the right."""
    stdev = nstdev * params.get_get_avg_vol() * np.sqrt(params.ttm)
    x = np.linspace(-stdev, stdev, 3000)
    state_pdfs, agg_pdf = params.compute_state_pdfs(x=x)
    state_pdfs, agg_pdf = np.asarray(state_pdfs), np.asarray(agg_pdf)

    columns = [f"state-{i + 1}: mean={params.gmm_mus[i]:0.2f}, "
               f"vol={params.gmm_vols[i]:0.2f}, weight={params.gmm_weights[i]:0.2f}"
               for i in range(len(params.gmm_weights))]
    df = pd.concat([pd.Series(agg_pdf, index=x, name="Aggregate PDF"),
                    pd.DataFrame(state_pdfs, index=x, columns=columns)], axis=1)

    if axs is None:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(16, 4.5))
    else:
        fig = None

    sns.lineplot(data=df, dashes=False, ax=axs[0])
    axs[0].get_lines()[0].set_linewidth(4.0)
    axs[0].set_ylim((0.0, None))
    axs[0].set_xlabel("log-price")
    axs[0].set_title("(A) State PDF and Aggregate Risk-Neutral PDF", color="darkblue")

    GmmPricer().plot_model_ivols_vs_bid_ask(option_chain=option_chain0, params=params,
                                            is_log_strike_xaxis=True, axs=[axs[1]])
    return fig
