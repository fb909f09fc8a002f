"""
Figure 4 of "Log-normal Stochastic Volatility Model with Quadratic Drift"
(Sepp & Rakhmonov, IJTAF 26(8), 2450003): the volatility drift per day as a
function of sigma_t, and the quadratic drift relative to the linear drift.

Reproduces /root/reference/papers/logsv_model_with_quadratic_drift/vol_drift.py
against the TPU framework API.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict, List

import matplotlib.pyplot as plt
import matplotlib.ticker as mticker
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import LogSvParams

VOLVOL = 1.75

DRIFT_PARAMS = {
    r"$(\kappa_{1}=4, \kappa_{2}=0)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=0.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=4)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=8)$": LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=8.0, beta=0.0, volvol=VOLVOL),
}


def plot_drift(params: Dict[str, LogSvParams] = DRIFT_PARAMS,
               axs: List[plt.Subplot] = None) -> None:
    """drift of d sigma_t per day: quadratic kappa1*theta - (kappa1 - kappa2*theta)*sigma
    - kappa2*sigma^2 vs the linear kappa1*(theta - sigma)."""
    sigma = np.linspace(0.0, 2.0, 200)

    quad_drifts, deltas = [], []
    for key, p in params.items():
        linear = p.kappa1 * (p.theta - sigma)
        quad = p.kappa1 * p.theta - (p.kappa1 - p.kappa2 * p.theta) * sigma - p.kappa2 * sigma * sigma
        quad_drifts.append(pd.Series(quad, index=sigma, name=key))
        deltas.append(pd.Series(quad - linear, index=sigma, name=key))
    quad_drifts = pd.concat(quad_drifts, axis=1) / 260.0
    deltas = pd.concat(deltas, axis=1) / 260.0

    dfs = {r"(A) Volatility drift per day as function of $\sigma_{t}$": quad_drifts,
           r"(B) Volatility drift relative to the linear drift": deltas}
    for idx, (title, df) in enumerate(dfs.items()):
        ax = axs[idx]
        sns.lineplot(data=df, dashes=False, ax=ax)
        ax.yaxis.set_major_formatter(mticker.FuncFormatter(lambda z, _: f"{z:.2f}"))
        ax.set_title(title, fontsize=12, color="darkblue")
        ax.set_xlabel(r"$\sigma_{t}$", fontsize=12)
        ax.set_xlim((0.0, None))
    plot.align_y_limits_axs(axs=axs)


class UnitTests(Enum):
    PLOT_DRIFT = 1


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.PLOT_DRIFT:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(18, 6), tight_layout=True)
        plot_drift(axs=axs)
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="vol_drift")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.PLOT_DRIFT)
