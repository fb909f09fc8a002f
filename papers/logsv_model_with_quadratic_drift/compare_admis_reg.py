"""
Figures 2 and 3 of the quadratic-drift LogSV paper: admissible regions of
(vartheta, beta) guaranteeing the martingale property under the MMA (spot)
and inverse measures for different kappa2.

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/compare_admis_reg.py
against the TPU framework. The martingale bounds are beta <= kappa2 (MMA) and
beta <= kappa2/2 (inverse), cf. logsv_pricer.py:377-388 constraint funcs.
"""
from __future__ import annotations

from enum import Enum
from typing import Sequence

import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu.plotting.plots as plot


def plot_admissible_regions(vartheta_min: float = 0.5,
                            vartheta_max: float = 3.0,
                            beta_min: float = -2.5,
                            beta_max: float = 2.5,
                            kappa2s: Sequence[float] = (3.0, 0.0)) -> plt.Figure:
    vartheta = np.linspace(vartheta_min, vartheta_max, 100)
    fig, axs = plt.subplots(1, len(kappa2s), figsize=(4 * len(kappa2s), 3), tight_layout=True)
    for idx, kappa2 in enumerate(kappa2s):
        ax = axs[idx]
        beta_mma = np.full_like(vartheta, max(kappa2, beta_min))
        beta_inv = np.full_like(vartheta, max(0.5 * kappa2, beta_min))
        ax.plot(vartheta, beta_mma, color="black", linewidth=0.8)
        ax.fill_between(vartheta, beta_min, beta_mma, edgecolor="black",
                        hatch="\\\\\\\\", label="MMA", facecolor="none")
        ax.plot(vartheta, beta_inv, color="black", linewidth=0.8)
        ax.fill_between(vartheta, beta_min, beta_inv, edgecolor="grey",
                        hatch="////", label="Inverse", facecolor="none")
        ax.set_ylim(beta_min, beta_max, auto=True)
        ax.set_title(f"({chr(ord('a') + idx).upper()}): $\\kappa_2={kappa2}$")
        ax.legend()
        ax.set(xlabel=r"$\vartheta$", ylabel=r"$\beta$")
    return fig


class UnitTests(Enum):
    ADMISSIBLE_REGIONS = 1


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.ADMISSIBLE_REGIONS:
        fig = plot_admissible_regions()
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="logsv_regions")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.ADMISSIBLE_REGIONS)
