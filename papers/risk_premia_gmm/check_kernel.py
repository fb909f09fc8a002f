"""
Compare the exponential pricing kernel with its cubic-expansion approximation.

Reproduces /root/reference/papers/risk_premia_gmm/check_kernel.py against the
TPU framework (behind a __main__ guard — the reference module executes at
import, flagged under its README "Known issues").
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns


def plot_kernels(kappa: float = -2.0, ax: plt.Subplot = None) -> None:
    x = np.linspace(-0.5, 1.0, 1000)
    exp_k = pd.Series(np.exp(x * kappa), index=x, name="Exp")
    xk = x * kappa
    cubic_k = pd.Series(1.0 + xk + 0.5 * np.square(xk) + (1.0 / 6.0) * np.square(xk) * xk,
                        index=x, name="Cubic expansion")
    df = pd.concat([exp_k, cubic_k], axis=1)
    if ax is None:
        with sns.axes_style("darkgrid"):
            _, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_title(f"Pricing kernels, kappa={kappa}", color="darkblue")


class UnitTests(Enum):
    PLOT_KERNELS = 1


def run_unit_test(unit_test: UnitTests) -> None:
    if unit_test == UnitTests.PLOT_KERNELS:
        plot_kernels()
        plt.show()


if __name__ == "__main__":
    run_unit_test(unit_test=UnitTests.PLOT_KERNELS)
