"""
Rolling volatility beta: the EWM regression beta of daily vol changes on
asset returns.

Reproduces /root/reference/papers/volatility_models/vol_beta.py against the
TPU framework; the EWM one-factor beta (qis.compute_one_factor_ewm_betas in
the reference) is implemented directly with pandas ewm covariances.
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import pandas as pd
import seaborn as sns

from papers.volatility_models.load_data import fetch_ohlc_vol


def estimate_vol_beta(vol: pd.Series,
                      returns: pd.Series,
                      span: int = 33) -> pd.Series:
    """beta_t = ewm_cov(dvol, returns) / ewm_var(returns)."""
    dvol = vol.diff(1).rename("dvol")
    joint = pd.concat([dvol, returns.rename("ret")], axis=1).dropna()
    cov = joint["dvol"].ewm(span=span).cov(joint["ret"])
    var = joint["ret"].ewm(span=span).var()
    return (cov / var).rename(f"vol_beta span={span}")


def plot_vol_beta(vol: pd.Series, returns: pd.Series, span: int = 33,
                  title: str = None, ax: plt.Subplot = None) -> None:
    vol_beta = estimate_vol_beta(vol=vol, returns=returns, span=span)
    if ax is None:
        with sns.axes_style("darkgrid"):
            _, ax = plt.subplots(1, 1, figsize=(18, 10), tight_layout=True)
    vol_beta.plot(ax=ax)
    ax.set_title(title or f"Volatility beta of {vol.name}", color="darkblue")


class UnitTests(Enum):
    VOL_BETA = 1
    PLOT_VOL_BETA = 2


def run_unit_test(unit_test: UnitTests):
    if unit_test == UnitTests.VOL_BETA:
        vol, returns = fetch_ohlc_vol(ticker="VIX")
        print(estimate_vol_beta(vol=vol, returns=returns).describe())
    elif unit_test == UnitTests.PLOT_VOL_BETA:
        vol, returns = fetch_ohlc_vol(ticker="OVX")
        with sns.axes_style("darkgrid"):
            plot_vol_beta(vol=vol, returns=returns)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.PLOT_VOL_BETA)
