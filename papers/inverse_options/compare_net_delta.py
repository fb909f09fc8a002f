"""
"Valuation and Hedging of Cryptocurrency Inverse Options" (SSRN 4606748):
Black delta vs the inverse-option net delta (delta - price/spot), and the
delta-hedged P&L breakevens in BTC and USD terms.

Reproduces /root/reference/papers/inverse_options/compare_net_delta.py against
the TPU framework BSM analytics (stochvolmodels_tpu/ops/bsm.py).
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import (
    compute_bsm_forward_grid_prices,
    compute_bsm_vanilla_delta,
    compute_bsm_vanilla_grid_deltas,
    compute_bsm_vanilla_price,
)


def compare_net_deltas(ttm: float,
                       forward: float,
                       vol: float,
                       strike_level: float = 1.0,
                       optiontype: str = "C",
                       title: str = None,
                       ax: plt.Subplot = None) -> None:
    """Black delta vs net delta = delta - price/spot over a spot grid."""
    spot_grid = np.linspace(0.7 * forward, 1.3 * forward, 1000)
    strike = strike_level * forward
    prices = np.asarray(compute_bsm_forward_grid_prices(ttm=ttm, forwards=spot_grid,
                                                        strike=strike, vol=vol,
                                                        optiontype=optiontype))
    deltas = np.asarray(compute_bsm_vanilla_grid_deltas(ttm=ttm, forwards=spot_grid,
                                                        strike=strike, vol=vol,
                                                        optiontype=optiontype))
    df = pd.concat([pd.Series(deltas, index=spot_grid, name="Black Delta"),
                    pd.Series(deltas - prices / spot_grid, index=spot_grid, name="Net Delta")],
                   axis=1)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_ylabel("delta")
    ax.set_xlabel("BTC price")
    if title is not None:
        ax.set_title(title, color="darkblue")


def compare_pnl(ttm: float,
                forward: float,
                vol: float,
                strike_level: float = 1.0,
                optiontype: str = "C",
                is_btc_pnl: bool = True,
                title: str = None,
                ax: plt.Subplot = None) -> None:
    """1-day delta-hedged P&L of a short inverse option under Black vs net
    delta, with breakeven annotations (reference :42-100)."""
    spot_grid = np.linspace(0.7 * forward, 1.3 * forward, 10000)
    returns_grid = spot_grid / forward - 1.0
    strike = strike_level * forward

    price0 = float(compute_bsm_vanilla_price(ttm=ttm, forward=forward, strike=strike,
                                             vol=vol, optiontype=optiontype))
    delta0 = float(compute_bsm_vanilla_delta(ttm=ttm, forward=forward, strike=strike,
                                             vol=vol, optiontype=optiontype))
    net_delta0 = delta0 - price0 / forward

    inverse_price_return = (spot_grid - forward) / spot_grid
    dt = 1.0 / 365.0
    prices = np.asarray(compute_bsm_forward_grid_prices(ttm=ttm - dt, forwards=spot_grid,
                                                        strike=strike, vol=vol,
                                                        optiontype=optiontype))
    option_pnl_btc = price0 / forward - prices / spot_grid

    series = []
    for name, hedge_delta in (("Black Delta", delta0), ("Net Delta", net_delta0)):
        pnl = option_pnl_btc + hedge_delta * inverse_price_return
        if not is_btc_pnl:
            pnl = pnl * spot_grid
        positive = spot_grid[pnl >= 0.0]
        if positive.size > 0:
            lower_be = positive[0] / forward - 1.0
            upper_be = positive[-1] / forward - 1.0
            label = f"{name}: breakevens=({lower_be:0.2%}, {upper_be:0.2%})"
        else:
            label = f"{name}: no breakeven region"
        series.append(pd.Series(pnl, index=returns_grid, name=label))
    df = pd.concat(series, axis=1)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_ylabel("BTC P&L" if is_btc_pnl else "USD P&L")
    ax.set_xlabel("BTC % change")
    if title is not None:
        ax.set_title(title, color="darkblue")


class UnitTests(Enum):
    NET_DELTAS = 1
    PNL = 2
    JOINT_FIGURE = 3


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    ttm, forward, vol = 14.0 / 365.0, 62000.0, 0.6
    if unit_test == UnitTests.NET_DELTAS:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
        compare_net_deltas(ttm=ttm, forward=forward, vol=vol, ax=ax)
    elif unit_test == UnitTests.PNL:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(16, 6), tight_layout=True)
        compare_pnl(ttm=ttm, forward=forward, vol=vol, is_btc_pnl=True,
                    title="(A) P&L in BTC", ax=axs[0])
        compare_pnl(ttm=ttm, forward=forward, vol=vol, is_btc_pnl=False,
                    title="(B) P&L in USD", ax=axs[1])
    elif unit_test == UnitTests.JOINT_FIGURE:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 3, figsize=(18, 6), tight_layout=True)
        compare_net_deltas(ttm=ttm, forward=forward, vol=vol,
                           title="(A) Black vs net delta", ax=axs[0])
        compare_pnl(ttm=ttm, forward=forward, vol=vol, is_btc_pnl=True,
                    title="(B) P&L in BTC", ax=axs[1])
        compare_pnl(ttm=ttm, forward=forward, vol=vol, is_btc_pnl=False,
                    title="(C) P&L in USD", ax=axs[2])
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(),
                          file_name="inverse_net_delta")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.JOINT_FIGURE)
