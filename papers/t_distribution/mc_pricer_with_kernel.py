"""
Monte-Carlo Student-t pricer with a cubic pricing-kernel tilt: implied-vol
smiles of the raw t-distribution vs the kernel-weighted measure.

Reproduces /root/reference/papers/t_distribution/mc_pricer_with_kernel.py
against the TPU framework. Sampling uses jax.random.t on device; payoffs
vectorize over the strike grid instead of the reference's per-strike loop.
"""
from __future__ import annotations

from enum import Enum

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from stochvolmodels_tpu import (
    compute_upsilon,
    infer_bsm_ivols_from_slice_prices,
)


def generate_tvars_stock_path(nu: float = 4.5,
                              n_path: int = 10000,
                              ttm: float = 1.0 / 12.0,
                              vol: float = 0.2,
                              seed: int = 14) -> np.ndarray:
    """terminal prices 1 + upsilon*T_nu, recentred to a unit forward."""
    rv = jax.random.t(jax.random.key(seed), df=nu, shape=(n_path,))
    upsilon = compute_upsilon(vol=vol, ttm=ttm, nu=nu)
    prices_t = 1.0 + float(upsilon) * np.asarray(rv)
    return prices_t + (1.0 - np.nanmean(prices_t))


def compute_kernel(prices_t: np.ndarray, b: float,
                   nu: float = 4.5,
                   ttm: float = 1.0 / 12.0,
                   vol: float = 0.2) -> np.ndarray:
    """cubic pricing kernel 1 + a*x + b*x^3 with a = -3*b*ttm*vol^2*(nu-2)/(nu-4),
    floored at 1e-4 (reference :32-46)."""
    x = prices_t - 1.0
    coeff = 3.0 * ttm * vol * vol * (nu - 2.0) / (nu - 4.0)
    a = -b * coeff
    kernel = 1.0 + a * x + b * x ** 3
    return np.where(kernel > 0.0, kernel, 0.0001)


def compute_implied_vols(b: float = -1.0,
                         nu: float = 4.5,
                         n_path: int = 100000,
                         ttm: float = 1.0 / 12.0,
                         vol: float = 0.2) -> pd.DataFrame:
    prices_t = generate_tvars_stock_path(nu=nu, n_path=n_path, ttm=ttm, vol=vol)
    kernel = compute_kernel(prices_t=prices_t, b=b, nu=nu, ttm=ttm, vol=vol)
    kernel = kernel / np.nanmean(kernel * prices_t)

    strikes = np.linspace(0.5, 1.5, 40)
    optiontypes = np.where(strikes < 1.0, "P", "C")
    s = jnp.asarray(prices_t)[None, :]
    k = jnp.asarray(strikes)[:, None]
    payoffs = jnp.where(jnp.asarray(optiontypes == "C")[:, None],
                        jnp.maximum(s - k, 0.0), jnp.maximum(k - s, 0.0))
    model_prices = np.asarray(jnp.nanmean(payoffs, axis=1))
    model_prices_kernel = np.asarray(jnp.nanmean(jnp.asarray(kernel)[None, :] * payoffs, axis=1))

    bsm_vols = np.asarray(infer_bsm_ivols_from_slice_prices(
        ttm=ttm, forward=1.0, strikes=strikes, optiontypes=optiontypes,
        model_prices=model_prices, discfactor=1.0))
    bsm_vols_kernel = np.asarray(infer_bsm_ivols_from_slice_prices(
        ttm=ttm, forward=1.0, strikes=strikes, optiontypes=optiontypes,
        model_prices=model_prices_kernel, discfactor=1.0))
    return pd.concat([pd.Series(bsm_vols, index=strikes, name="T-vols"),
                      pd.Series(bsm_vols_kernel, index=strikes, name="T-vols - kernel")],
                     axis=1)


class UnitTests(Enum):
    PLOT_KERNEL_VOLS = 1


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.PLOT_KERNEL_VOLS:
        vols = compute_implied_vols()
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
        sns.lineplot(data=vols, dashes=False, ax=ax)
        ax.set_title("t-distribution MC implied vols with cubic pricing kernel",
                     color="darkblue")
        if is_save:
            from papers import local_path as lp
            import stochvolmodels_tpu.plotting.plots as plot
            plot.save_fig(fig=fig, file_name="tdist_kernel_vols", local_path=lp.get_output_path())
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.PLOT_KERNEL_VOLS)
