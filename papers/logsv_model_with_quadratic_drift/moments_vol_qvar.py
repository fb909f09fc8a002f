"""
Figures 6 and 7 of the quadratic-drift LogSV paper: analytic moments of the
volatility and of the quadratic variance in time, benchmarked against Monte
Carlo (the truncated moment-ODE system dM/dtau = Lambda M + C, cf.
stochvolmodels_tpu/models/logsv/vol_moments.py and reference
pricers/logsv/vol_moments_ode.py:37-154).

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/moments_vol_qvar.py
against the TPU framework: vol paths simulate with lax.scan on device.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.models.logsv.vol_moments as vmo
import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import LogSvParams, LogSVPricer

VOLVOL = 1.5
SIGMA0P = 1.5

TEST_PARAMS = {
    r"$(\kappa_{1}=4, \kappa_{2}=0), \sigma_{0}=1.5$": LogSvParams(sigma0=SIGMA0P, theta=1.0, kappa1=4.0, kappa2=0.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=4), \sigma_{0}=1.5$": LogSvParams(sigma0=SIGMA0P, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=8), \sigma_{0}=1.5$": LogSvParams(sigma0=SIGMA0P, theta=1.0, kappa1=4.0, kappa2=8.0, beta=0.0, volvol=VOLVOL),
}

TEST_PARAMS2 = {
    r"$(\kappa_{1}=4, \kappa_{2}=0), \sigma_{0}=0.5$": LogSvParams(sigma0=0.5, theta=1.0, kappa1=4.0, kappa2=0.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=4), \sigma_{0}=0.5$": LogSvParams(sigma0=0.5, theta=1.0, kappa1=4.0, kappa2=4.0, beta=0.0, volvol=VOLVOL),
    r"$(\kappa_{1}=4, \kappa_{2}=8), \sigma_{0}=0.5$": LogSvParams(sigma0=0.5, theta=1.0, kappa1=4.0, kappa2=8.0, beta=0.0, volvol=VOLVOL),
}


def plot_vol_moments_vs_mc(params: LogSvParams = None,
                           ttm: float = 1.5,
                           n_terms: int = 4,
                           n_terms_to_display: int = 4,
                           nb_path: int = 100000,
                           grid_step: int = 15,
                           title: str = "Volatility moments",
                           ax: plt.Subplot = None) -> None:
    """centred moments E[(sigma_t - theta)^n] from the moment ODE vs MC bands."""
    if params is None:
        params = LogSvParams(sigma0=1.0, theta=1.0, kappa1=4.0, kappa2=0.0, beta=0.0, volvol=VOLVOL)
    pricer = LogSVPricer()
    params.assert_vol_moments_stability(n_terms=n_terms)
    sigma_t, grid_t = pricer.simulate_vol_paths(params=params, ttm=ttm, nb_path=nb_path,
                                                year_days=360)
    sigma_t = np.asarray(sigma_t)

    palette = plot.get_n_sns_colors(n=n_terms_to_display)
    if ax is None:
        with sns.axes_style("darkgrid"):
            _, ax = plt.subplots(1, 1, figsize=(18, 10), tight_layout=True)

    for n in range(n_terms_to_display):
        m_n = np.power(sigma_t - params.theta, n + 1) if n > 0 else sigma_t - params.theta
        mc_mean = np.mean(m_n, axis=1)
        mc_std = np.std(m_n, axis=1) / np.sqrt(nb_path)
        ax.errorbar(x=grid_t[::grid_step], y=mc_mean[::grid_step],
                    yerr=1.96 * mc_std[::grid_step], fmt="o", color=palette[n],
                    markersize=3, capsize=3)

    analytic = np.asarray(vmo.compute_vol_moments_t(params=params, ttm=grid_t, n_terms=n_terms))
    analytic = analytic[:, :n_terms_to_display]
    analytic = pd.DataFrame(analytic, index=grid_t,
                            columns=[f"Analytic m{n + 1}" for n in range(n_terms_to_display)])
    sns.lineplot(data=analytic, dashes=True, palette=palette, ax=ax)
    if title is not None:
        ax.set_title(title, fontsize=12, color="darkblue")
    ax.set_xlabel(r"$\tau$")
    ax.set_xlim((0.0, None))


def plot_qvar_vs_mc(params: Dict[str, LogSvParams] = TEST_PARAMS,
                    ttm: float = 1.5,
                    n_terms: int = 4,
                    nb_path: int = 100000,
                    grid_step: int = 15,
                    is_vol: bool = True,
                    title: str = "Expected values",
                    ax: plt.Subplot = None) -> None:
    """E[sigma_t] or E[QV_t/t] curves in t vs MC bands."""
    if ax is None:
        with sns.axes_style("darkgrid"):
            _, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
    pricer = LogSVPricer()
    analytic_curves = []
    colors = plot.get_n_sns_colors(n=len(params))
    for idx, (key, p) in enumerate(params.items()):
        p.assert_vol_moments_stability(n_terms=n_terms)
        sigma_t, grid_t = pricer.simulate_vol_paths(params=p, ttm=ttm, nb_path=nb_path,
                                                    year_days=360)
        sigma_t = np.asarray(sigma_t)
        if is_vol:
            mc_mean = np.mean(sigma_t, axis=1)
            mc_std = 2.0 * 1.96 * np.std(sigma_t, axis=1) / np.sqrt(nb_path)
        else:
            # expanding mean of sigma^2 along the time axis (pandas 3 dropped
            # expanding(axis=0))
            q_var = (np.cumsum(np.square(sigma_t), axis=0)
                     / np.arange(1, sigma_t.shape[0] + 1)[:, None])
            mc_mean = np.mean(q_var, axis=1)
            mc_std = 2.0 * 1.96 * np.std(q_var, axis=1) / np.sqrt(nb_path)
        ax.errorbar(x=grid_t[::grid_step], y=mc_mean[::grid_step], yerr=mc_std[::grid_step],
                    fmt="o", color=colors[idx], markersize=3, capsize=3)
        if is_vol:
            v_t = np.asarray(vmo.compute_expected_vol_t(params=p, t=grid_t, n_terms=n_terms))
        else:
            v_t = np.square(np.asarray(vmo.compute_sqrt_qvar_t(params=p, t=grid_t, n_terms=n_terms)))
        analytic_curves.append(pd.Series(v_t, index=grid_t, name=f"Analytic {key}"))

    sns.lineplot(data=pd.concat(analytic_curves, axis=1), dashes=True, palette=colors, ax=ax)
    if title is not None:
        ax.set_title(title, fontsize=12, color="darkblue")
    ax.set_xlabel(r"$\tau$")
    ax.set_xlim((0.0, None))


class UnitTests(Enum):
    VOL_MOMENTS_VS_MC = 1
    EXPECTED_VOL_VS_MC = 2
    EXPECTED_QVAR_VS_MC = 3
    JOINT_FIGURE = 4


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.VOL_MOMENTS_VS_MC:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
        plot_vol_moments_vs_mc(ax=ax)
    elif unit_test == UnitTests.EXPECTED_VOL_VS_MC:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
        plot_qvar_vs_mc(is_vol=True, ax=ax)
    elif unit_test == UnitTests.EXPECTED_QVAR_VS_MC:
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(12, 6), tight_layout=True)
        plot_qvar_vs_mc(is_vol=False, ax=ax)
    elif unit_test == UnitTests.JOINT_FIGURE:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(1, 2, figsize=(18, 6), tight_layout=True)
        plot_qvar_vs_mc(params=TEST_PARAMS, is_vol=True,
                        title=r"(A) $E[\sigma_{t}]$ with $\sigma_{0}=1.5$", ax=axs[0])
        plot_qvar_vs_mc(params=TEST_PARAMS2, is_vol=True,
                        title=r"(B) $E[\sigma_{t}]$ with $\sigma_{0}=0.5$", ax=axs[1])
        if is_save:
            from papers import local_path as lp
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="vol_moments_mc")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.JOINT_FIGURE)
