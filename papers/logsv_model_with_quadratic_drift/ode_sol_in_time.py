"""
Figures 8 and 9 of the quadratic-drift LogSV paper: solutions A^(k)(tau) of
the affine-expansion ODE system in time for a fixed transform point phi, and
the resulting first/second-order MGF approximations E^[1], E^[2].

Reproduces
/root/reference/papers/logsv_model_with_quadratic_drift/ode_sol_in_time.py
against the TPU framework. The reference uses scipy dense output; here the
trajectory is produced by chaining the batched RK4 grid solver
(stochvolmodels_tpu/models/logsv/affine.py:157) over uniform sub-intervals —
the same state-chaining contract the chain pricer uses across maturities
(reference logsv_pricer.py:588-632).
"""
from __future__ import annotations

from enum import Enum
from typing import List

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

import stochvolmodels_tpu.plotting.plots as plot
from stochvolmodels_tpu import LogSvParams
from stochvolmodels_tpu.models.logsv.affine import (
    ExpansionOrder,
    get_expansion_n,
    solve_ode_for_a,
)

TEST_PARAMS = LogSvParams(sigma0=0.8327, theta=1.0139, kappa1=4.8606, kappa2=4.7938,
                          beta=0.1985, volvol=2.3690)


def solve_a_trajectory(params: LogSvParams,
                       ttm: float,
                       phi: complex,
                       expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                       is_spot_measure: bool = True,
                       nb_steps: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """A(t) on a uniform grid t in [0, ttm] by chaining the grid solver."""
    n = get_expansion_n(expansion_order)
    t_grid = np.linspace(0.0, ttm, nb_steps + 1)
    a = np.zeros(n, dtype=complex)
    out = [a.copy()]
    dt = ttm / nb_steps
    for _ in range(nb_steps):
        a = solve_ode_for_a(ttm=dt, theta=params.theta, kappa1=params.kappa1,
                            kappa2=params.kappa2, beta=params.beta,
                            volvol=params.volvol, phi=phi, psi=0.0 + 0.0j,
                            a_t0=a, expansion_order=expansion_order,
                            is_spot_measure=is_spot_measure).y[:, -1]
        out.append(a.copy())
    return t_grid, np.stack(out, axis=0)


def plot_ode_sol_in_t(params: LogSvParams,
                      ttm: float,
                      t_grid: np.ndarray,
                      a_traj: np.ndarray,
                      expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                      title: str = None,
                      headers: List[str] = None,
                      axs: List[plt.Subplot] = None) -> None:
    """plot Re/Im of A^(k)(tau) and the MGF approximation exp(A . ys)."""
    n = a_traj.shape[1]
    y = params.sigma0 - params.theta
    ys = np.array([y ** k for k in range(n)])
    mgf = np.exp(a_traj @ ys)
    order = 1 if expansion_order == ExpansionOrder.FIRST else 2
    cols = [f"$A^{{({k})}}$" for k in range(n)]
    data = {
        r"$\Re[A(\tau)]$": pd.DataFrame(np.real(a_traj), index=t_grid, columns=cols),
        r"$\Im[A(\tau)]$": pd.DataFrame(np.imag(a_traj), index=t_grid, columns=cols),
        rf"$E^{{[{order}]}}(\tau)$": pd.concat(
            [pd.Series(np.real(mgf), index=t_grid, name=rf"$\Re[E^{{[{order}]}}]$"),
             pd.Series(np.imag(mgf), index=t_grid, name=rf"$\Im[E^{{[{order}]}}]$")], axis=1),
    }
    if axs is None:
        with sns.axes_style("darkgrid"):
            fig, axs = plt.subplots(3, 1, figsize=(8, 8), tight_layout=True)
            fig.suptitle(title, color="darkblue")
    for idx, (key, df) in enumerate(data.items()):
        sns.lineplot(data=df, ax=axs[idx])
        axs[idx].set_title(f"{headers[idx]} {key}, {title}" if headers else key,
                           color="darkblue")
        axs[idx].set(xlabel=r"$\tau$")


def plot_ode_solutions(params: LogSvParams = TEST_PARAMS,
                       ttm: float = 1.0,
                       expansion_order: ExpansionOrder = ExpansionOrder.FIRST,
                       is_spot_measure: bool = True) -> plt.Figure:
    real_part = -0.5 if is_spot_measure else 0.5
    phi = real_part + 2.0j
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, 3, figsize=(18, 6), tight_layout=True)
    t_grid, a_traj = solve_a_trajectory(params=params, ttm=ttm, phi=phi,
                                        expansion_order=expansion_order,
                                        is_spot_measure=is_spot_measure)
    title = rf"$\Phi$={np.real(phi):0.2f}+{np.imag(phi):0.2f}i"
    plot_ode_sol_in_t(params=params, ttm=ttm, t_grid=t_grid, a_traj=a_traj,
                      expansion_order=expansion_order, title=title, axs=axs,
                      headers=["(A)", "(B)", "(C)"])
    plot.set_subplot_border(fig=fig, n_ax_rows=1, n_ax_col=3)
    return fig


class UnitTests(Enum):
    FIRST_ORDER = 1
    SECOND_ORDER = 2


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    if unit_test == UnitTests.FIRST_ORDER:
        fig = plot_ode_solutions(expansion_order=ExpansionOrder.FIRST)
        name = "ode_sol_first_order"
    else:
        fig = plot_ode_solutions(expansion_order=ExpansionOrder.SECOND)
        name = "ode_sol_second_order"
    if is_save:
        from papers import local_path as lp
        plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name=name)
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.FIRST_ORDER)
