"""
Figures 8/9 of "Stochastic volatility for factor Heath-Jarrow-Morton
framework": fits of the Nelson-Siegel multi-factor LogSV model to SOFR
futures-option smiles (75d/103d expiries), with the futures convexity
adjustment and T-forward-measure transform.

Reproduces /root/reference/papers/sv_for_factor_hjm/calibration_fig_8_9.py
against the TPU framework. Market futures strikes/vols are data constants
from the reference (:74-96); the normal-SABR refit (reference :97-161)
regularizes the raw quotes onto a delta grid before plotting.
"""
from __future__ import annotations

import copy
from enum import Enum
from typing import Dict, Tuple

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from stochvolmodels_tpu import (
    FutOptionChain,
    MultiFactRateLogSvParams,
    NelsonSiegel,
    TermStructure,
    UnderlyingType,
)
from stochvolmodels_tpu.models.factor_hjm.rate_evaluate import libor_rate
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_ivols import (
    calc_logsv_ivols,
    fit_logsv_ivols,
    get_delta_at_strikes,
    infer_strikes_from_deltas,
)
from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
    FutSettleType,
    RateFutLogSVPricer,
    logsv_chain_de_pricer,
)
from stochvolmodels_tpu.models.logsv.affine import ExpansionOrder
from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid


def get_fut_calib_rate_logsv_params() -> Dict[str, MultiFactRateLogSvParams]:
    """the paper's futures-option parameter set (reference :33-72)."""
    ttms = np.array([75.0, 103.0]) / 365.0
    R_corr = np.array([[1.0, 0.99, 0.97], [0.99, 1.0, 0.98], [0.97, 0.98, 1.0]])
    nelson_siegel = NelsonSiegel(meanrev=0.55, key_terms=np.array([2.0, 5.0, 10.0]))
    times = np.concatenate((0, ttms), axis=None)
    params0 = MultiFactRateLogSvParams(
        sigma0=1.0, theta=1.0, kappa1=1e-12, kappa2=1e-12,
        beta=TermStructure.create_multi_fact_from_vec(
            times, RateFutLogSVPricer.populate_betas(1e-12, basis=nelson_siegel)),
        volvol=TermStructure.create_from_scalar(times, 1e-12),
        A=np.array([0.01, 0.01, 0.01]), R=R_corr, basis=nelson_siegel,
        ccy="USD_NS", vol_interpolation="BY_YIELD")
    params0.update_params(idx=0, kappa1=0.5, kappa2=1.0,
                          A_idx=np.array([0.012, 0.011, 0.010]),
                          beta_idx=RateFutLogSVPricer.populate_betas(0.2, basis=nelson_siegel),
                          volvol_idx=0.35)
    params0.update_params(idx=1, kappa1=0.5, kappa2=1.0,
                          A_idx=np.array([0.012, 0.011, 0.010]),
                          beta_idx=RateFutLogSVPricer.populate_betas(0.2, basis=nelson_siegel),
                          volvol_idx=0.35)
    return {"USD": params0}


def get_futures_data() -> FutOptionChain:
    """SOFR futures-option quotes at 75d/103d (reference :74-96): futures
    price strikes mapped onto rate strikes around the model libor forward."""
    strks = [[94.625, 94.6875, 94.75, 94.8125, 94.875, 94.9375, 95, 95.0625, 95.125,
              95.1875, 95.25, 95.3125, 95.375, 95.4375, 95.5, 95.5625, 95.625],
             [94.625, 94.6875, 94.75, 94.8125, 94.875, 94.9375, 95, 95.0625, 95.125,
              95.1875, 95.25, 95.3125, 95.375, 95.4375, 95.5]]
    vols = [[85.18, 83.53, 80.65, 80.02, 80.25, 78.44, 80.68, 81.98, 85.46, 86.45,
             88.14, 90.08, 89.86, 91.92, 93.65, 95.21, 100.49],
            [81.31, 78.6, 77.92, 78.22, 78.83, 79.42, 81.29, 82.63, 84.77, 86.39,
             87.66, 89.3, 90.52, 91.5, 93.63]]
    fut_rates = np.array([95.25, 95.25])
    ttms = np.array([75.0, 103.0]) / 365.0
    fwds = np.array([float(np.asarray(libor_rate(0, ttm, ttm + 0.25, 0, 0)).ravel()[0])
                     for ttm in ttms])
    strks = [np.array(s) - fr + (100 - 100 * fwd)
             for s, fr, fwd in zip(strks, fut_rates, fwds)]
    return FutOptionChain(ccy="USD_NS", ttms=ttms, forwards=fwds,
                          strikes_ttms=[(100 - s) * 0.01 for s in strks],
                          ivs_call_ttms=[np.array(v) * 1e-4 for v in vols],
                          ivs_put_ttms=[np.array(v) * 1e-4 for v in vols],
                          ttms_ids=np.array(["75d", "103d"]),
                          call_oi=None, put_oi=None, ticker="DUMMY")


def refit_to_sabr(futoption_chain: FutOptionChain
                  ) -> Tuple[FutOptionChain, Dict[str, np.ndarray]]:
    """fit the closed-form normal-SABR smile to each expiry and resample onto
    a delta grid (reference :97-161)."""
    calib_params = {k: np.zeros_like(futoption_chain.ttms)
                    for k in ("alpha", "beta", "total_vol", "rho")}
    ivols_opt_ttms, strikes_opt_ttms = [], []
    for idx_ttm, ttm in enumerate(futoption_chain.ttms):
        beta, shift = 0.0, 0.0
        fit = fit_logsv_ivols(strikes=futoption_chain.strikes_ttms[idx_ttm],
                              mid_vols=futoption_chain.ivs_call_ttms[idx_ttm],
                              f0=futoption_chain.forwards[idx_ttm],
                              beta=beta, shift=shift, ttm=ttm)
        for k in calib_params:
            calib_params[k][idx_ttm] = fit[k]
        f0 = futoption_chain.forwards[idx_ttm]
        get_delta_at_strikes(strikes=futoption_chain.strikes_ttms[idx_ttm], f0=f0,
                             ttm=ttm, sigma0=fit["alpha"], rho=fit["rho"],
                             total_vol=fit["total_vol"], beta=beta, shift=shift)
        delta_grid = np.array([-0.25, -0.375, -0.5, 0.375, 0.25])
        strikes_grid = np.asarray(infer_strikes_from_deltas(
            deltas=delta_grid, f0=f0, ttm=ttm, sigma0=fit["alpha"], rho=fit["rho"],
            total_vol=fit["total_vol"], beta=beta, shift=shift))
        if hasattr(strikes_grid, "values"):
            strikes_grid = strikes_grid.values
        ivols_opt_ttms.append(np.asarray(calc_logsv_ivols(
            strikes=strikes_grid, f0=f0, ttm=ttm, alpha=fit["alpha"],
            rho=fit["rho"], total_vol=fit["total_vol"], beta=beta, shift=shift)))
        strikes_opt_ttms.append(strikes_grid)
    chain = FutOptionChain(ccy=futoption_chain.ccy, ttms=futoption_chain.ttms,
                           forwards=futoption_chain.forwards,
                           strikes_ttms=np.array(strikes_opt_ttms),
                           ivs_call_ttms=np.array(ivols_opt_ttms),
                           ivs_put_ttms=np.array(ivols_opt_ttms),
                           ttms_ids=futoption_chain.ttms_ids,
                           call_oi=None, put_oi=None, ticker=futoption_chain.ticker)
    return chain, calib_params


def plot_mkt_model_joint_fut_smile_MF(params0: MultiFactRateLogSvParams,
                                      futoption_chain: FutOptionChain,
                                      expansion_order: ExpansionOrder = ExpansionOrder.FIRST
                                      ) -> plt.Figure:
    """model futures-option smiles (DE quadrature under the T-forward measure
    with convexity adjustment) vs the SABR-refitted market smiles."""
    ttms = futoption_chain.ttms
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, len(ttms), figsize=(16, 5), tight_layout=True)
    for idx, ttm in enumerate(ttms):
        t_grid = generate_ttms_grid(ttms[:idx + 1])
        strikes = futoption_chain.strikes_ttms[idx]
        _, ivols = logsv_chain_de_pricer(
            params=params0, t_grid=t_grid, ttms=np.array([ttm]),
            forwards=[futoption_chain.forwards[idx:idx + 1]],
            strikes_ttms=[[strikes]],
            optiontypes_ttms=[np.repeat("C", strikes.size)],
            underlying_type=UnderlyingType.FUTURES,
            expansion_order=expansion_order,
            settlement_type=FutSettleType.EURODOLLAR)
        model = pd.Series(np.asarray(ivols[0][0]).ravel(), index=strikes,
                          name="model")
        market = pd.Series(futoption_chain.ivs_call_ttms[idx], index=strikes,
                           name="market")
        ax = axs[idx] if len(ttms) > 1 else axs
        sns.lineplot(data=model, ax=ax, color="green", label="model")
        sns.scatterplot(data=market, ax=ax, color="red", label="market")
        ax.set_title(f"{futoption_chain.ttms_ids[idx]} futures options",
                     color="darkblue")
        ax.set_xlabel("rate strike")
    return fig


def benchmark_analytic_vs_mc_fut(params0: MultiFactRateLogSvParams,
                                 ttm: float = 75.0 / 365.0,
                                 nb_path: int = 50000) -> pd.DataFrame:
    """futures-option DE smile vs terminal-futures MC under Q^T (reference
    BENCHMARK_ANALYTIC_VS_MC_FUT, :446-...)."""
    from stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer import (
        calc_futures_mc_vols,
    )
    from stochvolmodels_tpu.utils.rate_core import generate_ttms_grid

    t_start, t_end = ttm, ttm + 0.25
    f0_mc, mc_vols, _ = calc_futures_mc_vols(
        params0, ttm, t_start, t_end,
        strikes=np.array([0.052, 0.057, 0.062]),
        optiontypes=np.array(["C", "C", "C"]), nb_path=nb_path, seed=42)
    strikes = np.array([0.052, 0.057, 0.062])
    t_grid = generate_ttms_grid(np.array([ttm]))
    _, ivols = logsv_chain_de_pricer(
        params=params0, t_grid=t_grid, ttms=np.array([ttm]),
        forwards=[np.array([f0_mc])], strikes_ttms=[[strikes]],
        optiontypes_ttms=[np.repeat("C", 3)],
        underlying_type=UnderlyingType.FUTURES,
        settlement_type=FutSettleType.EURODOLLAR)
    return pd.DataFrame({"strike": strikes,
                         "DE vol (bp)": np.round(np.asarray(ivols[0][0]).ravel() * 1e4, 1),
                         "MC vol (bp)": np.round(mc_vols * 1e4, 1)})


class UnitTests(Enum):
    CALIBRATE_LOGSV_FUT = 6
    SABR_REFIT = 7
    BENCHMARK_ANALYTIC_VS_MC_FUT = 12


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    futoption_chain = get_futures_data()
    futoption_chain_fit, calib_params = refit_to_sabr(futoption_chain=futoption_chain)
    if unit_test == UnitTests.SABR_REFIT:
        print(pd.DataFrame(calib_params, index=futoption_chain.ttms_ids))
        print(futoption_chain_fit.strikes_ttms)
        print(futoption_chain_fit.ivs_call_ttms)
    elif unit_test == UnitTests.BENCHMARK_ANALYTIC_VS_MC_FUT:
        params0 = get_fut_calib_rate_logsv_params()["USD"]
        params0.q = params0.theta * 1.0
        print(benchmark_analytic_vs_mc_fut(params0))
    elif unit_test == UnitTests.CALIBRATE_LOGSV_FUT:
        params0 = get_fut_calib_rate_logsv_params()["USD"]
        params0.q = params0.theta * 1.0
        opt_params = copy.deepcopy(params0)
        for ttm in opt_params.ts[1:]:
            assert opt_params.check_QT_kappa2(t_start=ttm)
        fig = plot_mkt_model_joint_fut_smile_MF(params0=opt_params,
                                                futoption_chain=futoption_chain_fit)
        if is_save:
            from papers import local_path as lp
            import stochvolmodels_tpu.plotting.plots as plot
            plot.save_fig(fig=fig, local_path=lp.get_output_path(),
                          file_name="hjm_futures_fit")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.SABR_REFIT)
