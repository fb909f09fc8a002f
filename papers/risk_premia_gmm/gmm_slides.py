"""
GMM risk-premia study: per-slice GMM calibrations, risk-neutral vs
statistical pdfs under the exponential kernel exp(kappa x), the closed-form
GMM risk premium, and kappa estimation from returns.

Reproduces the bundled-data core of
/root/reference/papers/risk_premia_gmm/gmm_slides.py against the TPU
framework.  The time-series strategy analysis requires the optional
``option-chain-analytics`` live-data package (reference gmm_slides.py:20-21)
and is gated on its presence; everything else runs offline on the bundled
BTC/SPY snapshots.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns
from scipy.optimize import minimize_scalar

from papers.risk_premia_gmm.plot_gmm import plot_gmm_pdfs  # noqa: F401  (re-export)
from stochvolmodels_tpu import (
    GmmParams,
    GmmPricer,
    OptionChain,
    get_btc_test_chain_data,
    get_spy_test_chain_data,
)

try:
    from option_chain_analytics import OptionsDataDFs  # noqa: F401
    HAS_OCA = True
except ImportError:
    HAS_OCA = False


def plot_calibrated_gmm_model_per_slice(option_chain: OptionChain,
                                        n_mixtures: int = 4) -> Dict[str, GmmParams]:
    """per-slice GMM calibration with a fit panel per maturity."""
    gmm_pricer = GmmPricer()
    calibrated_params = {}
    ids = option_chain.ids
    with sns.axes_style("darkgrid"):
        fig, axs = plt.subplots(1, len(ids), figsize=(18, 10), tight_layout=True)
        if len(ids) == 1:
            axs = [axs]
    for idx, id_ in enumerate(ids):
        chain0 = OptionChain.get_slices_as_chain(option_chain, ids=[id_])
        params_t = gmm_pricer.calibrate_model_params_to_chain_slice(option_chain=chain0,
                                                                    n_mixtures=n_mixtures)
        calibrated_params[id_] = params_t
        gmm_pricer.plot_model_ivols_vs_bid_ask(option_chain=chain0, params=params_t,
                                               axs=[axs[idx]])
    return calibrated_params


def plot_riskpremia_pdfs(params: GmmParams,
                         kappa: float = 3.0,
                         nstdev: float = 6.0,
                         title: str = None,
                         ax: plt.Subplot = None) -> None:
    """risk-neutral pdf vs the statistical pdf tilted by exp(kappa x)."""
    stdev = nstdev * params.get_get_avg_vol() * np.sqrt(params.ttm)
    x = np.linspace(-stdev, stdev, 2000)
    risk_neutral_pdf = np.asarray(params.compute_pdf(x=x))
    risk_neutral_pdf = risk_neutral_pdf / np.sum(risk_neutral_pdf)
    statistical_pdf = np.exp(kappa * x) * risk_neutral_pdf
    statistical_pdf = statistical_pdf / np.sum(statistical_pdf)
    print(f"forward_q={np.sum(risk_neutral_pdf * np.exp(x))}, "
          f"forward_p={np.sum(statistical_pdf * np.exp(x))}")
    df = pd.concat([pd.Series(risk_neutral_pdf, index=x, name="risk neutral"),
                    pd.Series(statistical_pdf, index=x, name="statistical")], axis=1)
    if ax is None:
        with sns.axes_style("darkgrid"):
            _, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
    sns.lineplot(data=df, dashes=False, ax=ax)
    ax.set_ylim((0.0, None))
    ax.set_xlabel("log-return")
    if title is not None:
        ax.set_title(title, color="darkblue")
    ax.axes.get_yaxis().set_visible(False)


def compute_risk_premia(params: GmmParams, kappa: float = 3.0) -> float:
    """closed-form GMM risk premium under the exponential kernel
    (reference :80-88)."""
    alpha_i = params.gmm_mus * params.ttm
    v_i = np.square(params.gmm_vols) * params.ttm
    gamma_i = kappa * alpha_i + 0.5 * np.square(kappa) * v_i
    weights_i = params.gmm_weights * np.exp(gamma_i)
    weights_i = weights_i / np.sum(weights_i)
    return float((np.sum(weights_i * np.exp(alpha_i + (kappa + 0.5) * v_i)) - 1.0)
                 / params.ttm)


def fit_kappa(returns: pd.Series, span: int = None) -> float:
    """moment-condition fit of kappa: E[exp(-kappa x)(exp(x) - 1)] = 0,
    optionally exponentially weighted (reference :90-109)."""
    x = returns.to_numpy()
    if span is not None:
        lam = 1.0 - 2.0 / (span + 1.0)
        weights = np.power(lam, np.arange(len(x))[::-1]).astype(float)
    else:
        weights = None

    def f(kappa: float) -> float:
        if weights is not None:
            res = np.sum(weights * np.exp(-kappa * x) * (np.exp(x) - 1.0))
        else:
            res = np.sum(np.exp(-kappa * x) * (np.exp(x) - 1.0))
        return float(np.square(res))

    res = minimize_scalar(f, bounds=(-10.0, 10.0),
                          options={"disp": False, "maxiter": 300}, tol=1e-12)
    return float(res.x)


class UnitTests(Enum):
    GMM_SLICE_FITS = 1
    RISK_PREMIA_PDFS = 2
    RISK_PREMIA_VALUE = 3
    FIT_KAPPA = 4


def run_unit_test(unit_test: UnitTests):
    if unit_test == UnitTests.GMM_SLICE_FITS:
        fits = plot_calibrated_gmm_model_per_slice(option_chain=get_btc_test_chain_data(),
                                                   n_mixtures=4)
        for k, v in fits.items():
            print(k, v)
    elif unit_test == UnitTests.RISK_PREMIA_PDFS:
        chain = get_spy_test_chain_data()
        chain0 = OptionChain.get_slices_as_chain(chain, ids=[chain.ids[1]])
        params = GmmPricer().calibrate_model_params_to_chain_slice(option_chain=chain0,
                                                                   n_mixtures=4)
        with sns.axes_style("darkgrid"):
            fig, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
        plot_riskpremia_pdfs(params=params, kappa=3.0,
                             title="Risk-neutral vs statistical pdf", ax=ax)
    elif unit_test == UnitTests.RISK_PREMIA_VALUE:
        chain = get_spy_test_chain_data()
        chain0 = OptionChain.get_slices_as_chain(chain, ids=[chain.ids[1]])
        params = GmmPricer().calibrate_model_params_to_chain_slice(option_chain=chain0,
                                                                   n_mixtures=4)
        for kappa in (1.0, 2.0, 3.0):
            print(f"kappa={kappa}: risk premium={compute_risk_premia(params, kappa=kappa):0.4f}")
    elif unit_test == UnitTests.FIT_KAPPA:
        rng = np.random.default_rng(7)
        returns = pd.Series(0.0005 + 0.01 * rng.standard_normal(2000))
        print(f"fitted kappa={fit_kappa(returns):0.3f}")
        print(f"fitted kappa (span=60)={fit_kappa(returns, span=60):0.3f}")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.GMM_SLICE_FITS)
