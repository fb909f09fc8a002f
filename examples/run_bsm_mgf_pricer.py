"""
Validate the transform engine against the Black-Scholes closed form: feed the
known BSM MGF through the generic Fourier pricer and invert back
(counterpart of examples/run_bsm_mgf_pricer.py — the engine oracle), with
the reference's spot-vs-inverse comparisons for vanilla and QVAR payoffs.
"""
from enum import Enum

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import stochvolmodels_tpu as svm
import stochvolmodels_tpu.ops.mgf as mgf
from stochvolmodels_tpu.utils.cplx import Cplx


def bsm_slice_pricer(ttm: float, forward: float, vol: float,
                     strikes: np.ndarray, optiontypes: np.ndarray,
                     is_spot_measure: bool = True):
    """price a BSM slice through the generic transform engine."""
    alpha = 1.0 if is_spot_measure else -1.0
    phi_grid = mgf.get_phi_grid(is_spot_measure=is_spot_measure,
                                vol_scaler=vol * np.sqrt(min(ttm, 1 / 12)))
    log_mgf = phi_grid * (phi_grid + alpha) * (0.5 * ttm * vol * vol)
    prices = mgf.vanilla_prices_with_mgf_grid(
        log_mgf_grid=log_mgf, phi_grid=phi_grid, forwards=forward,
        strikes=strikes, optiontypes=optiontypes,
        is_spot_measure=is_spot_measure)
    ivols = svm.infer_bsm_implied_vol(forward=forward, ttm=ttm, strike=strikes,
                                      given_price=prices,
                                      optiontype=optiontypes)
    return np.asarray(prices), np.asarray(ivols)


def bsm_qvar_slice_pricer(ttm: float, forward: float, vol: float,
                          strikes: np.ndarray, optiontypes: np.ndarray,
                          is_spot_measure: bool = True):
    """options on QVAR for a flat-vol model: log E[exp(-psi QV)] = -psi vol^2 T
    through the QVAR inversion path (reference run_bsm_mgf_pricer.py:34-41)."""
    psi_grid = mgf.get_psi_grid()
    log_mgf = psi_grid * (-ttm * vol * vol)
    prices = svm.slice_qvar_pricer_with_a_grid(
        log_mgf_grid=log_mgf, psi_grid=psi_grid, ttm=ttm, forward=forward,
        strikes=strikes, optiontypes=optiontypes,
        is_spot_measure=is_spot_measure)
    return np.asarray(prices)


def compare_spot_and_inverse_options():
    ttm, forward, vol = 1.0, 1.0, 1.0
    strikes = np.linspace(0.5, 5.0, 19)
    spot, _ = bsm_slice_pricer(ttm, forward, vol, strikes,
                               np.full(strikes.shape, 'C'), True)
    inverse, _ = bsm_slice_pricer(ttm, forward, vol, strikes,
                                  np.full(strikes.shape, 'IC'), False)
    prices = pd.DataFrame({'spot': spot, 'inverse': inverse}, index=strikes)
    fig, ax = plt.subplots(1, 1, figsize=(10, 4.0), tight_layout=True)
    prices.plot(ax=ax, title='BSM spot vs inverse calls (transform engine)')


def compare_spot_and_inverse_qvar_options():
    ttm, forward, vol = 1.0, 1.0, 1.0
    strikes = np.linspace(0.5, 5.0, 19)
    spot = bsm_qvar_slice_pricer(ttm, forward, vol, strikes,
                                 np.full(strikes.shape, 'C'), True)
    inverse = bsm_qvar_slice_pricer(ttm, forward, vol, strikes,
                                    np.full(strikes.shape, 'IC'), False)
    prices = pd.DataFrame({'spot': spot, 'inverse': inverse}, index=strikes)
    fig, ax = plt.subplots(1, 1, figsize=(10, 4.0), tight_layout=True)
    prices.plot(ax=ax, title='QVAR options, spot vs inverse measures')


class LocalTests(Enum):
    BSM_SLICE_PRICER = 1
    SPOT_INVERSE_COMP = 2
    SPOT_INVERSE_QVAR_COMP = 3


def run_local_test(local_test: LocalTests):
    if local_test == LocalTests.BSM_SLICE_PRICER:
        ttm, forward, vol = 1.0, 1.0, 1.0
        strikes = np.linspace(0.5, 5.0, 19)
        optiontypes = np.full(strikes.shape, 'C')
        prices, ivols = bsm_slice_pricer(ttm=ttm, forward=forward, vol=vol,
                                         strikes=strikes,
                                         optiontypes=optiontypes)
        print("prices:", np.round(prices, 6))
        print("recovered ivols (should all be 1.0):", np.round(ivols, 8))
        exact = np.asarray(svm.compute_bsm_vanilla_price(forward, strikes, ttm,
                                                         vol, optiontypes))
        print("max |transform - closed form|:",
              float(np.max(np.abs(prices - exact))))

    elif local_test == LocalTests.SPOT_INVERSE_COMP:
        compare_spot_and_inverse_options()

    elif local_test == LocalTests.SPOT_INVERSE_QVAR_COMP:
        compare_spot_and_inverse_qvar_options()

    plt.show()


if __name__ == '__main__':
    run_local_test(local_test=LocalTests.BSM_SLICE_PRICER)
