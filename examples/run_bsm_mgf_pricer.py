"""
Validate the transform engine against the Black-Scholes closed form: feed the
known BSM MGF through the generic Fourier pricer and invert back
(counterpart of examples/run_bsm_mgf_pricer.py — the engine oracle).
"""
import numpy as np

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


if __name__ == '__main__':
    ttm, forward, vol = 1.0, 1.0, 1.0
    strikes = np.linspace(0.5, 5.0, 19)
    optiontypes = np.full(strikes.shape, 'C')
    prices, ivols = bsm_slice_pricer(ttm=ttm, forward=forward, vol=vol,
                                     strikes=strikes, optiontypes=optiontypes)
    print("prices:", np.round(prices, 6))
    print("recovered ivols (should all be 1.0):", np.round(ivols, 8))
    exact = np.asarray(svm.compute_bsm_vanilla_price(forward, strikes, ttm,
                                                     vol, optiontypes))
    print("max |transform - closed form|:", float(np.max(np.abs(prices - exact))))
