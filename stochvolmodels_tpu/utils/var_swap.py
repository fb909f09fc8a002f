"""
Model-free variance swap strike from an OTM option strip.

Rebuild of /root/reference/stochvolmodels/utils/var_swap_pricer.py — host-side
numpy/pandas code (runs once per chain during calibration setup, not a hot
path).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def compute_var_swap_strike(puts: pd.Series, calls: pd.Series, forward: float,
                            ttm: float) -> float:
    """variance swap strike (as a volatility) from static replication.

    K_var = (2/ttm) sum_i dk_i O(K_i)/K_i^2 - (F/K_atm - 1)^2 / ttm with
    centred strike spacings and the discrete-grid correction at the first
    strike at or above the forward (var_swap_pricer.py:8-56).
    """
    joint_slice = pd.concat([puts.rename('puts'), calls.rename('calls')], axis=1).sort_index()
    strikes = joint_slice.index.to_numpy(dtype=float)
    otm = strikes < forward
    n = strikes.shape[0]
    dk = np.empty(n)
    dk[0] = strikes[1] - strikes[0]
    dk[-1] = strikes[-1] - strikes[-2]
    if n > 2:
        dk[1:-1] = 0.5 * (strikes[2:] - strikes[:-2])
    option_strip = np.where(otm, joint_slice['puts'].to_numpy(), joint_slice['calls'].to_numpy())
    var_swap_strike = 2.0 * np.nansum(dk * option_strip / np.square(strikes))
    atm_strike = strikes[~otm][0]
    correction = np.square(forward / atm_strike - 1.0)
    return float(np.sqrt((var_swap_strike - correction) / ttm))
