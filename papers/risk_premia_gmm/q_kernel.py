"""
Valuation of payoffs under the quadratic pricing kernel exp(c x - b x^2) and
the implied BSM vols it induces.

Reproduces /root/reference/papers/risk_premia_gmm/q_kernel.py against the TPU
framework (kept behind a __main__ guard — the reference module executes at
import, flagged under its README "Known issues").
"""
from __future__ import annotations

from enum import Enum

import numpy as np

from stochvolmodels_tpu import infer_bsm_implied_vol, npdf


def compute_normal_pdf(x: np.ndarray) -> np.ndarray:
    dx = x[1] - x[0]
    return dx * np.asarray(npdf(x))


def value_under_q_kernel(b: float, pdf: np.ndarray, x: np.ndarray,
                         payoff: np.ndarray, forward: float = 1.0) -> float:
    """E[K(x) payoff] with K = exp(c x - b x^2) normalized so E[K e^x] prices
    the forward correctly (reference :18-24)."""
    c = -0.5 + (2.0 * b + 1.0) * np.log(forward)
    norm = np.exp(0.5 * np.square(c) / (2.0 * b + 1.0)) / np.sqrt(2.0 * b + 1.0)
    return float(np.sum(pdf * np.exp(c * x - b * np.square(x)) * payoff) / norm)


def value_payoff(pdf: np.ndarray, payoff: np.ndarray) -> float:
    return float(np.sum(pdf * payoff))


class UnitTests(Enum):
    Q_KERNEL_VALUATION = 1


def run_unit_test(unit_test: UnitTests) -> None:
    if unit_test == UnitTests.Q_KERNEL_VALUATION:
        x = np.linspace(-5.0, 5.0, 20000)
        pdf = compute_normal_pdf(x)
        print(f"sum={np.sum(pdf)}, mean={np.sum(x * pdf)}, "
              f"std={np.sqrt(np.sum(np.square(x) * pdf) - np.square(np.sum(x * pdf)))}")

        q_payoff = value_under_q_kernel(b=2.0, pdf=pdf, x=x, payoff=np.exp(x), forward=1.0)
        print(f"q_payoff={q_payoff}")

        strikes = np.linspace(0.2, 2.0, 21)
        values, model_vols = np.zeros_like(strikes), np.zeros_like(strikes)
        values_q, model_vols_q = np.zeros_like(strikes), np.zeros_like(strikes)
        for idx, strike in enumerate(strikes):
            payoff = np.maximum(np.exp(x - 0.5) - strike, 0.0)
            values[idx] = value_payoff(pdf=pdf, payoff=payoff)
            model_vols[idx] = float(infer_bsm_implied_vol(
                forward=1.0, ttm=1.0, given_price=values[idx], strike=strike, optiontype="C"))
            payoff_q = np.maximum(np.exp(x) - strike, 0.0)
            values_q[idx] = value_under_q_kernel(b=0.25, pdf=pdf, x=x, payoff=payoff_q)
            model_vols_q[idx] = float(infer_bsm_implied_vol(
                forward=1.0, ttm=1.0, given_price=values_q[idx], strike=strike, optiontype="C"))
        print(f"values={values}")
        print(f"values_q={values_q}")
        print(f"model_vols={model_vols}")
        print(f"model_vols_q={model_vols_q}")


if __name__ == "__main__":
    run_unit_test(unit_test=UnitTests.Q_KERNEL_VALUATION)
