"""
"Unified Approach for Hedging Impermanent Loss of Liquidity Provision"
(SSRN 4887298): static replication of the IL payoff of a concentrated
liquidity position in range [pa, pb] as a portfolio of a square-root claim,
vanillas, digitals and a linear leg, priced in closed form under the
quadratic-drift LogSV model.

Reproduces /root/reference/papers/il_hedging/run_logsv_for_il_payoff.py
against the TPU framework: the MGF grid comes from the batched affine
expansion, and the square-root payoff transform (kernel
exp((phi+1/2) ln K)/(phi+1/2)) is implemented below on the same grid.
"""
from __future__ import annotations

from enum import Enum

import matplotlib.pyplot as plt
import numpy as np

from stochvolmodels_tpu import (
    LogSvParams,
    compute_integration_weights,
    digital_slice_pricer_with_mgf_grid,
    get_transform_var_grid,
    vanilla_slice_pricer_with_mgf_grid,
)
from stochvolmodels_tpu.models.logsv.affine import (
    ExpansionOrder,
    compute_logsv_a_mgf_grid,
    get_expansion_n,
)
from stochvolmodels_tpu.utils.cplx import Cplx


def _to_complex(c: Cplx) -> np.ndarray:
    return np.asarray(c.re) + 1j * np.asarray(c.im)


def square_root_payoff_pricer_with_mgf_grid(log_mgf_grid: np.ndarray,
                                            phi_grid: np.ndarray,
                                            forward: float,
                                            pa: float,
                                            pb: float,
                                            discfactor: float = 1.0,
                                            is_simpson: bool = True) -> float:
    """E[sqrt(S_T) 1{pa < S_T < pb}] by transform inversion: the sqrt payoff
    transform against exp(-x phi) is (K^(phi+1/2))/(phi+1/2) evaluated at the
    band edges (reference run_logsv_for_il_payoff.py:94-117)."""
    dp = np.asarray(compute_integration_weights(
        var_grid=Cplx(np.real(phi_grid), np.imag(phi_grid)), is_simpson=is_simpson))
    x = np.log(forward)
    xa, xb = np.log(pa), np.log(pb)
    p_payoff = (np.exp((phi_grid + 0.5) * xb - phi_grid * x)
                - np.exp((phi_grid + 0.5) * xa - phi_grid * x))
    p_payoff = (dp / np.pi) * p_payoff / (phi_grid + 0.5)
    return float(discfactor * np.nansum(np.real(p_payoff * np.exp(log_mgf_grid))))


def logsv_il_pricer(params: LogSvParams,
                    ttm: float,
                    p1: float,
                    p0: float,
                    pa: float,
                    pb: float,
                    expansion_order: ExpansionOrder = ExpansionOrder.SECOND,
                    vol_scaler: float = None,
                    notional: float = 1000000) -> float:
    """IL payoff value: -2 sqrt-claim + linear leg + (1/sqrt(pa)) put(pa)
    - (1/sqrt(pb)) call(pb) - 2 sqrt(pa) digital-put - 2 sqrt(pb) digital-call,
    scaled by the position notional (reference :20-88)."""
    if vol_scaler is None:
        vol_scaler = params.sigma0 * np.sqrt(min(ttm, 0.5 / 12.0))

    phi_grid_c, psi_grid_c, theta_grid_c = get_transform_var_grid(
        vol_scaler=vol_scaler, real_phi=-0.4)
    n = get_expansion_n(expansion_order)
    a_t0 = Cplx(np.zeros((phi_grid_c.shape[0], n)), np.zeros((phi_grid_c.shape[0], n)))
    _, log_mgf = compute_logsv_a_mgf_grid(
        ttm=ttm, phi_grid=phi_grid_c, psi_grid=psi_grid_c, theta_grid=theta_grid_c,
        a_t0=a_t0, expansion_order=expansion_order,
        sigma0=params.sigma0, theta=params.theta, kappa1=params.kappa1,
        kappa2=params.kappa2, beta=params.beta, volvol=params.volvol)

    strikes = np.array([pa, pb])
    optiontypes = np.array(["P", "C"])
    vanilla = np.asarray(vanilla_slice_pricer_with_mgf_grid(
        log_mgf_grid=log_mgf, phi_grid=phi_grid_c, forward=p1,
        strikes=strikes, optiontypes=optiontypes, discfactor=1.0))
    put_pa, call_pb = float(vanilla[0]), float(vanilla[1])
    digital = np.asarray(digital_slice_pricer_with_mgf_grid(
        log_mgf_grid=log_mgf, phi_grid=phi_grid_c, forward=p1,
        strikes=strikes, optiontypes=optiontypes, discfactor=1.0))
    digital_put, digital_call = float(digital[0]), float(digital[1])

    square_root = square_root_payoff_pricer_with_mgf_grid(
        log_mgf_grid=_to_complex(log_mgf), phi_grid=_to_complex(phi_grid_c),
        forward=p1, pa=pa, pb=pb)

    sp0, spa, spb = np.sqrt(p0), np.sqrt(pa), np.sqrt(pb)
    linear = sp0 * (p1 / p0 + 1.0)
    payoff = (-2.0 * square_root + linear
              + (1.0 / spa) * put_pa - (1.0 / spb) * call_pb
              - 2.0 * spa * digital_put - 2.0 * spb * digital_call)
    notional0 = 1.0 / (2.0 * sp0 - p0 / spb - spa)
    return float(-(notional0 * notional) * payoff)


logsv_il_pricer_vector = np.vectorize(logsv_il_pricer,
                                      doc="Vectorized `logsv_il_pricer`",
                                      excluded={"params"})


class UnitTests(Enum):
    COMPUTE_MODEL_PRICES = 1
    PAYOFF_IN_SPOT = 2


def run_unit_test(unit_test: UnitTests, is_save: bool = False):
    params = LogSvParams(sigma0=0.4861785891939535, theta=0.6176006871606874,
                         kappa1=1.955809653686808, kappa2=1.978367101612294,
                         beta=-0.26916969112829325, volvol=3.265815229306317)
    if unit_test == UnitTests.COMPUTE_MODEL_PRICES:
        payoff = logsv_il_pricer(params=params, ttm=10.0 / 365.0, p1=2200.0,
                                 p0=2200.0, pa=2000.0, pb=2400.0)
        print(payoff)
    elif unit_test == UnitTests.PAYOFF_IN_SPOT:
        p1s = np.linspace(1900.0, 2500.0, 13)
        payoffs = np.array([logsv_il_pricer(params=params, ttm=10.0 / 365.0,
                                            p1=p1, p0=2200.0, pa=2000.0, pb=2400.0)
                            for p1 in p1s])
        fig, ax = plt.subplots(1, 1, figsize=(10, 6), tight_layout=True)
        ax.plot(p1s, payoffs)
        ax.set_xlabel("terminal price")
        ax.set_ylabel("IL hedge value")
        ax.set_title("IL payoff value under LogSV", color="darkblue")
        if is_save:
            from papers import local_path as lp
            import stochvolmodels_tpu.plotting.plots as plot
            plot.save_fig(fig=fig, local_path=lp.get_output_path(), file_name="il_payoff")
    plt.show()


if __name__ == "__main__":
    run_unit_test(UnitTests.COMPUTE_MODEL_PRICES)
