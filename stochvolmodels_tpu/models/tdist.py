"""
Student-t terminal-distribution pricer.

TPU rebuild of /root/reference/stochvolmodels/pricers/tdist_pricer.py: vanilla
prices in closed form via the incomplete beta (ops/tdist.py), risk-neutral
drift by a differentiable Newton solve, per-slice SLSQP over (vol, nu) with
jax gradients.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.models.model_pricer import ModelParams, ModelPricer
from stochvolmodels_tpu.ops import bsm
from stochvolmodels_tpu.ops import tdist as td
from stochvolmodels_tpu.utils.funcs import timer, to_flat_np_array


@dataclass
class TdistParams(ModelParams):
    """Student-t model: drift, volatility and dof nu > 2 (tdist_pricer.py:22-33);
    ttm fixed, not calibrated."""
    drift: float
    vol: float
    nu: float
    ttm: float


def tdist_vanilla_chain_pricer(vol: float,
                               nu: float,
                               drift: float,
                               ttms: np.ndarray,
                               forwards: np.ndarray,
                               strikes_ttms,
                               optiontypes_ttms,
                               discfactors: np.ndarray
                               ) -> List[np.ndarray]:
    """per-slice Student-t pricing (tdist_pricer.py:144-171)."""
    out = []
    for ttm, forward, discfactor, strikes, types in zip(ttms, forwards,
                                                        discfactors,
                                                        strikes_ttms,
                                                        optiontypes_ttms):
        out.append(np.asarray(td.compute_vanilla_price_tdist(
            spot=forward * discfactor, strikes=np.asarray(strikes), ttm=ttm,
            vol=vol, nu=nu, optiontypes=types, rf_rate=drift,
            is_compute_risk_neutral_mu=False)))
    return out


class TdistPricer(ModelPricer):
    """ModelPricer valuing options under a Student-t terminal distribution."""

    def price_chain(self, option_chain: OptionChain, params: TdistParams,
                    **kwargs) -> List[np.ndarray]:
        return tdist_vanilla_chain_pricer(drift=params.drift, vol=params.vol,
                                          nu=params.nu, ttms=option_chain.ttms,
                                          forwards=option_chain.forwards,
                                          strikes_ttms=option_chain.strikes_ttms,
                                          optiontypes_ttms=option_chain.optiontypes_ttms,
                                          discfactors=option_chain.discfactors)

    def model_mc_price_chain(self, option_chain, params, **kwargs):
        raise NotImplementedError

    @timer
    def calibrate_model_params_to_chain_slice(self,
                                              option_chain: OptionChain,
                                              params0: Optional[TdistParams] = None,
                                              is_vega_weighted: bool = True,
                                              is_unit_ttm_vega: bool = False,
                                              **kwargs) -> TdistParams:
        """per-slice SLSQP over (vol, nu), drift implied by the martingale
        condition inside the objective (tdist_pricer.py:62-118)."""
        ttms = option_chain.ttms
        if len(ttms) > 1:
            raise NotImplementedError("cannot calibrate to multiple slices")
        ttm = float(ttms[0])
        rf_rate = float(option_chain.discount_rates[0])

        p0 = np.array([params0.vol, params0.nu]) if params0 is not None else np.array([0.2, 3.0])
        bounds = ((0.05, 10.0), (2.01, 20.0))

        _, y = option_chain.get_chain_data_as_xy()
        market_vols = to_flat_np_array(y)
        if is_vega_weighted:
            vegas_ttms = option_chain.get_chain_vegas(is_unit_ttm_vega=is_unit_ttm_vega)
            weights = to_flat_np_array([v / np.sum(v) for v in vegas_ttms])
        else:
            weights = np.ones_like(market_vols)

        forward = float(option_chain.forwards[0])
        discfactor = float(option_chain.discfactors[0])
        strikes = jnp.asarray(option_chain.strikes_ttms[0])
        codes = bsm.as_option_codes(option_chain.optiontypes_ttms[0])
        market = jnp.asarray(market_vols)
        w = jnp.asarray(weights)

        def loss_fn(pars):
            vol, nu = pars[0], pars[1]
            drift = td.imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=ttm)
            prices = td.compute_vanilla_price_tdist(
                spot=forward * discfactor, strikes=strikes, ttm=ttm, vol=vol,
                nu=nu, optiontypes=codes, rf_rate=drift,
                is_compute_risk_neutral_mu=False)
            model_vols = bsm.infer_bsm_implied_vol(
                forward=forward, ttm=ttm, strike=strikes, given_price=prices,
                discfactor=discfactor, optiontype=codes)
            nan_mask = jnp.isnan(model_vols)
            clean = jnp.where(nan_mask, market, model_vols)
            resid = w * jnp.square(clean - market)
            return jnp.sum(jnp.where(nan_mask, 0.0, resid))

        obj_and_grad = jax.jit(jax.value_and_grad(loss_fn))

        def objective(pars):
            v, g = obj_and_grad(jnp.asarray(pars))
            return float(v), np.asarray(g)

        options = {'ftol': 1e-10, 'maxiter': 500}
        res = minimize(objective, p0, jac=True, method='SLSQP', bounds=bounds,
                       options=options)
        vol, nu = res.x
        drift = float(td.imply_drift_tdist(rf_rate=rf_rate, vol=vol, nu=nu, ttm=ttm))
        return TdistParams(vol=float(vol), nu=float(nu), drift=drift, ttm=ttm)

    @timer
    def calibrate_model_params_to_chain(self, option_chain: OptionChain,
                                        is_vega_weighted: bool = True,
                                        is_unit_ttm_vega: bool = False,
                                        **kwargs) -> Dict[str, TdistParams]:
        """per-slice fits, warm-started slice-to-slice (tdist_pricer.py:120-141)."""
        fit_params: Dict[str, TdistParams] = {}
        params0 = None
        for ids_ in option_chain.ids:
            chain0 = OptionChain.get_slices_as_chain(option_chain, ids=[ids_])
            params0 = self.calibrate_model_params_to_chain_slice(
                option_chain=chain0, params0=params0,
                is_vega_weighted=is_vega_weighted,
                is_unit_ttm_vega=is_unit_ttm_vega, **kwargs)
            fit_params[ids_] = params0
        return fit_params
