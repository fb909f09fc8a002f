"""
Gaussian-mixture terminal-distribution pricer.

TPU rebuild of /root/reference/stochvolmodels/pricers/gmm_pricer.py: prices
are weighted sums of BSM prices at drift-adjusted forwards; the per-state
loop becomes one broadcast over the (state, strike) panel.  Per-slice SLSQP
calibration keeps the reference's equality constraints (weights sum to one,
mixture reprices the forward), with jax gradients for objective and
constraints.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.models.model_pricer import ModelParams, ModelPricer
from stochvolmodels_tpu.ops import bsm
from stochvolmodels_tpu.ops.gauss import npdf
from stochvolmodels_tpu.utils.funcs import timer, to_flat_np_array

Array = jnp.ndarray


@dataclass
class GmmParams(ModelParams):
    """weighted mixture of normals for terminal log-returns
    (gmm_pricer.py:20-60); ttm is fixed, not calibrated."""
    gmm_weights: np.ndarray
    gmm_mus: np.ndarray
    gmm_vols: np.ndarray
    ttm: float

    def sort_by_mus(self):
        indices = np.argsort(self.gmm_mus)
        self.gmm_weights = self.gmm_weights[indices]
        self.gmm_mus = self.gmm_mus[indices]
        self.gmm_vols = self.gmm_vols[indices]

    def get_get_avg_vol(self) -> float:
        return float(np.sqrt(np.sum(self.gmm_weights * np.square(self.gmm_vols))))

    def compute_state_pdfs(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        x = jnp.asarray(x)
        state_pdfs = npdf(x[:, None],
                          mu=jnp.asarray(self.gmm_mus)[None, :] * self.ttm,
                          vol=jnp.asarray(self.gmm_vols)[None, :] * np.sqrt(self.ttm))
        agg_pdf = state_pdfs @ jnp.asarray(self.gmm_weights)
        return np.asarray(state_pdfs), np.asarray(agg_pdf)

    def compute_pdf(self, x: np.ndarray) -> np.ndarray:
        _, agg = self.compute_state_pdfs(x)
        return agg


def compute_gmm_vanilla_price(gmm_weights,
                              gmm_mus,
                              gmm_vols,
                              ttm,
                              forward,
                              strike,
                              optiontype,
                              discfactor=1.0
                              ) -> Array:
    """price = sum_i w_i BSM(F exp((mu_i + 0.5 vol_i^2) ttm), vol_i)
    (gmm_pricer.py:198-222); broadcast over (state, strike)."""
    gmm_weights = jnp.asarray(gmm_weights)
    gmm_mus = jnp.asarray(gmm_mus)
    gmm_vols = jnp.asarray(gmm_vols)
    strike = jnp.asarray(strike)
    forwards_i = forward * jnp.exp((gmm_mus + 0.5 * gmm_vols * gmm_vols) * ttm)
    codes = bsm.as_option_codes(optiontype)
    prices_i = bsm.compute_bsm_vanilla_price(
        forward=forwards_i[:, None], strike=strike[None, :], ttm=ttm,
        vol=gmm_vols[:, None], optiontype=codes[None, :], discfactor=1.0)
    return discfactor * (gmm_weights @ prices_i)


def compute_gmm_vanilla_slice_prices(gmm_weights, gmm_mus, gmm_vols, ttm,
                                     forward, strikes, optiontypes,
                                     discfactor=1.0) -> Array:
    """slice entry with the reference's plural kwargs (gmm_pricer.py:225-244)."""
    return compute_gmm_vanilla_price(gmm_weights=gmm_weights, gmm_mus=gmm_mus,
                                     gmm_vols=gmm_vols, ttm=ttm, forward=forward,
                                     strike=strikes, optiontype=optiontypes,
                                     discfactor=discfactor)


def gmm_vanilla_chain_pricer(gmm_weights, gmm_mus, gmm_vols, ttms, forwards,
                             strikes_ttms, optiontypes_ttms, discfactors
                             ) -> List[np.ndarray]:
    """per-slice mixture pricing (gmm_pricer.py:255-282)."""
    out = []
    for ttm, forward, discfactor, strikes, types in zip(ttms, forwards,
                                                        discfactors,
                                                        strikes_ttms,
                                                        optiontypes_ttms):
        out.append(np.asarray(compute_gmm_vanilla_price(
            gmm_weights=gmm_weights, gmm_mus=gmm_mus, gmm_vols=gmm_vols,
            ttm=ttm, forward=forward, strike=np.asarray(strikes),
            optiontype=types, discfactor=discfactor)))
    return out


class GmmPricer(ModelPricer):
    """ModelPricer valuing options as a weighted sum of BSM prices."""

    def price_chain(self, option_chain: OptionChain, params: GmmParams,
                    **kwargs) -> List[np.ndarray]:
        return gmm_vanilla_chain_pricer(gmm_weights=params.gmm_weights,
                                        gmm_mus=params.gmm_mus,
                                        gmm_vols=params.gmm_vols,
                                        ttms=option_chain.ttms,
                                        forwards=option_chain.forwards,
                                        strikes_ttms=option_chain.strikes_ttms,
                                        optiontypes_ttms=option_chain.optiontypes_ttms,
                                        discfactors=option_chain.discfactors)

    def model_mc_price_chain(self, option_chain, params, **kwargs):
        raise NotImplementedError

    @timer
    def calibrate_model_params_to_chain_slice(self,
                                              option_chain: OptionChain,
                                              params0: Optional[GmmParams] = None,
                                              is_vega_weighted: bool = True,
                                              is_unit_ttm_vega: bool = False,
                                              n_mixtures: int = 4,
                                              **kwargs) -> GmmParams:
        """per-slice SLSQP with weights-sum and martingale equality
        constraints (gmm_pricer.py:89-170), jax gradients supplied."""
        ttms = option_chain.ttms
        if len(ttms) > 1:
            raise NotImplementedError("cannot calibrate to multiple slices")
        ttm = float(ttms[0])

        if params0 is not None:
            p0 = np.concatenate((params0.gmm_weights, params0.gmm_mus, params0.gmm_vols))
            n_mixtures = len(params0.gmm_weights)
        else:
            p0 = np.concatenate((np.ones(n_mixtures) / n_mixtures,
                                 np.zeros(n_mixtures),
                                 np.linspace(0.2, 1.0, n_mixtures)))
        bounds = np.concatenate(([(0.0, 1.0)] * n_mixtures,
                                 [(-10.0, 10.0)] * n_mixtures,
                                 [(0.01, 4.0)] * n_mixtures))

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
        nm = n_mixtures

        def loss_fn(pars):
            gmm_weights = pars[:nm]
            gmm_mus = pars[nm:2 * nm]
            gmm_vols = pars[2 * nm:]
            prices = compute_gmm_vanilla_price(
                gmm_weights=gmm_weights, gmm_mus=gmm_mus, gmm_vols=gmm_vols,
                ttm=ttm, forward=forward, strike=strikes, optiontype=codes,
                discfactor=discfactor)
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

        def weights_sum(pars):
            return np.sum(pars[:nm]) - 1.0

        def weights_sum_jac(pars):
            j = np.zeros_like(pars)
            j[:nm] = 1.0
            return j

        def martingale(pars):
            gw, gm, gv = pars[:nm], pars[nm:2 * nm], pars[2 * nm:]
            return np.sum(gw * np.exp((gm + 0.5 * gv * gv) * ttm)) - 1.0

        constraints = ({'type': 'eq', 'fun': weights_sum, 'jac': weights_sum_jac},
                       {'type': 'eq', 'fun': martingale})
        options = {'ftol': 1e-10, 'maxiter': 500}
        res = minimize(objective, p0, jac=True, method='SLSQP',
                       constraints=constraints, bounds=bounds, options=options)
        fit_params = GmmParams(gmm_weights=res.x[:nm], gmm_mus=res.x[nm:2 * nm],
                               gmm_vols=res.x[2 * nm:], ttm=ttm)
        fit_params.sort_by_mus()
        return fit_params

    @timer
    def calibrate_model_params_to_chain(self, option_chain: OptionChain,
                                        is_vega_weighted: bool = True,
                                        is_unit_ttm_vega: bool = False,
                                        n_mixtures: int = 4,
                                        **kwargs) -> Dict[str, GmmParams]:
        """per-slice fits, warm-started slice-to-slice (gmm_pricer.py:172-195)."""
        fit_params: Dict[str, GmmParams] = {}
        params0 = None
        for ids_ in option_chain.ids:
            chain0 = OptionChain.get_slices_as_chain(option_chain, ids=[ids_])
            params0 = self.calibrate_model_params_to_chain_slice(
                option_chain=chain0, params0=params0,
                is_vega_weighted=is_vega_weighted,
                is_unit_ttm_vega=is_unit_ttm_vega, n_mixtures=n_mixtures, **kwargs)
            fit_params[ids_] = params0
        return fit_params
