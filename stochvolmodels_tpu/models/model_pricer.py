"""
ModelPricer: the abstract interface every model implements.

Rebuild of /root/reference/stochvolmodels/pricers/model_pricer.py.  A concrete
pricer supplies ``price_chain`` (analytic transform pricing) and optionally
``model_mc_price_chain`` / ``calibrate_model_params_to_chain``; this base
class builds slice/vanilla pricing, implied-vol computation and MC confidence
bands on top.  API-boundary types are ragged numpy lists (reference-compatible);
the jit-facing work happens inside each model on padded ChainGrid panels.

Unlike the reference, importing this module does NOT mutate any global RNG
state (the reference calls ``set_seed(24)`` at import, model_pricer.py:29);
simulations take explicit threefry keys with default seed 24.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy import stats

from stochvolmodels_tpu.config import VariableType
from stochvolmodels_tpu.data.option_chain import OptionChain


@dataclass
class ModelParams:
    """abstract container for model parameters (model_pricer.py:32-45)."""

    @classmethod
    def copy(cls, obj: "ModelParams") -> "ModelParams":
        return cls(**asdict(obj))

    def to_dict(self) -> Dict:
        return asdict(self)


class ModelPricer(ABC):
    """abstract pricer interface shared by every model (model_pricer.py:48-230)."""

    @abstractmethod
    def price_chain(self, option_chain: OptionChain, params: ModelParams,
                    **kwargs) -> List[np.ndarray]:
        """price chain data analytically; returns ragged list of price arrays."""

    def compute_chain_prices_with_vols(self,
                                       option_chain: OptionChain,
                                       params: ModelParams,
                                       variable_type: VariableType = VariableType.LOG_RETURN,
                                       **kwargs
                                       ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """price chain and invert to model implied vols."""
        model_prices = self.price_chain(option_chain=option_chain, params=params,
                                        variable_type=variable_type, **kwargs)
        model_ivols = option_chain.compute_model_ivols_from_chain_data(model_prices=model_prices)
        return model_prices, model_ivols

    def compute_model_ivols_for_chain(self, option_chain: OptionChain,
                                      params: ModelParams, **kwargs) -> List[np.ndarray]:
        """model implied vols for the chain."""
        _, model_ivols = self.compute_chain_prices_with_vols(
            option_chain=option_chain, params=params, **kwargs)
        return model_ivols

    def model_mc_price_chain(self, option_chain: OptionChain, params: ModelParams,
                             variable_type: VariableType = VariableType.LOG_RETURN,
                             **kwargs) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """price chain by simulating model dynamics; (prices, stderrs)."""
        raise NotImplementedError("must be implemented in parent class")

    def calibrate_model_params_to_chain(self, option_chain: OptionChain, **kwargs):
        """fit model params to chain quotes."""
        raise NotImplementedError("must be implemented in parent class")

    # ------------------------------------------------------------------
    # slice / vanilla pricing on top of price_chain
    # ------------------------------------------------------------------
    def price_slice(self, params: ModelParams, ttm: float, forward: float,
                    strikes: np.ndarray, optiontypes: np.ndarray,
                    discfactor: float = 1.0, **kwargs
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """price one maturity slice; returns (prices, ivols)."""
        option_chain = OptionChain.slice_to_chain(ttm=ttm, forward=forward,
                                                  strikes=strikes,
                                                  optiontypes=optiontypes,
                                                  discfactor=discfactor)
        model_prices = self.price_chain(option_chain=option_chain, params=params, **kwargs)
        model_ivols = option_chain.compute_model_ivols_from_chain_data(model_prices=model_prices)
        return model_prices[0], model_ivols[0]

    def price_vanilla(self, params: ModelParams, ttm: float, forward: float,
                      strike: float, optiontype: str, discfactor: float = 1.0,
                      **kwargs) -> Tuple[float, float]:
        """price one option; returns (price, ivol)."""
        model_prices, model_ivols = self.price_slice(
            params=params, ttm=ttm, forward=forward,
            strikes=np.array([strike]), optiontypes=np.array([optiontype]),
            discfactor=discfactor, **kwargs)
        return model_prices[0], model_ivols[0]

    # ------------------------------------------------------------------
    # monte carlo interfaces
    # ------------------------------------------------------------------
    def simulate_vol_paths(self, params: ModelParams, **kwargs):
        """grid of vol paths."""
        raise NotImplementedError("must be implemented in parent class")

    def simulate_terminal_values(self, params: ModelParams, **kwargs):
        """terminal realizations of (x, vol-state, qvar)."""
        raise NotImplementedError("must be implemented in parent class")

    def compute_mc_chain_implied_vols(self,
                                      option_chain: OptionChain,
                                      params: ModelParams,
                                      variable_type: VariableType = VariableType.LOG_RETURN,
                                      nb_path: int = 100000,
                                      **kwargs
                                      ) -> Tuple[List[np.ndarray], ...]:
        """MC prices and implied vols with 1.96-sigma confidence bands
        (model_pricer.py:181-206)."""
        model_prices_ttms, option_std_ttms = self.model_mc_price_chain(
            option_chain=option_chain, params=params,
            variable_type=variable_type, nb_path=nb_path, **kwargs)
        std_factor = 1.96
        ups = [p + std_factor * s for p, s in zip(model_prices_ttms, option_std_ttms)]
        downs = [np.maximum(p - std_factor * s, 1e-10)
                 for p, s in zip(model_prices_ttms, option_std_ttms)]
        ivols_mid = option_chain.compute_model_ivols_from_chain_data(model_prices=model_prices_ttms)
        ivols_up = option_chain.compute_model_ivols_from_chain_data(model_prices=ups)
        ivols_down = option_chain.compute_model_ivols_from_chain_data(model_prices=downs)
        return (model_prices_ttms, ups, downs, ivols_mid, ivols_up, ivols_down,
                option_std_ttms)

    def get_log_return_mc_pdf(self, ttm: float, params: ModelParams,
                              x_grid: np.ndarray, nb_path: int = 100000
                              ) -> np.ndarray:
        """KDE of simulated terminal log-returns with NaN/inf filtering
        (model_pricer.py:208-230)."""
        t_values = self.simulate_terminal_values(ttm=ttm, params=params, nb_path=nb_path)
        t_values = np.asarray(t_values)
        cut_off = 1e16
        inf_nans = np.isnan(t_values)
        inf_pos = np.greater(t_values, cut_off, where=~inf_nans)
        inf_neg = np.less(t_values, -cut_off, where=~inf_nans)
        print(f"in mc: num -inf = {np.sum(inf_neg)}, num +inf = {np.sum(inf_pos)}, "
              f"num nans = {np.sum(inf_nans)}")
        t_values = t_values[~inf_neg & ~inf_pos & ~inf_nans]
        kernel = stats.gaussian_kde(t_values)
        z = kernel(x_grid)
        return z / np.nansum(z)

    def compute_logreturn_pdf(self, params: ModelParams, **kwargs) -> np.ndarray:
        """analytic log-return density."""
        raise NotImplementedError("must be implemented in parent class")

    # ------------------------------------------------------------------
    # visualization interfaces (implemented in stochvolmodels_tpu.plotting)
    # ------------------------------------------------------------------
    def plot_model_ivols(self, option_chain: OptionChain, params: ModelParams, **kwargs):
        from stochvolmodels_tpu.plotting import pricer_plots
        return pricer_plots.plot_model_ivols(self, option_chain, params, **kwargs)

    def plot_model_ivols_vs_bid_ask(self, option_chain: OptionChain,
                                    params: ModelParams, **kwargs):
        from stochvolmodels_tpu.plotting import pricer_plots
        return pricer_plots.plot_model_ivols_vs_bid_ask(self, option_chain, params, **kwargs)

    def plot_model_ivols_vs_mc(self, option_chain: OptionChain,
                               params: ModelParams, **kwargs):
        from stochvolmodels_tpu.plotting import pricer_plots
        return pricer_plots.plot_model_ivols_vs_mc(self, option_chain, params, **kwargs)

    def plot_comp_mma_inverse_options_with_mc(self, option_chain: OptionChain,
                                              params: ModelParams, **kwargs):
        from stochvolmodels_tpu.plotting import pricer_plots
        return pricer_plots.plot_comp_mma_inverse_options_with_mc(
            self, option_chain, params, **kwargs)

    def plot_model_slices_in_params(self, option_slice, params_dict, **kwargs):
        from stochvolmodels_tpu.plotting import pricer_plots
        return pricer_plots.plot_model_slices_in_params(
            self, option_slice, params_dict, **kwargs)
