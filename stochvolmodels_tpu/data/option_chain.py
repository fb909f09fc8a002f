"""
Option-chain containers.

Rebuild of /root/reference/stochvolmodels/data/option_chain.py with a
TPU-native twist: the user-facing :class:`OptionChain` keeps the reference's
ragged per-maturity numpy lists for API compatibility, and lowers to a dense
padded :class:`ChainGrid` pytree — (n_ttm, max_strikes) panels with a validity
mask — which is what every jitted pricer consumes.  Padded strike slots carry
the slice forward (so log-moneyness is 0, always finite) and a call code; they
are masked out at the boundary.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import stochvolmodels_tpu.ops.bachelier as bachel
import stochvolmodels_tpu.ops.bsm as bsm
from stochvolmodels_tpu.config import decode_optiontypes, encode_optiontypes
from stochvolmodels_tpu.utils.funcs import npad, unpad
from stochvolmodels_tpu.utils.var_swap import compute_var_swap_strike


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ChainGrid:
    """dense padded chain panel: the jit-facing view of an OptionChain.

    All leaves are arrays; ``strikes``/``optioncodes``/``mask`` have shape
    (n_ttm, max_strikes), the rest (n_ttm,).
    """
    ttms: jnp.ndarray
    forwards: jnp.ndarray
    discfactors: jnp.ndarray
    strikes: jnp.ndarray
    optioncodes: jnp.ndarray   # int8; bit0=is_call, bit1=is_inverse
    mask: jnp.ndarray          # bool, True on real quotes

    @property
    def n_ttms(self) -> int:
        return self.ttms.shape[0]

    @property
    def max_strikes(self) -> int:
        return self.strikes.shape[1]

    def masked(self, panel: jnp.ndarray, fill: float = jnp.nan) -> jnp.ndarray:
        """apply the validity mask to a (n_ttm, max_strikes) result panel."""
        return jnp.where(self.mask, panel, fill)


@dataclass
class OptionSlice:
    """single-maturity container (option_chain.py:22-50)."""
    ttm: float
    forward: float
    strikes: np.ndarray
    optiontypes: np.ndarray
    id: str
    discfactor: Optional[float] = None
    discount_rate: Optional[float] = None
    bid_ivs: Optional[np.ndarray] = None
    ask_ivs: Optional[np.ndarray] = None
    bid_prices: Optional[np.ndarray] = None
    ask_prices: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.discfactor is not None:
            self.discount_rate = -np.log(self.discfactor) / self.ttm
        elif self.discount_rate is not None:
            self.discfactor = np.exp(-self.discount_rate * self.ttm)
        else:
            self.discfactor = 1.0
            self.discount_rate = 0.0


@dataclass
class OptionChain:
    """chain container mirroring the reference API (option_chain.py:53-333).

    Ragged data is stored as tuples/lists of numpy arrays; ``to_grid()``
    lowers to the padded :class:`ChainGrid` consumed by jitted pricers.
    """
    ttms: np.ndarray
    forwards: np.ndarray
    strikes_ttms: Sequence[np.ndarray]
    optiontypes_ttms: Sequence[np.ndarray]
    ids: Optional[np.ndarray] = None
    discfactors: Optional[np.ndarray] = None
    discount_rates: Optional[np.ndarray] = None
    ticker: Optional[str] = None
    bid_ivs: Optional[Sequence[np.ndarray]] = None
    ask_ivs: Optional[Sequence[np.ndarray]] = None
    bid_prices: Optional[Sequence[np.ndarray]] = None
    ask_prices: Optional[Sequence[np.ndarray]] = None
    forwards0: Optional[np.ndarray] = None

    def __post_init__(self):
        self.ttms = np.asarray(self.ttms, dtype=float)
        self.forwards = np.asarray(self.forwards, dtype=float)
        self.strikes_ttms = [np.asarray(s, dtype=float) for s in self.strikes_ttms]
        self.optiontypes_ttms = [np.asarray(t) for t in self.optiontypes_ttms]
        if self.ids is None:
            self.ids = np.array([f"{ttm:0.2f}" for ttm in self.ttms])
        if self.discfactors is not None:
            self.discfactors = np.asarray(self.discfactors, dtype=float)
            self.discount_rates = -np.log(self.discfactors) / self.ttms
        elif self.discount_rates is not None:
            self.discount_rates = np.asarray(self.discount_rates, dtype=float)
            self.discfactors = np.exp(-self.discount_rates * self.ttms)
        else:
            self.discfactors = np.ones_like(self.ttms)
            self.discount_rates = np.zeros_like(self.ttms)

    # ------------------------------------------------------------------
    # padded-grid lowering
    # ------------------------------------------------------------------
    def to_grid(self) -> ChainGrid:
        """lower to the dense padded panel used by all jitted pricers."""
        strikes, mask = npad(self.strikes_ttms, pad_value=np.nan)
        # pad strikes with the row forward: log-moneyness 0, always finite
        strikes = np.where(mask, strikes, self.forwards[:, None])
        codes, _ = npad([encode_optiontypes(t) for t in self.optiontypes_ttms],
                        pad_value=1)  # pad as calls
        return ChainGrid(ttms=jnp.asarray(self.ttms),
                         forwards=jnp.asarray(self.forwards),
                         discfactors=jnp.asarray(self.discfactors),
                         strikes=jnp.asarray(strikes),
                         optioncodes=jnp.asarray(codes.astype(np.int8)),
                         mask=jnp.asarray(mask))

    def unpad_panel(self, panel) -> List[np.ndarray]:
        """split a (n_ttm, max_strikes) panel back into the ragged list."""
        strikes, mask = npad(self.strikes_ttms, pad_value=np.nan)
        return unpad(np.asarray(panel), mask)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def slice_to_chain(cls, ttm: float, forward: float, strikes: np.ndarray,
                       optiontypes: np.ndarray, discfactor: float = 1.0,
                       id: Optional[str] = None) -> "OptionChain":
        """single-slice chain from raw arrays (option_chain.py:99-115)."""
        return cls(ttms=np.array([ttm]), forwards=np.array([forward]),
                   strikes_ttms=[np.asarray(strikes)],
                   optiontypes_ttms=[np.asarray(optiontypes)],
                   discfactors=np.array([discfactor]),
                   ids=np.array([id]) if id is not None else np.array([f"{ttm:0.2f}"]))

    @classmethod
    def get_uniform_chain(cls,
                          ttms: np.ndarray = np.array([0.083, 0.25]),
                          ids: np.ndarray = np.array(['1m', '3m']),
                          forwards: np.ndarray = np.array([1.0, 1.0]),
                          strikes: np.ndarray = np.linspace(0.9, 1.1, 3),
                          flat_vol: float = 0.2
                          ) -> "OptionChain":
        """synthetic chain on a uniform strike grid (option_chain.py:314-333)."""
        return cls(ttms=ttms, ids=ids, forwards=forwards,
                   strikes_ttms=[strikes for _ in ttms],
                   bid_ivs=[flat_vol * np.ones_like(strikes) for _ in ttms],
                   ask_ivs=[flat_vol * np.ones_like(strikes) for _ in ttms],
                   optiontypes_ttms=[np.where(strikes >= forward, 'C', 'P')
                                     for forward in forwards])

    @classmethod
    def to_forward_normalised_strikes(cls, obj: "OptionChain") -> "OptionChain":
        """normalize strikes by forwards (option_chain.py:201-219)."""
        new_strikes = [s / f for s, f in zip(obj.strikes_ttms, obj.forwards)]
        return cls(ttms=obj.ttms, forwards=np.ones_like(obj.forwards),
                   strikes_ttms=new_strikes, optiontypes_ttms=obj.optiontypes_ttms,
                   discfactors=obj.discfactors, ticker=obj.ticker, ids=obj.ids,
                   bid_ivs=obj.bid_ivs, ask_ivs=obj.ask_ivs, forwards0=obj.forwards)

    @classmethod
    def to_uniform_strikes(cls, obj: "OptionChain", num_strikes: int = 21) -> "OptionChain":
        """re-grid each slice to uniform strikes (option_chain.py:221-238)."""
        new_strikes_ttms, new_optiontypes_ttms = [], []
        for strikes_ttm, forward in zip(obj.strikes_ttms, obj.forwards):
            new_strikes = np.linspace(strikes_ttm[0], strikes_ttm[-1], num_strikes)
            new_strikes_ttms.append(new_strikes)
            new_optiontypes_ttms.append(np.where(new_strikes >= forward, 'C', 'P'))
        return cls(ttms=obj.ttms, forwards=obj.forwards,
                   strikes_ttms=new_strikes_ttms,
                   optiontypes_ttms=new_optiontypes_ttms,
                   discfactors=obj.discfactors, ticker=obj.ticker, ids=obj.ids,
                   bid_ivs=None, ask_ivs=None)

    @classmethod
    def get_slices_as_chain(cls, option_chain: "OptionChain", ids) -> "OptionChain":
        """subset of the chain for given slice ids (option_chain.py:281-312)."""
        indices = [list(option_chain.ids).index(id_) for id_ in ids]
        pick = lambda seq: None if seq is None else [seq[i] for i in indices]
        return cls(ids=np.asarray(ids),
                   ttms=option_chain.ttms[indices],
                   ticker=option_chain.ticker,
                   forwards=option_chain.forwards[indices],
                   strikes_ttms=[option_chain.strikes_ttms[i] for i in indices],
                   optiontypes_ttms=[option_chain.optiontypes_ttms[i] for i in indices],
                   discfactors=option_chain.discfactors[indices],
                   bid_ivs=pick(option_chain.bid_ivs),
                   ask_ivs=pick(option_chain.ask_ivs),
                   bid_prices=pick(option_chain.bid_prices),
                   ask_prices=pick(option_chain.ask_prices))

    def get_slice(self, id: str) -> OptionSlice:
        """the OptionSlice with the given id (option_chain.py:240-253)."""
        idx = list(self.ids).index(id)
        g = lambda seq: None if seq is None else seq[idx]
        return OptionSlice(id=self.ids[idx], ttm=self.ttms[idx],
                           forward=self.forwards[idx],
                           strikes=self.strikes_ttms[idx],
                           optiontypes=self.optiontypes_ttms[idx],
                           discfactor=self.discfactors[idx],
                           bid_ivs=g(self.bid_ivs), ask_ivs=g(self.ask_ivs),
                           bid_prices=g(self.bid_prices), ask_prices=g(self.ask_prices))

    # ------------------------------------------------------------------
    # analytics
    # ------------------------------------------------------------------
    def print(self) -> None:
        """print the chain slice by slice."""
        for k in ('ttms', 'forwards', 'strikes_ttms', 'optiontypes_ttms', 'ids',
                  'bid_ivs', 'ask_ivs'):
            print(f"{k}:\n{getattr(self, k)}")

    def get_mid_vols(self) -> Optional[List[np.ndarray]]:
        """per-slice mid implied vols, average of bid and ask."""
        if self.bid_ivs is not None and self.ask_ivs is not None:
            return [0.5 * (b + a) for b, a in zip(self.bid_ivs, self.ask_ivs)]
        return None

    def get_chain_deltas(self) -> List[np.ndarray]:
        """BSM deltas per slice at the mid vols."""
        out = []
        for ttm, fwd, strikes, types, vols in zip(self.ttms, self.forwards,
                                                  self.strikes_ttms,
                                                  self.optiontypes_ttms,
                                                  self.get_mid_vols()):
            out.append(np.asarray(bsm.compute_bsm_vanilla_delta(
                ttm=ttm, forward=fwd, strike=strikes, vol=vols, optiontype=types)))
        return out

    def get_chain_vegas(self, is_unit_ttm_vega: bool = False) -> List[np.ndarray]:
        """BSM vegas per slice — calibration weights (option_chain.py:133-149)."""
        ttms = np.ones_like(self.ttms) if is_unit_ttm_vega else self.ttms
        out = []
        for ttm, fwd, strikes, vols in zip(ttms, self.forwards, self.strikes_ttms,
                                           self.get_mid_vols()):
            out.append(np.asarray(bsm.compute_bsm_vanilla_vega(
                ttm=ttm, forward=fwd, strike=strikes, vol=vols)))
        return out

    def get_chain_atm_vols(self) -> np.ndarray:
        """ATM vol per slice by interpolation to the forward."""
        atm_vols = np.zeros(len(self.ttms))
        for idx, (forward, strikes_ttm, y) in enumerate(zip(self.forwards,
                                                            self.strikes_ttms,
                                                            self.get_mid_vols())):
            atm_vols[idx] = np.interp(x=forward, xp=strikes_ttm, fp=y)
        return atm_vols

    def get_chain_skews(self, delta: float = 0.25) -> np.ndarray:
        """25-delta skew (put vol - call vol)/atm per slice (option_chain.py:158-169)."""
        skews = np.zeros(len(self.ttms))
        deltas_ttms = self.get_chain_deltas()
        for idx, (deltas, vols) in enumerate(zip(deltas_ttms, self.get_mid_vols())):
            dput = np.interp(x=-delta, xp=deltas, fp=vols)
            d50 = np.interp(x=0.5, xp=deltas, fp=vols)
            dcall = np.interp(x=delta, xp=deltas, fp=vols)
            skews[idx] = (dput - dcall) / d50
        return skews

    def get_chain_data_as_xy(self) -> Tuple[tuple, List[np.ndarray]]:
        """(x, y) for calibration: chain coordinates and mid vols."""
        mid_vols = [0.5 * (b + a) for b, a in zip(self.bid_ivs, self.ask_ivs)]
        x = (self.ttms, self.forwards, self.discfactors, self.strikes_ttms,
             self.optiontypes_ttms)
        return x, mid_vols

    def compute_model_ivols_from_chain_data(self,
                                            model_prices,
                                            forwards: np.ndarray = None
                                            ) -> List[np.ndarray]:
        """invert model prices to BSM ivols, slice by slice.

        ``model_prices`` may be the ragged list or a padded (T, K) panel.
        """
        if forwards is None:
            forwards = self.forwards
        if isinstance(model_prices, (list, tuple)):
            prices_panel, _ = npad([np.asarray(p) for p in model_prices], pad_value=np.nan)
        else:
            prices_panel = np.asarray(model_prices)
        grid = self.to_grid()
        ivols = bsm.infer_bsm_ivols_from_model_chain_prices(
            ttms=self.ttms, forwards=forwards, discfactors=self.discfactors,
            strikes_ttms=grid.strikes, optiontypes_ttms=grid.optioncodes,
            model_prices_ttms=jnp.asarray(prices_panel))
        return self.unpad_panel(ivols)

    def get_slice_varswap_strikes(self, floor_with_atm_vols: bool = True) -> pd.Series:
        """varswap strike per maturity from the option strip (option_chain.py:255-279)."""
        varswap_strikes = np.zeros_like(self.ttms)
        vols_ttms = self.get_mid_vols()
        for idx, ttm in enumerate(self.ttms):
            mid_prices = np.asarray(bsm.compute_bsm_vanilla_slice_prices(
                ttm=ttm, forward=self.forwards[idx],
                strikes=self.strikes_ttms[idx], vols=vols_ttms[idx],
                optiontypes=self.optiontypes_ttms[idx]))
            strikes = self.strikes_ttms[idx]
            puts_cond = self.optiontypes_ttms[idx] == 'P'
            puts = pd.Series(mid_prices[puts_cond], index=strikes[puts_cond])
            calls = pd.Series(mid_prices[~puts_cond], index=strikes[~puts_cond])
            varswap_strikes[idx] = compute_var_swap_strike(
                puts=puts, calls=calls, forward=self.forwards[idx], ttm=ttm)
        if floor_with_atm_vols:
            varswap_strikes = np.maximum(self.get_chain_atm_vols(), varswap_strikes)
        return pd.Series(varswap_strikes, index=self.ttms)
