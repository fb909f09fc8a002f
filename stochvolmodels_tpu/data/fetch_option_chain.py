"""
Build calibration :class:`OptionChain` inputs from live or in-memory
option-chain data.

Counterpart of /root/reference/stochvolmodels/data/fetch_option_chain.py.
The reference couples the whole module to the optional
``option-chain-analytics`` (OCA) package; here the actual chain-construction
logic — days-map expiry selection, OTM joint-slice assembly, delta-bounds
wing filtering, per-slice packing into an :class:`OptionChain`
(reference ``generate_vol_chain_np``, fetch_option_chain.py:31-74) — is
implemented dependency-free over a small duck-typed protocol, so it runs
(and is tested) against synthetic in-memory frames.  Only the live *fetch*
(``load_option_chain``, :77-101) remains guarded on OCA, which this
environment cannot install (no network egress).

Protocol (satisfied by OCA's ``SlicesChain``/``ExpirySlice`` and by the
lightweight containers below):

* ``chain.get_next_slice_after_date(mat_date)`` -> expiry key
* ``chain.expiry_slices[key]`` -> slice with ``expiry_id``, ``get_ttm()``,
  ``get_future_price()`` and
  ``get_joint_slice(delta_bounds=..., is_filtered=...)`` -> DataFrame
  indexed by strike with columns optiontype / bid_iv / ask_iv /
  bid_price / ask_price.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from stochvolmodels_tpu.data.option_chain import OptionChain

try:
    from option_chain_analytics import (  # noqa: F401
        OptionsDataDFs, create_chain_from_from_options_dfs)
    from option_chain_analytics.option_chain import SliceColumn  # noqa: F401
    HAS_OCA = True
except ImportError:
    SliceColumn = None
    HAS_OCA = False


def _oca_create_chain():
    """resolve OCA's chain constructor LAZILY (at call time, not import
    time) so the optional dependency gates only the import: a test (or a
    late install) that provides an ``option_chain_analytics`` module in
    ``sys.modules`` flows through the full adapter without reloading this
    module (reference wiring: fetch_option_chain.py:77-101)."""
    try:
        from option_chain_analytics import create_chain_from_from_options_dfs
        return create_chain_from_from_options_dfs
    except ImportError:
        raise ImportError(
            "live chain fetching needs the optional 'option-chain-analytics' "
            "package; install it or use the bundled sample chains in "
            "stochvolmodels_tpu.data.sample_chains")


def _require_oca() -> None:
    _oca_create_chain()


def _col(df: pd.DataFrame, name: str) -> np.ndarray:
    """tolerant column access: plain lower/upper-case string names, or (when
    OCA is installed) the SliceColumn enum member and its value."""
    candidates = [name, name.upper()]
    if SliceColumn is not None:
        member = getattr(SliceColumn, name.upper(), None)
        if member is not None:
            candidates += [member, getattr(member, "value", None)]
    for c in candidates:
        if c is not None and c in df.columns:
            return df[c].to_numpy()
    raise KeyError(f"joint slice frame has no '{name}' column "
                   f"(have: {list(df.columns)})")


def make_joint_slice_df(df: pd.DataFrame,
                        forward: float,
                        delta_bounds: Tuple[Optional[float], Optional[float]] = (-0.1, 0.1),
                        is_filtered: bool = True) -> pd.DataFrame:
    """assemble the OTM joint smile of one expiry from a raw per-option frame.

    This is the transformation OCA's ``ExpirySlice.get_joint_slice`` performs
    upstream of the reference's ``generate_vol_chain_np``; implemented here
    so synthetic frames go through the same semantics:

    * joint smile: puts quote strikes below the forward, calls at/above it
      (each strike appears once, sorted ascending);
    * ``delta_bounds=(put_floor, call_floor)``: drop far-wing quotes with
      ``|delta|`` below the floor — puts need ``delta <= put_floor``
      (e.g. -0.1), calls ``delta >= call_floor``; ``None`` disables a side;
    * ``is_filtered``: drop quotes without a usable two-sided vol market
      (non-finite or non-positive bid/ask IV).

    ``df`` columns: strike, optiontype ('C'/'P'), delta, bid_iv, ask_iv,
    bid_price, ask_price (strike may be the index instead).
    """
    df = df.copy()
    if "strike" in df.columns:
        df = df.set_index("strike")
    df.index = df.index.astype(float)

    otype = df["optiontype"].astype(str).to_numpy()
    is_call = np.char.upper(otype.astype(str)) == "C"
    otm = np.where(is_call, df.index.to_numpy() >= float(forward),
                   df.index.to_numpy() < float(forward))
    keep = otm
    if delta_bounds is not None and "delta" in df.columns:
        put_floor, call_floor = delta_bounds
        delta = df["delta"].to_numpy(dtype=float)
        if put_floor is not None:
            keep = keep & np.where(~is_call, delta <= float(put_floor), True)
        if call_floor is not None:
            keep = keep & np.where(is_call, delta >= float(call_floor), True)
    if is_filtered:
        bid_iv = df["bid_iv"].to_numpy(dtype=float)
        ask_iv = df["ask_iv"].to_numpy(dtype=float)
        keep = keep & np.isfinite(bid_iv) & np.isfinite(ask_iv) \
                    & (bid_iv > 0.0) & (ask_iv > 0.0)
    out = df.loc[keep].sort_index()
    # one quote per strike: the OTM split should already ensure it, but a
    # duplicated ATM strike (P and C both quoted at the forward) keeps the call
    out = out[~out.index.duplicated(keep="last")]
    return out


@dataclass
class ExpirySlice:
    """minimal expiry-slice container satisfying the OCA protocol, for
    in-memory/synthetic chains (columns as in :func:`make_joint_slice_df`)."""
    expiry_id: str
    ttm: float
    future_price: float
    df: pd.DataFrame

    def get_ttm(self) -> float:
        return float(self.ttm)

    def get_future_price(self) -> float:
        return float(self.future_price)

    def get_joint_slice(self,
                        delta_bounds: Tuple[Optional[float], Optional[float]] = (-0.1, 0.1),
                        is_filtered: bool = True) -> pd.DataFrame:
        return make_joint_slice_df(self.df, forward=self.future_price,
                                   delta_bounds=delta_bounds,
                                   is_filtered=is_filtered)


@dataclass
class SlicesChain:
    """minimal chain-of-expiry-slices container satisfying the OCA protocol
    (keys are expiry timestamps, kept sorted)."""
    expiry_slices: Dict[pd.Timestamp, ExpirySlice] = field(default_factory=dict)

    def __post_init__(self):
        self.expiry_slices = dict(sorted(self.expiry_slices.items()))

    def get_next_slice_after_date(self, mat_date: pd.Timestamp) -> pd.Timestamp:
        """first expiry on/after ``mat_date``; the LAST available expiry when
        the requested date overshoots them all (reference comment at
        fetch_option_chain.py:48: 'if overlapping next date will be last
        available maturity')."""
        keys = list(self.expiry_slices.keys())
        if not keys:
            raise ValueError("chain has no expiry slices")
        for k in keys:
            if k >= mat_date:
                return k
        return keys[-1]


def generate_vol_chain_np(chain,
                          value_time: pd.Timestamp,
                          days_map: Optional[Dict[str, int]] = None,
                          delta_bounds: Tuple[Optional[float], Optional[float]] = (-0.1, 0.1),
                          is_filtered: bool = True,
                          ) -> OptionChain:
    """build the calibration :class:`OptionChain` from a slices chain
    (reference ``generate_vol_chain_np``, fetch_option_chain.py:31-74).

    For each ``days_map`` entry (label -> horizon in days) the first expiry
    on/after ``value_time + days`` is selected, its delta-filtered OTM joint
    smile extracted, and non-empty slices packed into one chain with ids
    ``'<label>: <expiry_id>'`` and unit discount factors (crypto-style
    forward quoting).  Works on OCA ``SlicesChain`` objects and on the
    in-memory :class:`SlicesChain` above — no optional dependency needed.
    """
    if days_map is None:
        days_map = {'1w': 7, '1m': 21}

    ttms, future_prices, discfactors, slice_ids = [], [], [], []
    strikes_ttms, optiontypes_ttms = [], []
    bid_ivs, ask_ivs, bid_prices, ask_prices = [], [], [], []
    seen = set()
    for label, day in days_map.items():
        next_date = value_time + pd.DateOffset(days=day)
        slice_date = chain.get_next_slice_after_date(mat_date=next_date)
        if slice_date in seen:   # overlapping horizons resolve to one expiry
            continue
        seen.add(slice_date)
        slice_t = chain.expiry_slices[slice_date]
        df = slice_t.get_joint_slice(delta_bounds=delta_bounds,
                                     is_filtered=is_filtered)
        if df.empty:
            continue
        slice_ids.append(f"{label}: {slice_t.expiry_id}")
        ttms.append(slice_t.get_ttm())
        future_prices.append(slice_t.get_future_price())
        discfactors.append(1.0)
        strikes_ttms.append(df.index.to_numpy(dtype=float))
        optiontypes_ttms.append(_col(df, "optiontype").astype(str))
        bid_ivs.append(_col(df, "bid_iv").astype(float))
        ask_ivs.append(_col(df, "ask_iv").astype(float))
        bid_prices.append(_col(df, "bid_price").astype(float))
        ask_prices.append(_col(df, "ask_price").astype(float))

    return OptionChain(ttms=np.array(ttms),
                       forwards=np.array(future_prices),
                       discfactors=np.array(discfactors),
                       ids=np.array(slice_ids),
                       strikes_ttms=strikes_ttms,
                       optiontypes_ttms=optiontypes_ttms,
                       bid_ivs=bid_ivs,
                       ask_ivs=ask_ivs,
                       bid_prices=bid_prices,
                       ask_prices=ask_prices)


def load_option_chain(options_data_dfs,
                      value_time: pd.Timestamp = pd.Timestamp('2023-02-06 08:00:00+00:00'),
                      days_map: Optional[Dict[str, int]] = None,
                      delta_bounds: Tuple[Optional[float], Optional[float]] = (-0.1, 0.1),
                      is_filtered: bool = True,
                      ) -> Optional[OptionChain]:
    """build an OptionChain from an OCA ``OptionsDataDFs`` at ``value_time``
    (reference fetch_option_chain.py:77-101).  The optional dependency is
    resolved lazily and gates ONLY the ``create_chain_from_from_options_dfs``
    constructor; the transformation itself lives in
    :func:`generate_vol_chain_np` and needs nothing beyond pandas — tested
    end-to-end against an injected fake OCA module
    (tests/test_chain_data.py)."""
    create_chain = _oca_create_chain()
    chain = create_chain(
        options_data_dfs=options_data_dfs, value_time=value_time)
    if chain is None:
        return None
    return generate_vol_chain_np(chain=chain, value_time=value_time,
                                 days_map=days_map, delta_bounds=delta_bounds,
                                 is_filtered=is_filtered)


def sample_option_chain_at_times(options_data_dfs,
                                 time_period,
                                 freq: str = 'W-FRI',
                                 days_map: Optional[Dict[str, int]] = None,
                                 delta_bounds: Tuple[Optional[float], Optional[float]] = (-0.1, 0.1),
                                 hour_offset: int = 8,
                                 ) -> Dict[pd.Timestamp, OptionChain]:
    """extract chains on a date schedule for time-series calibration
    (reference fetch_option_chain.py:104-127).  ``time_period`` is anything
    with ``.start``/``.end`` timestamps (e.g. qis.TimePeriod) or a
    ``(start, end)`` pair."""
    _require_oca()
    start, end = (getattr(time_period, "start", None),
                  getattr(time_period, "end", None))
    if start is None or end is None:
        start, end = time_period
    value_times = (pd.date_range(start=start, end=end, freq=freq)
                   + pd.Timedelta(hours=hour_offset))
    return {vt: load_option_chain(options_data_dfs=options_data_dfs,
                                  value_time=vt, days_map=days_map,
                                  delta_bounds=delta_bounds, is_filtered=True)
            for vt in value_times}


def load_price_data(options_data_dfs,
                    time_period=None,
                    data: str = 'close',
                    freq: Optional[str] = 'D',
                    ) -> pd.Series:
    """underlying price series accompanying the options data (reference
    fetch_option_chain.py:130-141).  Duck-typed on ``get_spot_data()``."""
    spot_price = options_data_dfs.get_spot_data()[data]
    if freq is not None:
        spot_price = spot_price.resample(freq).last()
    if time_period is not None:
        locate = getattr(time_period, "locate", None)
        if locate is not None:
            spot_price = locate(spot_price)
        else:
            start, end = time_period
            spot_price = spot_price.loc[start:end]
    return spot_price
