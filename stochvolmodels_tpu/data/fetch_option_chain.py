"""
Live option-chain fetch via the optional ``option-chain-analytics`` package.

Counterpart of /root/reference/stochvolmodels/data/fetch_option_chain.py: the
dependency is optional and guarded; without it the loaders raise with a clear
message (this environment has no network egress).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from stochvolmodels_tpu.data.option_chain import OptionChain

try:
    from option_chain_analytics import OptionsDataDFs, create_chain_from_from_options_dfs  # noqa: F401
    from option_chain_analytics.option_chain import SliceColumn  # noqa: F401
    HAS_OCA = True
except ImportError:
    HAS_OCA = False


def _require_oca() -> None:
    if not HAS_OCA:
        raise ImportError(
            "live chain fetching needs the optional 'option-chain-analytics' "
            "package; install it or use the bundled sample chains in "
            "stochvolmodels_tpu.data.sample_chains")


def generate_vol_chain_np(chain,
                          value_time,
                          days_map: Optional[dict] = None,
                          delta_bounds: tuple = (-0.1, 0.1),
                          is_filtered: bool = True,
                          ) -> OptionChain:
    """build an :class:`OptionChain` from an option-chain-analytics chain
    (fetch_option_chain.py API)."""
    _require_oca()
    raise NotImplementedError(
        "port pending live-data access; use the bundled sample chains")


def load_option_chain(ticker: str = 'BTC', value_time=None) -> OptionChain:
    """load a live chain for the ticker (fetch_option_chain.py API)."""
    _require_oca()
    raise NotImplementedError(
        "port pending live-data access; use the bundled sample chains")
