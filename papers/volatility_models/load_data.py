"""
Volatility data loading for the "What Is a Robust Stochastic Volatility
Model" study.

Reproduces /root/reference/papers/volatility_models/load_data.py against the
TPU framework.  Live downloads need the optional ``yfinance`` package (and
``qis`` OHLC estimators); neither ships with this environment, so
``fetch_ohlc_vol`` gates on their presence and ``get_synthetic_vol`` provides
an offline stand-in: a LogSV volatility path simulated at the daily frequency,
which exercises every downstream fit exactly like a market series.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd

try:
    import yfinance as yf  # noqa: F401
    HAS_YFINANCE = True
except ImportError:
    HAS_YFINANCE = False


def get_synthetic_vol(ticker: str = "SPY",
                      nb_days: int = 5200,
                      af: float = 260.0,
                      seed: int = 17) -> Tuple[pd.Series, pd.Series]:
    """(vol, returns) daily series from a simulated LogSV path; parameters per
    asset class chosen near the paper's fitted values."""
    presets = {"SPY": dict(theta=0.16, kappa1=3.0, kappa2=3.0, beta=-1.0, volvol=1.0),
               "VIX": dict(theta=0.18, kappa1=3.0, kappa2=3.0, beta=-1.0, volvol=0.9),
               "OVX": dict(theta=0.35, kappa1=2.5, kappa2=2.5, beta=-0.5, volvol=0.9),
               "MOVE": dict(theta=0.9, kappa1=2.0, kappa2=2.0, beta=-0.3, volvol=0.7),
               "BTC": dict(theta=0.75, kappa1=2.2, kappa2=2.2, beta=0.2, volvol=1.3),
               "ETH": dict(theta=0.95, kappa1=2.2, kappa2=2.2, beta=0.2, volvol=1.3)}
    import zlib

    p = presets.get(ticker, presets["SPY"])
    # crc32, not hash(): str hashing is salted per process and would defeat seed
    rng = np.random.default_rng(seed + zlib.crc32(ticker.encode()) % 1000)
    dt = 1.0 / af
    sdt = np.sqrt(dt)
    vartheta = np.sqrt(p["beta"] ** 2 + p["volvol"] ** 2)
    log_sigma = np.log(p["theta"])
    sigmas = np.empty(nb_days)
    rets = np.empty(nb_days)
    for i in range(nb_days):
        sigma = np.exp(log_sigma)
        w0, w1 = rng.standard_normal(2)
        rets[i] = sigma * sdt * w0
        dw_vol = (p["beta"] * w0 + p["volvol"] * w1) / vartheta
        log_sigma += ((p["kappa1"] * p["theta"] / sigma - p["kappa1"])
                      + p["kappa2"] * (p["theta"] - sigma)
                      - 0.5 * vartheta ** 2) * dt + vartheta * sdt * dw_vol
        sigmas[i] = sigma
    index = pd.bdate_range(end="2024-12-31", periods=nb_days)
    return (pd.Series(sigmas, index=index, name=ticker),
            pd.Series(rets, index=index, name=ticker))


def fetch_ohlc_vol(ticker: str = "SPY",
                   af: float = 260.0,
                   timeperiod: Optional[Tuple[str, str]] = None
                   ) -> Tuple[pd.Series, pd.Series]:
    """(vol, returns): implied indices (VIX/MOVE/OVX) use the index level as
    vol; equities use a close-to-close realized vol proxy (the reference uses
    qis Rogers-Satchell OHLC estimates).  Falls back to the synthetic series
    when yfinance is unavailable."""
    if not HAS_YFINANCE:
        print(f"yfinance not installed: using synthetic LogSV vol series for {ticker}")
        return get_synthetic_vol(ticker=ticker, af=af)

    if ticker in ("VIX", "MOVE", "OVX"):
        ohlc = yf.download(tickers=f"^{ticker}", start=None, end=None, ignore_tz=True)
        vol = ohlc["Close"] / 100.0
        spot_ticker = {"VIX": "^GSPC", "MOVE": "^TNX", "OVX": "USO"}[ticker]
        prices = yf.download(tickers=spot_ticker, start=None, end=None,
                             ignore_tz=True)["Close"]
        returns = prices.diff(1) if ticker == "MOVE" else prices.pct_change()
    else:
        data = yf.download(tickers=ticker, start=None, end=None, ignore_tz=True)
        returns = np.log(data["Close"]).diff(1)
        # close-to-close EWM realized vol at the annualization factor
        var = returns.pow(2).ewm(span=33).mean()
        vol = np.sqrt(af * var)
    if isinstance(vol, pd.DataFrame):
        vol = vol.iloc[:, 0]
    if isinstance(returns, pd.DataFrame):
        returns = returns.iloc[:, 0]
    vol = vol.replace([0.0, np.inf, -np.inf], np.nan).dropna()
    if timeperiod is not None:
        vol = vol.loc[timeperiod[0]:timeperiod[1]]
        returns = returns.loc[timeperiod[0]:timeperiod[1]]
    return vol.rename(ticker), returns.rename(ticker)
