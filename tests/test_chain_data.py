"""
Option-chain containers and bundled sample data.
"""
import numpy as np
import pandas as pd
import pytest

from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.data import sample_chains


ALL_CHAINS = [
    sample_chains.get_btc_test_chain_data,
    sample_chains.get_vix_test_chain_data,
    sample_chains.get_gld_test_chain_data_6m,
    sample_chains.get_gld_test_chain_data,
    sample_chains.get_sqqq_test_chain_data,
    sample_chains.get_spy_test_chain_data,
]


@pytest.mark.parametrize("loader", ALL_CHAINS)
def test_sample_chain_loads(loader):
    chain = loader()
    n = len(chain.ttms)
    assert n >= 1
    assert chain.forwards.shape == (n,)
    assert len(chain.strikes_ttms) == n
    for s, t, b, a in zip(chain.strikes_ttms, chain.optiontypes_ttms,
                          chain.bid_ivs, chain.ask_ivs):
        assert s.shape == t.shape == b.shape == a.shape
        assert np.all(b <= a)


def test_btc_chain_values():
    chain = sample_chains.get_btc_test_chain_data()
    assert chain.ticker == 'BTC'
    assert len(chain.ttms) == 4
    np.testing.assert_allclose(chain.ttms[0], 0.04289242541152263)
    assert [len(s) for s in chain.strikes_ttms] == [12, 13, 15, 9]


def test_grid_roundtrip():
    chain = sample_chains.get_btc_test_chain_data()
    grid = chain.to_grid()
    assert grid.strikes.shape == (4, 15)
    assert grid.mask.shape == (4, 15)
    assert int(grid.mask.sum()) == 12 + 13 + 15 + 9
    # unpad recovers the ragged strikes
    back = chain.unpad_panel(grid.strikes)
    for orig, rec in zip(chain.strikes_ttms, back):
        np.testing.assert_allclose(orig, rec)
    # padded slots carry the forward (finite log-moneyness)
    assert np.all(np.isfinite(np.asarray(grid.strikes)))


def test_mid_vols_and_vegas():
    chain = sample_chains.get_btc_test_chain_data()
    mids = chain.get_mid_vols()
    vegas = chain.get_chain_vegas()
    for m, v in zip(mids, vegas):
        assert np.all(m > 0)
        assert np.all(v > 0)
    atm = chain.get_chain_atm_vols()
    assert np.all((atm > 0.5) & (atm < 1.5))
    skews = chain.get_chain_skews()
    assert skews.shape == (4,)


def test_slice_to_chain_and_back():
    chain = OptionChain.slice_to_chain(ttm=0.5, forward=100.0,
                                       strikes=np.array([90.0, 100.0, 110.0]),
                                       optiontypes=np.array(['P', 'C', 'C']),
                                       discfactor=0.99)
    assert len(chain.ttms) == 1
    np.testing.assert_allclose(chain.discount_rates[0], -np.log(0.99) / 0.5)
    sl = chain.get_slice(chain.ids[0])
    assert sl.forward == 100.0


def test_get_slices_as_chain():
    chain = sample_chains.get_btc_test_chain_data()
    sub = OptionChain.get_slices_as_chain(chain, ['1m', '3m'])
    assert len(sub.ttms) == 2
    np.testing.assert_allclose(sub.forwards, chain.forwards[[1, 3]])


def test_uniform_chain():
    chain = OptionChain.get_uniform_chain()
    assert len(chain.ttms) == 2
    assert chain.get_mid_vols() is not None


def test_varswap_strikes():
    chain = sample_chains.get_btc_test_chain_data()
    vs = chain.get_slice_varswap_strikes()
    assert np.all(vs.to_numpy() > 0.5)
    assert np.all(vs.to_numpy() < 2.0)


# ---------------------------------------------------------------------------
# generate_vol_chain_np: chain construction from in-memory frames
# (reference fetch_option_chain.py:31-74 semantics, dependency-free)
# ---------------------------------------------------------------------------

def _synthetic_expiry_slice(expiry_id, ttm, forward):
    """raw per-option frame for one expiry: OTM+ITM quotes on both sides,
    far wings with tiny |delta|, one strike with a dead (NaN/zero) market."""
    from stochvolmodels_tpu.data.fetch_option_chain import ExpirySlice

    strikes = np.array([50.0, 70.0, 90.0, 100.0, 110.0, 130.0, 160.0])
    put_deltas = {50.0: -0.02, 70.0: -0.10, 90.0: -0.25, 100.0: -0.45,
                  110.0: -0.65, 130.0: -0.85, 160.0: -0.95}
    rows = []
    for k in strikes:
        for ot, delta in (('P', put_deltas[k]), ('C', 1.0 + put_deltas[k])):
            iv = 0.5 + 0.3 * abs(np.log(k / forward))
            rows.append(dict(strike=k, optiontype=ot, delta=delta,
                             bid_iv=iv - 0.02, ask_iv=iv + 0.02,
                             bid_price=1.0, ask_price=1.2))
    df = pd.DataFrame(rows)
    # kill the two-sided market at strike 130 call (bid_iv NaN) -> filtered
    df.loc[(df.strike == 130.0) & (df.optiontype == 'C'), 'bid_iv'] = np.nan
    return ExpirySlice(expiry_id=expiry_id, ttm=ttm, future_price=forward, df=df)


def _synthetic_chain(value_time):
    from stochvolmodels_tpu.data.fetch_option_chain import SlicesChain

    return SlicesChain(expiry_slices={
        value_time + pd.DateOffset(days=9): _synthetic_expiry_slice('09NOV', 9 / 365, 100.0),
        value_time + pd.DateOffset(days=23): _synthetic_expiry_slice('23NOV', 23 / 365, 101.0),
    })


def test_generate_vol_chain_np_from_synthetic_frames():
    from stochvolmodels_tpu.data.fetch_option_chain import generate_vol_chain_np

    value_time = pd.Timestamp('2021-11-01 08:00:00+00:00')
    chain = _synthetic_chain(value_time)
    oc = generate_vol_chain_np(chain, value_time,
                               days_map={'1w': 7, '1m': 21},
                               delta_bounds=(-0.1, 0.1), is_filtered=True)
    # days_map horizons 7d/21d pick the 9d and 23d expiries
    assert list(oc.ids) == ['1w: 09NOV', '1m: 23NOV']
    np.testing.assert_allclose(oc.ttms, [9 / 365, 23 / 365])
    np.testing.assert_allclose(oc.forwards, [100.0, 101.0])
    np.testing.assert_allclose(oc.discfactors, [1.0, 1.0])
    s0, t0 = oc.strikes_ttms[0], oc.optiontypes_ttms[0]
    # OTM joint smile: puts strictly below the forward, calls at/above
    assert np.all((t0 == 'P') == (s0 < 100.0))
    assert np.all(np.diff(s0) > 0)
    # delta-bounds dropped the |delta| < 0.1 far wings (50 put, 160 call)
    assert 50.0 not in s0 and 160.0 not in s0
    # is_filtered dropped the NaN-bid 130 call
    assert 130.0 not in s0
    np.testing.assert_allclose(s0, [70.0, 90.0, 100.0, 110.0])
    # ivs are the OTM side's quotes
    k90 = int(np.searchsorted(s0, 90.0))
    assert t0[k90] == 'P'
    iv90 = 0.5 + 0.3 * abs(np.log(90.0 / 100.0))
    np.testing.assert_allclose(oc.bid_ivs[0][k90], iv90 - 0.02)
    np.testing.assert_allclose(oc.ask_ivs[0][k90], iv90 + 0.02)
    # the result is a fully functional calibration chain
    grid = oc.to_grid()
    assert grid.mask.sum() == sum(len(s) for s in oc.strikes_ttms)


def test_generate_vol_chain_np_overlapping_horizons():
    """horizons that resolve past the last expiry collapse onto it (reference
    comment fetch_option_chain.py:48), deduplicated to one slice."""
    from stochvolmodels_tpu.data.fetch_option_chain import generate_vol_chain_np

    value_time = pd.Timestamp('2021-11-01 08:00:00+00:00')
    chain = _synthetic_chain(value_time)
    oc = generate_vol_chain_np(chain, value_time,
                               days_map={'1m': 21, '3m': 90, '6m': 180})
    assert list(oc.ids) == ['1m: 23NOV']


def test_make_joint_slice_df_no_delta_filter():
    from stochvolmodels_tpu.data.fetch_option_chain import make_joint_slice_df

    sl = _synthetic_expiry_slice('X', 0.1, 100.0)
    df = make_joint_slice_df(sl.df, forward=100.0, delta_bounds=None,
                             is_filtered=False)
    # no filtering: every strike once, OTM side selected
    assert len(df) == 7
    assert df.loc[100.0, 'optiontype'] == 'C'
    assert df.loc[90.0, 'optiontype'] == 'P'


def test_load_option_chain_through_mocked_oca(monkeypatch):
    """full OptionsDataDFs -> OptionChain adapter path through an injected
    fake ``option_chain_analytics`` module (reference wiring:
    fetch_option_chain.py:77-101).  The OCA guard gates only the lazy
    constructor import; the construction logic is the tested
    dependency-free pipeline."""
    import sys
    import types

    from stochvolmodels_tpu.data import fetch_option_chain as fc

    value_time = pd.Timestamp('2021-11-01 08:00:00+00:00')
    calls = {}

    def fake_create_chain(options_data_dfs, value_time):
        calls['args'] = (options_data_dfs, value_time)
        return _synthetic_chain(value_time)

    fake = types.ModuleType('option_chain_analytics')
    fake.create_chain_from_from_options_dfs = fake_create_chain
    fake.OptionsDataDFs = object
    monkeypatch.setitem(sys.modules, 'option_chain_analytics', fake)

    sentinel_dfs = object()
    oc = fc.load_option_chain(options_data_dfs=sentinel_dfs,
                              value_time=value_time,
                              days_map={'1w': 7, '1m': 21})
    # the adapter forwarded the OCA inputs verbatim ...
    assert calls['args'] == (sentinel_dfs, value_time)
    # ... and the frames flowed through the real construction pipeline
    assert list(oc.ids) == ['1w: 09NOV', '1m: 23NOV']
    np.testing.assert_allclose(oc.forwards, [100.0, 101.0])
    np.testing.assert_allclose(oc.strikes_ttms[0], [70.0, 90.0, 100.0, 110.0])

    # returning None from OCA propagates (reference :97-101 returns None)
    fake.create_chain_from_from_options_dfs = \
        lambda options_data_dfs, value_time: None
    assert fc.load_option_chain(options_data_dfs=sentinel_dfs,
                                value_time=value_time) is None


def test_load_option_chain_guard_without_oca():
    """without the optional dependency the adapter raises the documented
    ImportError — and only the import is gated, not the module load."""
    import pytest

    from stochvolmodels_tpu.data import fetch_option_chain as fc

    if fc.HAS_OCA:  # pragma: no cover - environment has the optional dep
        pytest.skip("option_chain_analytics installed")
    with pytest.raises(ImportError, match="option-chain-analytics"):
        fc.load_option_chain(options_data_dfs=object())
