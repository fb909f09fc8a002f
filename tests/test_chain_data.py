"""
Option-chain containers and bundled sample data.
"""
import numpy as np
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
