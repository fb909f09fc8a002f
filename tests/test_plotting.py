"""
Visualization layer: figures render headlessly with the expected structure.
"""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.heston import BTC_HESTON_PARAMS, HestonPricer
from stochvolmodels_tpu.plotting import plots


@pytest.fixture(scope="module")
def chain():
    return get_btc_test_chain_data()


def test_vol_slice_fit_renders():
    strikes = np.linspace(90.0, 110.0, 5)
    fig = plots.vol_slice_fit(
        bid_vol=pd.Series(np.full(5, 0.19), index=strikes),
        ask_vol=pd.Series(np.full(5, 0.21), index=strikes),
        model_vols=pd.Series(np.full(5, 0.2), index=strikes, name='model'),
        title='test', atm_points={'ATM': (100.0, 0.2)})
    assert fig is not None
    assert len(fig.axes) == 1
    plt.close(fig)


def test_model_vols_ts_renders():
    strikes = np.linspace(90.0, 110.0, 5)
    df = pd.DataFrame({'1m': np.full(5, 0.2), '3m': np.full(5, 0.22)}, index=strikes)
    fig = plots.model_vols_ts(model_vols=df, title='vols')
    assert fig is not None
    plt.close(fig)


def test_param_ts_and_risk_var_render():
    ts = pd.DataFrame({'sigma0': [0.8, 0.9], 'theta': [1.0, 1.1]}, index=[0, 1])
    fig = plots.model_param_ts(param_ts=ts, title='params')
    plt.close(fig)
    x = np.linspace(-1, 1, 50)
    fig2 = plots.plot_model_risk_var(pd.Series(np.exp(-x * x), index=x))
    plt.close(fig2)


def test_pricer_plot_ivols_vs_bid_ask(chain):
    pricer = HestonPricer()
    fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=chain,
                                             params=BTC_HESTON_PARAMS)
    assert fig is not None
    assert len(fig.axes) == 4  # 2x2 layout for 4 slices
    # each panel has a model line and bid/ask scatter
    for ax in fig.axes:
        assert len(ax.lines) >= 1
        assert len(ax.collections) >= 2
    plt.close(fig)


def test_pricer_plot_model_ivols(chain):
    pricer = HestonPricer()
    fig = pricer.plot_model_ivols(option_chain=chain, params=BTC_HESTON_PARAMS)
    assert fig is not None
    plt.close(fig)


def test_pricer_plot_slices_in_params(chain):
    from stochvolmodels_tpu.models.heston import HestonParams
    pricer = HestonPricer()
    option_slice = chain.get_slice(chain.ids[1])
    fig = pricer.plot_model_slices_in_params(
        option_slice=option_slice,
        params_dict={'base': BTC_HESTON_PARAMS,
                     'high kappa': HestonParams(v0=0.8, theta=1.0, kappa=8.0,
                                                rho=0.0, volvol=2.0)})
    assert fig is not None
    plt.close(fig)


def test_pricer_plot_ivols_vs_mc(chain):
    pricer = HestonPricer()
    fig = pricer.plot_model_ivols_vs_mc(option_chain=chain,
                                        params=BTC_HESTON_PARAMS, nb_path=20000)
    assert fig is not None
    assert len(fig.axes) == 4
    plt.close(fig)


def test_fig_export(tmp_path):
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    path = plots.save_fig(fig, 'test_fig', local_path=str(tmp_path))
    assert (tmp_path / 'test_fig.PNG').exists()
    path2 = plots.fig_to_pdf(fig, 'test_fig', local_path=str(tmp_path))
    assert (tmp_path / 'test_fig.pdf').exists()
    plt.close(fig)
