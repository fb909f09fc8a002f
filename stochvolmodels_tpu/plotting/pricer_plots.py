"""
Plotting entry points called by ModelPricer (placeholder until the
visualization layer lands; reference: stochvolmodels/utils/plots.py and
model_pricer.py:244-596).
"""
from __future__ import annotations


def _todo(name):
    raise NotImplementedError(f"plotting.{name} lands with the visualization layer")


def plot_model_ivols(pricer, option_chain, params, **kwargs):
    _todo("plot_model_ivols")


def plot_model_ivols_vs_bid_ask(pricer, option_chain, params, **kwargs):
    _todo("plot_model_ivols_vs_bid_ask")


def plot_model_ivols_vs_mc(pricer, option_chain, params, **kwargs):
    _todo("plot_model_ivols_vs_mc")


def plot_comp_mma_inverse_options_with_mc(pricer, option_chain, params, **kwargs):
    _todo("plot_comp_mma_inverse_options_with_mc")


def plot_model_risk_var(pricer, option_chain, params, **kwargs):
    _todo("plot_model_risk_var")
