"""
Compatibility shim: the reference's ``stochvolmodels`` import surface backed
by the TPU-native implementation in ``stochvolmodels_tpu``.

The reference's paper-reproduction scripts and examples import from
``stochvolmodels`` (see /root/reference/stochvolmodels/__init__.py); this
module re-exports every public name so they run unmodified against the new
backend.  Submodule aliases (``stochvolmodels.pricers...`` etc.) are
registered in ``sys.modules`` so deep imports also resolve.
"""
import sys as _sys

__version__ = "1.2.2+tpu"

from stochvolmodels_tpu.config import OptionType, VariableType  # noqa: F401

from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff  # noqa: F401

from stochvolmodels_tpu.ops.mgf import (  # noqa: F401
    get_phi_grid,
    get_psi_grid,
    get_theta_grid,
    get_transform_var_grid,
    compute_integration_weights,
    vanilla_slice_pricer_with_mgf_grid,
    digital_slice_pricer_with_mgf_grid,
    slice_pricer_with_mgf_grid_with_gamma,
    slice_qvar_pricer_with_a_grid,
    pdf_with_mgf_grid,
)

from stochvolmodels_tpu.utils.funcs import (  # noqa: F401
    set_seed,
    compute_histogram_data,
    timer,
    to_flat_np_array,
    update_kwargs,
    find_nearest,
)
from stochvolmodels_tpu.ops.gauss import ncdf, npdf  # noqa: F401

from stochvolmodels_tpu.ops.bsm import (  # noqa: F401
    compute_bsm_vanilla_price,
    compute_bsm_vanilla_slice_deltas,
    compute_bsm_vanilla_slice_prices,
    compute_bsm_forward_grid_prices,
    compute_bsm_vanilla_delta,
    compute_bsm_vanilla_grid_deltas,
    compute_bsm_strike_from_delta,
    compute_bsm_vanilla_deltas_ttms,
    compute_bsm_slice_vegas,
    compute_bsm_vegas_ttms,
    infer_bsm_implied_vol,
    infer_bsm_ivols_from_model_chain_prices,
    infer_bsm_ivols_from_model_slice_prices,
    infer_bsm_ivols_from_slice_prices,
)

from stochvolmodels_tpu.ops.bachelier import (  # noqa: F401
    compute_normal_delta,
    compute_normal_delta_from_lognormal_vol,
    compute_normal_delta_to_strike,
    compute_normal_deltas_ttms,
    compute_normal_price,
    compute_normal_slice_deltas,
    compute_normal_slice_prices,
    compute_normal_slice_vegas,
    compute_normal_vegas_ttms,
    infer_normal_implied_vol,
    infer_normal_ivols_from_chain_prices,
    infer_normal_ivols_from_model_slice_prices,
    infer_normal_ivols_from_slice_prices,
)

from stochvolmodels_tpu.ops.tdist import (  # noqa: F401
    pdf_tdist,
    cdf_tdist,
    cum_mean_tdist,
    imply_drift_tdist,
    compute_default_prob_tdist,
    compute_forward_tdist,
    compute_vanilla_price_tdist,
    infer_implied_vol_tdist,
    infer_tdist_implied_vols_from_model_slice_prices,
)

from stochvolmodels_tpu.models.logsv.affine import (  # noqa: F401
    ExpansionOrder,
    compute_logsv_a_mgf_grid,
    func_a_ode_quadratic_terms,
    func_rhs,
    func_rhs_jac,
    get_expansion_n,
    get_init_conditions_a,
    solve_a_ode_grid,
    solve_analytic_ode_for_a,
    solve_analytic_ode_for_a0,
    solve_analytic_ode_grid_phi,
    solve_ode_for_a,
)

from stochvolmodels_tpu.models.hawkes_jd import HawkesJDParams, HawkesJDPricer  # noqa: F401
from stochvolmodels_tpu.models.heston import (  # noqa: F401
    BTC_HESTON_PARAMS,
    HestonParams,
    HestonPricer,
)
from stochvolmodels_tpu.models.logsv import (  # noqa: F401
    LOGSV_BTC_PARAMS,
    CalibrationEngine,
    ConstraintsType,
    LogsvModelCalibrationType,
    LogSvParams,
    LogSVPricer,
)
from stochvolmodels_tpu.models.logsv.pricer import (  # noqa: F401
    get_randoms_for_chain_valuation,
    get_randoms_for_rough_vol_chain_valuation,
    logsv_mc_chain_pricer_fixed_randoms,
    rough_logsv_mc_chain_pricer_fixed_randoms,
)
from stochvolmodels_tpu.models.gmm import GmmParams, GmmPricer  # noqa: F401
from stochvolmodels_tpu.models.tdist import TdistParams, TdistPricer  # noqa: F401

from stochvolmodels_tpu.data.option_chain import OptionChain, OptionSlice  # noqa: F401
from stochvolmodels_tpu.data.sample_chains import (  # noqa: F401
    get_btc_test_chain_data,
    get_gld_test_chain_data,
    get_gld_test_chain_data_6m,
    get_qv_options_test_chain_data,
    get_spy_test_chain_data,
    get_sqqq_test_chain_data,
    get_vix_test_chain_data,
)

from stochvolmodels_tpu.plotting.plots import (  # noqa: F401
    align_x_limits_axs,
    align_y_limits_axs,
    create_dummy_line,
    fig_list_to_pdf,
    fig_to_pdf,
    set_legend_colors,
    get_n_sns_colors,
    map_deltas_to_str,
    model_param_ts,
    model_vols_ts,
    plot_model_risk_var,
    save_fig,
    save_figs,
    set_fig_props,
    set_subplot_border,
    set_y_limits,
    vol_slice_fit,
)

from stochvolmodels_tpu.models.logsv.vol_moments import compute_analytic_qvar  # noqa: F401

# -- submodule aliases for deep imports -------------------------------------
import stochvolmodels_tpu.config as _config
import stochvolmodels_tpu.data.option_chain as _option_chain
import stochvolmodels_tpu.data.sample_chains as _sample_chains
import stochvolmodels_tpu.models.factor_hjm as _factor_hjm
import stochvolmodels_tpu.models.gmm as _gmm
import stochvolmodels_tpu.models.hawkes_jd as _hawkes
import stochvolmodels_tpu.models.heston as _heston
import stochvolmodels_tpu.models.logsv.affine as _affine
import stochvolmodels_tpu.models.logsv.params as _logsv_params
import stochvolmodels_tpu.models.logsv.pricer as _logsv_pricer
import stochvolmodels_tpu.models.logsv.vol_moments as _vol_moments
import stochvolmodels_tpu.models.model_pricer as _model_pricer
import stochvolmodels_tpu.models.rough.kernel as _rough_kernel
import stochvolmodels_tpu.models.rough.simulation as _rough_sim
import stochvolmodels_tpu.models.tdist as _tdist_pricer
import stochvolmodels_tpu.ops.bachelier as _bachelier
import stochvolmodels_tpu.ops.bsm as _bsm
import stochvolmodels_tpu.ops.mgf as _mgf
import stochvolmodels_tpu.ops.payoffs as _payoffs
import stochvolmodels_tpu.ops.tdist as _tdist
import stochvolmodels_tpu.plotting.plots as _plots
import stochvolmodels_tpu.utils.funcs as _funcs
import stochvolmodels_tpu.utils.rate_core as _rate_core
import stochvolmodels_tpu.utils.var_swap as _var_swap

_ALIASES = {
    'stochvolmodels.utils': None,
    'stochvolmodels.utils.config': _config,
    'stochvolmodels.utils.funcs': _funcs,
    'stochvolmodels.utils.mgf_pricer': _mgf,
    'stochvolmodels.utils.mc_payoffs': _payoffs,
    'stochvolmodels.utils.var_swap_pricer': _var_swap,
    'stochvolmodels.utils.rate_core': _rate_core,
    'stochvolmodels.utils.plots': _plots,
    'stochvolmodels.pricers': None,
    'stochvolmodels.pricers.model_pricer': _model_pricer,
    'stochvolmodels.pricers.analytic': None,
    'stochvolmodels.pricers.analytic.bsm': _bsm,
    'stochvolmodels.pricers.analytic.bachelier': _bachelier,
    'stochvolmodels.pricers.analytic.tdist': _tdist,
    'stochvolmodels.pricers.logsv': None,
    'stochvolmodels.pricers.logsv.logsv_params': _logsv_params,
    'stochvolmodels.pricers.logsv.affine_expansion': _affine,
    'stochvolmodels.pricers.logsv.vol_moments_ode': _vol_moments,
    'stochvolmodels.pricers.logsv_pricer': _logsv_pricer,
    'stochvolmodels.pricers.heston_pricer': _heston,
    'stochvolmodels.pricers.hawkes_jd_pricer': _hawkes,
    'stochvolmodels.pricers.gmm_pricer': _gmm,
    'stochvolmodels.pricers.tdist_pricer': _tdist_pricer,
    'stochvolmodels.pricers.rough_logsv': None,
    'stochvolmodels.pricers.rough_logsv.RoughKernel': _rough_kernel,
    'stochvolmodels.pricers.rough_logsv.split_simulation': _rough_sim,
    'stochvolmodels.pricers.factor_hjm': _factor_hjm,
    'stochvolmodels.data': None,
    'stochvolmodels.data.option_chain': _option_chain,
    'stochvolmodels.data.sample_option_chains': _sample_chains,
}

import types as _types

for _name, _mod in _ALIASES.items():
    if _mod is None:
        _mod = _types.ModuleType(_name)
    _sys.modules[_name] = _mod

# factor-hjm deep submodules
import stochvolmodels_tpu.models.factor_hjm.double_exp_pricer as _de
import stochvolmodels_tpu.models.factor_hjm.factor_hjm_pricer as _fh
import stochvolmodels_tpu.models.factor_hjm.rate_affine_expansion as _rae
import stochvolmodels_tpu.models.factor_hjm.rate_evaluate as _re_
import stochvolmodels_tpu.models.factor_hjm.rate_factor_basis as _rfb
import stochvolmodels_tpu.models.factor_hjm.rate_logsv_ivols as _rli
import stochvolmodels_tpu.models.factor_hjm.rate_logsv_params as _rlp
import stochvolmodels_tpu.models.factor_hjm.rate_logsv_pricer as _rlpr

for _name, _mod in {
    'stochvolmodels.pricers.factor_hjm.double_exp_pricer': _de,
    'stochvolmodels.pricers.factor_hjm.factor_hjm_pricer': _fh,
    'stochvolmodels.pricers.factor_hjm.rate_affine_expansion': _rae,
    'stochvolmodels.pricers.factor_hjm.rate_evaluate': _re_,
    'stochvolmodels.pricers.factor_hjm.rate_factor_basis': _rfb,
    'stochvolmodels.pricers.factor_hjm.rate_logsv_ivols': _rli,
    'stochvolmodels.pricers.factor_hjm.rate_logsv_params': _rlp,
    'stochvolmodels.pricers.factor_hjm.rate_logsv_pricer': _rlpr,
}.items():
    _sys.modules[_name] = _mod

# Mirror what a real package import does: set every aliased submodule as an
# attribute of its parent, so `import stochvolmodels; stochvolmodels.data...`
# works without a prior deep import (reference parity: the reference package
# imports its submodules at __init__, which binds them as attributes).
for _name in [n for n in _sys.modules if n.startswith('stochvolmodels.')]:
    _parent_name, _, _child = _name.rpartition('.')
    _parent = _sys.modules.get(_parent_name)
    if _parent is not None and not hasattr(_parent, _child):
        setattr(_parent, _child, _sys.modules[_name])
