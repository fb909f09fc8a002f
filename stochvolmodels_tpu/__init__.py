"""
stochvolmodels_tpu: a TPU-native (JAX/XLA/Pallas) stochastic-volatility
pricing framework with the capabilities of ArturSepp/StochVolModels.

Flat API surface mirroring /root/reference/stochvolmodels/__init__.py; names
are added as the corresponding subsystems land.
"""
# config must import first: it enables float64
from stochvolmodels_tpu.config import VariableType, OptionType  # noqa: F401

from stochvolmodels_tpu.utils.funcs import (  # noqa: F401
    compute_histogram_data,
    find_nearest,
    set_time_grid,
    timer,
    to_flat_np_array,
    update_kwargs,
)

from stochvolmodels_tpu.ops.gauss import erfcc, ncdf, npdf  # noqa: F401

from stochvolmodels_tpu.ops.bsm import (  # noqa: F401
    compute_bsm_vanilla_price,
    compute_bsm_vanilla_price_vector,
    compute_bsm_vanilla_slice_prices,
    compute_bsm_forward_grid_prices,
    compute_bsm_vanilla_delta,
    compute_bsm_vanilla_delta_vector,
    compute_bsm_vanilla_slice_deltas,
    compute_bsm_vanilla_grid_deltas,
    compute_bsm_strike_from_delta,
    compute_bsm_vanilla_vega,
    compute_bsm_vanilla_slice_vegas,
    compute_bsm_slice_vegas,
    compute_bsm_vanilla_gamma,
    compute_bsm_vanilla_theta,
    compute_bsm_digital_price,
    compute_bsm_digital_delta,
    infer_bsm_implied_vol,
    infer_bsm_ivols_from_model_slice_prices,
    infer_bsm_ivols_from_slice_prices,
    infer_bsm_ivols_from_model_chain_prices,
)

from stochvolmodels_tpu.ops.bachelier import (  # noqa: F401
    compute_normal_price,
    compute_normal_slice_prices,
    compute_normal_delta,
    compute_normal_slice_deltas,
    compute_normal_slice_vegas,
    compute_normal_vegas_ttms,
    compute_normal_delta_to_strike,
    compute_normal_delta_from_lognormal_vol,
    infer_normal_implied_vol,
    infer_normal_implied_vol_fast,
    infer_normal_ivols_from_model_slice_prices,
    infer_normal_ivols_from_slice_prices,
    infer_normal_ivols_from_chain_prices,
    strikes_to_delta,
)

from stochvolmodels_tpu.ops.mgf import (  # noqa: F401
    get_phi_grid,
    get_psi_grid,
    get_theta_grid,
    get_transform_var_grid,
    compute_integration_weights,
    vanilla_slice_pricer_with_mgf_grid,
    digital_slice_pricer_with_mgf_grid,
    slice_qvar_pricer_with_a_grid,
    pdf_with_mgf_grid,
)

from stochvolmodels_tpu.ops.payoffs import compute_mc_vars_payoff  # noqa: F401
from stochvolmodels_tpu.utils.var_swap import compute_var_swap_strike  # noqa: F401

from stochvolmodels_tpu.data.option_chain import (  # noqa: F401
    ChainGrid,
    FutOptionChain,
    OptionChain,
    OptionSlice,
    SwOptionChain,
)
from stochvolmodels_tpu.models.factor_hjm import (  # noqa: F401
    Cheyette1D,
    CheyettePEND,
    FutSettleType,
    Measure,
    MultiFactRateLogSvParams,
    NelsonSiegel,
    RateFutLogSVPricer,
    RateLogSVPricer,
    RateLogSvParams,
    TermStructure,
    UnderlyingType,
)
from stochvolmodels_tpu.data.sample_chains import (  # noqa: F401
    get_btc_test_chain_data,
    get_gld_test_chain_data,
    get_gld_test_chain_data_6m,
    get_qv_options_test_chain_data,
    get_spy_test_chain_data,
    get_sqqq_test_chain_data,
    get_vix_test_chain_data,
)

from stochvolmodels_tpu.models.model_pricer import ModelParams, ModelPricer  # noqa: F401
from stochvolmodels_tpu.models.gmm import GmmParams, GmmPricer  # noqa: F401
from stochvolmodels_tpu.models.hawkes_jd import HawkesJDParams, HawkesJDPricer  # noqa: F401
from stochvolmodels_tpu.models.tdist import TdistParams, TdistPricer  # noqa: F401
from stochvolmodels_tpu.ops.tdist import (  # noqa: F401
    compute_default_prob_tdist,
    compute_forward_tdist,
    compute_upsilon,
    compute_vanilla_price_tdist,
    cdf_tdist,
    cum_mean_tdist,
    imply_drift_tdist,
    infer_implied_vol_tdist,
    infer_tdist_implied_vols_from_model_slice_prices,
    pdf_tdist,
)
from stochvolmodels_tpu.models.logsv import (  # noqa: F401
    LOGSV_BTC_PARAMS,
    CalibrationEngine,
    ConstraintsType,
    ExpansionOrder,
    LogsvModelCalibrationType,
    LogSvParams,
    LogSVPricer,
    compute_analytic_qvar,
    compute_analytic_vol_moments,
    compute_expected_vol_t,
    compute_sqrt_qvar_t,
    compute_vol_moments_t,
    fit_model_vol_backbone_to_varswaps,
    logsv_chain_pricer,
    logsv_pdfs,
)
from stochvolmodels_tpu.models.heston import (  # noqa: F401
    BTC_HESTON_PARAMS,
    HestonParams,
    HestonPricer,
    compute_heston_mgf_grid,
    heston_chain_price_grid,
    heston_mc_chain_pricer,
    simulate_heston_terminal,
)
from stochvolmodels_tpu.models.greeks import (  # noqa: F401
    heston_chain_greeks,
    logsv_chain_greeks,
    logsv_mc_chain_greeks,
    swaption_cube_greeks,
)

__version__ = "0.1.0"
