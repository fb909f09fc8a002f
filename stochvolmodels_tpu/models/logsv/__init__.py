from stochvolmodels_tpu.models.logsv.affine import (  # noqa: F401
    ExpansionOrder,
    compute_logsv_a_mgf_grid,
    func_a_ode_quadratic_terms,
    get_expansion_n,
    get_init_conditions_a,
    solve_a_ode_grid,
)
from stochvolmodels_tpu.models.logsv.params import LogSvParams  # noqa: F401
from stochvolmodels_tpu.models.logsv.pricer import (  # noqa: F401
    LOGSV_BTC_PARAMS,
    CalibrationEngine,
    ConstraintsType,
    LogsvModelCalibrationType,
    LogSVPricer,
    logsv_chain_pricer,
    logsv_mc_chain_pricer,
    logsv_pdfs,
    simulate_logsv_terminal,
    simulate_vol_paths,
    v0_implied,
)
from stochvolmodels_tpu.models.logsv.vol_moments import (  # noqa: F401
    compute_analytic_qvar,
    compute_analytic_vol_moments,
    compute_expected_vol_t,
    compute_sqrt_qvar_t,
    compute_vol_moments_t,
    fit_model_vol_backbone_to_varswaps,
)
