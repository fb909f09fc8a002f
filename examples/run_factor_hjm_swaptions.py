"""
Factor HJM swaption pricing demo: DE-quadrature normal smiles vs Monte Carlo
under the Nelson-Siegel multi-factor model.
"""
import numpy as np

import stochvolmodels_tpu as svm
from stochvolmodels_tpu.models.factor_hjm import logsv_chain_de_pricer
from stochvolmodels_tpu.models.factor_hjm.factor_hjm_pricer import calc_mc_vols
from stochvolmodels_tpu.utils.rate_core import (
    generate_ttms_grid,
    get_default_swap_term_structure,
)

if __name__ == '__main__':
    key_terms = np.array([1.0, 5.0, 10.0])
    basis = svm.NelsonSiegel(meanrev=0.25, key_terms=key_terms)
    ts = np.array([0.0, 1.0, 2.0, 5.0])
    params = svm.MultiFactRateLogSvParams(
        sigma0=1.0, theta=1.0, kappa1=2.0, kappa2=2.0,
        beta=svm.TermStructure.create_multi_fact_from_vec(
            ts, np.array([0.15, -0.075, 0.0])),
        volvol=svm.TermStructure.create_from_scalar(ts, 0.6),
        A=np.array([0.01, 0.01, 0.01]), R=np.eye(3), basis=basis, ccy="USD")

    expiry, tenor = 1.0, 1.0
    ts_sw = get_default_swap_term_structure(expiry, tenor)
    f0 = float(np.asarray(basis.swap_rate(0.0, ts_sw, np.zeros(3), np.zeros(8),
                                          ccy="USD")[0]).ravel()[0])
    strikes = f0 + np.linspace(-0.01, 0.01, 5)
    t_grid = generate_ttms_grid(np.array([expiry]), nb_pts=21)

    _, ivols = logsv_chain_de_pricer(
        params=params, t_grid=t_grid, ttms=np.array([expiry]),
        forwards=[np.array([f0])] * 3, strikes_ttms=[[strikes]] * 3,
        optiontypes_ttms=[np.repeat('C', 5)])
    for i, t in enumerate(key_terms):
        print(f"tenor {t:4.0f}y analytic normal vols (bp): "
              f"{np.round(np.asarray(ivols[i][0]).ravel() * 1e4, 1)}")

    _, mc_vols, _, _ = calc_mc_vols(
        basis_type="NELSON-SIEGEL", params=params, ttm=expiry,
        tenors=key_terms[:1], forwards=[np.array([f0])],
        strikes_ttms=[[strikes]], optiontypes=np.repeat('C', 5),
        is_annuity_measure=False, nb_path=50000, seed=42)
    print(f"tenor    1y MC vols (bp):              "
          f"{np.round(np.asarray(mc_vols[0]) * 1e4, 1)}")

    # --- whole-cube pricing in ONE device program + joint LM calibration ---
    import jax.numpy as jnp
    from stochvolmodels_tpu.models.factor_hjm import (
        calibrate_rate_logsv_cube_lm_on_device,
        make_swaption_cube_fn,
    )

    slices = [(e, t) for e in (1.0, 2.0) for t in (1.0, 5.0)]
    cube_fn, mask = make_swaption_cube_fn(
        params, slices, [f0] * 4, [strikes] * 4, year_steps=180)
    cube_px = np.asarray(cube_fn(jnp.asarray(params.sigma0),
                                 jnp.asarray(params.beta.xs),
                                 jnp.asarray(params.volvol.xs)))
    print(f"cube prices, {len(slices)} slices in one program:\n"
          f"{np.round(cube_px * 1e4, 2)}")

    market_ivols = [np.asarray(svm.infer_normal_implied_vol(
        forward=f0, ttm=e, strike=strikes, given_price=cube_px[p, :5]))
        for p, (e, _) in enumerate(slices)]
    start = svm.MultiFactRateLogSvParams(
        sigma0=1.0, theta=1.0, kappa1=2.0, kappa2=2.0,
        beta=svm.TermStructure.create_multi_fact_from_vec(
            ts, np.array([0.0, 0.0, 0.0])),
        volvol=svm.TermStructure.create_from_scalar(ts, 0.2),
        A=np.array([0.01, 0.01, 0.01]), R=np.eye(3), basis=basis, ccy="USD")
    fit, cost = calibrate_rate_logsv_cube_lm_on_device(
        start, slices, [f0] * 4, [strikes] * 4, market_ivols,
        nb_iters=20, year_steps=180)
    print(f"joint cube LM from flat start: cost={cost:.2e} "
          f"(beta seg0 -> {np.round(fit.beta.xs[0], 3)})")
