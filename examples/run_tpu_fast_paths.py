"""
TPU-native fast paths: Pallas MC engines and f32 fused analytic pricing.

These are strictly additive to the reference API (no counterpart in
/root/reference): every default call keeps reference-parity f64 semantics,
and each fast path is an opt-in kwarg:

* ``price_chain(..., precision='fast')`` — f32 trace of the Fourier chain
  pricer (LogSV: 360-steps ODE grid; Heston: closed-form MGF), ~1e-4
  relative accuracy, ~30x faster warm on a TPU chip.
* ``compute_model_ivols_for_chain(..., precision='fast')`` — the reprice
  AND the BSM implied-vol inversion fused into ONE device program (one
  dispatch, one host fetch — the latency-optimal form on a remote chip).
* ``model_mc_price_chain(..., engine='pallas')`` — the Monte-Carlo path
  loop as an on-chip-PRNG Pallas kernel (LogSV / Heston / Hawkes JD /
  rough LogSV): ~9.5e9 path-steps/s on a v5e chip vs ~1e9 for the f64
  scan, so 1M-path chains price in the time the scan needs for 50k.

On CPU the Pallas engines run under the Mosaic interpreter (slow but
exact-structure); this demo uses small path counts so it runs anywhere.
NOTE: on a box where a remote TPU backend is primary, the first run
compiles ~10 device programs (can take minutes through a tunnel; warm
reruns are cached).  To force the CPU interpreter instead, run
``jax.config.update("jax_platforms", "cpu")`` before importing this module
(the pytest conftest does this for CI).
"""
import numpy as np

import stochvolmodels_tpu as svm


def main():

    chain = svm.get_btc_test_chain_data()
    NB_PATH = 8192    # small so the CPU interpreter path stays quick

    # --- LogSV: fast analytic reprice + fused implied vols ----------------------
    logsv_pricer = svm.LogSVPricer()
    params = svm.LOGSV_BTC_PARAMS
    fast_prices = logsv_pricer.price_chain(option_chain=chain, params=params,
                                           precision="fast")
    fast_ivols = logsv_pricer.compute_model_ivols_for_chain(
        option_chain=chain, params=params, precision="fast")
    print("LogSV fast slice-0 prices:", np.round(np.asarray(fast_prices[0])[:4], 4))
    print("LogSV fused slice-0 ivols:", np.round(np.asarray(fast_ivols[0])[:4], 4))

    # --- LogSV: model-consistent AD greeks ----------------------------------------
    greeks = logsv_pricer.compute_chain_greeks(
        option_chain=chain, params=params, greeks=("delta", "gamma", "vega"),
        year_steps=360)
    print("LogSV AD slice-0 deltas:", np.round(greeks["delta"][0][:4], 4))
    print("LogSV AD slice-0 vegas: ", np.round(greeks["vega"][0][:4], 4))

    # --- LogSV: Pallas MC engine -------------------------------------------------
    mc_prices, mc_stds = logsv_pricer.model_mc_price_chain(
        option_chain=chain, params=params, nb_path=NB_PATH, engine="pallas")
    print("LogSV pallas-MC slice-0 prices:", np.round(np.asarray(mc_prices[0])[:4], 1))

    # --- LogSV: antithetic variates on the scan MC engine -------------------------
    a_prices, a_stds = logsv_pricer.model_mc_price_chain(
        option_chain=chain, params=params, nb_path=NB_PATH, antithetic=True)
    _, p_stds = logsv_pricer.model_mc_price_chain(
        option_chain=chain, params=params, nb_path=NB_PATH)
    print("LogSV antithetic slice-0 stderr:",
          np.round(np.asarray(a_stds[0])[:4], 2),
          "vs plain:", np.round(np.asarray(p_stds[0])[:4], 2))

    # --- Heston: fast fused ivols + Pallas MC ------------------------------------
    heston_pricer = svm.HestonPricer()
    hparams = svm.HestonParams(v0=0.85 ** 2, theta=1.4 ** 2, kappa=4.0,
                               volvol=1.0, rho=0.2)
    h_ivols = heston_pricer.compute_model_ivols_for_chain(
        option_chain=chain, params=hparams, precision="fast")
    h_mc, _ = heston_pricer.model_mc_price_chain(
        option_chain=chain, params=hparams, nb_path=NB_PATH, engine="pallas")
    print("Heston fused slice-0 ivols:", np.round(np.asarray(h_ivols[0])[:4], 4))
    print("Heston pallas-MC slice-0 prices:", np.round(np.asarray(h_mc[0])[:4], 1))

    # --- rough LogSV: Pallas Strang-splitting engine ------------------------------
    rparams = svm.LogSvParams(sigma0=0.8376, theta=1.0413, kappa1=3.1844,
                              kappa2=3.058, beta=0.1514, volvol=1.8458, H=0.125)
    rparams.approximate_kernel(T=float(np.max(chain.ttms)))
    r_prices, _ = logsv_pricer.model_mc_price_chain(
        option_chain=chain, params=rparams, nb_path=NB_PATH,
        use_rough_mc=True, engine="pallas", nb_steps=120)
    print("rough pallas-MC slice-0 prices:", np.round(np.asarray(r_prices[0])[:4], 1))

    # --- path-sharded Pallas MC over the device mesh ------------------------------
    import jax

    from stochvolmodels_tpu.parallel.mesh import (
        make_path_mesh,
        simulate_logsv_terminal_pallas_sharded,
    )

    mesh = make_path_mesh()
    n = mesh.devices.size * 128 * 8
    x, sig, qvar = simulate_logsv_terminal_pallas_sharded(
        mesh, seed=7, nb_path=n, ttm=0.5, sigma0=params.sigma0,
        theta=params.theta, kappa1=params.kappa1, kappa2=params.kappa2,
        beta=params.beta, volvol=params.volvol, nb_steps_per_year=120)
    print(f"sharded pallas MC over {mesh.devices.size} device(s): "
          f"E[x]={float(jax.numpy.mean(x)):.4f}")


if __name__ == "__main__":
    main()
