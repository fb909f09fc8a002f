"""
Performance harness: reprice the BTC chain over perturbed parameter sets,
recording wall-clock and RSS (counterpart of the reference's
tests/rough_logsv_perf.py:170-302; run directly, not a pytest).

Usage: python tests/perf_harness.py [--mode analytic|mc|rough] [--n 100]
"""
from __future__ import annotations

import argparse
import resource
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="analytic",
                        choices=["analytic", "mc", "rough"])
    parser.add_argument("--n", type=int, default=100)
    parser.add_argument("--nb_path", type=int, default=50000)
    parser.add_argument("--precision", default="exact", choices=["exact", "fast"])
    args = parser.parse_args()

    import jax
    import stochvolmodels_tpu as svm

    chain = svm.get_btc_test_chain_data()
    pricer = svm.LogSVPricer()
    base = svm.LOGSV_BTC_PARAMS
    rng = np.random.default_rng(7)
    checksum = 0.0
    times = []

    # warm-up compile (excluded from timings, like the reference's numba warm-up)
    def reprice(params):
        if args.mode == "analytic":
            return pricer.price_chain(option_chain=chain, params=params,
                                      precision=args.precision)
        if args.mode == "mc":
            return pricer.model_mc_price_chain(option_chain=chain, params=params,
                                               nb_path=args.nb_path,
                                               nb_steps=240, seed=10)[0]
        params.H = 0.1
        if params.nodes is None:
            params.approximate_kernel(T=float(np.max(chain.ttms)))
        return pricer.model_mc_price_chain(option_chain=chain, params=params,
                                           nb_path=args.nb_path, nb_steps=240,
                                           use_rough_mc=True, seed=10)[0]

    _ = reprice(base)

    for i in range(args.n):
        bump = 1.0 + 0.02 * rng.standard_normal(6)
        params = svm.LogSvParams(sigma0=base.sigma0 * bump[0],
                                 theta=base.theta * bump[1],
                                 kappa1=base.kappa1 * abs(bump[2]),
                                 kappa2=base.kappa2 * abs(bump[3]),
                                 beta=base.beta * bump[4],
                                 volvol=base.volvol * abs(bump[5]),
                                 H=0.1 if args.mode == "rough" else 0.5,
                                 nodes=base.nodes, weights=base.weights)
        t0 = time.perf_counter()
        prices = reprice(params)
        checksum += float(np.nansum([np.nansum(p) for p in prices]))
        times.append(time.perf_counter() - t0)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    times = np.array(times)
    print(f"mode={args.mode} n={args.n} backend={jax.devices()[0].platform}")
    print(f"wall per reprice: median={np.median(times)*1e3:.1f} ms, "
          f"p90={np.percentile(times, 90)*1e3:.1f} ms, "
          f"total={np.sum(times):.2f} s")
    print(f"max RSS: {rss_mb:.0f} MB, checksum={checksum:.4f}")


if __name__ == "__main__":
    main()
