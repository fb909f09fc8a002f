"""
Markovian lift of the fractional kernel: quadrature quality by node count
(counterpart of examples/run_rough_kernel_approx.py).
"""
import numpy as np

from stochvolmodels_tpu.models.rough.kernel import (
    european_rule,
    kernel_l2_relative_error,
    quadrature_rule,
)

if __name__ == '__main__':
    T = 0.5
    for H in (0.1, 0.2, 0.3, 0.45):
        print(f"H = {H}:")
        for n in (1, 2, 3):
            nodes, weights = european_rule(H, n, T)
            err = kernel_l2_relative_error(H, nodes, weights, T)
            print(f"  N={n}: nodes={np.round(nodes, 3)}, "
                  f"weights={np.round(weights, 3)}, rel L2 err={err:0.3f}")

    # research-rule comparison (RoughKernel.py alternatives)
    print("\nrule comparison at H=0.1, T=1, N=3 (rel L2 err):")
    for mode in ('european', 'ak', 'gaussian', 'abi-jaber'):
        nodes, weights = quadrature_rule(0.1, 3, 1.0, mode=mode)
        err = kernel_l2_relative_error(0.1, np.asarray(nodes),
                                       np.asarray(weights), 1.0)
        print(f"  {mode:10s}: {err:0.4f}")
