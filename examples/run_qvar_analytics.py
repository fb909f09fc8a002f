"""
Quadratic-variance analytics: expected QVAR term structure and options on
QVAR under LogSV (counterpart of examples/run_qvar_analytics.py and
run_pricing_options_on_qvar.py).
"""
import numpy as np

import stochvolmodels_tpu as svm
from stochvolmodels_tpu.config import VariableType

if __name__ == '__main__':
    params = svm.LOGSV_BTC_PARAMS
    pricer = svm.LogSVPricer()

    # expected QVAR (variance swap fair value) term structure
    ttms = np.array([1 / 12, 0.25, 0.5, 1.0])
    qvars = [svm.compute_analytic_qvar(params=params, ttm=float(t)) for t in ttms]
    print("varswap strikes:", np.round(np.sqrt(qvars), 4))

    # options on QVAR through the Fourier engine on the Psi grid
    chain = svm.get_qv_options_test_chain_data()
    chain = svm.OptionChain.get_slices_as_chain(chain, ids=['1m', '6m'])
    forwards = np.array([svm.compute_analytic_qvar(params=params, ttm=float(t))
                         for t in chain.ttms])
    chain.forwards = forwards
    chain.strikes_ttms = [f * s for f, s in zip(forwards, chain.strikes_ttms)]
    prices = pricer.price_chain(option_chain=chain, params=params,
                                variable_type=VariableType.Q_VAR)
    for id_, p in zip(chain.ids, prices):
        print(f"QVAR options {id_}: {np.round(p, 5)}")
