"""Measure on-device LogSV calibration wall-clock + fit quality on TPU."""
import time
import numpy as np

from stochvolmodels_tpu.data.sample_chains import get_btc_test_chain_data
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.fast_calibration import (
    calibrate_logsv_lm_on_device,
    calibrate_logsv_on_device,
)
from stochvolmodels_tpu.models.logsv.pricer import LogSVPricer

chain = get_btc_test_chain_data()
params0 = LogSvParams(sigma0=0.8, theta=1.0, kappa1=2.21, kappa2=2.18,
                      beta=0.15, volvol=1.85)
pricer = LogSVPricer()
mids = chain.get_mid_vols()


def fit_err(fit):
    vols = pricer.compute_model_ivols_for_chain(option_chain=chain, params=fit)
    errs = np.concatenate([np.abs(np.asarray(v) - np.asarray(m))
                           for v, m in zip(vols, mids)])
    return float(np.nanmean(errs))


for nb_iters in (12, 16):
    t0 = time.time()
    fit, cost = calibrate_logsv_lm_on_device(chain, params0, nb_iters=nb_iters)
    t1 = time.time()
    fit2, cost2 = calibrate_logsv_lm_on_device(chain, params0, nb_iters=nb_iters)
    t2 = time.time()
    print(f"LM {nb_iters} it: cold {t1-t0:.1f}s, warm {t2-t1:.3f}s, "
          f"cost={cost2:.6f}, fit err={fit_err(fit2):.4f}")
    print(f"  fit: sigma0={fit2.sigma0:.4f}, theta={fit2.theta:.4f}, "
          f"kappa1={fit2.kappa1:.4f}, beta={fit2.beta:.4f}, volvol={fit2.volvol:.4f}")
