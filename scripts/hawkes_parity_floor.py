"""
Hawkes parity-floor study (VERDICT r02 weak item 5).

Question: is the ~3e-5 chain-price gap between our batched RK4 Riccati and
the reference's per-point scipy solve_ivp our discretization error or the
reference's own integration tolerance?

Experiment: (a) our prices at year_steps 720/1440/2880 (self-convergence),
(b) reference prices at solve_ivp defaults (rtol=1e-3) and tightened
(rtol=1e-10, atol=1e-12, injected by rebinding the module's solve_ivp name).

Run (CPU): python scripts/hawkes_parity_floor.py
"""
import functools
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
import stochvolmodels_tpu  # noqa: F401
import jax
jax.config.update("jax_platforms", "cpu")
from reference_oracle import load_reference  # noqa: E402

ref = load_reference()
from _ref_stochvolmodels.pricers import hawkes_jd_pricer as ref_hawkes  # noqa: E402

from stochvolmodels_tpu.data.option_chain import OptionChain  # noqa: E402
from stochvolmodels_tpu.models.hawkes_jd import (  # noqa: E402
    HawkesJDParams, HawkesJDPricer)

STRIKES = np.array([0.8, 0.9, 1.0, 1.1, 1.2])
TYPES = np.array(['P', 'P', 'C', 'C', 'C'])
TTM = 0.25

params_r = ref_hawkes.HawkesJDParams()


def ref_prices(rtol=None, atol=None):
    orig = ref_hawkes.solve_ivp
    if rtol is not None:
        ref_hawkes.solve_ivp = functools.partial(orig, rtol=rtol, atol=atol)
    try:
        return np.asarray(ref_hawkes.hawkesjd_chain_pricer(
            model_params=params_r, ttms=np.array([TTM]),
            forwards=np.array([1.0]), discfactors=np.array([1.0]),
            strikes_ttms=(STRIKES,), optiontypes_ttms=(TYPES,))[0])
    finally:
        ref_hawkes.solve_ivp = orig


chain = OptionChain(ttms=np.array([TTM]), forwards=np.array([1.0]),
                    discfactors=np.array([1.0]), strikes_ttms=[STRIKES],
                    optiontypes_ttms=[TYPES])
pricer = HawkesJDPricer()
ours = {}
for ys in (720, 1440, 2880):
    ours[ys] = np.asarray(pricer.price_chain(option_chain=chain,
                                             params=HawkesJDParams(),
                                             year_steps=ys)[0])
print(f"ours self-convergence: max|P(1440)-P(720)|  = "
      f"{np.max(np.abs(ours[1440]-ours[720])):.3e}")
print(f"                       max|P(2880)-P(1440)| = "
      f"{np.max(np.abs(ours[2880]-ours[1440])):.3e}")

r_def = ref_prices()
r_tight = ref_prices(rtol=1e-10, atol=1e-12)
print(f"reference tolerance:   max|ref_tight-ref_default| = "
      f"{np.max(np.abs(r_tight-r_def)):.3e}")
print(f"parity vs ref default: max|ours(1440)-ref_def|   = "
      f"{np.max(np.abs(ours[1440]-r_def)):.3e}")
print(f"parity vs ref tight:   max|ours(1440)-ref_tight| = "
      f"{np.max(np.abs(ours[1440]-r_tight)):.3e}")
