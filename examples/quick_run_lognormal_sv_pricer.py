"""
Quick start: price a vanilla and fit the BTC chain under the LogSV model
(counterpart of examples/quick_run_lognormal_sv_pricer.py in the reference).
"""
import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm

# 1. price a single vanilla option
params = svm.LogSvParams(sigma0=0.8, theta=1.0, kappa1=5.0, kappa2=5.0,
                         beta=0.15, volvol=2.0)
pricer = svm.LogSVPricer()
price, ivol = pricer.price_vanilla(params=params, ttm=0.25, forward=1.0,
                                   strike=1.0, optiontype='C')
print(f"price={float(price):0.4f}, implied vol={float(ivol):0.2%}")

# 2. price a slice
prices, ivols = pricer.price_slice(params=params, ttm=0.25, forward=1.0,
                                   strikes=np.array([0.8, 0.9, 1.0, 1.1]),
                                   optiontypes=np.array(['P', 'P', 'C', 'C']))
print("slice prices:", np.round(np.asarray(prices), 4))
print("slice ivols :", np.round(np.asarray(ivols), 4))

# 3. model fit to the bundled BTC chain with the calibrated params
chain = svm.get_btc_test_chain_data()
fig = pricer.plot_model_ivols_vs_bid_ask(option_chain=chain,
                                         params=svm.LOGSV_BTC_PARAMS)
plt.show()
