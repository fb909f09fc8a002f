"""
Terminal-distribution models: GMM and Student-t per-slice calibration
(counterparts of the reference's gmm_pricer / tdist_pricer local tests).
"""
import matplotlib.pyplot as plt
import numpy as np

import stochvolmodels_tpu as svm
from stochvolmodels_tpu.plotting import plots

if __name__ == '__main__':
    chain = svm.get_btc_test_chain_data()

    gmm = svm.GmmPricer()
    fits = gmm.calibrate_model_params_to_chain(option_chain=chain, n_mixtures=3)
    fig, axs = plt.subplots(2, 2, figsize=(14, 12), tight_layout=True)
    axs = plots.to_flat_list(axs)
    for idx, (key, params) in enumerate(fits.items()):
        print(f"{key}: weights={np.round(params.gmm_weights, 3)}, "
              f"mus={np.round(params.gmm_mus, 3)}, "
              f"vols={np.round(params.gmm_vols, 3)}")
        chain0 = svm.OptionChain.get_slices_as_chain(chain, ids=[key])
        gmm.plot_model_ivols_vs_bid_ask(option_chain=chain0, params=params,
                                        axs=[axs[idx]])

    spy = svm.get_spy_test_chain_data()
    td = svm.TdistPricer()
    tfits = td.calibrate_model_params_to_chain(option_chain=spy)
    for key, params in tfits.items():
        print(f"{key}: vol={params.vol:0.4f}, nu={params.nu:0.2f}, "
              f"drift={params.drift:0.5f}")
    plt.show()
