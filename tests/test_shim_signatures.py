"""
API-compatibility lock: every function exported by the compat shim keeps the
reference's parameter names and order, so reference-style positional calls
keep working.  Classes are compared on their public method names.
"""
import inspect
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_oracle import load_reference

import stochvolmodels as shim

ref = load_reference()

# names whose reference form is np.vectorize / dynamically built (no useful
# signature), or where we deliberately extend the surface
SKIP = {
    "compute_bsm_vanilla_price_vector",      # np.vectorize in the reference
    "compute_bsm_vanilla_delta_vector",
    "compute_bsm_vanilla_vega_vector",
    "compute_bsm_vanilla_gamma_vector",
    "compute_bsm_vanilla_theta_vector",
    "logsv_il_pricer_vector",
}


def _exported_functions():
    out = []
    for name in dir(shim):
        if name.startswith("_") or name in SKIP:
            continue
        ours = getattr(shim, name)
        theirs = getattr(ref, name, None)
        if theirs is None or not callable(ours) or not callable(theirs):
            continue
        if inspect.isclass(ours) or inspect.isclass(theirs):
            continue
        try:
            rs = inspect.signature(theirs)
            os_ = inspect.signature(ours)
        except (ValueError, TypeError):
            continue
        out.append((name, rs, os_))
    return out


def test_submodules_are_attributes():
    """reference parity: `import stochvolmodels` binds data/pricers/utils as
    package attributes (the reference imports its submodules at __init__,
    which binds them); a bare top-level import must be enough."""
    for top in ("data", "pricers", "utils"):
        assert hasattr(shim, top), f"stochvolmodels.{top} not an attribute"
    assert hasattr(shim.data, "option_chain")
    assert hasattr(shim.utils, "funcs")
    assert hasattr(shim.pricers, "factor_hjm")
    assert hasattr(shim.pricers.factor_hjm, "rate_logsv_pricer")


@pytest.mark.parametrize("name,ref_sig,our_sig",
                         _exported_functions(),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_signature_prefix_matches(name, ref_sig, our_sig):
    """our parameter list must start with the reference's names in the
    reference's order (we may append extra keyword-defaulted params)."""
    ref_params = [p for p in ref_sig.parameters
                  if ref_sig.parameters[p].kind
                  not in (inspect.Parameter.VAR_POSITIONAL,
                          inspect.Parameter.VAR_KEYWORD)]
    our_params = [p for p in our_sig.parameters
                  if our_sig.parameters[p].kind
                  not in (inspect.Parameter.VAR_POSITIONAL,
                          inspect.Parameter.VAR_KEYWORD)]
    assert our_params[:len(ref_params)] == ref_params, (
        f"{name}: ref {ref_params} vs ours {our_params}")
    # any extra params we add must have defaults
    for extra in our_params[len(ref_params):]:
        assert our_sig.parameters[extra].default is not inspect.Parameter.empty, (
            f"{name}: extra param {extra} has no default")
