"""
Global configuration: dtype policy, variable types, option-type encoding.

TPU-first design notes
----------------------
* float64 is enabled globally (the pricing/transform layer needs ~1e-12
  internal accuracy to hit 1e-8 parity with the reference analytics,
  ``/root/reference/stochvolmodels/pricers/analytic/bsm.py:445-489``).
  Monte-Carlo hot kernels explicitly request float32.
* complex128 is NOT supported by XLA:TPU.  Everything complex in the
  transform engine uses a (real, imag) float64 pair representation,
  see ``stochvolmodels_tpu.utils.cplx``.
* Option types are strings ('C','P','IC','IP') at the API boundary
  (mirroring ``/root/reference/stochvolmodels/pricers/analytic/bsm.py:15-23``)
  and int8 codes inside jitted code.
"""
from __future__ import annotations

import os
from enum import Enum

import jax
import numpy as np

if not os.environ.get("SVMTPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TPU compiles go through a remote helper in
# this environment (~20-200s per program); cache them across processes.
# Forced-CPU runs (conftest, the multichip dryrun child) get their OWN local
# cache dir: sharing one dir with the remote compile service is unsafe (its
# CPU AOT artifacts carry that machine's feature set — loading them locally
# risks SIGILL), but a local-only dir is written and read by this host alone,
# and it cuts the dryrun's per-round XLA recompiles (the round-3 MULTICHIP
# timeout was almost pure repeated CPU compile on the 1-core box).
if not os.environ.get("SVMTPU_NO_COMPILE_CACHE"):
    # decide by the RESOLVED platform, not the env var alone: the image's
    # sitecustomize registers the axon backend via jax.config, which WINS
    # over a JAX_PLATFORMS=cpu env var — a session with the env var set
    # but the config not updated runs on the TPU and would write
    # remote-machine AOT artifacts into the local-only CPU dir (observed:
    # cross-machine-feature XLA:CPU artifacts loaded with a SIGILL-risk
    # warning AND silently-corrupt f32 numerics)
    _platforms = str(getattr(jax.config, "jax_platforms", None)
                     or os.environ.get("JAX_PLATFORMS", ""))
    if _platforms.startswith("cpu"):
        _cache_dir = os.environ.get("SVMTPU_CPU_COMPILE_CACHE_DIR",
                                    os.path.expanduser("~/.cache/svmtpu_jax_cpu"))
    else:
        _cache_dir = os.environ.get("SVMTPU_COMPILE_CACHE_DIR",
                                    os.path.expanduser("~/.cache/svmtpu_jax"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


class VariableType(Enum):
    """transform variable: log-return, quadratic variance, or instantaneous vol.

    Mirrors /root/reference/stochvolmodels/utils/config.py:8-14.
    """
    LOG_RETURN = 1
    Q_VAR = 2
    SIGMA = 3
    POINT_VALUE = 4


class OptionType(str, Enum):
    """'C'/'P' vanilla, 'IC'/'IP' inverse (payoff divided by terminal spot)."""
    CALL = 'C'
    PUT = 'P'
    INVERSE_CALL = 'IC'
    INVERSE_PUT = 'IP'


# int codes used inside jit: bit0 = is_call, bit1 = is_inverse
OPTION_CODES = {'P': 0, 'C': 1, 'IP': 2, 'IC': 3}
OPTION_CODES_INV = {v: k for k, v in OPTION_CODES.items()}


def encode_optiontypes(optiontypes: np.ndarray) -> np.ndarray:
    """map string option types to int8 codes for use inside jitted pricers."""
    return np.asarray([OPTION_CODES[str(t)] for t in np.asarray(optiontypes).ravel()],
                      dtype=np.int8).reshape(np.asarray(optiontypes).shape)


def decode_optiontypes(codes: np.ndarray) -> np.ndarray:
    """inverse of :func:`encode_optiontypes`."""
    return np.asarray([OPTION_CODES_INV[int(c)] for c in np.asarray(codes).ravel()],
                      dtype='<U2').reshape(np.asarray(codes).shape)
