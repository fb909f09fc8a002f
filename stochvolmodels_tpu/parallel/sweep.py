"""
Multi-device calibration sweeps: batched on-device Levenberg-Marquardt over
many option chains, sharded across a 1-D device mesh.

The reference's only batch workload is repricing/recalibrating a time series
of chains in a host loop (papers model_fit_to_options_timeseries.py — one
SLSQP per date).  TPU-natively the chains are independent, so the whole sweep
is one program: the LM solver (models/logsv/fast_calibration.py) vmaps over a
stacked chain batch and the batch axis shards over the mesh — pure data
parallelism, XLA inserts no cross-device communication at all (each chain's
solve is local; only the host gather at the end crosses devices).

All chains in a sweep must share the maturity/strike layout (same ttms, same
padded panel shape) — the natural shape for a calibration time series of one
underlying.  Use :func:`pad_chains_to_sweep` to group arbitrary chains.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stochvolmodels_tpu.data.option_chain import OptionChain
from stochvolmodels_tpu.models.logsv.fast_calibration import (
    LOWER,
    UPPER,
    _bounds_vector,
    _lm_run,
)
from stochvolmodels_tpu.models.logsv.params import LogSvParams
from stochvolmodels_tpu.models.logsv.pricer import (
    ConstraintsType,
    _grid_to_f32,
    _pad_panel,
    set_vol_scaler,
    use_float32_default,
)
from stochvolmodels_tpu.parallel.mesh import make_path_mesh, path_sharding

Array = jnp.ndarray


def _stack_grids(grids):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *grids)


def calibrate_logsv_lm_sweep(option_chains: Sequence[OptionChain],
                             params0: LogSvParams | Sequence[LogSvParams],
                             constraints_type: ConstraintsType = ConstraintsType.UNCONSTRAINT,
                             nb_iters: int = 16,
                             year_steps: int = 360,
                             use_float32: Optional[bool] = None,
                             is_vega_weighted: bool = True,
                             params_min: Optional[LogSvParams] = None,
                             params_max: Optional[LogSvParams] = None,
                             mesh=None,
                             ) -> List[Tuple[LogSvParams, float]]:
    """calibrate every chain in one device dispatch; returns [(params, cost)].

    The batch axis is sharded over ``mesh`` (default: all devices).  Chains
    must share ``ttms`` and the padded (n_ttm, max_strikes) layout.  The
    batch is padded up to a multiple of the mesh size by repeating the last
    chain (discarded on return), so any sweep length works on any mesh.
    """
    chains = list(option_chains)
    if not chains:
        return []
    ttms0 = tuple(float(t) for t in chains[0].ttms)
    for c in chains[1:]:
        if tuple(float(t) for t in c.ttms) != ttms0:
            raise ValueError("all chains in a sweep must share ttms; "
                             "use pad_chains_to_sweep to group by layout")
    if use_float32 is None:
        use_float32 = use_float32_default()
    dtype = jnp.float32 if use_float32 else jnp.float64
    if isinstance(params0, LogSvParams):
        params0 = [params0] * len(chains)
    elif len(params0) != len(chains):
        raise ValueError(f"params0 has {len(params0)} entries for "
                         f"{len(chains)} chains")

    grids, markets, sqrtws, p0s, vol_scalers = [], [], [], [], []
    for chain, par0 in zip(chains, params0):
        grid = chain.to_grid()
        market_panel = _pad_panel(chain.get_mid_vols(), grid)
        if is_vega_weighted:
            vegas = [v / np.sum(v) for v in chain.get_chain_vegas()]
            weights_panel = _pad_panel(vegas, grid)
        else:
            weights_panel = np.ones_like(market_panel)
        mask = np.asarray(grid.mask)
        sqrtws.append(np.sqrt(np.where(mask, weights_panel, 0.0)).astype(dtype))
        markets.append(np.where(mask, market_panel, 0.0).astype(dtype))
        grids.append(_grid_to_f32(grid) if use_float32 else grid)
        p0s.append([par0.sigma0, par0.theta, par0.kappa1, par0.beta, par0.volvol])
        vol_scalers.append(set_vol_scaler(sigma0=chain.get_chain_atm_vols()[0],
                                          ttm=chain.ttms[0]))

    mesh = mesh if mesh is not None else make_path_mesh()
    n_dev = mesh.devices.size
    n = len(chains)
    pad = (-n) % n_dev
    for _ in range(pad):
        grids.append(grids[-1])
        markets.append(markets[-1])
        sqrtws.append(sqrtws[-1])
        p0s.append(p0s[-1])
        vol_scalers.append(vol_scalers[-1])

    batch_grid = _stack_grids(grids)
    market_b = jnp.asarray(np.stack(markets))
    sqrtw_b = jnp.asarray(np.stack(sqrtws))
    p0_b = jnp.asarray(np.asarray(p0s), dtype=dtype)
    vs_b = jnp.asarray(np.asarray(vol_scalers), dtype=dtype)
    lower = jnp.asarray(_bounds_vector(params_min, LOWER), dtype=dtype)
    upper = jnp.asarray(_bounds_vector(params_max, UPPER), dtype=dtype)

    raw = _lm_run.__wrapped__  # un-jitted LM loop; statics bound by closure

    def one(p0, grid, market, sqrtw, vol_scaler):
        return raw(p0, grid, market, sqrtw, lower, upper, vol_scaler,
                   ttms_static=ttms0, year_steps=year_steps, nb_iters=nb_iters,
                   constraints_type=constraints_type, use_float32=use_float32)

    sharding = path_sharding(mesh)
    batch_grid = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch_grid)
    market_b, sqrtw_b, p0_b, vs_b = (jax.device_put(a, sharding)
                                     for a in (market_b, sqrtw_b, p0_b, vs_b))
    with jax.set_mesh(mesh):
        best_b, cost_b = jax.jit(jax.vmap(one))(p0_b, batch_grid, market_b,
                                                sqrtw_b, vs_b)
        best_b = np.asarray(best_b, dtype=np.float64)
        cost_b = np.asarray(cost_b, dtype=np.float64)

    out = []
    for i in range(n):
        b = best_b[i]
        out.append((LogSvParams(sigma0=b[0], theta=b[1], kappa1=b[2],
                                kappa2=b[2] / b[1], beta=b[3], volvol=b[4]),
                    float(cost_b[i])))
    return out


def pad_chains_to_sweep(option_chains: Sequence[OptionChain]):
    """group chains by (ttms, panel shape) into sweep-compatible buckets."""
    buckets = {}
    for idx, c in enumerate(option_chains):
        grid = c.to_grid()
        key = (tuple(float(t) for t in c.ttms), grid.mask.shape)
        buckets.setdefault(key, []).append((idx, c))
    return list(buckets.values())


HESTON_LOWER = np.array([0.01, 0.01, 0.1, -0.99, 0.1])
HESTON_UPPER = np.array([2.0, 2.0, 30.0, 0.99, 5.0])


def calibrate_heston_lm_sweep(option_chains: Sequence[OptionChain],
                              params0,
                              nb_iters: int = 16,
                              use_float32: Optional[bool] = None,
                              is_vega_weighted: bool = True,
                              mesh=None,
                              ) -> List[Tuple["HestonParams", float]]:
    """Heston counterpart of :func:`calibrate_logsv_lm_sweep`: every chain's
    (v0, theta, kappa, rho, volvol) LM fit in ONE device dispatch, batch axis
    sharded over the mesh.  ``params0`` is one HestonParams or a list."""
    from stochvolmodels_tpu.models.heston import HestonParams, _heston_lm_run

    chains = list(option_chains)
    if not chains:
        return []
    ttms0 = tuple(float(t) for t in chains[0].ttms)
    for c in chains[1:]:
        if tuple(float(t) for t in c.ttms) != ttms0:
            raise ValueError("all chains in a sweep must share ttms; "
                             "use pad_chains_to_sweep to group by layout")
    if use_float32 is None:
        use_float32 = use_float32_default()
    dtype = jnp.float32 if use_float32 else jnp.float64
    if isinstance(params0, HestonParams):
        params0 = [params0] * len(chains)
    elif len(params0) != len(chains):
        raise ValueError(f"params0 has {len(params0)} entries for "
                         f"{len(chains)} chains")

    grids, markets, sqrtws, p0s, vol_scalers = [], [], [], [], []
    for chain, par0 in zip(chains, params0):
        grid = chain.to_grid()
        market_panel = _pad_panel(chain.get_mid_vols(), grid)
        if is_vega_weighted:
            vegas = [v / np.sum(v) for v in chain.get_chain_vegas()]
            weights_panel = _pad_panel(vegas, grid)
        else:
            weights_panel = np.ones_like(market_panel)
        mask = np.asarray(grid.mask)
        sqrtws.append(np.sqrt(np.where(mask, weights_panel, 0.0)).astype(dtype))
        markets.append(np.where(mask, market_panel, 0.0).astype(dtype))
        grids.append(_grid_to_f32(grid) if use_float32 else grid)
        p0s.append(par0.to_array())
        vol_scalers.append(float(np.minimum(0.3, np.sqrt(par0.v0 * chain.ttms[0]))))

    mesh = mesh if mesh is not None else make_path_mesh()
    n_dev = mesh.devices.size
    n = len(chains)
    pad = (-n) % n_dev
    for _ in range(pad):
        grids.append(grids[-1])
        markets.append(markets[-1])
        sqrtws.append(sqrtws[-1])
        p0s.append(p0s[-1])
        vol_scalers.append(vol_scalers[-1])

    batch_grid = _stack_grids(grids)
    market_b = jnp.asarray(np.stack(markets))
    sqrtw_b = jnp.asarray(np.stack(sqrtws))
    p0_b = jnp.asarray(np.asarray(p0s), dtype=dtype)
    vs_b = jnp.asarray(np.asarray(vol_scalers), dtype=dtype)
    lower = jnp.asarray(HESTON_LOWER, dtype=dtype)
    upper = jnp.asarray(HESTON_UPPER, dtype=dtype)

    raw = _heston_lm_run.__wrapped__

    def one(p0, grid, market, sqrtw, vol_scaler):
        return raw(p0, grid, market, sqrtw, lower, upper, vol_scaler,
                   nb_iters=nb_iters, use_float32=use_float32)

    sharding = path_sharding(mesh)
    batch_grid = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch_grid)
    market_b, sqrtw_b, p0_b, vs_b = (jax.device_put(a, sharding)
                                     for a in (market_b, sqrtw_b, p0_b, vs_b))
    with jax.set_mesh(mesh):
        best_b, cost_b = jax.jit(jax.vmap(one))(p0_b, batch_grid, market_b,
                                                sqrtw_b, vs_b)
        best_b = np.asarray(best_b, dtype=np.float64)
        cost_b = np.asarray(cost_b, dtype=np.float64)

    out = []
    for i in range(n):
        b = best_b[i]
        out.append((HestonParams(v0=b[0], theta=b[1], kappa=b[2], rho=b[3],
                                 volvol=b[4]), float(cost_b[i])))
    return out
