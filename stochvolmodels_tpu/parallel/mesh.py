"""
Device-mesh utilities: path-parallel Monte Carlo over a 1-D mesh.

The reference has no distributed backend (SURVEY.md §2.14): the only
cross-device reductions the math needs are the per-strike payoff mean/std and
the forward-recentring mean.  TPU-natively, MC paths are i.i.d., so the path
axis is sharded over the mesh ('paths' axis = pure data parallelism) and the
reductions lower to psums over ICI, inserted by XLA from the sharding
annotations — no hand-written collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PATH_AXIS = "paths"


def make_path_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'paths' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(PATH_AXIS,))


def path_sharding(mesh: Mesh) -> NamedSharding:
    """sharding that splits the leading (path) axis across the mesh."""
    return NamedSharding(mesh, P(PATH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """fully-replicated sharding on the mesh."""
    return NamedSharding(mesh, P())


def shard_paths(mesh: Mesh, *arrays):
    """device_put path-major arrays with the path axis split over the mesh."""
    s = path_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def round_up_paths(nb_path: int, mesh: Mesh) -> int:
    """round the path count up to a multiple of the mesh size."""
    n = mesh.devices.size
    return ((nb_path + n - 1) // n) * n


def simulate_logsv_terminal_pallas_sharded(mesh: Mesh,
                                           seed: int,
                                           nb_path: int,
                                           ttm: float,
                                           sigma0: float,
                                           theta: float,
                                           kappa1: float,
                                           kappa2: float,
                                           beta: float,
                                           volvol: float,
                                           vol_backbone_eta: float = 1.0,
                                           is_spot_measure: bool = True,
                                           nb_steps_per_year: int = 360,
                                           interpret: Optional[bool] = None):
    """LogSV terminal MC by the Pallas kernel, path-sharded over the mesh.

    MC paths are i.i.d. and the kernel needs no collectives, so each device
    runs the on-chip-PRNG kernel on its own path shard as an independent
    async dispatch (`jax.device_put` pins the shard; XLA overlaps the device
    programs).  Seeds are offset per device (1e6 * device index, plus the
    block index inside the kernel) so streams never collide.  The outputs
    are reassembled with the mesh's path sharding via
    `jax.make_array_from_single_device_arrays`, so downstream payoff
    reductions still lower to psums over ICI.

    (Not `shard_map`: the Pallas *interpreter* — the CPU CI path —
    deadlocks inside SPMD shard_map programs; per-device dispatch is
    equivalent here because the computation has no cross-device terms.)
    ``interpret`` defaults to True off-TPU (CPU CI mesh)."""
    from stochvolmodels_tpu.ops.pallas_mc import (
        LANES, simulate_logsv_terminal_pallas)

    devices = list(mesh.devices.flat)
    n_dev = len(devices)
    if interpret is None:
        # probe the MESH's devices, not the default backend: dryrun builds a
        # CPU-device mesh even when the TPU backend is primary
        interpret = devices[0].platform == "cpu"
    assert nb_path % (n_dev * LANES) == 0, \
        f"nb_path must be a multiple of mesh size * {LANES}"
    local = nb_path // n_dev

    shards = []
    for i, dev in enumerate(devices):
        x0 = jax.device_put(jnp.zeros(local, dtype=jnp.float32), dev)
        s0 = jax.device_put(jnp.full(local, sigma0, dtype=jnp.float32), dev)
        q0 = jax.device_put(jnp.zeros(local, dtype=jnp.float32), dev)
        shards.append(simulate_logsv_terminal_pallas(
            seed=int(seed) + 1_000_003 * i, x0=x0, sigma0=s0, qvar0=q0,
            ttm=ttm, theta=theta, kappa1=kappa1, kappa2=kappa2, beta=beta,
            volvol=volvol, vol_backbone_eta=vol_backbone_eta,
            is_spot_measure=is_spot_measure,
            nb_steps_per_year=nb_steps_per_year, interpret=interpret))

    sharding = path_sharding(mesh)
    outs = []
    for k in range(3):
        outs.append(jax.make_array_from_single_device_arrays(
            (nb_path,), sharding, [s[k] for s in shards]))
    return tuple(outs)
