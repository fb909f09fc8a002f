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
