"""Mesh activation and sharding placement for the production prover.

TPU-native scale-out (SURVEY.md §2.5): the prover's stage inputs are
`jax.device_put` with `NamedSharding`s over a 1-D device mesh and the
existing jitted stage graphs compile as SPMD programs — XLA/GSPMD inserts
the ICI collectives (the cols->rows all-to-all before row hashing, halo
exchanges for next-row constraints, reduction trees) from the sharding
constraints alone. All math is exact mod-P integer arithmetic, so the
multi-device proof is bit-identical to the single-device proof
(tests/test_multichip_prover.py, __graft_entry__.dryrun_multichip).

Activation: set TVM_MESH=<n> (n > 1) to place the prover over the first n
visible devices. Without it the prover runs single-device.
"""

from __future__ import annotations

import os

import numpy as np

AXIS = "d"


def active_mesh():
    """The mesh requested via TVM_MESH, or None for single-device."""
    n = int(os.environ.get("TVM_MESH", "0") or 0)
    if n <= 1:
        return None
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < n:
        raise RuntimeError(
            f"TVM_MESH={n} but only {len(devices)} devices are visible")
    return Mesh(np.array(devices[:n]), (AXIS,))


def shard(mesh, value, axis: int, ndim: int):
    """Place a gf/gfx pytree with the given logical axis mesh-sharded.

    Falls back to replication if the axis length does not divide the mesh
    (uneven layouts are legal in GSPMD but not worth the edge cases on the
    narrow master-table axes)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    leaves = jax.tree_util.tree_leaves(value)
    if not leaves or leaves[0].shape[axis] % mesh.size != 0:
        return replicate(mesh, value)
    spec = [None] * ndim
    spec[axis] = AXIS
    return jax.device_put(value, NamedSharding(mesh, PartitionSpec(*spec)))


def replicate(mesh, value):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(value, NamedSharding(mesh, PartitionSpec()))
