"""Multi-chip sharding of the prover's hot paths over a jax.sharding.Mesh.

TPU-native re-design of the reference's rayon (shared-memory thread pool)
parallelism (SURVEY.md §2.5): each rayon axis becomes a mesh axis with XLA
collectives over ICI instead of work stealing:

- P1/P2 (stark.rs:867-878,992-1003 / master_table.rs:279-315):
  column-parallel iNTT/NTT and LDE — columns sharded over the mesh, each
  chip transforms its block; no communication.
- P3 (master_table.rs:455-503): row-parallel Tip5 row hashing — the
  cols->rows reshard is the single all-to-all the pipeline pays on ICI;
  Merkle layers stay row-sharded until the subtree cap.
- P4 (master_table.rs:1302-1359): row-parallel quotient evaluation —
  rows sharded, the compiled AIR tapes (air/compile.py) run
  embarrassingly parallel per shard.
- P7 (stark.rs:611-626): weighted column reductions via psum-shaped
  tree sums (XLA inserts the collectives from the sharding constraints).

All entry points take an explicit Mesh; use `default_mesh()` to build one
over all visible devices. Everything works identically on a virtual CPU
mesh (xla_force_host_platform_device_count) — that is how tests run.
"""

from __future__ import annotations

import numpy as np

from ..ops import gf, gfx, ntt, tip5_kernel

COL_AXIS = "cols"


def default_mesh(n_devices: int | None = None):
    """1-D mesh over the first n (default: all) visible devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(COL_AXIS,))


def _col_sharding(mesh, dim_size=None):
    """Shard axis 0 over the mesh; replicate if the size doesn't divide."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    if dim_size is not None and dim_size % mesh.size != 0:
        return NamedSharding(mesh, PS())
    return NamedSharding(mesh, PS(COL_AXIS, None))


def shard_columns(mesh, cols):
    """Place a gf/gfx pytree with layout (num_cols, n) column-sharded."""
    import jax

    return jax.device_put(cols, _col_sharding(mesh, gf.shape(cols)[0]))


def sharded_lde(mesh, cols, expansion: int, in_offset: int = 1,
                out_offset: int = 7):
    """P1/P2: column-parallel low-degree extension.

    cols: gf pair (num_cols, h), column-sharded (num_cols % mesh size == 0
    for an even split). Returns gf pair (num_cols, h*expansion) with the
    same sharding."""
    import jax

    n_cols = gf.shape(cols)[0]

    def step(c):
        out = ntt.lde(c, expansion, in_offset, out_offset)
        return jax.lax.with_sharding_constraint(
            out, _col_sharding(mesh, n_cols))

    return jax.jit(step)(shard_columns(mesh, cols))


def sharded_row_hash(mesh, cols):
    """P3: hash all rows of a column-major codeword matrix.

    The input is column-sharded (num_cols, L); the transpose to row-major
    (L, num_cols) re-shards to row-parallel — XLA lowers this to the
    all-to-all on ICI. Returns digests (5, L), row-sharded."""
    import jax

    n_rows = gf.shape(cols)[-1]

    def step(c):
        rows = gf.tmap(lambda x: x.T, c)
        rows = jax.lax.with_sharding_constraint(
            rows, _col_sharding(mesh, n_rows))
        return tip5_kernel.sponge_absorb_rows(rows)

    return jax.jit(step)(cols)


def sharded_merkle_layers(mesh, digests):
    """P3: Merkle-tree layers from row-sharded leaf digests (5, L).

    Each chip folds its contiguous leaf block into a local subtree; the
    remaining log2(mesh) layers on the small cap run replicated. Returns
    the list of layers (root last), all as host arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    L0 = int(digests[0].shape[-1])
    leaf_sharding = (NamedSharding(mesh, PS(None, COL_AXIS))
                     if L0 % mesh.size == 0 else NamedSharding(mesh, PS()))
    digests = jax.device_put(digests, leaf_sharding)
    layers = [digests]
    L = int(digests[0].shape[-1])
    while L > 1:
        prev = layers[-1]
        left = gf.tmap(lambda x: x[:, 0::2], prev)
        right = gf.tmap(lambda x: x[:, 1::2], prev)
        layers.append(tip5_kernel.hash_pairs(left, right))
        L //= 2
    return layers


def sharded_quotients(mesh, main_q, aux_q, ch, ws, xs, unit, h, gen_inv):
    """P4: run the quotient combiner with the quotient-domain rows sharded
    over the mesh. Same math as stark/prover._quotient_fn; the tapes are
    row-parallel so the only cross-chip data motion is the jnp.roll halo
    exchange for next-row constraints."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from ..stark.prover import _quotient_fn

    row_sharding = NamedSharding(mesh, PS(None, COL_AXIS))
    Q = gf.shape(main_q)[-1]
    main_q = jax.device_put(main_q, NamedSharding(mesh, PS(None, COL_AXIS)))
    aux_q = jax.device_put(aux_q, row_sharding)
    fn = _quotient_fn(Q, unit, h, gen_inv)
    return fn(main_q, aux_q, ch, ws, xs)
