"""Intra-column sharded NTT: ONE tall transform distributed over the mesh.

Completes parallelism axis P1 (SURVEY §2.5): the production prover
shards the LDE over *columns*, which stops scaling once height grows
faster than column count (the reference instead splits the butterfly
stages themselves across threads, stark.rs:867-878 via ndarray/rayon).
The TPU-native formulation is NOT per-stage exchanges (log n all-to-alls
over ICI) but the six-step / transpose algorithm:

    n = D * n2 on a D-device mesh, input x_j natural order, j = j1*n2+j2
    1. block transpose (all_to_all): device d holds x[all j1, j2 block d]
    2. local length-D column NTTs  (sum over j1, root w^n2)
       + local twiddle multiply  W[k1, j2] = w^(j2*k1)
    3. row gather (all_to_all): device d holds A[k1 = d, all j2]
    4. one local length-n2 NTT per device (root w^D) — the bulk of the
       work, perfectly balanced: each device runs exactly (n/D)*log(n/D)
       butterflies
    5. block transpose (all_to_all) + local transpose -> natural-order
       output, block-sharded over the mesh

Three all_to_alls of n/D elements each ride the ICI; everything else is
local VPU work through the same exact mod-p kernels as the single-device
path, so the result is bit-identical (exact integer field arithmetic has
no rounding — tests/test_ntt_sharded.py pins it).

The inverse transform is the same network with inverted roots: intt's
1/n and the coset's offset^{-j} fold into one natural-order postscale.
"""

from __future__ import annotations

import functools

import jax

from ..fields import bfe
from ..fields.bfe import P
from . import gf
from .ntt import bitrev_indices, ntt_dit


@functools.lru_cache(maxsize=32)
def _twiddle_table_u64(n: int, d: int, inverse: bool):
    """(d, n2) u64: W[k1, j2] = w^(±j2*k1), w the primitive n-th root."""
    import numpy as np

    from .kernels import _powers_ladder_u64

    n2 = n // d
    w = bfe.primitive_root_of_unity(n)
    if inverse:
        w = bfe.inv(w)
    return np.stack([_powers_ladder_u64(pow(w, k1, P), 1, n2)
                     for k1 in range(d)])


@functools.lru_cache(maxsize=32)
def _scale_table_u64(n: int, offset: int, inverse: bool):
    """(n,) u64 natural-order coset scale: offset^j (forward prescale)
    or offset^{-j} / n (inverse postscale)."""
    from .kernels import _powers_ladder_u64

    if inverse:
        base = bfe.inv(offset) if offset != 1 else 1
        return _powers_ladder_u64(base, bfe.inv(n % P), n)
    return _powers_ladder_u64(offset, 1, n)


def _plain_ntt_last(v, root: int):
    """Length-m plain NTT (natural -> natural) along the LAST axis with
    an explicit root (the six-step needs roots of sub-orders)."""
    m = gf.shape(v)[-1]
    if m == 1:
        return v
    br = bitrev_indices(m)
    return ntt_dit(gf.take(v, br, axis=-1), root)


def _sixstep_body(x, w_tw, scale, *, d: int, n2: int, root_d: int,
                  root_n2: int, inverse: bool, axis: str):
    """shard_map body. Local shapes: x (n2,) = the device's natural
    block; w_tw (d, n2/d); scale (n2,). All gf limb pairs."""
    import jax.numpy as jnp

    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis, tiled=True)

    if not inverse:
        x = gf.mul(x, scale)  # coset prescale offset^j
    # 1. block transpose: (n2,) -> (d, n2/d) rows = source device = j1
    x = gf.tmap(lambda a: a2a(a.reshape(d, n2 // d),
                              split_axis=0, concat_axis=0), x)
    # 2. length-d column NTTs along axis 0 + twiddle
    x = gf.tmap(lambda a: a.T, x)
    x = _plain_ntt_last(x, root_d)
    x = gf.tmap(lambda a: a.T, x)
    x = gf.mul(x, w_tw)
    # 3. row gather: device d_i receives its full row k1 = d_i
    x = gf.tmap(lambda a: a2a(a, split_axis=0, concat_axis=1), x)
    x = gf.tmap(lambda a: a.reshape(n2), x)
    # 4. the bulk: one local length-n2 NTT
    x = _plain_ntt_last(x, root_n2)
    # 5. natural order: block transpose + local transpose
    x = gf.tmap(lambda a: a2a(a.reshape(d, n2 // d),
                              split_axis=0, concat_axis=0), x)
    x = gf.tmap(lambda a: a.T.reshape(n2), x)
    if inverse:
        x = gf.mul(x, scale)  # offset^{-j} / n postscale
    return x


@functools.lru_cache(maxsize=32)
def _sixstep_fn(n: int, d: int, offset: int, inverse: bool,
                mesh_key: int, axis: str):
    """Jitted shard_map six-step over the given mesh (cached per shape)."""
    from jax.sharding import PartitionSpec as PS

    mesh = _MESHES[mesh_key]
    n2 = n // d
    w = bfe.primitive_root_of_unity(n)
    if inverse:
        w = bfe.inv(w)
    root_d = pow(w, n2, P)     # primitive d-th root (possibly inverted)
    root_n2 = pow(w, d, P)     # primitive n2-th root
    body = functools.partial(
        _sixstep_body, d=d, n2=n2, root_d=root_d, root_n2=root_n2,
        inverse=inverse, axis=axis)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(PS(axis), PS(None, axis), PS(axis)),
        out_specs=PS(axis))
    return jax.jit(sharded)


# shard_map needs the concrete Mesh, but lru_cache keys must be hashable
# and stable; register meshes by id.
_MESHES: dict = {}


def _mesh_key(mesh) -> int:
    k = id(mesh)
    _MESHES[k] = mesh
    return k


def ntt_sharded(coeffs, mesh, offset: int = 1):
    """Forward NTT of ONE length-n vector distributed over `mesh`:
    natural-order coefficients -> natural-order values on the coset
    offset*<omega_n>, output block-sharded over the mesh axis.

    Bit-identical to ops.ntt.ntt (exact mod-p arithmetic). Requires
    n % (D*D) == 0 for the all_to_all block splits."""
    return _dispatch(coeffs, mesh, offset, inverse=False)


def intt_sharded(values, mesh, offset: int = 1):
    """Inverse NTT distributed over `mesh`: natural-order values on the
    coset -> natural-order coefficients, block-sharded."""
    return _dispatch(values, mesh, offset, inverse=True)


def _dispatch(v, mesh, offset: int, inverse: bool):
    from ..parallel.sharding import AXIS

    n = gf.shape(v)[-1]
    d = mesh.size
    if n % (d * d) != 0:
        raise ValueError(f"n={n} not divisible by mesh^2={d * d}")
    w_tw = gf.from_u64(_twiddle_table_u64(n, d, inverse))
    scale = gf.from_u64(_scale_table_u64(n, offset, inverse))
    fn = _sixstep_fn(n, d, offset, inverse, _mesh_key(mesh), AXIS)
    return fn(v, w_tw, scale)


def xfe_map_sharded(fn, v, mesh, *args, **kwargs):
    """Apply a sharded gf transform to each of the 3 XFE coefficients."""
    return tuple(fn(v[i], mesh, *args, **kwargs) for i in range(3))


def _intra_threshold() -> int:
    import os

    return int(os.environ.get("TVM_INTRA_NTT_MIN", str(1 << 18)))


def _select_mesh(n: int):
    """The active mesh, if intra-column sharding applies at length n:
    tall enough to beat the all_to_all cost (TVM_INTRA_NTT_MIN,
    default 2^18) and block-splittable (n % D^2 == 0)."""
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if (mesh is not None and n >= _intra_threshold()
            and n % (mesh.size * mesh.size) == 0):
        return mesh
    return None


def xfe_ntt_auto(coeffs, offset: int = 1):
    """Forward NTT of one XFE column; distributes the butterflies over
    the active mesh when the column is tall (P1 intra-column sharding),
    single-device otherwise. Bit-identical either way."""
    from . import ntt as _ntt

    mesh = _select_mesh(gf.shape(coeffs[0])[-1])
    if mesh is not None:
        return xfe_map_sharded(ntt_sharded, coeffs, mesh, offset)
    return _ntt.xfe_map(_ntt.ntt, coeffs, offset)


def xfe_intt_auto(values, offset: int = 1):
    """Inverse NTT of one XFE column; mesh-distributed when tall."""
    from . import ntt as _ntt

    mesh = _select_mesh(gf.shape(values[0])[-1])
    if mesh is not None:
        return xfe_map_sharded(intt_sharded, values, mesh, offset)
    return _ntt.xfe_map(_ntt.intt, values, offset)
