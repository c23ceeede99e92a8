"""Pallas TPU kernel for the Tip5 permutation.

The XLA formulation of the permutation (ops/tip5_kernel.py) materializes
every MDS tap / S-box intermediate in HBM: measured ~1.4 us/permutation
on one chip — no faster than single-core Rust, and row hashing is ~70%
of prover wall-clock. This kernel runs all 5 rounds in VMEM: one HBM
read + one write per state, everything else on the VPU.

Design notes (bit-identical to ops/tip5_kernel.py, which is tested
against the scalar host implementation and the reference's golden
program hashes):

- State is (16, B) in two u32 limb planes (the gf pair layout).
- S-box on rows 0..3 ("split-and-lookup", table/hash.rs:41-45) is
  computed ARITHMETICALLY instead of by gathers: the 8-bit lookup table
  is the Fermat cube map L(x) = (x+1)^3 mod 257 - 1 (verified against
  tip5.LOOKUP_TABLE element-for-element), and c mod 257 reduces with the
  alternating-digit identity 2^8 == -1 (mod 257) — pure VPU arithmetic,
  no gather (TPU gathers serialize).
- S-box on rows 4..15 is x^7 via limb-pair Goldilocks muls (gf._mul32 /
  _reduce128 are plain jnp element-wise ops and lower fine in Mosaic).
- MDS is the circulant first-column accumulation with 128-bit delayed
  reduction (tips/tip-0005), 16 taps unrolled, rotations via pltpu.roll
  on the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import tip5
from ..fields.bfe import P, R, R_INV
from . import gf


def _interpret() -> bool:
    """Run the kernel in Pallas interpret mode off-TPU so pure-CPU CI
    exercises the exact kernel bodies (tests/test_tip5_pallas.py)."""
    return jax.default_backend() == "cpu"

_MDS = tuple(int(c) for c in tip5.MDS_MATRIX_FIRST_COLUMN)
_RC = np.array(tip5.ROUND_CONSTANTS, np.uint64).reshape(
    tip5.NUM_ROUNDS, 16)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


def _mod257(c):
    """c mod 257 for int32 c in [0, 2^18): alternating 8-bit digits
    (2^8 == -1 mod 257), then two conditional subtracts."""
    r = (c & 255) - ((c >> 8) & 255) + (c >> 16)
    r = r + 257  # now in [2, 767]
    r = jnp.where(r >= 514, r - 514, jnp.where(r >= 257, r - 257, r))
    return r


def _fermat_cube(b):
    """tip5.LOOKUP_TABLE as arithmetic: ((b+1)^3 mod 257) - 1, b int32
    in [0, 256)."""
    t = b + 1
    t2 = _mod257(t * t)
    t3 = _mod257(t2 * t)
    return t3 - 1


def _sbox_lookup_rows(v):
    """Split-and-lookup on a gf pair of (4, B) rows."""
    raw = gf.mul_const(v, R)
    parts = []
    for limb in raw:
        x = limb.astype(jnp.int32)
        b0 = _fermat_cube(x & 0xFF)
        b1 = _fermat_cube((x >> 8) & 0xFF)
        b2 = _fermat_cube((x >> 16) & 0xFF)
        b3 = _fermat_cube((x >> 24) & 0xFF)
        parts.append((b0 | (b1 << 8) | (b2 << 16) | (b3 << 24))
                     .astype(jnp.uint32))
    return gf.mul_const(tuple(parts), R_INV)


def _pow7(v):
    v2 = gf.mul(v, v)
    v4 = gf.mul(v2, v2)
    return gf.mul(gf.mul(v4, v2), v)


def _mds(lo, hi, roll):
    """Circulant MDS with 128-bit delayed reduction; taps unrolled."""
    z = jnp.zeros_like(lo)
    al_lo, al_hi, ah_lo, ah_hi = z, z, z, z
    for k in range(16):
        ck = jnp.uint32(_MDS[k])
        s_lo = roll(lo, k)
        s_hi = roll(hi, k)
        p_lo, p_hi = gf._mul32(s_lo, ck)
        al_lo, al_hi, _ = gf._add64(al_lo, al_hi, p_lo, p_hi)
        p_lo, p_hi = gf._mul32(s_hi, ck)
        ah_lo, ah_hi, _ = gf._add64(ah_lo, ah_hi, p_lo, p_hi)
    x0 = al_lo
    x1 = al_hi + ah_lo
    c1 = (x1 < al_hi).astype(gf.U32)
    x2 = ah_hi + c1
    x3 = jnp.zeros_like(x2)
    return gf._reduce128(x0, x1, x2, x3)


def _rounds(lo, hi, roll, rc_lo, rc_hi):
    """All 5 Tip5 rounds on a (16, B) u32 limb pair. rc_lo/rc_hi:
    (NUM_ROUNDS, 16) round-constant limb planes."""
    for r in range(tip5.NUM_ROUNDS):
        # S-box layer
        looked = _sbox_lookup_rows((lo[:4], hi[:4]))
        powed = _pow7((lo[4:], hi[4:]))
        lo = jnp.concatenate([looked[0], powed[0]], axis=0)
        hi = jnp.concatenate([looked[1], powed[1]], axis=0)
        # MDS layer
        lo, hi = _mds(lo, hi, roll)
        # round constants
        rc = (rc_lo[r][:, None], rc_hi[r][:, None])
        lo, hi = gf.add((lo, hi), rc)
    return lo, hi


def _kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, k):
        return pltpu.roll(x, shift=k, axis=0) if k else x

    lo, hi = _rounds(lo_ref[:], hi_ref[:], roll, rc_lo_ref[:], rc_hi_ref[:])
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@functools.partial(jax.jit, static_argnames=("block",))
def permutation(state, block: int = 1024):
    """Batched Tip5 permutation: gf pair (16, B) -> (16, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo, hi = state
    b = lo.shape[-1]
    bp = -(-max(b, 128) // block) * block if b > 128 else 128
    blk = min(block, bp)
    if bp != b:
        lo = jnp.pad(lo, ((0, 0), (0, bp - b)))
        hi = jnp.pad(hi, ((0, 0), (0, bp - b)))
    grid = (bp // blk,)
    spec = pl.BlockSpec((16, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((tip5.NUM_ROUNDS, 16), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((16, bp), jnp.uint32),
                   jax.ShapeDtypeStruct((16, bp), jnp.uint32)),
        interpret=_interpret(),
    )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)
    if bp != b:
        out_lo, out_hi = out_lo[:, :b], out_hi[:, :b]
    return (out_lo, out_hi)


def _sponge_kernel(nchunks, rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                   out_lo_ref, out_hi_ref):
    """Variable-length sponge over pre-transposed padded rows.

    lo/hi blocks: (nchunks*16, blk) — column j holds one padded row,
    each RATE-chunk padded to 16 sublanes so the dynamic slice offset
    16*j is provably 8-aligned for Mosaic (rows 10..15 of each chunk
    are dead). The full absorb loop runs in VMEM; digests (5, blk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, k):
        return pltpu.roll(x, shift=k, axis=0) if k else x

    rc_lo, rc_hi = rc_lo_ref[:], rc_hi_ref[:]
    blk = lo_ref.shape[-1]

    def absorb(j, state):
        lo, hi = state
        ch_lo = lo_ref[pl.ds(j * 16, 16), :][:tip5.RATE]
        ch_hi = hi_ref[pl.ds(j * 16, 16), :][:tip5.RATE]
        lo = jnp.concatenate([ch_lo, lo[tip5.RATE:]], axis=0)
        hi = jnp.concatenate([ch_hi, hi[tip5.RATE:]], axis=0)
        return _rounds(lo, hi, roll, rc_lo, rc_hi)

    lo0 = jnp.zeros((16, blk), jnp.uint32)
    lo, hi = jax.lax.fori_loop(0, nchunks, absorb, (lo0, lo0))
    out_lo_ref[:] = lo[:5]
    out_hi_ref[:] = hi[:5]


@functools.partial(jax.jit, static_argnames=("block",))
def sponge_absorb_rows_t(rows_t, block: int = 512):
    """Variable-length Tip5 sponge, one per COLUMN of the pre-padded,
    pre-transposed input: gf pair (total, B) with total a multiple of
    RATE (padding applied by the caller) -> digests gf (5, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo, hi = rows_t
    total, b = lo.shape
    assert total % tip5.RATE == 0
    nchunks = total // tip5.RATE

    def chunk_pad(x):
        # (nchunks*RATE, b) -> (nchunks*16, b): each chunk 8-aligned
        x = x.reshape(nchunks, tip5.RATE, b)
        x = jnp.pad(x, ((0, 0), (0, 16 - tip5.RATE), (0, 0)))
        return x.reshape(nchunks * 16, b)

    lo, hi = chunk_pad(lo), chunk_pad(hi)
    bp = -(-max(b, 128) // block) * block if b > 128 else 128
    blk = min(block, bp)
    if bp != b:
        lo = jnp.pad(lo, ((0, 0), (0, bp - b)))
        hi = jnp.pad(hi, ((0, 0), (0, bp - b)))
    spec_in = pl.BlockSpec((nchunks * 16, blk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((5, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((tip5.NUM_ROUNDS, 16), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        functools.partial(_sponge_kernel, nchunks),
        grid=(bp // blk,),
        in_specs=[rc_spec, rc_spec, spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((5, bp), jnp.uint32),
                   jax.ShapeDtypeStruct((5, bp), jnp.uint32)),
        interpret=_interpret(),
    )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)
    if bp != b:
        out_lo, out_hi = out_lo[:, :b], out_hi[:, :b]
    return (out_lo, out_hi)


def _roll_jnp(x, k):
    return jnp.roll(x, k, axis=0) if k else x


@jax.jit
def permutation_reference(state):
    """Same math through plain XLA (for differential tests off-TPU)."""
    lo, hi = state
    return _rounds(lo, hi, _roll_jnp, jnp.asarray(_RC_LO),
                   jnp.asarray(_RC_HI))
