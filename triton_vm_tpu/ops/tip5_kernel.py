"""Batched Tip5 permutation on device (TPU-native).

State layout: gf limb pair whose arrays have shape (16, B) — 16 state
elements, B parallel permutations. This is the hot kernel behind Merkle
commitment and master-table row hashing (reference hot spots:
/root/reference/triton-vm/src/table/master_table.rs:443-503, 666-716).

Tested bit-for-bit against the scalar host implementation in
`triton_vm_tpu.crypto.tip5`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import tip5
from ..fields.bfe import P, R, R_INV
from . import gf

_LOOKUP = jnp.asarray(np.array(tip5.LOOKUP_TABLE, np.uint32))


def _split_and_lookup(v):
    """Split-and-lookup S-box on a gf pair: Montgomery byte view."""
    raw = gf.mul_const(v, R)
    parts = []
    for limb in raw:
        b0 = jnp.take(_LOOKUP, (limb & 0xFF).astype(jnp.int32))
        b1 = jnp.take(_LOOKUP, ((limb >> 8) & 0xFF).astype(jnp.int32))
        b2 = jnp.take(_LOOKUP, ((limb >> 16) & 0xFF).astype(jnp.int32))
        b3 = jnp.take(_LOOKUP, (limb >> 24).astype(jnp.int32))
        parts.append(b0 | (b1 << 8) | (b2 << 16) | (b3 << 24))
    return gf.mul_const(tuple(parts), R_INV)


def _pow7(v):
    v2 = gf.mul(v, v)
    v4 = gf.mul(v2, v2)
    return gf.mul(gf.mul(v4, v2), v)


def _sbox_layer(state):
    looked = _split_and_lookup(gf.tmap(lambda x: x[:4], state))
    powed = _pow7(gf.tmap(lambda x: x[4:], state))
    return gf.concatenate([looked, powed], axis=0)


_MDS_COL = jnp.asarray(
    np.array(tip5.MDS_MATRIX_FIRST_COLUMN, np.uint32)[:, None])


def _mds_layer(state):
    """Circulant MDS: out_i = sum_k c[k] * state[(i-k) mod 16].

    Accumulates 32-bit-limb x 16-bit-constant products in a 4-limb (128-bit)
    accumulator before a single Goldilocks reduction, per the delayed
    reduction scheme of tips/tip-0005/tip-0005.md ("MDS Matrix
    Multiplication"). Loops via fori_loop to keep the XLA graph small."""
    lo, hi = state
    z = jnp.zeros_like(lo)

    def tap(k, acc):
        al_lo, al_hi, ah_lo, ah_hi, s_lo, s_hi = acc
        ck = jax.lax.dynamic_index_in_dim(_MDS_COL, k, keepdims=False)
        p_lo, p_hi = gf._mul32(s_lo, ck)
        al_lo, al_hi, _ = gf._add64(al_lo, al_hi, p_lo, p_hi)
        p_lo, p_hi = gf._mul32(s_hi, ck)
        ah_lo, ah_hi, _ = gf._add64(ah_lo, ah_hi, p_lo, p_hi)
        # rotate one step for the next tap: s_{i-k} = roll(s, k)[i]
        return (al_lo, al_hi, ah_lo, ah_hi,
                jnp.roll(s_lo, 1, axis=0), jnp.roll(s_hi, 1, axis=0))

    al_lo, al_hi, ah_lo, ah_hi, _, _ = jax.lax.fori_loop(
        0, 16, tap, (z, z, z, z, lo, hi))
    # total = acc_l + 2^32 * acc_h -> 128-bit limbs x0..x3
    x0 = al_lo
    x1 = al_hi + ah_lo
    c1 = (x1 < al_hi).astype(gf.U32)
    x2 = ah_hi + c1
    x3 = jnp.zeros_like(x2)  # accumulators < 2^53, so x3 = 0
    return gf._reduce128(x0, x1, x2, x3)


_RC_STACK = tuple(
    jnp.stack([
        jnp.asarray((np.array(tip5.ROUND_CONSTANTS[r * 16:(r + 1) * 16],
                              np.uint64) >> np.uint64(32 * limb)
                     & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None])
        for r in range(tip5.NUM_ROUNDS)
    ])
    for limb in (0, 1)
)  # pair of (5, 16, 1) arrays


def _round(r, state):
    state = _sbox_layer(state)
    state = _mds_layer(state)
    rc = gf.tmap(lambda x: jax.lax.dynamic_index_in_dim(x, r, keepdims=False),
                 _RC_STACK)
    return gf.add(state, rc)


def _permutation_impl(state):
    return jax.lax.fori_loop(0, tip5.NUM_ROUNDS, _round, state)


@jax.jit
def permutation(state):
    """One Tip5 permutation over the batch: gf pair (16, B) -> (16, B)."""
    return _permutation_impl(state)


@jax.jit
def permutation_trace(state):
    """All 6 states, stacked on a new leading axis: gf pair (6, 16, B)."""

    def step(s, r):
        ns = _round(r, s)
        return ns, ns

    _, states = jax.lax.scan(step, state, jnp.arange(tip5.NUM_ROUNDS))
    return gf.tmap(lambda first, rest: jnp.concatenate([first[None], rest]),
                   state, states)


def hash_pairs(left, right):
    """Batched hash_pair: gf pairs (5,B),(5,B) -> (5,B) parent digests."""
    b = gf.shape(left)[-1]
    cap = gf.broadcast_to(gf.ones((6, 1)), (6, b))
    state = gf.concatenate([left, right, cap], axis=0)
    return gf.tmap(lambda x: x[:5], _permutation_impl(state))


@jax.jit
def _hash_pairs_jit(left, right):
    return hash_pairs(left, right)


def merkle_flat(leaves):
    """All Merkle layers in one graph, heap order: gf (5, n) ->
    gf (5, 2n-1); flat[:, i-1] is heap node i (root at i=1).

    Unrolled log2(n) hash_pairs layers so the whole tree is ONE device
    dispatch with ONE small readback — on tunneled backends per-dispatch
    latency dominates the per-layer eager loop."""
    layers = [leaves]
    while gf.shape(layers[-1])[-1] > 1:
        cur = layers[-1]
        left = gf.tmap(lambda x: x[:, 0::2], cur)
        right = gf.tmap(lambda x: x[:, 1::2], cur)
        layers.append(hash_pairs(left, right))
    return gf.concatenate(list(reversed(layers)), axis=-1)


merkle_flat_jit = jax.jit(merkle_flat)


@jax.jit
def commit_rows(rows):
    """Row digests + full Merkle tree in one dispatch:
    gf (B, n) rows -> gf (5, 2B-1) heap-ordered tree."""
    return merkle_flat(sponge_absorb_rows(rows))


@jax.jit
def sponge_absorb_rows(rows):
    """Hash B rows of n field elements each (variable-length Tip5 sponge,
    one sponge per row): gf pair (B, n) -> digests (5, B).

    Padding (append 1, then 0s to a RATE multiple) is applied here; the row
    length is static."""
    b, n = gf.shape(rows)
    pad_len = (-(n + 1)) % tip5.RATE
    total = n + 1 + pad_len
    ones_col = gf.broadcast_to(gf.ones((1, 1)), (b, 1))
    zeros_cols = gf.zeros((b, pad_len))
    padded = gf.concatenate([rows, ones_col, zeros_cols], axis=1)
    state = gf.zeros((16, b))
    for i in range(total // tip5.RATE):
        chunk = gf.tmap(lambda x: x[:, i * 10:(i + 1) * 10].T, padded)
        state = gf.concatenate([chunk, gf.tmap(lambda x: x[10:], state)],
                               axis=0)
        state = _permutation_impl(state)
    return gf.tmap(lambda x: x[:5], state)
