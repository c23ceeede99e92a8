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


def _use_pallas() -> bool:
    """TVM_TIP5_PALLAS=1 forces the Pallas kernels (interpret mode on
    CPU — lets pure-CPU CI run the exact kernel bodies), =0 forces the
    XLA formulation; default 'auto' selects Pallas on real accelerators."""
    import os

    mode = os.environ.get("TVM_TIP5_PALLAS", "auto")
    return mode == "1" or (mode == "auto"
                           and jax.default_backend() != "cpu")


def _permutation_impl(state):
    if _use_pallas():
        # Pallas kernel: all 5 rounds in VMEM (11x the XLA graph, which
        # materializes every MDS tap in HBM). Bit-identical (tested).
        from . import tip5_pallas

        return tip5_pallas.permutation(state)
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
    """All Merkle layers in one dispatch: gf (5, n) leaves ->
    gf (log2(n), 5, n/2) stacked layer buffer; row k holds layer
    log2(n)-1-k (i.e. the k-th fold) in its first n/2^(k+1) entries.

    One fori_loop over folds on a fixed-size buffer instead of log2(n)
    unrolled hash_pairs graphs: the unrolled version bloats the lowered
    module (~2MB StableHLO for n=8192) which is what the tunneled
    backend's slow lowering path chokes on. The buffer tail beyond the
    shrinking valid prefix holds duplicated garbage that the host-side
    assembly (assemble_flat) slices away."""
    n = gf.shape(leaves)[-1]
    if n == 1:
        return gf.zeros((0, 5, 1))  # no folds; flat == leaves
    logn = (n - 1).bit_length()

    def body(k, carry):
        buf, out = carry
        left = gf.tmap(lambda x: x[:, 0::2], buf)
        right = gf.tmap(lambda x: x[:, 1::2], buf)
        parents = hash_pairs(left, right)  # (5, n/2)
        out = gf.tmap(
            lambda o, p: jax.lax.dynamic_update_slice(o, p[None], (k, 0, 0)),
            out, parents)
        buf = gf.tmap(lambda p: jnp.concatenate([p, p], axis=1), parents)
        return buf, out

    out0 = gf.zeros((logn, 5, n // 2))
    _, out = jax.lax.fori_loop(0, logn, body, (leaves, out0))
    return out


merkle_flat_jit = jax.jit(merkle_flat)


def assemble_flat_device(leaves, stack):
    """Device assembly of the heap-ordered (5, 2n-1) gf pair from leaf
    digests gf (5, n) and the merkle_flat layer stack gf (logn, 5, n/2).
    Stays on device — the host round-trip of the full stack costs ~8 s
    per tree at 2^18 leaves over the tunneled backend."""
    n = gf.shape(leaves)[-1]
    logn = gf.shape(stack)[0]
    parts = []
    size = 1
    for k in range(logn - 1, -1, -1):
        parts.append(gf.tmap(lambda x, k=k, s=size: x[k][:, :s], stack))
        size *= 2
    parts.append(leaves)
    return gf.concatenate(parts, axis=1)


def assemble_flat(leaves_u64: "np.ndarray", stack_u64: "np.ndarray"):
    """Host assembly of the heap-ordered (5, 2n-1) layer array from the
    leaf digests (5, n) and the merkle_flat layer stack."""
    import numpy as np

    n = leaves_u64.shape[-1]
    parts = []
    size = 1
    for k in range(stack_u64.shape[0] - 1, -1, -1):
        parts.append(stack_u64[k][:, :size])
        size *= 2
    parts.append(leaves_u64)
    return np.concatenate(parts, axis=1)


@jax.jit
def commit_rows(rows):
    """Row digests + full Merkle layer stack in one dispatch:
    gf (B, n) rows -> (digests gf (5, B), layers gf (log2(B), 5, B/2))."""
    digests = sponge_absorb_rows(rows)
    return digests, merkle_flat(digests)


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
    if _use_pallas():
        # Pallas sponge: the whole absorb loop runs in VMEM — one HBM
        # read of the rows, one write of the digests (10x over the XLA
        # scan, which round-trips the state through HBM per permutation)
        from . import tip5_pallas

        return tip5_pallas.sponge_absorb_rows_t(
            gf.tmap(lambda x: x.T, padded))
    # XLA fallback (CPU): absorb via lax.scan so the permutation
    # while-body exists ONCE in the lowered module; an unrolled loop
    # clones it total/RATE times and XLA:CPU re-optimizes every clone —
    # measured multi-minute compiles at 379 columns.
    chunks = gf.tmap(
        lambda x: x.reshape(b, total // tip5.RATE, tip5.RATE)
        .transpose(1, 2, 0), padded)  # (nchunks, RATE, b)
    state = gf.zeros((16, b))

    def absorb(state, chunk):
        state = gf.concatenate(
            [chunk, gf.tmap(lambda x: x[tip5.RATE:], state)], axis=0)
        return _permutation_impl(state), None

    state, _ = jax.lax.scan(absorb, state, chunks)
    return gf.tmap(lambda x: x[:5], state)
