"""Tip5 hash: host-side scalar implementation (permutation, sponge, digests,
Fiat-Shamir sampling).

Spec: /root/reference/tips/tip-0005/tip-0005.md. The reference consumes Tip5
through `twenty-first` (usage: /root/reference/triton-vm/src/proof_stream.rs:40-103,
master_table.rs:666-716, aet.rs:187-213). The batched device kernel lives in
`triton_vm_tpu.ops.tip5_kernel`; it is tested against this module.

Constants are derived, not copied:
  * LOOKUP_TABLE[i] = ((i+1)^3 mod 257) - 1  (Fermat cube map, offset 1)
  * MDS_MATRIX_FIRST_COLUMN = SHA-256("Tip5") as 16 little-endian u16s
  * ROUND_CONSTANTS[i] = Blake3("Tip5" || byte(i))[:16] as LE integer,
    reduced mod p, times R^-1 (R = 2^64 mod p)
"""

from __future__ import annotations

import hashlib

from ..fields.bfe import P, R, R_INV
from .blake3_mini import blake3_digest16

STATE_SIZE = 16
RATE = 10
CAPACITY = 6
DIGEST_LEN = 5
NUM_ROUNDS = 5
NUM_SPLIT_AND_LOOKUP = 4

LOOKUP_TABLE = tuple(((i + 1) ** 3 % 257) - 1 for i in range(256))

MDS_MATRIX_FIRST_COLUMN = tuple(
    int.from_bytes(hashlib.sha256(b"Tip5").digest()[2 * i: 2 * i + 2], "little")
    for i in range(STATE_SIZE)
)

ROUND_CONSTANTS = tuple(
    int.from_bytes(blake3_digest16(b"Tip5" + bytes([i])), "little") % P * R_INV % P
    for i in range(STATE_SIZE * NUM_ROUNDS)
)


def split_and_lookup(x: int) -> int:
    """S: x -> R^-1 * rho(L^8(sigma(R*x))) via the Montgomery byte view."""
    raw = x * R % P
    out = 0
    for b in range(8):
        out |= LOOKUP_TABLE[(raw >> (8 * b)) & 0xFF] << (8 * b)
    return out * R_INV % P


def _sbox_layer(state):
    return [
        split_and_lookup(s) if i < NUM_SPLIT_AND_LOOKUP else pow(s, 7, P)
        for i, s in enumerate(state)
    ]


def _mds_layer(state):
    c = MDS_MATRIX_FIRST_COLUMN
    return [
        sum(c[(i - j) % STATE_SIZE] * state[j] for j in range(STATE_SIZE)) % P
        for i in range(STATE_SIZE)
    ]


def _round(state, r):
    state = _sbox_layer(state)
    state = _mds_layer(state)
    rc = ROUND_CONSTANTS[r * STATE_SIZE:(r + 1) * STATE_SIZE]
    return [(s + k) % P for s, k in zip(state, rc)]


def permutation(state):
    try:
        from ..vm.native import tip5_permute_native

        out = tip5_permute_native(state)
        if out is not None:
            return out
    except ImportError:
        pass
    state = list(state)
    for r in range(NUM_ROUNDS):
        state = _round(state, r)
    return state


def permutation_python(state):
    """Pure-Python permutation (differential oracle for the C path)."""
    state = list(state)
    for r in range(NUM_ROUNDS):
        state = _round(state, r)
    return state


def permutation_trace(state):
    """All NUM_ROUNDS+1 states (initial + after each round); the hash-table
    witness format (triton-air/src/table/hash.rs: PERMUTATION_TRACE_LENGTH)."""
    states = [list(state)]
    for r in range(NUM_ROUNDS):
        states.append(_round(states[-1], r))
    return states


def hash_10(input_10):
    """Fixed-length hashing: capacity initialized to 1, one permutation,
    digest = first 5 state elements."""
    assert len(input_10) == RATE
    state = list(input_10) + [1] * CAPACITY
    return permutation(state)[:DIGEST_LEN]


def hash_pair(left, right):
    assert len(left) == DIGEST_LEN and len(right) == DIGEST_LEN
    return hash_10(list(left) + list(right))


def hash_varlen(elements):
    sponge = Tip5Sponge()
    sponge.pad_and_absorb_all(elements)
    return sponge.squeeze()[:DIGEST_LEN]


class Tip5Sponge:
    """Overwrite-mode sponge over the Tip5 permutation (variable-length
    flavor: state starts all-zero; padding = 1 then 0s to a RATE multiple)."""

    def __init__(self):
        self.state = [0] * STATE_SIZE

    def absorb(self, chunk):
        assert len(chunk) == RATE
        self.state[:RATE] = [c % P for c in chunk]
        self.state = permutation(self.state)

    def pad_and_absorb_all(self, elements):
        elements = list(elements)
        if len(elements) >= 3 * RATE:
            # C fast path (native/vm_core.cpp tvm_tip5_pad_absorb):
            # the Fiat-Shamir transcript absorbs every proof item, ~25k
            # permutations for a 2^16 proof — Python permutation cost
            # dominated the prover's serialization tail. Bit-identical
            # (same constants; pinned by tests/test_tip5.py).
            from ..vm.native import tip5_pad_absorb_native

            out = tip5_pad_absorb_native(self.state, elements)
            if out is not None:
                self.state = out
                return
        elements.append(1)
        while len(elements) % RATE:
            elements.append(0)
        for i in range(0, len(elements), RATE):
            self.absorb(elements[i:i + RATE])

    def squeeze(self):
        out = self.state[:RATE]
        log = getattr(self, "squeeze_log", None)
        if log is not None:
            log.append(("squeeze", list(out)))
        self.state = permutation(self.state)
        return out

    # ---------------------------------------------------- FS sampling
    def sample_scalars(self, n: int):
        """n XFEs; squeezes ceil(3n/RATE) times, consumes 3 BFEs per XFE
        (twenty-first `Sponge::sample_scalars` semantics)."""
        num_elements = 3 * n
        elements = []
        while len(elements) < num_elements:
            elements.extend(self.squeeze())
        return [tuple(elements[3 * i: 3 * i + 3]) for i in range(n)]

    def sample_indices(self, upper_bound: int, n: int):
        """n indices below the power-of-2 upper_bound. Squeezed elements
        equal to p-1 are rejected; otherwise index = low bits of the
        canonical value (twenty-first `Sponge::sample_indices`)."""
        assert upper_bound & (upper_bound - 1) == 0
        indices = []
        pending = []
        while len(indices) < n:
            if not pending:
                pending = list(self.squeeze())
            element = pending.pop(0)
            if element != P - 1:
                indices.append((element & 0xFFFFFFFF) % upper_bound)
        return indices
