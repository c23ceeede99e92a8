"""Decode fuzzing: arbitrary word vectors must never crash the decoder —
they either decode or raise `DecodeError` (reference test model:
proof.rs:193-198 `decoding_arbitrary_proof_data_does_not_panic`,
proof.rs:180-192 `proof_with_multiple_padded_height_gives_err`)."""

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.stark import codec
from triton_vm_tpu.stark.proof_item import ProofItem
from triton_vm_tpu.stark.proof_stream import Proof, ProofStream


@pytest.mark.parametrize("seed", range(40))
def test_decoding_arbitrary_proof_data_does_not_panic(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 1000))
    words = [int(w) for w in rng.integers(0, P, n, dtype=np.uint64)]
    try:
        stream = ProofStream.decode(words)
    except codec.DecodeError:
        return
    # a successful decode must re-encode to *some* valid word vector
    assert all(0 <= w < P for w in stream.encode())


@pytest.mark.parametrize("seed", range(40))
def test_decoding_arbitrary_proof_item_does_not_panic(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(1, 200))
    words = [int(w) for w in rng.integers(0, P, n, dtype=np.uint64)]
    try:
        ProofItem.decode(words)
    except codec.DecodeError:
        pass


@pytest.mark.parametrize("seed", range(20))
def test_small_valued_words_do_not_panic(seed):
    # small integers exercise length-prefix paths much harder than
    # uniform field elements do
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(1, 64))
    words = [int(w) for w in rng.integers(0, 8, n)]
    try:
        ProofStream.decode(words)
    except codec.DecodeError:
        pass


def test_proof_with_multiple_padded_heights_gives_err():
    ps = ProofStream()
    ps.enqueue(ProofItem("Log2PaddedHeight", 8))
    ps.enqueue(ProofItem("MerkleRoot", tuple(range(5))))
    ps.enqueue(ProofItem("Log2PaddedHeight", 7))
    with pytest.raises(codec.DecodeError):
        ps.to_proof().padded_height()


def test_proof_without_padded_height_gives_err():
    ps = ProofStream()
    ps.enqueue(ProofItem("MerkleRoot", tuple(range(5))))
    with pytest.raises(codec.DecodeError):
        ps.to_proof().padded_height()


def test_truncated_valid_proof_raises_decode_error():
    ps = ProofStream()
    ps.enqueue(ProofItem("Log2PaddedHeight", 8))
    ps.enqueue(ProofItem("MerkleRoot", tuple(range(5))))
    words = ps.encode()
    for cut in range(len(words)):
        try:
            ProofStream.decode(words[:cut])
        except codec.DecodeError:
            pass


def test_corrupted_valid_proof_never_crashes():
    ps = ProofStream()
    ps.enqueue(ProofItem("Log2PaddedHeight", 8))
    ps.enqueue(ProofItem("FriCodeword", [(1, 2, 3)] * 4))
    words = ps.encode()
    for i in range(len(words)):
        for delta in (1, P - 1, 7):
            bad = list(words)
            bad[i] = (bad[i] + delta) % P
            try:
                ProofStream.decode(bad)
            except codec.DecodeError:
                pass
