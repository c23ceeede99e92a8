"""BFieldCodec + proof-item/stream roundtrips and malformed-input
rejection (reference test model: proof_item.rs / proof_stream.rs unit
tests)."""

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.stark.proof_item import ITEM_SPECS, ProofItem
from triton_vm_tpu.stark.proof_stream import Claim, Proof, ProofStream

rng = np.random.default_rng(9)


def _xfe():
    return tuple(int(x) for x in rng.integers(0, P, 3, dtype=np.uint64))


def _digest():
    return tuple(int(x) for x in rng.integers(0, P, 5, dtype=np.uint64))


def _sample_item(variant):
    if variant == "MerkleRoot":
        return _digest()
    if variant == "Log2PaddedHeight":
        return 10
    if variant in ("OutOfDomainMainRow", "OutOfDomainAuxRow"):
        n = 379 if variant == "OutOfDomainMainRow" else 91
        return [_xfe() for _ in range(n)]
    if variant == "OutOfDomainQuotientSegments":
        return [_xfe() for _ in range(4)]
    if variant == "AuthenticationStructure":
        return [_digest() for _ in range(7)]
    if variant == "MasterMainTableRows":
        return [[int(x) for x in rng.integers(0, P, 379, dtype=np.uint64)]
                for _ in range(3)]
    if variant == "MasterAuxTableRows":
        return [[_xfe() for _ in range(91)] for _ in range(3)]
    if variant == "QuotientSegmentsElements":
        return [[_xfe() for _ in range(5)] for _ in range(3)]
    if variant == "FriCodeword":
        return [_xfe() for _ in range(8)]
    if variant == "FriPolynomial" or variant == "Polynomial":
        return [_xfe() for _ in range(5)]
    if variant == "FriResponse":
        return {"queried_leaves": [_xfe() for _ in range(4)],
                "auth_structure": [_digest() for _ in range(3)]}
    if variant == "StirOutOfDomainValues":
        return [_xfe() for _ in range(2)]
    if variant == "StirResponse":
        return {"queried_leaves": [[_xfe() for _ in range(4)]
                                   for _ in range(3)],
                "auth_structure": [_digest() for _ in range(3)]}
    return None


@pytest.mark.parametrize("variant", sorted(ITEM_SPECS))
def test_proof_item_roundtrip(variant):
    value = _sample_item(variant)
    if value is None:
        pytest.skip(f"no sample generator for {variant}")
    item = ProofItem(variant, value)
    words = item.encode()
    decoded, pos = ProofItem.decode(words)
    assert pos == len(words)
    assert decoded.variant == variant
    assert decoded.expect(variant) == item.payload


def test_proof_stream_roundtrip_preserves_items():
    ps = ProofStream()
    ps.enqueue(ProofItem("Log2PaddedHeight", 8))
    ps.enqueue(ProofItem("MerkleRoot", _digest()))
    ps.enqueue(ProofItem("FriCodeword", [_xfe() for _ in range(4)]))
    words = ps.encode()
    ps2 = ProofStream.decode(words)
    assert ps2.dequeue().expect("Log2PaddedHeight") == 8
    root = ps2.dequeue().expect("MerkleRoot")
    assert isinstance(root, tuple) and len(root) == 5
    cw = ps2.dequeue().expect("FriCodeword")
    assert len(cw) == 4


def test_proof_stream_decode_rejects_garbage():
    with pytest.raises(Exception):
        ProofStream.decode([999999])  # bogus discriminant / length
    with pytest.raises(Exception):
        ProofStream.decode([])


def test_claim_roundtrips_through_encode():
    claim = (Claim(program_digest=_digest())
             .with_input([1, 2, 3]).with_output([4]))
    words = claim.encode()
    assert all(0 <= w < P for w in words)
    # version word present (Claim v6, proof.rs:95-127)
    assert 6 in [int(w) for w in words]


def test_proof_padded_height_recovery():
    ps = ProofStream()
    ps.enqueue(ProofItem("Log2PaddedHeight", 9))
    proof = ps.to_proof()
    assert proof.padded_height() == 512
