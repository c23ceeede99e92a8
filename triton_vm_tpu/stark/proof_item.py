"""Typed proof items with Fiat-Shamir inclusion rules.

Mirrors /root/reference/triton-vm/src/proof_item.rs:96-147: 13 item
variants; the first 7 are absorbed into the Fiat-Shamir transcript, the
rest are covered by earlier commitments (see the reference's soundness
notes).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import codec

NUM_MAIN_COLUMNS = 379
NUM_AUX_COLUMNS = 91
NUM_QUOTIENT_SEGMENTS = 4
NUM_RANDOMIZED_QUOTIENT_SEGMENTS = 5

# variant name -> (discriminant, payload shape, include_in_fiat_shamir)
ITEM_SPECS = {
    "MerkleRoot": (0, "digest", True),
    "Log2PaddedHeight": (1, "u32", True),
    "OutOfDomainMainRow": (2, ("arr", NUM_MAIN_COLUMNS, "xfe"), True),
    "OutOfDomainAuxRow": (3, ("arr", NUM_AUX_COLUMNS, "xfe"), True),
    "OutOfDomainQuotientSegments": (
        4, ("arr", NUM_QUOTIENT_SEGMENTS, "xfe"), True),
    "Polynomial": (5, ("vec", "xfe"), True),
    "StirOutOfDomainValues": (6, ("vec", "xfe"), True),
    "AuthenticationStructure": (7, ("vec", "digest"), False),
    "MasterMainTableRows": (8, ("vec", ("arr", NUM_MAIN_COLUMNS, "bfe")), False),
    "MasterAuxTableRows": (9, ("vec", ("arr", NUM_AUX_COLUMNS, "xfe")), False),
    "QuotientSegmentsElements": (
        10, ("vec", ("arr", NUM_RANDOMIZED_QUOTIENT_SEGMENTS, "xfe")), False),
    "FriCodeword": (11, ("vec", "xfe"), False),
    "FriResponse": (12, ("struct", [("queried_leaves", ("vec", "xfe")),
                                    ("auth_structure", ("vec", "digest"))]),
                    False),
    # stir.rs:150-169: revealed k-element leaf stacks + auth structure
    "StirResponse": (13, ("struct", [("queried_leaves",
                                      ("vec", ("vec", "xfe"))),
                                     ("auth_structure", ("vec", "digest"))]),
                     False),
}

_BY_DISCRIMINANT = {spec[0]: (name, spec[1], spec[2])
                    for name, spec in ITEM_SPECS.items()}


@dataclass
class ProofItem:
    variant: str
    payload: object

    def include_in_fiat_shamir_heuristic(self) -> bool:
        return ITEM_SPECS[self.variant][2]

    def encode(self) -> list[int]:
        disc, shape, _ = ITEM_SPECS[self.variant]
        return [disc] + codec.encode(self.payload, shape)

    @classmethod
    def decode(cls, words, pos=0):
        codec._check(words, pos, 1)
        disc = words[pos]
        if disc not in _BY_DISCRIMINANT:
            raise codec.DecodeError(f"unknown proof item discriminant {disc}")
        name, shape, _ = _BY_DISCRIMINANT[disc]
        payload, pos = codec.decode(words, shape, pos + 1)
        return cls(name, payload), pos

    def expect(self, variant: str):
        if self.variant != variant:
            raise codec.DecodeError(
                f"expected {variant}, got {self.variant}")
        return self.payload
