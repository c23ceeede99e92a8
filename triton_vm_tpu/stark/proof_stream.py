"""Fiat-Shamir proof stream over the Tip5 sponge.

Mirrors /root/reference/triton-vm/src/proof_stream.rs:9-104 and
proof.rs:33-126 (Claim, Proof).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..crypto import tip5
from . import codec
from .proof_item import ProofItem

CLAIM_SHAPE = ("struct", [
    ("program_digest", "digest"),
    ("version", "u32"),
    ("input", ("vec", "bfe")),
    ("output", ("vec", "bfe")),
])

CURRENT_VERSION = 6  # proof.rs: Claim::CURRENT_VERSION


@dataclass
class Claim:
    program_digest: tuple
    input: list = field(default_factory=list)
    output: list = field(default_factory=list)
    version: int = CURRENT_VERSION

    def encode(self):
        return codec.encode(
            {"program_digest": self.program_digest, "version": self.version,
             "input": list(self.input), "output": list(self.output)},
            CLAIM_SHAPE)

    @classmethod
    def about_program(cls, program):
        return cls(program_digest=program.hash())

    def with_input(self, inp):
        self.input = list(inp)
        return self

    def with_output(self, out):
        self.output = list(out)
        return self


@dataclass
class Proof:
    words: list[int]

    def padded_height(self) -> int:
        """Recover the unique Log2PaddedHeight item (proof.rs:45-59)."""
        stream = ProofStream.decode(self.words)
        heights = [item.payload for item in stream.items
                   if item.variant == "Log2PaddedHeight"]
        if len(heights) != 1:
            raise codec.DecodeError("proof must contain exactly one height")
        return 1 << heights[0]


class ProofStream:
    def __init__(self):
        self.items: list[ProofItem] = []
        self.items_index = 0
        self.sponge = tip5.Tip5Sponge()
        self.fs_events = None

    def enable_fs_recording(self) -> list:
        """Record the Fiat-Shamir event stream: ("absorb", padded_words)
        and ("squeeze", outputs) tuples in occurrence order. Consumed by
        models/recursive_verifier.py to replay the transcript in-VM."""
        self.fs_events = []
        self.sponge.squeeze_log = self.fs_events
        return self.fs_events

    def alter_fiat_shamir_state_with(self, encoded_words):
        if self.fs_events is not None:
            padded = [int(w) for w in encoded_words] + [1]
            padded += [0] * (-len(padded) % tip5.RATE)
            self.fs_events.append(("absorb", padded))
        self.sponge.pad_and_absorb_all(encoded_words)

    def enqueue(self, item: ProofItem):
        if item.include_in_fiat_shamir_heuristic():
            self.alter_fiat_shamir_state_with(item.encode())
        self.items.append(item)

    def dequeue(self) -> ProofItem:
        if self.items_index >= len(self.items):
            raise codec.DecodeError("proof stream: empty queue")
        item = self.items[self.items_index]
        if item.include_in_fiat_shamir_heuristic():
            self.alter_fiat_shamir_state_with(item.encode())
        self.items_index += 1
        return item

    def is_exhausted(self) -> bool:
        return self.items_index >= len(self.items)

    def sample_indices(self, upper_bound: int, num: int) -> list[int]:
        return self.sponge.sample_indices(upper_bound, num)

    def sample_scalars(self, num: int) -> list[tuple]:
        return self.sponge.sample_scalars(num)

    # --------------------------------------------------------- serialization

    def encode(self) -> list[int]:
        """struct ProofStream { items: Vec<ProofItem> } (dynamic field)."""
        vec_enc = [len(self.items)]
        for item in self.items:
            item_enc = item.encode()
            if codec._vec_item_prefix():
                vec_enc.append(len(item_enc))
            vec_enc.extend(item_enc)
        if codec._struct_prefix():
            return [len(vec_enc)] + vec_enc
        return vec_enc

    def to_proof(self) -> Proof:
        return Proof(self.encode())

    @classmethod
    def decode(cls, words) -> "ProofStream":
        stream = cls()
        if not words:
            raise codec.DecodeError("empty proof")
        declared = words[0]
        if declared != len(words) - 1:
            raise codec.DecodeError("wrong outer length")
        pos = 1
        codec._check(words, pos, 1)
        n = words[pos]
        pos += 1
        for _ in range(n):
            codec._check(words, pos, 1)
            item_len = words[pos]
            pos += 1
            item, new_pos = ProofItem.decode(words, pos)
            if new_pos - pos != item_len:
                raise codec.DecodeError("wrong declared item length")
            pos = new_pos
            stream.items.append(item)
        if pos != len(words):
            raise codec.DecodeError("trailing garbage in proof")
        return stream
