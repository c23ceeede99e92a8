"""Programs: address-resolved instruction streams with attestation digests.

Mirrors /root/reference/triton-isa/src/program.rs:41-416: label resolution
(labels map to b-word addresses), `to_bwords` encoding (opcode, then the
argument word for size-2 instructions), and `hash()` =
Tip5::hash_varlen(to_bwords) (program.rs:399, deliberately NOT
BFieldCodec-encoded so no length prefix).
"""

from __future__ import annotations

from ..crypto import tip5
from .instruction import (
    AssertionContext,
    Breakpoint,
    CallTarget,
    Instruction,
    Label,
    TypeHint,
)
from . import parser


class Program:
    def __init__(self, labelled_instructions):
        # first pass: label -> address
        label_to_address = {}
        address = 0
        for item in labelled_instructions:
            if isinstance(item, Label):
                if item.name in label_to_address:
                    raise parser.ParseError(f"duplicate label {item.name!r}")
                label_to_address[item.name] = address
            elif isinstance(item, (Instruction, CallTarget)):
                address += 2 if isinstance(item, CallTarget) else item.size()
        # second pass: resolve calls, collect debug info
        self.instructions: list[Instruction] = []
        self.address_to_label = {v: k for k, v in label_to_address.items()}
        self.breakpoints: set[int] = set()
        self.type_hints: dict[int, list[TypeHint]] = {}
        self.assertion_contexts: dict[int, AssertionContext] = {}
        address = 0
        for item in labelled_instructions:
            if isinstance(item, Label):
                continue
            if isinstance(item, Breakpoint):
                self.breakpoints.add(address)
                continue
            if isinstance(item, TypeHint):
                self.type_hints.setdefault(address, []).append(item)
                continue
            if isinstance(item, AssertionContext):
                self.assertion_contexts[max(0, address - 1)] = item
                continue
            if isinstance(item, CallTarget):
                if item.label not in label_to_address:
                    raise parser.ParseError(f"undefined label {item.label!r}")
                item = Instruction("call", label_to_address[item.label])
            self.instructions.append(item)
            address += item.size()

        # address -> instruction map for the VM's fetch
        self._by_address = {}
        addr = 0
        for ins in self.instructions:
            self._by_address[addr] = ins
            addr += ins.size()
        self._len_bwords = addr

    @classmethod
    def from_code(cls, code: str) -> "Program":
        return cls(parser.parse(code))

    def len_bwords(self) -> int:
        return self._len_bwords

    def to_bwords(self) -> list[int]:
        out = []
        for ins in self.instructions:
            out.extend(ins.to_bwords())
        return out

    def hash(self) -> tuple:
        """Program attestation digest (program.rs:399)."""
        return tuple(tip5.hash_varlen(self.to_bwords()))

    def instruction_at(self, address: int):
        return self._by_address.get(address)

    def __len__(self):
        return len(self.instructions)

    def __str__(self):
        lines = []
        addr = 0
        for ins in self.instructions:
            if addr in self.address_to_label:
                lines.append(f"{self.address_to_label[addr]}:")
            lines.append(str(ins))
            addr += ins.size()
        return "\n".join(lines)


def triton_program(code: str) -> Program:
    """Convenience mirroring the reference's `triton_program!` macro."""
    return Program.from_code(code)


def triton_asm(code: str) -> list:
    """Convenience mirroring `triton_asm!`: parsed labelled instructions."""
    return parser.parse(code)
