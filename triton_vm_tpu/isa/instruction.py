"""The Triton VM instruction set: 46 instructions, fixed opcodes.

Opcode table, argument kinds, sizes, stack influence and u32 classification
mirror /root/reference/triton-isa/src/instruction.rs:247-570 exactly (the
opcodes are protocol constants: they are wired into the processor AIR's
instruction bit decomposition IB0-IB6).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..fields.bfe import P

# name -> (opcode, arg_kind, stack_influence, is_u32)
# arg_kind: None | 'bfe' (Push/AddI) | 'num_words' (1-5) | 'stack_elem'
# (0-15) | 'call' (label/address)
_SPEC = {
    "pop":               (3,  "num_words",  None, False),
    "push":              (1,  "bfe",        +1,   False),
    "divine":            (9,  "num_words",  None, False),
    "pick":              (17, "stack_elem", 0,    False),
    "place":             (25, "stack_elem", 0,    False),
    "dup":               (33, "stack_elem", +1,   False),
    "swap":              (41, "stack_elem", 0,    False),
    "halt":              (0,  None,         0,    False),
    "nop":               (8,  None,         0,    False),
    "skiz":              (2,  None,         -1,   False),
    "call":              (49, "call",       0,    False),
    "return":            (16, None,         0,    False),
    "recurse":           (24, None,         0,    False),
    "recurse_or_return": (32, None,         0,    False),
    "assert":            (10, None,         -1,   False),
    "read_mem":          (57, "num_words",  None, False),
    "write_mem":         (11, "num_words",  None, False),
    "hash":              (18, None,         -5,   False),
    "assert_vector":     (26, None,         -5,   False),
    "sponge_init":       (40, None,         0,    False),
    "sponge_absorb":     (34, None,         -10,  False),
    "sponge_absorb_mem": (48, None,         0,    False),
    "sponge_squeeze":    (56, None,         +10,  False),
    "add":               (42, None,         -1,   False),
    "addi":              (65, "bfe",        0,    False),
    "mul":               (50, None,         -1,   False),
    "invert":            (64, None,         0,    False),
    "eq":                (58, None,         -1,   False),
    "split":             (4,  None,         +1,   True),
    "lt":                (6,  None,         -1,   True),
    "and":               (14, None,         -1,   True),
    "xor":               (22, None,         -1,   True),
    "log_2_floor":       (12, None,         0,    True),
    "pow":               (30, None,         -1,   True),
    "div_mod":           (20, None,         0,    True),
    "pop_count":         (28, None,         0,    True),
    "xx_add":            (66, None,         -3,   False),
    "xx_mul":            (74, None,         -3,   False),
    "x_invert":          (72, None,         0,    False),
    "xb_mul":            (82, None,         -1,   False),
    "read_io":           (73, "num_words",  None, False),
    "write_io":          (19, "num_words",  None, False),
    "merkle_step":       (36, None,         0,    True),
    "merkle_step_mem":   (44, None,         0,    True),
    "b_horner_step":     (80, None,         0,    False),
    "x_horner_step":     (88, None,         0,    False),
}

ALL_INSTRUCTION_NAMES = tuple(_SPEC)
OPCODE_TO_NAME = {spec[0]: name for name, spec in _SPEC.items()}
assert len(OPCODE_TO_NAME) == 46


@dataclass(frozen=True)
class Instruction:
    """One (possibly argumented) Triton instruction."""

    name: str
    arg: Optional[int] = None  # BFE value / num_words / stack index / address

    def __post_init__(self):
        spec = _SPEC.get(self.name)
        if spec is None:
            raise ValueError(f"unknown instruction: {self.name}")
        kind = spec[1]
        if kind is None and self.arg is not None:
            raise ValueError(f"{self.name} takes no argument")
        if kind is not None and self.arg is None:
            raise ValueError(f"{self.name} requires an argument")
        if kind == "num_words" and self.arg not in (1, 2, 3, 4, 5):
            raise ValueError(f"{self.name} arg must be 1..5, got {self.arg}")
        if kind == "stack_elem" and self.arg not in range(16):
            raise ValueError(f"{self.name} arg must be 0..15, got {self.arg}")
        if kind == "bfe":
            object.__setattr__(self, "arg", self.arg % P)

    @property
    def opcode(self) -> int:
        return _SPEC[self.name][0]

    @property
    def arg_kind(self):
        return _SPEC[self.name][1]

    def size(self) -> int:
        """1 or 2 b-field words (instruction.rs:422-433)."""
        return 2 if self.arg_kind is not None else 1

    def op_stack_size_influence(self) -> int:
        inf = _SPEC[self.name][2]
        if inf is not None:
            return inf
        n = self.arg
        if self.name in ("pop", "write_mem", "write_io"):
            return -n
        return n  # divine, read_mem, read_io

    def is_u32_instruction(self) -> bool:
        return _SPEC[self.name][3]

    def ib(self, bit: int) -> int:
        """Instruction bit: (opcode >> bit) & 1 (instruction.rs:436-439)."""
        return (self.opcode >> bit) & 1

    def to_bwords(self) -> list[int]:
        if self.size() == 2:
            return [self.opcode, self.arg % P]
        return [self.opcode]

    def shrinks_op_stack(self) -> bool:
        return self.op_stack_size_influence() < 0

    def __str__(self):
        if self.arg_kind is None:
            return self.name
        return f"{self.name} {self.arg}"


def instruction_from_opcode(opcode: int, arg: Optional[int] = None) -> Instruction:
    name = OPCODE_TO_NAME.get(opcode)
    if name is None:
        raise ValueError(f"invalid opcode: {opcode}")
    return Instruction(name, arg)


# label pseudo-instruction wrappers used by the parser / Program
@dataclass(frozen=True)
class Label:
    name: str


@dataclass(frozen=True)
class CallTarget:
    """`call <label>` before address resolution."""

    label: str


@dataclass(frozen=True)
class TypeHint:
    """Debug aid naming stack regions (instruction.rs:123-138):
    `hint <variable_name>[: <type_name>] = stack[<start>[..<end>]]`."""

    raw: str
    variable_name: str = ""
    type_name: str | None = None
    starting_index: int = 0
    length: int = 1

    @classmethod
    def parse(cls, raw: str) -> "TypeHint":
        import re

        m = re.match(
            r"^hint\s+([a-z_][a-z0-9_]*)\s*(?::\s*([a-zA-Z_][a-zA-Z0-9_]*)"
            r"\s*)?=\s*stack\s*\[\s*(\d+)\s*(?:\.\.\s*(\d+)\s*)?\]$",
            raw.strip())
        if m is None:
            raise ValueError(f"invalid type hint: {raw!r}")
        variable, type_name, start, end = m.groups()
        start = int(start)
        length = (int(end) - start) if end is not None else 1
        if length <= 0:
            raise ValueError(f"type hint range is empty: {raw!r}")
        return cls(raw=raw, variable_name=variable, type_name=type_name,
                   starting_index=start, length=length)


@dataclass(frozen=True)
class Breakpoint:
    pass


@dataclass(frozen=True)
class AssertionContext:
    error_id: int
