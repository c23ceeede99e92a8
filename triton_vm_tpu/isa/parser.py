"""Triton assembly parser.

Covers the grammar of /root/reference/triton-isa/src/parser.rs:107-229:
labels (`name:`), all 47 instructions with their argument forms,
breakpoints (`break`), type hints (`hint name: type = stack[a..b]`), and
assertion error ids (`assert error_id 42` / `assert_vector error_id 7`).
Comments run from `//` to end of line.
"""

from __future__ import annotations

import re

from ..fields.bfe import P
from .instruction import (
    ALL_INSTRUCTION_NAMES,
    AssertionContext,
    Breakpoint,
    CallTarget,
    Instruction,
    Label,
    TypeHint,
    _SPEC,
)

_LABEL_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_.\-]*$")


class ParseError(ValueError):
    pass


def _tokenize(source: str):
    lines = source.split("\n")
    tokens = []
    for line in lines:
        line = line.split("//")[0]
        # keep `hint` lines intact: they contain '=' and brackets
        stripped = line.strip()
        if stripped.startswith("hint "):
            tokens.append(("hint", stripped))
            continue
        for tok in stripped.replace(",", " ").split():
            tokens.append(("tok", tok))
    return tokens


def _parse_int(tok: str) -> int:
    try:
        return int(tok, 0) % P
    except ValueError as e:
        raise ParseError(f"expected an integer, got {tok!r}") from e


def parse(source: str) -> list:
    """Parse assembly into a list of labelled instructions
    (Instruction | Label | CallTarget-carrying Instruction | TypeHint |
    Breakpoint | AssertionContext)."""
    tokens = _tokenize(source)
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        kind, tok = tokens[i]
        i += 1
        if kind == "hint":
            try:
                out.append(TypeHint.parse(tok))
            except ValueError as e:
                raise ParseError(str(e)) from e
            continue
        if tok.endswith(":"):
            name = tok[:-1]
            if not _LABEL_RE.match(name):
                raise ParseError(f"invalid label: {name!r}")
            out.append(Label(name))
            continue
        if tok == "break":
            out.append(Breakpoint())
            continue
        if tok not in ALL_INSTRUCTION_NAMES:
            raise ParseError(f"unknown instruction: {tok!r}")
        arg_kind = _SPEC[tok][1]
        if arg_kind is None:
            out.append(Instruction(tok))
        elif arg_kind == "call":
            if i >= n or tokens[i][0] != "tok":
                raise ParseError("call requires a label")
            dest = tokens[i][1]
            i += 1
            if not _LABEL_RE.match(dest):
                raise ParseError(f"invalid call target: {dest!r}")
            out.append(CallTarget(dest))
        else:
            if i >= n or tokens[i][0] != "tok":
                raise ParseError(f"{tok} requires an argument")
            arg_tok = tokens[i][1]
            i += 1
            if arg_kind == "bfe":
                arg = _parse_int(arg_tok)
            else:
                arg = int(arg_tok, 0)
            out.append(Instruction(tok, arg))
        # optional `error_id N` after assert / assert_vector
        if (tok in ("assert", "assert_vector") and i + 1 < n
                and tokens[i] == ("tok", "error_id")):
            out.append(AssertionContext(int(tokens[i + 1][1], 0)))
            i += 2
    return out
