"""Typed error hierarchy, mirroring the reference's error taxonomy.

Sources: /root/reference/triton-vm/src/error.rs:53-238 (domain, proof
stream, low-degree test, proving, verification errors) and
/root/reference/triton-isa/src/instruction.rs:867-945 (instruction
errors and assertion context).

Every error type is a distinct class so callers can match on the exact
failure — the reference's tests pattern-match enum variants; ours use
``isinstance`` / ``pytest.raises`` the same way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


class TritonError(Exception):
    """Root of the library's error hierarchy."""


# ------------------------------------------------------------ instruction

@dataclass
class AssertionFailure:
    """instruction.rs:917-939 `AssertionError`: context of a failed
    `assert`/`assert_vector`, including the user-defined error id."""

    expected: int
    actual: int
    id: Optional[int] = None

    def __str__(self):
        prefix = f"[{self.id}] " if self.id is not None else ""
        return f"{prefix}expected {self.expected}, got {self.actual}"


class InstructionError(TritonError):
    """instruction.rs:867-915."""


class InvalidOpcode(InstructionError):
    pass


class IllegalArgument(InstructionError):
    pass


class InstructionPointerOverflow(InstructionError):
    pass


class JumpStackIsEmpty(InstructionError):
    pass


class AssertionFailed(InstructionError):
    def __init__(self, failure: AssertionFailure):
        super().__init__(f"assertion failed: {failure}")
        self.failure = failure


class VectorAssertionFailed(InstructionError):
    def __init__(self, index: int, failure: AssertionFailure):
        super().__init__(
            f"vector assertion failed because stack[{index}] != "
            f"stack[{index + 5}]: {failure}")
        self.index = index
        self.failure = failure


class InverseOfZero(InstructionError):
    pass


class DivisionByZero(InstructionError):
    pass


class SpongeNotInitialized(InstructionError):
    pass


class LogarithmOfZero(InstructionError):
    pass


class EmptyPublicInput(InstructionError):
    pass


class EmptySecretInput(InstructionError):
    pass


class EmptySecretDigestInput(InstructionError):
    pass


class MachineHalted(InstructionError):
    pass


class OpStackTooShallow(InstructionError):
    """op_stack.rs `OpStackError::TooShallow`."""


class FailedU32Conversion(InstructionError):
    """op_stack.rs `OpStackError::FailedU32Conversion`."""


# --------------------------------------------------------------- domains

class ArithmeticDomainError(TritonError):
    """error.rs:53-60."""


# ----------------------------------------------------------- proof stream

class ProofStreamError(TritonError):
    """error.rs:63-84."""


class EmptyQueue(ProofStreamError):
    pass


class UnexpectedItem(ProofStreamError):
    def __init__(self, expected: str, got: str):
        super().__init__(f"expected {expected}, got {got}")
        self.expected = expected
        self.got = got


class NoLog2PaddedHeight(ProofStreamError):
    pass


class TooManyLog2PaddedHeights(ProofStreamError):
    pass


# -------------------------------------------------------- low-degree test

class LdtParameterError(TritonError):
    """error.rs:87-109."""


class LdtProvingError(TritonError):
    """error.rs:112-122."""


class LdtVerificationError(TritonError):
    """error.rs:125-150."""


class BadMerkleAuthenticationPath(LdtVerificationError):
    pass


class LastCodewordMismatch(LdtVerificationError):
    pass


class LastPolynomialDegreeTooHigh(LdtVerificationError):
    pass


# ----------------------------------------------------------------- prover

class ProvingError(TritonError):
    """error.rs:153-187."""


class ProgramDigestMismatch(ProvingError):
    pass


class PublicOutputMismatch(ProvingError):
    pass


class TableRowConversionError(ProvingError):
    pass


class ZeroKnowledgeViolation(ProvingError):
    pass


# --------------------------------------------------------------- verifier

class VerificationError(TritonError):
    """error.rs:190-238."""


class Log2PaddedHeightTooLarge(VerificationError):
    pass


class OutOfDomainQuotientValueMismatch(VerificationError):
    pass


class MainCodewordAuthenticationFailure(VerificationError):
    pass


class AuxiliaryCodewordAuthenticationFailure(VerificationError):
    pass


class QuotientCodewordAuthenticationFailure(VerificationError):
    pass


class CombinationCodewordMismatch(VerificationError):
    pass
