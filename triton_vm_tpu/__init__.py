"""tpu-triton-vm: a TPU-native Triton VM zk-STARK proof system in JAX.

Public API mirrors the reference `triton_vm::prelude`
(/root/reference/triton-vm/src/prelude.rs) and `triton_vm::lib`
(prove_program / prove / verify, lib.rs:228-297).
"""

from .utils import jaxcfg as _jaxcfg

_jaxcfg.setup()

from .isa.program import Program, triton_asm, triton_program  # noqa: E402
from .ldt.fri import Fri, FriParameters  # noqa: E402
from .ldt.stir import Stir, StirParameters  # noqa: E402
from .utils import profiler  # noqa: E402
from .stark.proof_stream import Claim, Proof  # noqa: E402
from .stark.prover import (Prover, ProvingError, Stark,  # noqa: E402
                           VerificationError, Verifier)
from .vm.machine import (VM, NonDeterminism, PublicInput,  # noqa: E402
                         VMError, VMState)


def prove_program(program, public_input=None, non_determinism=None,
                  seed=None):
    """Execute `program`, prove correct execution, and pre-verify.

    Returns (stark, claim, proof) like the reference's `prove_program`
    (lib.rs:228-267)."""
    if public_input is None:
        public_input = PublicInput()
    elif not isinstance(public_input, PublicInput):
        public_input = PublicInput(list(public_input))
    non_determinism = non_determinism or NonDeterminism()
    from .vm.machine import VM

    aet, public_output = VM.trace_execution(program, public_input,
                                            non_determinism)
    claim = (Claim.about_program(program)
             .with_input(public_input.individual_tokens)
             .with_output(public_output))
    stark = Stark()
    proof = stark.prove(claim, aet, seed=seed)
    return stark, claim, proof


def prove(stark, claim, program, non_determinism=None, seed=None):
    """Like the reference's `prove` (lib.rs:270-283)."""
    non_determinism = non_determinism or NonDeterminism()
    aet, public_output = VM.trace_execution(
        program, PublicInput(claim.input), non_determinism)
    if list(public_output) != list(claim.output):
        raise ProvingError("public output does not match claim")
    return stark.prove(claim, aet, seed=seed)


def verify(stark, claim, proof) -> bool:
    """Like the reference's `verify` (lib.rs:286-297)."""
    try:
        return bool(stark.verify(claim, proof))
    except Exception:
        return False
