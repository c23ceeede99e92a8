"""End-to-end: prove and verify a Triton VM execution."""

import pytest

from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.stark.proof_stream import Claim, Proof
from triton_vm_tpu.stark.prover import Stark, VerificationError
from triton_vm_tpu.vm.machine import VM, PublicInput

SEED = bytes(range(32))


@pytest.mark.slow
def test_prove_and_verify_fibonacci():
    program = ex.fibonacci()
    public_input = PublicInput([7])
    aet, output = VM.trace_execution(program, public_input)
    claim = Claim.about_program(program).with_input([7]).with_output(output)

    stark = Stark()
    proof = stark.prove(claim, aet, seed=SEED)
    assert stark.verify(claim, proof)

    # proof is a plain word list; serialization round trip
    reloaded = Proof(list(proof.words))
    assert reloaded.padded_height() == aet.padded_height()
    assert stark.verify(claim, reloaded)

    # tampered claim fails
    bad_claim = Claim.about_program(program).with_input([7]).with_output(
        [(output[0] + 1)])
    with pytest.raises(VerificationError):
        stark.verify(bad_claim, proof)

    # tampered proof word fails
    bad = list(proof.words)
    bad[len(bad) // 2] = (bad[len(bad) // 2] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(Exception):
        stark.verify(claim, Proof(bad))


@pytest.mark.slow
def test_pinned_transcript_regression():
    """Self-pinned full-proof Tip5 digest under a fixed seed: any silent
    Fiat-Shamir / codec / table-fill transcript drift fails here (mirrors
    the reference's derandomized-proof pin, stark.rs:2434-2460). Update
    the constant only for a deliberate, root-caused transcript change."""
    from triton_vm_tpu.crypto import tip5

    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([10]))
    claim = Claim.about_program(program).with_input([10]).with_output(output)
    proof = Stark().prove(claim, aet, seed=SEED)
    w = proof.words
    assert tuple(tip5.hash_varlen([len(w) + 1, len(w)] + w)) == (
        7024632114429628424,
        11029959989076809184,
        8246888127736946106,
        15137373578292407606,
        15772038778546270844,
    )


@pytest.mark.slow
def test_prove_and_verify_with_stir_ldt():
    """Full STARK pipeline with STIR as the low-degree test
    (stark.rs LdtChoice::Stir)."""
    import triton_vm_tpu as tvm
    from triton_vm_tpu.models import example_programs as ex

    program = ex.fibonacci()
    aet, output = tvm.VM.trace_execution(program, tvm.PublicInput([7]))
    claim = (tvm.Claim.about_program(program)
             .with_input([7]).with_output(output))
    stark = tvm.Stark(ldt_choice="stir")
    proof = stark.prove(claim, aet, seed=bytes(range(32)))
    assert stark.verify(claim, proof)

    # FRI stark must reject a STIR proof (parameter mismatch)
    fri_stark = tvm.Stark(ldt_choice="fri")
    with pytest.raises(Exception):
        assert not fri_stark.verify(claim, proof)
