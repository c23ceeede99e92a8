"""Recursive-verifier workload: STARK verification inside the VM.

BASELINE config 5 (reference cost anchor:
specification/src/arithmetization-overview.md:92-99 — static AIR
evaluation 33,998 processor rows)."""

import pytest

from triton_vm_tpu.models import example_programs as ex
from triton_vm_tpu.models import recursive_verifier as rv
from triton_vm_tpu.stark.proof_stream import Claim
from triton_vm_tpu.stark.prover import Stark
from triton_vm_tpu.vm.machine import (VM, NonDeterminism, PublicInput,
                                      VMError)


@pytest.fixture(scope="module")
def proven():
    program = ex.fibonacci()
    aet, output = VM.trace_execution(program, PublicInput([7]))
    claim = (Claim.about_program(program)
             .with_input([7]).with_output(output))
    stark = Stark()
    proof = stark.prove(claim, aet, seed=bytes(range(32)))
    return claim, proof, stark


@pytest.mark.slow
def test_verifier_core_accepts_and_hits_spec_anchor(proven):
    claim, proof, stark = proven
    r = rv.build(claim, proof, stark, num_queries=2)
    air = r.run("air_eval")
    # the spec's static-evaluator anchor is 33,998 processor rows; ours
    # generates from the same constraint set and lands within a handful
    # of cycles (call/halt framing)
    assert abs(air["cycles"] - r.anchors[
        "spec_static_air_eval_processor_rows"]) < 200
    assert r.run("fs_replay")["cycles"] > 0
    assert r.run("ood_check")["cycles"] > 0
    assert r.run("queries")["cycles"] > 0
    combined = r.run("combined")
    assert combined["cycles"] > air["cycles"]


@pytest.mark.slow
def test_verifier_core_rejects_tampered_reveal(proven):
    claim, proof, stark = proven
    r = rv.build(claim, proof, stark, num_queries=1)
    # flip one word of the revealed main row in RAM: the in-VM Merkle
    # walk must fail its root assertion
    ram = dict(r.non_determinism.ram)
    addr = rv._q_main(0) + 7
    ram[addr] = (ram.get(addr, 0) + 1) % rv.P
    nd = NonDeterminism(ram=ram, digests=list(r.non_determinism.digests))
    with pytest.raises(VMError):
        VM.trace_execution(r.programs["queries"], PublicInput([]), nd)
