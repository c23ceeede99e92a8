"""Proof-size report: FRI vs STIR x proven/conjectured x padded heights,
mirroring the reference's benches/proof_size.rs:31-50.

Usage: python scripts/proof_size.py [max_log2]  (default 11)
Writes a markdown table to stdout; runs on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from triton_vm_tpu.models import example_programs as ex
    from triton_vm_tpu.stark.proof_stream import Claim
    from triton_vm_tpu.stark.prover import Prover, Stark
    from triton_vm_tpu.vm.machine import VM, PublicInput

    max_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    rows = []
    for log2_ph in range(8, max_log2 + 1):
        program, iterations = ex.spin(log2_ph)
        aet, output = VM.trace_execution(program, PublicInput([iterations]))
        claim = (Claim.about_program(program)
                 .with_input([iterations]).with_output(output))
        actual = aet.padded_height()
        for ldt in ("fri", "stir"):
            for regime in ("proven", "conjectured"):
                stark = Stark(ldt_choice=ldt, soundness=regime)
                proof = Prover(stark, seed=bytes(32)).prove(claim, aet)
                kib = len(proof.words) * 8 / 1024
                rows.append((actual, ldt, regime, kib))
                print(f"| 2^{actual.bit_length() - 1} | {ldt} | {regime} "
                      f"| {kib:.1f} KiB |", flush=True)
    print()
    print("| padded height | LDT | regime | proof size |")
    print("|---|---|---|---|")
    for actual, ldt, regime, kib in rows:
        print(f"| 2^{actual.bit_length() - 1} | {ldt} | {regime} "
              f"| {kib:.1f} KiB |")


if __name__ == "__main__":
    main()
