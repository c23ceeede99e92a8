"""Full spin-2^16 prove on the real TPU with per-suboperation timers."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.ldt import fri as fri_mod  # noqa: E402
from triton_vm_tpu.crypto import merkle as merkle_mod  # noqa: E402
from triton_vm_tpu.stark.proof_stream import Claim, ProofStream  # noqa
from triton_vm_tpu.stark.prover import Stark  # noqa: E402
from triton_vm_tpu.stark import prover as pr  # noqa: E402
from triton_vm_tpu.vm.machine import VM, PublicInput  # noqa: E402
from triton_vm_tpu.models import example_programs as ex  # noqa: E402

acc = {}


def wrap(obj, name, key):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        acc[key] = acc.get(key, 0.0) + time.time() - t0
        return out

    setattr(obj, name, timed)


wrap(fri_mod, "_fold_device", "fri_fold")
wrap(merkle_mod.MerkleTree, "__init__", "tree_build")
wrap(merkle_mod.MerkleTree, "from_flat", "tree_from_flat")
wrap(merkle_mod.MerkleTree, "root", "tree_root")
wrap(merkle_mod.MerkleTree, "authentication_structure", "auth")
wrap(fri_mod.Fri, "_reveal", "fri_reveal")
wrap(fri_mod.Fri, "prove", "fri_prove_total")

program, iterations = ex.spin(16)
aet, output = VM.trace_execution(program, PublicInput([iterations]))
claim = (Claim.about_program(program).with_input([iterations])
         .with_output(output))
stark = Stark()
for it in range(2):
    acc.clear()
    t0 = time.time()
    proof = stark.prove(claim, aet, seed=bytes(range(32)))
    total = time.time() - t0
    print(f"iter{it} total {total:.1f}s:",
          {k: round(v, 2) for k, v in sorted(acc.items(),
                                             key=lambda kv: -kv[1])},
          flush=True)
