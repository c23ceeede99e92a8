"""Debug aid: device extension vs cached host fixture (/tmp/extfix.npz)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env

import numpy as np  # noqa: E402

d = np.load("/tmp/extfix.npz")
main, chv, want = d["main"], d["ch"], d["want"]

from triton_vm_tpu.air import columns  # noqa: E402
from triton_vm_tpu.air.challenges import Challenges  # noqa: E402
from triton_vm_tpu.isa.instruction import OPCODE_TO_NAME  # noqa: E402
from triton_vm_tpu.stark.proof_stream import Claim  # noqa: E402
from triton_vm_tpu.tables import extend_device as ed  # noqa: E402

claim = Claim(program_digest=(0, 0, 0, 0, 0))
challenges = Challenges([tuple(int(c) for c in row) for row in chv], claim)
h = main.shape[0]
got = ed.extend_all_device(main, challenges)
A = columns.aux_index
M = columns.main_index
nbad = 0
for table in ("program", "processor", "op_stack", "ram", "jump_stack",
              "hash", "cascade", "lookup", "u32"):
    for name in columns.AUX_COLUMNS[table]:
        idx = A(table, name)
        w, g = want[:, idx, :], got[:, idx, :]
        bad = np.nonzero((w != g).any(axis=1))[0]
        if len(bad):
            nbad += 1
            i = int(bad[0])
            print(f"{table}.{name}: {len(bad)} bad, first at {i}")
            if table == "processor":
                print("  prev instr:", OPCODE_TO_NAME.get(
                    int(main[i - 1, M('processor', 'CI')])))
print("columns with mismatch:", nbad)
