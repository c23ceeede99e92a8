"""Time fri.prove on the real TPU at the 2^16-proof FRI domain (2^18),
broken into commit / last-poly / query sub-phases."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.ldt.fri import Fri, FriParameters  # noqa: E402
from triton_vm_tpu.stark.proof_stream import ProofStream  # noqa: E402
from triton_vm_tpu.ops import gfx  # noqa: E402

rng = np.random.default_rng(12)

# parameters matching a 2^16 proof: expansion 4, domain 2^18
params = FriParameters(security_level=160, log2_initial_expansion_factor=2,
                       log2_high_degree_bound=16)
fri = Fri(params)
print("domain", fri.domain.length, "rounds", fri.num_rounds(),
      "queries", fri.num_collinearity_checks, flush=True)

cw = gfx.from_u64(rng.integers(0, P, (fri.domain.length, 3),
                               dtype=np.uint64))
for it in range(2):
    ps = ProofStream()
    t0 = time.time()
    fri.prove(cw, ps)
    print(f"fri.prove iter{it}: {time.time() - t0:.1f}s", flush=True)
