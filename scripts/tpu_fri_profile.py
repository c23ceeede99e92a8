"""Instrument fri.prove's sub-operations on the real TPU (warm pass)."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.ldt import fri as fri_mod  # noqa: E402
from triton_vm_tpu.crypto import merkle as merkle_mod  # noqa: E402
from triton_vm_tpu.ldt.fri import Fri, FriParameters  # noqa: E402
from triton_vm_tpu.stark.proof_stream import ProofStream  # noqa: E402
from triton_vm_tpu.ops import gfx  # noqa: E402

rng = np.random.default_rng(12)
params = FriParameters(security_level=160, log2_initial_expansion_factor=2,
                       log2_high_degree_bound=16)
fri = Fri(params)

acc = {}


def wrap(obj, name, key):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        acc[key] = acc.get(key, 0.0) + time.time() - t0
        return out

    setattr(obj, name, timed)


wrap(fri_mod, "_fold_device", "fold")
wrap(fri_mod, "_intt_full", "intt_full")
wrap(merkle_mod.MerkleTree, "__init__", "tree_build")
wrap(merkle_mod.MerkleTree, "root", "tree_root")
wrap(merkle_mod.MerkleTree, "authentication_structure", "auth")
wrap(ProofStream, "enqueue", "fs_enqueue")
wrap(ProofStream, "sample_indices", "fs_indices")
wrap(ProofStream, "sample_scalars", "fs_scalars")
wrap(fri_mod.Fri, "_reveal", "reveal")

cw = gfx.from_u64(rng.integers(0, P, (fri.domain.length, 3),
                               dtype=np.uint64))

if "ballast" in sys.argv[1:]:
    # ~5.7 GB of live HBM, mimicking the prover's committed codewords
    from triton_vm_tpu.ops import gf
    ballast = [gf.from_u64(rng.integers(0, P, (379, 1 << 19),
                                        dtype=np.uint64)),
               gf.from_u64(rng.integers(0, P, (379, 1 << 19),
                                        dtype=np.uint64))]

for it in range(2):
    acc.clear()
    ps = ProofStream()
    t0 = time.time()
    fri.prove(cw, ps)
    total = time.time() - t0
    print(f"iter{it} total {total:.1f}s:",
          {k: round(v, 2) for k, v in sorted(acc.items(),
                                             key=lambda kv: -kv[1])},
          flush=True)
