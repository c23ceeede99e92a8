"""Per-kernel wall-clock on the real TPU at 2^16-proof shapes.

Under axon, block_until_ready does not block; every timing ends in a tiny
host readback to fence (np.asarray of one element still forces the whole
dependency chain).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.ops import gf, gfx, ntt, tip5_kernel  # noqa: E402

rng = np.random.default_rng(3)
H, E = 1 << 17, 1 << 19  # randomized trace len, eval domain at 2^16
NM, NA = 379, 91


def fence(v):
    # transfer ONE scalar: forces the dependency chain without paying the
    # tunnel's ~20-80 MB/s full-array readback cost
    leaf = v
    while isinstance(leaf, tuple):
        leaf = leaf[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timed(name, f, *args, n=2):
    out = f(*args)
    fence(out)  # build + warm
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
        fence(out)
    print(f"{name}: {(time.time() - t0) / n:.3f}s", flush=True)
    return out


cols = gf.from_u64(rng.integers(0, P, (NM, H), dtype=np.uint64))
print("shapes: cols", (NM, H), "eval", E, flush=True)

# 1. iNTT + NTT (the LDE core) on all main columns
timed("intt (379, 2^17)", lambda v: ntt.intt(v, 1), cols)
lde = timed("lde 4x -> (379, 2^19)", lambda v: ntt.lde(v, 4, 1, 7), cols)

# 2. row hashing of the LDT-domain rows (stride 2 -> 2^18 rows)
rows = gf.tmap(lambda a: a[:, ::2].T, lde)  # (2^18, 379)
timed("sponge rows (2^18, 379)", tip5_kernel.sponge_absorb_rows, rows)

# 3. Merkle over 2^18 leaves
leaves = gf.from_u64(rng.integers(0, P, (5, 1 << 18), dtype=np.uint64))
timed("merkle_flat 2^18", tip5_kernel.merkle_flat_jit, leaves)

# 4. bare Tip5 permutation batch
st = gf.from_u64(rng.integers(0, P, (16, 1 << 18), dtype=np.uint64))
timed("tip5 perm (16, 2^18)", tip5_kernel.permutation, st)

# 5. elementwise mul at LDE scale (HBM roofline probe)
timed("gf.mul (379, 2^19)", __import__("jax").jit(gf.mul), lde, lde)

# 6. readback cost of the committed codeword
t0 = time.time()
_ = gf.to_u64(lde)
print(f"to_u64 (379, 2^19) readback: {time.time() - t0:.3f}s", flush=True)
