"""Time the quotient tape and DEEP combination kernels on the real TPU
at 2^16-proof shapes (Q = 2^18, L = 2^18)."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.ops import gf, gfx, kernels  # noqa: E402
from triton_vm_tpu.stark.arithmetic_domain import Domain  # noqa: E402
from triton_vm_tpu.stark import prover as pr  # noqa: E402
from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges  # noqa
from triton_vm_tpu.air.master import master_air  # noqa: E402
from triton_vm_tpu.stark.proof_stream import Claim  # noqa: E402

rng = np.random.default_rng(11)
NM, NA = 379, 91
H, Q, L = 1 << 16, 1 << 18, 1 << 18


def fence(v):
    leaf = v
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    np.asarray(leaf[(0,) * leaf.ndim])


num_constraints = sum(len(cs) for cs in master_air().constraints.values())
weights = pr._powers_xfe((3, 1, 4), num_constraints)
claim = Claim((0,) * 5, [], [])
challenges = Challenges(
    [tuple(int(c) for c in row) for row in
     rng.integers(0, P, size=(SAMPLE_COUNT, 3), dtype=np.uint64)], claim)
trace_dom, quot_dom = Domain(H), Domain(Q, 7)

main = gf.from_u64(rng.integers(0, P, (NM, Q), dtype=np.uint64))
aux = tuple(gf.from_u64(rng.integers(0, P, (NA, Q), dtype=np.uint64))
            for _ in range(3))

t0 = time.time()
acc = pr._all_quotients_combined_device(
    main, aux, trace_dom, quot_dom, challenges, weights, return_device=True)
fence(acc)
print(f"quotients 2^18 (cold): {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
acc = pr._all_quotients_combined_device(
    main, aux, trace_dom, quot_dom, challenges, weights, return_device=True)
fence(acc)
print(f"quotients 2^18 (warm): {time.time() - t0:.1f}s", flush=True)

segs = tuple(gfx.from_u64(rng.integers(0, P, (L, 3), dtype=np.uint64))
             for _ in range(5))


def wv(n):
    return gfx.from_u64(rng.integers(0, P, (n, 3), dtype=np.uint64))


g = Domain(L, 7).generator
dfn = kernels.deep_combination_fn(L, L, g, 7, 7, 1, 1)
args = (main, aux, segs, wv(NM), wv(NA), wv(5), wv(4), wv(4), wv(4))
t0 = time.time()
out = dfn(*args)
fence(out)
print(f"deep 2^18 (cold): {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
out = dfn(*args)
fence(out)
print(f"deep 2^18 (warm): {time.time() - t0:.1f}s", flush=True)

ofn = kernels.ood_stage_fn(Q, L, quot_dom.generator, 7, g, 7)
sc = lambda: wv(1)  # noqa: E731
pt = gfx.tmap(lambda a: a[0], wv(1))
t0 = time.time()
out = ofn(main, aux, segs, pt, pt, pt, pt)
fence(out)
print(f"ood 2^18 (cold): {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
out = ofn(main, aux, segs, pt, pt, pt, pt)
fence(out)
print(f"ood 2^18 (warm): {time.time() - t0:.1f}s", flush=True)
