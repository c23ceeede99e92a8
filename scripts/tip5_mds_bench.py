"""Compare Tip5 MDS-layer formulations on the real TPU.

A: current fori_loop over 16 taps with jnp.roll (serial dependency chain)
B: unrolled taps, static rotations via one (16,16,B) gather-free indexing
C: digit-plane matmul — split state into 16-bit digits and MDS constants
   into 8-bit digits, 4 int32 dot_generals on the MXU, delayed reduction
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from triton_vm_tpu.crypto import tip5  # noqa: E402
from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.ops import gf, tip5_kernel  # noqa: E402

rng = np.random.default_rng(3)
B = 1 << 18
st_np = rng.integers(0, P, (16, B), dtype=np.uint64)
st = gf.from_u64(st_np)

MDS = np.array(tip5.MDS_MATRIX_FIRST_COLUMN, np.uint64)
print("MDS consts max:", MDS.max(), flush=True)

# full circulant matrix: M[i, k] = c[(i - k) mod 16]
CIRC = np.empty((16, 16), np.uint32)
for i in range(16):
    for k in range(16):
        CIRC[i, k] = MDS[(i - k) % 16]


def mds_b(state):
    """Unrolled taps: accumulate al/ah as 64-bit pairs, static rotations
    expressed as two-slice concats (XLA lowers these to copies it can
    fuse; no loop-carried dependency)."""
    lo, hi = state
    z = jnp.zeros_like(lo)
    al = (z, z)
    ah = (z, z)
    s_lo, s_hi = lo, hi
    for k in range(16):
        ck = jnp.uint32(int(MDS[k]))
        if k:
            s_lo = jnp.concatenate([lo[-k:], lo[:-k]], axis=0)
            s_hi = jnp.concatenate([hi[-k:], hi[:-k]], axis=0)
        p_lo, p_hi = gf._mul32(s_lo, ck)
        a0, a1, _ = gf._add64(al[0], al[1], p_lo, p_hi)
        al = (a0, a1)
        p_lo, p_hi = gf._mul32(s_hi, ck)
        a0, a1, _ = gf._add64(ah[0], ah[1], p_lo, p_hi)
        ah = (a0, a1)
    x0 = al[0]
    x1 = al[1] + ah[0]
    c1 = (x1 < al[1]).astype(gf.U32)
    x2 = ah[1] + c1
    x3 = jnp.zeros_like(x2)
    return gf._reduce128(x0, x1, x2, x3)


# C: digit-plane matmuls. state digit planes: s16[d] (16, B) with
# d in 0..3 (16-bit digits of the 64-bit value); const digit planes:
# c8[e] (16, 16) 8-bit digits (consts < 2^16 -> 2 digits).
C_LO8 = (CIRC & 0xFF).astype(np.int32)
C_HI8 = ((CIRC >> 8) & 0xFF).astype(np.int32)


def mds_c(state):
    lo, hi = state
    planes = [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
    acc = [None] * 6  # digit sums for 16-bit positions 0..5
    for d, pl in enumerate(planes):
        x = pl.astype(jnp.int32)
        for e, cm in enumerate((C_LO8, C_HI8)):
            y = jax.lax.dot_general(
                jnp.asarray(cm), x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (16, B) < 2^28
            # product contributes at bit position 16*d + 8*e
            pos = 2 * d + e  # half-digit position in 8-bit steps
            if acc[0] is None:
                acc = [jnp.zeros_like(y) for _ in range(8)]
            acc[pos] = acc[pos] + y
    # recombine: total = sum acc[j] << (8*j), acc[j] < 2^29
    # 64-bit accumulate in u32 pairs then reduce128
    x0 = jnp.zeros_like(lo)
    x1 = jnp.zeros_like(lo)
    x2 = jnp.zeros_like(lo)
    for j in range(8):
        v = acc[j].astype(jnp.uint32)
        sh = 8 * j
        if sh < 32:
            b_lo = v << sh if sh else v
            b_mid = (v >> (32 - sh)) if sh else jnp.zeros_like(v)
            x0, x1, cf = gf._add64(x0, x1, b_lo, b_mid)
            x2 = x2 + gf._mask_val(cf, 1)
        else:
            b_mid = v << (sh - 32) if sh > 32 else v
            b_hi = v >> (64 - sh) if sh > 32 else jnp.zeros_like(v)
            x1, x2, _ = gf._add64(x1, x2, b_mid, b_hi)
    return gf._reduce128(x0, x1, x2, jnp.zeros_like(x2))


def timed(name, f, *args, n=3):
    out = f(*args)
    np.asarray(out[0][(0, 0)])
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
        np.asarray(out[0][(0, 0)])
    print(f"{name}: {(time.time() - t0) / n * 1000:.1f}ms", flush=True)
    return out


a = timed("A fori+roll", jax.jit(tip5_kernel._mds_layer), st)
b = timed("B unrolled", jax.jit(mds_b), st)
c = timed("C digit-matmul", jax.jit(mds_c), st)

au = gf.to_u64(gf.tmap(lambda x: x[:, :64], a))
bu = gf.to_u64(gf.tmap(lambda x: x[:, :64], b))
cu = gf.to_u64(gf.tmap(lambda x: x[:, :64], c))
print("B == A:", np.array_equal(au, bu), flush=True)
print("C == A:", np.array_equal(au, cu), flush=True)
