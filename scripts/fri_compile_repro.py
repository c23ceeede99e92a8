"""Isolate FRI-stage compile cost on the CPU backend."""

import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from triton_vm_tpu.ops import gf, gfx, tip5_kernel  # noqa: E402
from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.crypto import merkle  # noqa: E402
from triton_vm_tpu.stark.arithmetic_domain import Domain  # noqa: E402
from triton_vm_tpu.ldt import fri as fri_mod  # noqa: E402

rng = np.random.default_rng(0)


def rgf(shape):
    return gf.from_u64(rng.integers(0, P, size=shape, dtype=np.uint64))


def rgfx(shape):
    return tuple(rgf(shape) for _ in range(3))


which = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

if which == "merkle":
    leaves = rgf((5, n))
    t = time.time()
    tree = merkle.MerkleTree(leaves)
    print("MerkleTree", n, ":", round(time.time() - t, 1), "s")
elif which == "fold":
    dom = Domain(n, 7)
    cw = rgfx((n,))
    ch = tuple(int(x) for x in rng.integers(0, P, size=3, dtype=np.uint64))
    t = time.time()
    out = fri_mod._fold_device(dom, cw, ch)
    jax.block_until_ready(out)
    print("fold_device", n, ":", round(time.time() - t, 1), "s")
elif which == "ginv":
    xs = rng.integers(1, P, size=(n // 2,), dtype=np.uint64)
    t = time.time()
    out = gf.inv(gf.from_u64(xs))
    jax.block_until_ready(out)
    print("eager gf.inv", n // 2, ":", round(time.time() - t, 1), "s")
