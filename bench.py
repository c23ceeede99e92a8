"""Benchmark entry point. Prints ONE JSON line for the driver.

Currently measures Goldilocks field-multiply throughput on the default
device (real TPU under the driver). Will become the end-to-end prover
benchmark once the STARK pipeline lands.
"""

import json
import time

import numpy as np


def main():
    import jax
    from triton_vm_tpu.fields.bfe import P
    from triton_vm_tpu.ops import gf

    rng = np.random.default_rng(1)
    shape = (256, 65536)  # 16M field elements
    a = gf.from_u64(rng.integers(0, P, size=shape, dtype=np.uint64))
    b = gf.from_u64(rng.integers(0, P, size=shape, dtype=np.uint64))

    @jax.jit
    def kernel(a, b):
        return gf.mul(gf.mul(a, b), gf.add(a, b))

    # NOTE: under the axon TPU platform, block_until_ready() returns before
    # execution finishes; a device->host readback is the only honest fence.
    np.asarray(kernel(a, b)[0][:1, :1])  # compile + warm up
    n_iters = 20
    t0 = time.perf_counter()
    out = a
    for _ in range(n_iters):
        out = kernel(out, b)
    np.asarray(out[0][:1, :1])
    dt = time.perf_counter() - t0

    muls = 2 * n_iters * shape[0] * shape[1]
    rate = muls / dt / 1e9
    print(json.dumps({
        "metric": "goldilocks_mul_throughput",
        "value": round(rate, 3),
        "unit": "Gmul/s",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
