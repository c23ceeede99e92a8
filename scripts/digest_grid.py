"""Debug aid: grid-search RNG semantics against the reference's golden
proof digest (proof.rs:200-225). Run with JAX_PLATFORMS=cpu."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env

from triton_vm_tpu.crypto import tip5
from triton_vm_tpu.isa.program import triton_program
from triton_vm_tpu.stark.proof_stream import Claim
from triton_vm_tpu.stark.prover import Prover, Stark
from triton_vm_tpu.utils.stdrng import ChaCha12Rng, seed_from_u64
from triton_vm_tpu.vm.machine import VM, PublicInput

GOLD = (2390426207231576512, 11357322246033024133, 15595568858844533957,
        10807389618517394866, 11786266879565336160)

program = triton_program("""
    pick 11 pick 12 pick 13 pick 14 pick 15
    read_io 5 assert_vector halt
""")
claim = Claim.about_program(program).with_input(program.hash())
aet, _ = VM.trace_execution(program, PublicInput(list(claim.input)))
print("padded height:", aet.padded_height(), flush=True)


def derive_seed(mode):
    rng = ChaCha12Rng(seed_from_u64(4742841043836029231))
    if mode == "u8x32":
        return rng.random_u8_array(32)
    if mode == "fill":
        out = b""
        while len(out) < 32:
            w = rng.next_u32()
            out += w.to_bytes(4, "little")
        return out
    if mode == "u8x64":  # each byte from a next_u64 draw's low byte
        return bytes(rng.next_u64() & 0xFF for _ in range(32))
    raise ValueError(mode)


import itertools

VARIANTS = os.environ.get(
    "GRID",
    "1:1:canon:u8x32,1:1:canon:fill,1:1:modp:u8x32")
combos = [v.split(":") for v in VARIANTS.split(",")] if VARIANTS else []

for combo in (combos or itertools.product(
        ("1", "0"), ("1", "0"), ("canon", "modp", "zone08"),
        ("u8x32", "fill"))):
    prefix, poly_full, bfe_mode, seed_mode = combo[:4]
    rounds = combo[4] if len(combo) > 4 else "12"
    poly_wrap = combo[5] if len(combo) > 5 else "0"
    os.environ["TVM_ENUM_PREFIX"] = prefix
    os.environ["TVM_FRI_POLY_FULL"] = poly_full
    os.environ["TVM_RNG_BFE"] = bfe_mode
    os.environ["TVM_STDRNG_ROUNDS"] = rounds
    os.environ["TVM_POLY_WRAP"] = poly_wrap
    t0 = time.time()
    proof = Prover(Stark(), seed=derive_seed(seed_mode)).prove(claim, aet)
    words = proof.words
    n = len(words)
    digests = {
        "struct": tuple(tip5.hash_varlen([n + 1, n] + words)),
        "vec": tuple(tip5.hash_varlen([n] + words)),
        "raw": tuple(tip5.hash_varlen(words)),
    }
    match = [k for k, d in digests.items() if d == GOLD]
    print(f"prefix={prefix} polyfull={poly_full} bfe={bfe_mode} "
          f"seed={seed_mode} rounds={rounds} t={time.time()-t0:.1f}s "
          f"{'MATCH ' + match[0] + '!' if match else 'no'} "
          f"d={digests['struct'][0]}", flush=True)
    if match:
        break
