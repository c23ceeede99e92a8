"""Debug aid: one-factor-at-a-time tests of memory-based conventions
against the reference's golden proof digest (proof.rs:200-225).

Each variant monkeypatches exactly one convention, re-proves the tiny
golden scenario, and compares Tip5::hash(&proof) to the pinned digest.
Run with JAX_PLATFORMS=cpu (conftest-free)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from triton_vm_tpu.crypto import merkle, tip5  # noqa: E402
from triton_vm_tpu.isa.program import triton_program  # noqa: E402
from triton_vm_tpu.stark.proof_stream import Claim  # noqa: E402
from triton_vm_tpu.stark.prover import Prover, Stark  # noqa: E402
from triton_vm_tpu.utils.stdrng import std_rng_seed_from_u64  # noqa: E402
from triton_vm_tpu.vm.machine import VM, PublicInput  # noqa: E402

GOLD = (2390426207231576512, 11357322246033024133, 15595568858844533957,
        10807389618517394866, 11786266879565336160)

program = triton_program("""
    pick 11 pick 12 pick 13 pick 14 pick 15
    read_io 5 assert_vector halt
""")
claim = Claim.about_program(program).with_input(program.hash())
aet, _ = VM.trace_execution(program, PublicInput(list(claim.input)))
seed = std_rng_seed_from_u64(4742841043836029231)


def digest_of(proof):
    words = proof.words
    n = len(words)
    return {
        "struct": tuple(tip5.hash_varlen([n + 1, n] + words)),
        "vec": tuple(tip5.hash_varlen([n] + words)),
        "raw": tuple(tip5.hash_varlen(words)),
    }


def run(name):
    t0 = time.time()
    proof = Prover(Stark(), seed=seed).prove(claim, aet)
    digests = digest_of(proof)
    match = [k for k, d in digests.items() if d == GOLD]
    tag = ("MATCH " + match[0] + "!") if match else "no"
    print(f"{name}: {tag} t={time.time() - t0:.0f}s d={digests['struct'][0]}",
          flush=True)
    return bool(match)


# ------------------------------------------------------------------ variants

def variant_baseline():
    return run("baseline")


def variant_auth_ascending():
    orig = merkle.auth_structure_node_indices

    def asc(num_leafs, leaf_indices):
        return sorted(orig(num_leafs, leaf_indices))

    merkle.auth_structure_node_indices = asc
    try:
        return run("auth-ascending")
    finally:
        merkle.auth_structure_node_indices = orig


def variant_idx_no_reject():
    orig = tip5.Tip5Sponge.sample_indices

    def no_reject(self, upper_bound, n):
        indices = []
        pending = []
        while len(indices) < n:
            if not pending:
                pending = list(self.squeeze())
            element = pending.pop(0)
            indices.append((element & 0xFFFFFFFF) % upper_bound)
        return indices

    tip5.Tip5Sponge.sample_indices = no_reject
    try:
        return run("indices-no-reject")
    finally:
        tip5.Tip5Sponge.sample_indices = orig


def variant_fri_leaf_zero_first():
    os.environ["TVM_FRI_LEAF_ZFIRST"] = "1"
    try:
        return run("fri-leaf-zeros-first")
    finally:
        del os.environ["TVM_FRI_LEAF_ZFIRST"]


def variant_squeeze_permute_first():
    """If twenty-first's hash_varlen reads the state directly (not via
    squeeze), the squeeze permute-order is unpinned by the program-hash
    oracle. Test permute-THEN-read."""
    orig = tip5.Tip5Sponge.squeeze

    def permute_first(self):
        self.state = tip5.permutation(self.state)
        return self.state[:tip5.RATE]

    tip5.Tip5Sponge.squeeze = permute_first
    try:
        return run("squeeze-permute-first")
    finally:
        tip5.Tip5Sponge.squeeze = orig


def variant_scalars_one_squeeze_per_xfe():
    """sample_scalars consuming a fresh squeeze per scalar (discarding
    7 of 10 elements each time)."""
    orig = tip5.Tip5Sponge.sample_scalars

    def per_scalar(self, n):
        out = []
        for _ in range(n):
            sq = self.squeeze()
            out.append(tuple(sq[:3]))
        return out

    tip5.Tip5Sponge.sample_scalars = per_scalar
    try:
        return run("scalars-one-squeeze-per-xfe")
    finally:
        tip5.Tip5Sponge.sample_scalars = orig


def variant_scalars_three_per_squeeze():
    """sample_scalars producing floor(RATE/3)=3 scalars per squeeze and
    discarding the 10th element of every squeeze."""
    orig = tip5.Tip5Sponge.sample_scalars

    def three_per(self, n):
        out = []
        while len(out) < n:
            sq = self.squeeze()
            for i in range(3):
                if len(out) < n:
                    out.append(tuple(sq[3 * i:3 * i + 3]))
        return out

    tip5.Tip5Sponge.sample_scalars = three_per
    try:
        return run("scalars-three-per-squeeze")
    finally:
        tip5.Tip5Sponge.sample_scalars = orig


def _env_variant(name, env):
    def run_env():
        for k, v in env.items():
            os.environ[k] = v
        try:
            return run(name)
        finally:
            for k in env:
                del os.environ[k]
    return run_env


VARIANTS = {
    "baseline": variant_baseline,
    "auth_asc": variant_auth_ascending,
    "no_reject": variant_idx_no_reject,
    "leaf_zfirst": variant_fri_leaf_zero_first,
    "squeeze_pf": variant_squeeze_permute_first,
    "scalars_per_xfe": variant_scalars_one_squeeze_per_xfe,
    "scalars_3per": variant_scalars_three_per_squeeze,
    # struct-field / vec-item length-prefix combinations (8 minus baseline)
    "s0v1e1": _env_variant("struct0 vecitem1 enum1", {"TVM_STRUCT_PREFIX": "0"}),
    "s1v0e1": _env_variant("struct1 vecitem0 enum1", {"TVM_VEC_ITEM_PREFIX": "0"}),
    "s0v0e1": _env_variant("struct0 vecitem0 enum1", {"TVM_STRUCT_PREFIX": "0", "TVM_VEC_ITEM_PREFIX": "0"}),
    "s0v1e0": _env_variant("struct0 vecitem1 enum0", {"TVM_STRUCT_PREFIX": "0", "TVM_ENUM_PREFIX": "0"}),
    "s1v0e0": _env_variant("struct1 vecitem0 enum0", {"TVM_VEC_ITEM_PREFIX": "0", "TVM_ENUM_PREFIX": "0"}),
    "s0v0e0": _env_variant("struct0 vecitem0 enum0", {"TVM_STRUCT_PREFIX": "0", "TVM_VEC_ITEM_PREFIX": "0", "TVM_ENUM_PREFIX": "0"}),
    "struct_rev": _env_variant("struct fields reversed", {"TVM_STRUCT_REVERSE": "1"}),
}

def variant_combo(auth_asc: bool, env: dict, name: str):
    orig = merkle.auth_structure_node_indices
    if auth_asc:
        def asc(num_leafs, leaf_indices):
            return sorted(orig(num_leafs, leaf_indices))
        merkle.auth_structure_node_indices = asc
    for k, v in env.items():
        os.environ[k] = v
    try:
        return run(name)
    finally:
        merkle.auth_structure_node_indices = orig
        for k in env:
            del os.environ[k]


def run_combo_grid():
    """Multi-factor sweep over the strongest residual convention axes."""
    import itertools

    for auth, leaf, poly, enum in itertools.product((0, 1), repeat=4):
        if (auth, leaf, poly, enum) == (0, 0, 0, 0):
            continue  # baseline, known-failing
        env = {}
        if leaf:
            env["TVM_FRI_LEAF_ZFIRST"] = "1"
        if poly:
            env["TVM_FRI_POLY_FULL"] = "0"
        if enum:
            env["TVM_ENUM_PREFIX"] = "0"
        if variant_combo(bool(auth), env,
                         f"auth{auth} leaf{leaf} polytrim{poly} "
                         f"enumoff{enum}"):
            return True
    return False


if __name__ == "__main__":
    args = sys.argv[1:] or list(VARIANTS)
    if args == ["combo"]:
        run_combo_grid()
    else:
        for name in args:
            if VARIANTS[name]():
                break
