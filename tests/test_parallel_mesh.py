"""Sharded prover primitives on a virtual 8-device mesh: results must be
bit-identical to the single-device path."""

import numpy as np
import pytest

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, ntt, tip5_kernel
from triton_vm_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return pm.default_mesh(8)


def _cols(num, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=(num, h), dtype=np.uint64)


def test_sharded_lde_matches_single_device(mesh8):
    cols_u = _cols(16, 64)
    cols = gf.from_u64(cols_u)
    want = gf.to_u64(ntt.lde(cols, 4, 1, 7))
    got = gf.to_u64(pm.sharded_lde(mesh8, cols, 4, 1, 7))
    assert np.array_equal(want, got)


def test_sharded_row_hash_matches(mesh8):
    cols = gf.from_u64(_cols(16, 32, seed=1))
    lde = pm.sharded_lde(mesh8, cols, 2)
    rows = gf.tmap(lambda x: x.T, lde)
    want = gf.to_u64(tip5_kernel.sponge_absorb_rows(rows))
    got = gf.to_u64(pm.sharded_row_hash(mesh8, lde))
    assert np.array_equal(want, got)


def test_sharded_merkle_root_matches(mesh8):
    from triton_vm_tpu.crypto import merkle

    cols = gf.from_u64(_cols(16, 32, seed=2))
    lde = pm.sharded_lde(mesh8, cols, 2)
    digests = pm.sharded_row_hash(mesh8, lde)
    layers = pm.sharded_merkle_layers(mesh8, digests)
    root = tuple(int(x) for x in gf.to_u64(layers[-1])[:, 0])

    rows_u = gf.to_u64(lde).T.copy()
    tree = merkle.MerkleTree(tip5_kernel.sponge_absorb_rows(
        gf.from_u64(rows_u)))
    assert root == tuple(tree.root())


def test_multichip_prover_bit_identical():
    """The production prover over the 8-device virtual mesh produces the
    same proof bits as single-device, and the proof verifies
    (SURVEY §4's multi-host test obligation)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
