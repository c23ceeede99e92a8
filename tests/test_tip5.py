"""Tip5 host implementation, device kernel parity, Merkle trees."""

import numpy as np

from triton_vm_tpu.crypto import merkle, tip5
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, tip5_kernel


def test_constants():
    # MDS column is pinned by the spec (SHA-256 of "Tip5")
    assert tip5.MDS_MATRIX_FIRST_COLUMN == (
        61402, 1108, 28750, 33823, 7454, 43244, 53865, 12034,
        56951, 27521, 41351, 40901, 12021, 59689, 26798, 17845)
    # first round constant matches twenty-first's published table
    assert tip5.ROUND_CONSTANTS[0] == 13630775303355457758
    # lookup table is a permutation of 0..255 with L(0)=0, L(255)=255
    assert sorted(tip5.LOOKUP_TABLE) == list(range(256))
    assert tip5.LOOKUP_TABLE[0] == 0 and tip5.LOOKUP_TABLE[255] == 255


def test_split_and_lookup_fixed_point():
    # raw p-1 = 0xFFFFFFFF_00000000 has bytes {00, FF} only -> fixed point
    # of the raw-domain byte map (tip-0005: "S(-1) = -1" in raw domain)
    from triton_vm_tpu.fields.bfe import R_INV
    x = (P - 1) * R_INV % P  # element whose Montgomery raw is p-1
    assert tip5.split_and_lookup(x) == x


def test_sponge_padding_disambiguates():
    a = tip5.hash_varlen([1, 2, 3])
    b = tip5.hash_varlen([1, 2, 3, 0])
    assert a != b
    assert len(a) == 5


def test_device_permutation_matches_host(rng):
    B = 7
    states = rng.integers(0, P, size=(B, 16), dtype=np.uint64)
    dev = tip5_kernel.permutation(gf.from_u64(states.T))
    got = gf.to_u64(dev).T
    for i in range(B):
        want = tip5.permutation([int(x) for x in states[i]])
        assert [int(x) for x in got[i]] == want


def test_device_trace_matches_host(rng):
    states = rng.integers(0, P, size=(3, 16), dtype=np.uint64)
    trace = tip5_kernel.permutation_trace(gf.from_u64(states.T))
    tr = gf.to_u64(trace)
    assert tr.shape == (6, 16, 3)
    for i in range(3):
        want = tip5.permutation_trace([int(x) for x in states[i]])
        for r in range(6):
            assert [int(x) for x in tr[r][:, i]] == want[r]


def test_device_row_hash_matches_host(rng):
    rows = rng.integers(0, P, size=(4, 23), dtype=np.uint64)
    digests = gf.to_u64(tip5_kernel.sponge_absorb_rows(gf.from_u64(rows))).T
    for i in range(4):
        want = tip5.hash_varlen([int(x) for x in rows[i]])
        assert [int(x) for x in digests[i]] == want


def test_merkle_tree_and_auth_structure(rng):
    n = 16
    leaves = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    tree = merkle.MerkleTree(leaves)
    # root equals scalar recomputation
    nodes = {n + i: [int(x) for x in leaves[i]] for i in range(n)}
    for k in range(n - 1, 0, -1):
        nodes[k] = tip5.hash_pair(nodes[2 * k], nodes[2 * k + 1])
    assert tree.root() == tuple(nodes[1])

    for indices in ([0], [3, 7], [0, 1, 2, 15], [5, 5], list(range(n))):
        auth = tree.authentication_structure(indices)
        digs = [tree.leaf(i) for i in indices]
        assert merkle.verify_authentication_structure(
            tree.root(), n, indices, digs, auth)
        # tampered digest fails
        bad = [tuple((d[0] + 1) % P if j == 0 else d[j] for j in range(5))
               for d in digs]
        assert not merkle.verify_authentication_structure(
            tree.root(), n, indices, bad, auth)


def test_sample_indices_and_scalars():
    s = tip5.Tip5Sponge()
    s.pad_and_absorb_all([42])
    idx = s.sample_indices(1 << 10, 30)
    assert len(idx) == 30 and all(0 <= i < 1024 for i in idx)
    s2 = tip5.Tip5Sponge()
    s2.pad_and_absorb_all([42])
    scalars = s2.sample_scalars(7)
    assert len(scalars) == 7
    assert all(len(x) == 3 and all(0 <= c < P for c in x) for x in scalars)
