"""Merkle tree over Tip5 digests with de-duplicated authentication structures.

Replaces `twenty-first`'s `MerkleTree` (`par_new`, `root`,
`authentication_structure`, `MerkleTreeInclusionProof::verify`) as used by
the reference at /root/reference/triton-vm/src/table/master_table.rs:443-453
and stark.rs:1608-1674.

Node indexing: 1-based heap layout — root at 1, leaf i at num_leafs + i,
children of k at 2k / 2k+1. Authentication structures list the needed node
digests in DESCENDING node-index order.

Layer hashing runs batched on device (ops.tip5_kernel.hash_pairs).
"""

from __future__ import annotations

import numpy as np

from ..ops import gf, tip5_kernel

ROOT_INDEX = 1


_TAKE_FN = None


def _take_jit(flat, idx):
    global _TAKE_FN
    if _TAKE_FN is None:
        import jax

        _TAKE_FN = jax.jit(lambda f, i: gf.take(f, i, axis=1))
    return _TAKE_FN(flat, idx)


class MerkleTree:
    """The tree lives ON DEVICE as a heap-ordered gf pair (5, 2n-1);
    node reads are batched gathers. This matters on the tunneled TPU
    backend: reading the whole layer stack back to host cost ~8 s per
    tree at 2^18 leaves (~94 MB at the tunnel's ~12 MB/s), while a
    proof only ever opens root + a few thousand authentication nodes."""

    def __init__(self, leaf_digests):
        """leaf_digests: numpy (n, 5) u64, or gf array (2, 5, n)."""
        if isinstance(leaf_digests, np.ndarray):
            leaves = gf.from_u64(leaf_digests.T)  # gf pair (5, n)
        else:
            leaves = leaf_digests
        n = gf.shape(leaves)[-1]
        assert n >= 1 and (n & (n - 1)) == 0, "leaf count must be a power of 2"
        stack = tip5_kernel.merkle_flat_jit(leaves)
        self._flat = tip5_kernel.assemble_flat_device(leaves, stack)
        self.num_leafs = n
        self._root = None

    @classmethod
    def from_flat(cls, flat, num_leafs: int) -> "MerkleTree":
        """Adopt a precomputed heap-ordered layer array (5, 2n-1):
        numpy u64 or device gf pair (tip5_kernel commit output)."""
        self = cls.__new__(cls)
        if isinstance(flat, np.ndarray):
            self._flat = gf.from_u64(np.asarray(flat, np.uint64))
        else:
            self._flat = flat
        self.num_leafs = num_leafs
        self._root = None
        return self

    def _nodes(self, indices) -> list[tuple]:
        """Digests at 1-based heap node indices: ONE gather + readback.

        The index count is padded to the next power of two (with the
        root) so the jitted gather sees O(log) distinct shapes instead
        of one per proof — auth-structure sizes vary per revealed-index
        set and each fresh shape would otherwise pay a compile on the
        tunneled backend."""
        k = len(list(indices))
        if k == 0:
            return []
        kp = 1 << (k - 1).bit_length()
        idx = np.full(kp, ROOT_INDEX - 1, np.int64)
        idx[:k] = np.asarray(list(indices), np.int64) - 1
        sel = gf.to_u64(_take_jit(self._flat, idx))  # (5, kp)
        return [tuple(int(x) for x in sel[:, j]) for j in range(k)]

    def node(self, index: int) -> tuple:
        return self._nodes([index])[0]

    def root(self) -> tuple:
        if self._root is None:
            self._root = self.node(ROOT_INDEX)
        return self._root

    def leaf(self, i: int) -> tuple:
        return self.node(self.num_leafs + i)

    def authentication_structure(self, leaf_indices) -> list[tuple]:
        idxs = auth_structure_node_indices(self.num_leafs, leaf_indices)
        return self._nodes(idxs)


def auth_structure_node_indices(num_leafs: int, leaf_indices) -> list[int]:
    """Node indices revealed for the given leaves, deduplicated, in
    descending order (twenty-first convention)."""
    needed, computable = set(), set()
    for leaf_index in leaf_indices:
        assert 0 <= leaf_index < num_leafs
        node = leaf_index + num_leafs
        while node > ROOT_INDEX:
            computable.add(node)
            needed.add(node ^ 1)
            node //= 2
    return sorted(needed - computable, reverse=True)


def partial_tree_nodes(
    num_leafs: int, leaf_indices, leaf_digests, auth_structure
) -> dict | None:
    """All tree nodes recoverable from an authentication structure:
    {node_index: digest}, or None if the structure is malformed. Every
    node on a revealed leaf's root path — and each such node's sibling —
    is present, so per-leaf sibling paths can be read out of the result
    (used by models/recursive_verifier.py to feed `merkle_step`)."""
    from . import tip5

    leaf_indices = list(leaf_indices)
    if len(leaf_indices) != len(leaf_digests):
        return None
    if not leaf_indices:
        return {} if not auth_structure else None
    needed = auth_structure_node_indices(num_leafs, leaf_indices)
    if len(needed) != len(auth_structure):
        return None
    nodes = {i + num_leafs: tuple(d) for i, d in zip(leaf_indices, leaf_digests)}
    nodes.update({i: tuple(d) for i, d in zip(needed, auth_structure)})
    frontier = sorted(nodes, reverse=True)
    while frontier:
        idx = frontier.pop(0)
        if idx == ROOT_INDEX:
            break
        parent = idx // 2
        if parent in nodes:
            continue
        sibling = idx ^ 1
        if sibling not in nodes:
            return None
        left, right = (idx, sibling) if idx % 2 == 0 else (sibling, idx)
        nodes[parent] = tuple(tip5.hash_pair(nodes[left], nodes[right]))
        # keep frontier sorted descending
        import bisect
        pos = bisect.bisect_left([-f for f in frontier], -parent)
        frontier.insert(pos, parent)
    return nodes


def verify_authentication_structure(
    root: tuple, num_leafs: int, leaf_indices, leaf_digests, auth_structure
) -> bool:
    """MerkleTreeInclusionProof::verify equivalent (host, scalar Tip5)."""
    nodes = partial_tree_nodes(num_leafs, leaf_indices, leaf_digests,
                               auth_structure)
    if nodes is None:
        return False
    if not leaf_indices:
        return True
    return ROOT_INDEX in nodes and tuple(nodes[ROOT_INDEX]) == tuple(root)
