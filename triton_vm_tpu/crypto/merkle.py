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


class MerkleTree:
    def __init__(self, leaf_digests):
        """leaf_digests: numpy (n, 5) u64, or gf array (2, 5, n)."""
        if isinstance(leaf_digests, np.ndarray):
            leaves = gf.from_u64(leaf_digests.T)  # gf pair (5, n)
        else:
            leaves = leaf_digests
        n = gf.shape(leaves)[-1]
        assert n >= 1 and (n & (n - 1)) == 0, "leaf count must be a power of 2"
        # one dispatch for the whole tree, one readback for all layers
        stack = gf.to_u64(tip5_kernel.merkle_flat_jit(leaves))
        flat = tip5_kernel.assemble_flat(gf.to_u64(leaves), stack)
        self._init_from_flat(flat, n)

    @classmethod
    def from_flat(cls, flat: np.ndarray, num_leafs: int) -> "MerkleTree":
        """Adopt a precomputed heap-ordered layer array (5, 2n-1) u64
        (tip5_kernel.merkle_flat / commit_rows output)."""
        self = cls.__new__(cls)
        self._init_from_flat(np.asarray(flat, np.uint64), num_leafs)
        return self

    def _init_from_flat(self, flat, n):
        self.num_leafs = n
        # layer k occupies heap nodes [2^k, 2^(k+1)); root layer is k=0
        self._layers = [flat[:, (1 << k) - 1:(2 << k) - 1].T
                        for k in range((2 * n - 1).bit_length())]

    def node(self, index: int) -> tuple:
        """Digest at 1-based heap node index."""
        level = index.bit_length() - 1
        return tuple(int(x) for x in self._layers[level][index - (1 << level)])

    def root(self) -> tuple:
        return self.node(ROOT_INDEX)

    def leaf(self, i: int) -> tuple:
        return self.node(self.num_leafs + i)

    def authentication_structure(self, leaf_indices) -> list[tuple]:
        idxs = auth_structure_node_indices(self.num_leafs, leaf_indices)
        return [self.node(i) for i in idxs]


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


def verify_authentication_structure(
    root: tuple, num_leafs: int, leaf_indices, leaf_digests, auth_structure
) -> bool:
    """MerkleTreeInclusionProof::verify equivalent (host, scalar Tip5)."""
    from . import tip5

    leaf_indices = list(leaf_indices)
    if len(leaf_indices) != len(leaf_digests):
        return False
    if not leaf_indices:
        return not auth_structure
    needed = auth_structure_node_indices(num_leafs, leaf_indices)
    if len(needed) != len(auth_structure):
        return False
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
            return False
        left, right = (idx, sibling) if idx % 2 == 0 else (sibling, idx)
        nodes[parent] = tuple(tip5.hash_pair(nodes[left], nodes[right]))
        # keep frontier sorted descending
        import bisect
        pos = bisect.bisect_left([-f for f in frontier], -parent)
        frontier.insert(pos, parent)
    return ROOT_INDEX in nodes and tuple(nodes[ROOT_INDEX]) == tuple(root)
