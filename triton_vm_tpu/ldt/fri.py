"""FRI low-degree test.

Transcribed from /root/reference/triton-vm/src/low_degree_test/fri.rs and
the parameter derivation in low_degree_test/mod.rs:215-360. Codewords are
lists of XFE tuples; commitment trees embed each XFE as the digest
(c0, c1, c2, 0, 0) (fri.rs:927-929).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

from ..crypto import merkle
from ..fields import bfe, poly, xfe
from ..fields.bfe import P
from ..stark.arithmetic_domain import Domain
from ..stark.proof_item import ProofItem

GENERATOR = 7  # BFieldElement::generator(): initial-domain offset


class LdtError(ValueError):
    pass


def xfe_to_digest(x):
    return (x[0], x[1], x[2], 0, 0)


def proximity_parameter(log2_expansion_factor: int, soundness: str) -> float:
    """low_degree_test/mod.rs:250-341."""
    rate = 1.0 / (1 << log2_expansion_factor)
    if soundness == "proven":
        margin = math.sqrt(rate)
    elif soundness == "conjectured":
        log2_field_size = 191.99999999899228
        rate_log_rate = rate * -log2_expansion_factor
        one_m = (1.0 - rate) * math.log2(1.0 - rate)
        margin = rate - (rate_log_rate + one_m) / log2_field_size
    else:
        raise ValueError(soundness)
    slackness = margin / 20.0
    return 1.0 - margin - slackness


@dataclass(frozen=True)
class FriParameters:
    security_level: int
    log2_initial_expansion_factor: int
    log2_high_degree_bound: int
    soundness: str = "proven"


class Fri:
    def __init__(self, params: FriParameters):
        if params.log2_initial_expansion_factor == 0:
            raise LdtError("expansion factor too small")
        self.expansion_factor = 1 << params.log2_initial_expansion_factor
        log2_domain_len = (params.log2_high_degree_bound
                           + params.log2_initial_expansion_factor)
        self.domain = Domain(1 << log2_domain_len, GENERATOR)
        delta = proximity_parameter(params.log2_initial_expansion_factor,
                                    params.soundness)
        self.num_collinearity_checks = math.ceil(
            -params.security_level / math.log2(1.0 - delta))

    # ------------------------------------------------------------ interface

    def initial_domain(self) -> Domain:
        return self.domain

    def num_first_round_queries(self) -> int:
        return self.num_collinearity_checks

    def max_degree(self) -> int:
        return self.domain.length // self.expansion_factor - 1

    def num_rounds(self) -> int:
        first_round_code_dimension = self.max_degree() + 1
        max_num_rounds = (1 << (first_round_code_dimension - 1).bit_length()
                          ).bit_length() - 1
        if self.num_collinearity_checks > 0:
            checking_all = max(self.num_collinearity_checks.bit_length() - 1, 0)
        else:
            checking_all = 0
        checking_most = checking_all + 1
        return max(0, max_num_rounds - checking_most)

    def last_round_max_degree(self) -> int:
        return self.max_degree() >> self.num_rounds()

    # --------------------------------------------------------------- prover

    def prove(self, codeword, proof_stream) -> list[int]:
        """Returns the (first-round) revealed indices (A-indices).

        `codeword` may be a device-resident gfx tuple, a list of XFE
        tuples, or a numpy (n, 3) uint64 array; all folding, leaf hashing
        and tree building run on device (fri.rs:349-366 semantics, device
        codewords end-to-end)."""
        import numpy as np

        from ..ops import gf, gfx

        if isinstance(codeword, tuple):  # gfx device value
            cur = codeword
            if gf.shape(cur[0])[0] != self.domain.length:
                raise LdtError("initial codeword length mismatch")
        else:
            cw = np.asarray(codeword, np.uint64)
            if cw.shape[0] != self.domain.length:
                raise LdtError("initial codeword length mismatch")
            cur = gfx.from_u64(cw)

        rounds = []  # (domain, codeword gfx (n,), tree)
        domain = self.domain

        def commit(domain, cw_dev):
            import os

            n = gf.shape(cw_dev[0])[0]
            parts = [cw_dev[0], cw_dev[1], cw_dev[2],
                     gf.zeros((n,)), gf.zeros((n,))]
            if os.environ.get("TVM_FRI_LEAF_ZFIRST") == "1":
                parts = parts[3:] + parts[:3]  # bisection aid
            leaves = gf.stack(parts, axis=0)  # (5, n)
            tree = merkle.MerkleTree(leaves)
            proof_stream.enqueue(ProofItem("MerkleRoot", tree.root()))
            rounds.append((domain, cw_dev, tree))

        commit(domain, cur)
        for _ in range(self.num_rounds()):
            challenge = proof_stream.sample_scalars(1)[0]
            prev_domain, prev_cw, _ = rounds[-1]
            folded = _fold_device(prev_domain, prev_cw, challenge)
            commit(prev_domain.pow(2), folded)

        _, last_cw_dev, _ = rounds[-1]
        last_codeword = [tuple(int(c) for c in row)
                         for row in gfx.to_u64(last_cw_dev)]
        proof_stream.enqueue(ProofItem("FriCodeword", last_codeword))
        # The reference interpolates via iNTT and sends the FULL-length
        # coefficient vector, trailing zeros included (fri.rs:262-268;
        # ArithmeticDomain::interpolate does not normalize). The encoding
        # length is part of the Fiat-Shamir transcript, so match it.
        # (TVM_FRI_POLY_FULL=0 trims instead: bisection aid.)
        import os

        last_poly = _intt_full(last_codeword)
        if os.environ.get("TVM_FRI_POLY_FULL", "1") == "0":
            while len(last_poly) > 1 and last_poly[-1] == (0, 0, 0):
                last_poly.pop()
        proof_stream.enqueue(ProofItem("Polynomial", last_poly))

        # query phase
        a_indices = proof_stream.sample_indices(
            self.domain.length, self.num_collinearity_checks)
        self._reveal(proof_stream, rounds[0], a_indices)
        for round_number in range(len(rounds) - 1):
            domain_r, _, _ = rounds[round_number]
            b_indices = [(a + domain_r.length // 2) % domain_r.length
                         for a in a_indices]
            self._reveal(proof_stream, rounds[round_number], b_indices)

        # transcript parity: sample & discard the verifier's barycentric
        # indeterminate (fri.rs:764-769)
        proof_stream.sample_scalars(1)
        return a_indices

    def _reveal(self, proof_stream, round_data, indices):
        import numpy as np

        from ..ops import gf

        _, cw_dev, tree = round_data
        idx = np.array(indices, np.int64)
        sel_d = _take3_jit()(cw_dev, idx)  # one dispatch for 3 coeffs
        sel3 = [gf.to_u64(sel_d[c]) for c in range(3)]
        queried_leaves = [tuple(int(sel3[c][i]) for c in range(3))
                          for i in range(len(indices))]
        auth = tree.authentication_structure(indices)
        proof_stream.enqueue(ProofItem("FriResponse", {
            "queried_leaves": queried_leaves,
            "auth_structure": auth,
        }))

    # -------------------------------------------------------------- verifier

    def verify(self, proof_stream):
        """Returns (first_round_indices, partial_first_codeword)."""
        num_rounds = self.num_rounds()
        # initialize: read merkle roots, sample folding challenges
        domains = [self.domain]
        roots = []
        challenges = []
        for r in range(num_rounds + 1):
            root = proof_stream.dequeue().expect("MerkleRoot")
            roots.append(root)
            if r < num_rounds:
                # every round that has a next round samples a folding
                # challenge right after its root (fri.rs:414-447)
                challenges.append(proof_stream.sample_scalars(1)[0])
                domains.append(domains[-1].pow(2))
        last_codeword = proof_stream.dequeue().expect("FriCodeword")
        last_poly = proof_stream.dequeue().expect("Polynomial")
        if len(last_codeword) != domains[-1].length:
            raise LdtError("last codeword length mismatch")

        a_indices = proof_stream.sample_indices(
            self.domain.length, self.num_collinearity_checks)

        # receive & authenticate partial codewords
        partial_a = [None] * (num_rounds + 1)
        partial_b = [None] * (num_rounds + 1)
        response = proof_stream.dequeue().expect("FriResponse")
        partial_a[0] = response["queried_leaves"]
        self._authenticate(roots[0], domains[0], a_indices,
                           partial_a[0], response["auth_structure"])
        for r in range(num_rounds):
            b_indices = [(a + domains[r].length // 2) % domains[r].length
                         for a in a_indices]
            response = proof_stream.dequeue().expect("FriResponse")
            partial_b[r] = response["queried_leaves"]
            self._authenticate(roots[r], domains[r], b_indices,
                               partial_b[r], response["auth_structure"])

        # fold rounds
        for r in range(num_rounds):
            domain = domains[r]
            n = domain.length
            a_idx = [a % n for a in a_indices]
            b_idx = [(a + n // 2) % n for a in a_indices]
            ch = challenges[r]
            folded = []
            for i in range(self.num_collinearity_checks):
                ax = xfe.lift(domain.value(a_idx[i]))
                bx = xfe.lift(domain.value(b_idx[i]))
                ay, by = partial_a[r][i], partial_b[r][i]
                folded.append(_colinear_y((ax, ay), (bx, by), ch))
            partial_a[r + 1] = folded

        # authenticate last round codeword
        import numpy as np
        digests = np.array([xfe_to_digest(x) for x in last_codeword], np.uint64)
        if merkle.MerkleTree(digests).root() != tuple(roots[-1]):
            raise LdtError("bad merkle root for last codeword")
        last_n = domains[-1].length
        last_a_idx = [a % last_n for a in a_indices]
        received = [last_codeword[i] for i in last_a_idx]
        if received != partial_a[num_rounds]:
            raise LdtError("last codeword disagrees with folded codeword")
        if poly.degree(last_poly, xfe) > self.last_round_max_degree():
            raise LdtError("last round polynomial has too high degree")
        indeterminate = proof_stream.sample_scalars(1)[0]
        horner = poly.evaluate(last_poly, indeterminate, xfe)
        bary = poly.barycentric_evaluate(last_codeword, indeterminate)
        if horner != bary:
            raise LdtError("last round polynomial evaluation mismatch")

        first_a_indices = [a % self.domain.length for a in a_indices]
        return first_a_indices, partial_a[0]

    def _authenticate(self, root, domain, indices, leaves, auth):
        digests = [xfe_to_digest(x) for x in leaves]
        ok = merkle.verify_authentication_structure(
            tuple(root), domain.length, indices, digests, auth)
        if not ok:
            raise LdtError("bad merkle authentication path")


@functools.lru_cache(maxsize=1)
def _take3_jit():
    """One jitted gather for all 3 XFE coefficient planes (the separate
    takes were 6 round-trips per FRI round on the tunneled backend)."""
    import jax

    from ..ops import gf

    return jax.jit(lambda cw, i: tuple(gf.take(cw[c], i, axis=0)
                                       for c in range(3)))


def _intt_full(codeword):
    """iNTT over the plain (offset-1) domain; full-length coefficient list
    of XFE tuples, trailing zeros NOT trimmed (twenty-first semantics)."""
    import numpy as np

    from ..ops import gfx, ntt

    arr = np.array(codeword, np.uint64)  # (n, 3)
    v = gfx.from_u64(arr)
    coeffs = ntt.xfe_map(ntt.intt, v, 1)
    out = gfx.to_u64(coeffs)
    return [tuple(int(c) for c in row) for row in out]


@functools.lru_cache(maxsize=64)
def _fold_fn(n):
    """Jitted split-and-fold for length-n codewords:
    fold_i = ((c_i + c_j) + beta * x_i^{-1} * (c_i - c_j)) / 2, j = i+n/2."""
    import jax

    from ..ops import gf, gfx

    two_inv = pow(2, P - 2, P)

    def fn(cw, xs_inv_half, beta):
        half = n // 2
        left = gfx.tmap(lambda a: a[:half], cw)
        right = gfx.tmap(lambda a: a[half:], cw)
        s = gfx.add(left, right)
        d = gfx.sub(left, right)
        scaled = gfx.bfe_mul(gfx.mul(beta, d), xs_inv_half)
        return gfx.bfe_mul(gfx.add(s, scaled), gf.full((), two_inv))

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _half_domain_inverses(length, offset):
    """Device gf (n/2,) of 1/x_i — via ONE jitted dispatch and cached:
    the previous eager gf.inv was ~100 sequential dispatches per FRI
    round, each paying the tunneled backend's RPC latency."""
    import jax

    from ..ops import gf

    xs = _domain_values_u64(length, offset)[: length // 2]
    return jax.jit(gf.inv)(gf.from_u64(xs))


def _fold_device(domain: Domain, cw_dev, challenge):
    """Device split-and-fold (fri.rs:349-366). cw_dev: gfx (n,)."""
    from ..ops import gfx

    n = domain.length
    xs_inv = _half_domain_inverses(domain.length, domain.offset)
    beta = gfx.full((), tuple(challenge))
    return _fold_fn(n)(cw_dev, xs_inv, beta)


@functools.lru_cache(maxsize=32)
def _domain_values_u64(length, offset):
    import numpy as np

    return np.array(Domain(length, offset).values(), np.uint64)


def _split_and_fold(domain: Domain, codeword, challenge):
    """(1 +/- beta/x_i)-weighted average fold (fri.rs:349-366),
    host reference implementation (kept for differential tests)."""
    n = len(codeword)
    values = domain.values()
    inv_values = bfe.batch_inverse(values[:n // 2])
    two_inv = pow(2, P - 2, P)
    out = []
    for i in range(n // 2):
        scaled = xfe.bfe_mul(challenge, inv_values[i])
        left = xfe.mul(xfe.add(xfe.ONE, scaled), codeword[i])
        right = xfe.mul(xfe.sub(xfe.ONE, scaled), codeword[n // 2 + i])
        out.append(xfe.bfe_mul(xfe.add(left, right), two_inv))
    return out


def _colinear_y(point_a, point_b, x):
    """y-coordinate at x of the line through a and b."""
    (ax, ay), (bx, by) = point_a, point_b
    dy = xfe.sub(by, ay)
    dx = xfe.sub(bx, ax)
    slope = xfe.mul(dy, xfe.inv(dx))
    return xfe.add(ay, xfe.mul(slope, xfe.sub(x, ax)))
