"""Independent, naive transcription of the reference prover (stark.rs
Prover::prove) for bit-exactness bisection.

Deliberately re-implements every protocol step in plain host Python from
a fresh reading of /root/reference/triton-vm/src/stark.rs (prove,
compute_quotient_segments cached path, segment split, zeta-chain
randomization), master_table.rs (randomized interpolants, row hashing),
and fri.rs — sharing with the production prover ONLY components that are
pinned by the reference's own golden vectors (Tip5 host, ChaCha12
StdRng, the AIR evaluators, table fill, Fiat-Shamir sponge).

Usage: python scripts/naive_prover.py  — proves the proof.rs:200-225
scenario, reports the golden-digest comparison, and (if present)
compares word-by-word against /tmp/golden_small_proof.pkl from the
production prover.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env

import numpy as np  # noqa: E402

from triton_vm_tpu.crypto import tip5  # noqa: E402  (pinned primitive)
from triton_vm_tpu.fields import xfe as sxfe  # noqa: E402 (scalar math)
from triton_vm_tpu.fields.bfe import P  # noqa: E402
from triton_vm_tpu.utils.stdrng import (  # noqa: E402  (pinned primitive)
    ChaCha12Rng,
    std_rng_seed_from_u64,
)

GOLD = (2390426207231576512, 11357322246033024133, 15595568858844533957,
        10807389618517394866, 11786266879565336160)

NUM_MAIN, NUM_AUX = 379, 91
K = 4  # NUM_QUOTIENT_SEGMENTS
ZETA = 3


# ---------------------------------------------------------------- field ops

def ntt_obj(col, root):
    """Iterative radix-2 NTT over numpy object array (length power of 2),
    natural order in, natural order out: out[i] = sum_j col[j] root^(ij)."""
    n = len(col)
    if n == 1:
        return col.copy()
    # bit-reverse copy, then butterflies (DIT)
    levels = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(levels):
        rev |= ((idx >> b) & 1) << (levels - 1 - b)
    a = col[rev].copy()
    length = 2
    while length <= n:
        w = pow(root, n // length, P)
        half = length // 2
        ws = np.ones(half, object)
        for i in range(1, half):
            ws[i] = ws[i - 1] * w % P
        for start in range(0, n, length):
            lo = a[start:start + half].copy()
            hi = a[start + half:start + length] * ws % P
            a[start:start + half] = (lo + hi) % P
            a[start + half:start + length] = (lo - hi) % P
        length *= 2
    return a


def intt_obj(vals, root):
    n = len(vals)
    inv_n = pow(n, P - 2, P)
    out = ntt_obj(vals, pow(root, P - 2, P))
    return out * inv_n % P


def root_of_unity(n):
    return pow(7, (P - 1) // n, P)


class Domain:
    def __init__(self, length, offset=1):
        self.length = length
        self.offset = offset
        self.generator = root_of_unity(length)

    def values(self):
        out = np.empty(self.length, object)
        acc = self.offset
        for i in range(self.length):
            out[i] = acc
            acc = acc * self.generator % P
        return out

    def evaluate_bfe(self, coeffs):
        """coeffs: object array, len <= length. Coset-NTT evaluation."""
        c = np.zeros(self.length, object)
        c[:len(coeffs)] = coeffs
        if self.offset != 1:
            off = 1
            for i in range(len(coeffs)):
                c[i] = c[i] * off % P
                off = off * self.offset % P
        return ntt_obj(c, self.generator)

    def interpolate_bfe(self, vals):
        c = intt_obj(np.array(vals, object), self.generator)
        if self.offset != 1:
            inv_off = pow(self.offset, P - 2, P)
            off = 1
            for i in range(len(c)):
                c[i] = c[i] * off % P
                off = off * inv_off % P
        return c

    def evaluate_xfe(self, coeffs3):
        return np.stack([self.evaluate_bfe(coeffs3[:, c])
                         for c in range(3)], axis=1)

    def interpolate_xfe(self, vals3):
        return np.stack([self.interpolate_bfe(vals3[:, c])
                         for c in range(3)], axis=1)

    def pow(self, e):
        return Domain(self.length // e, pow(self.offset, e, P))


def poly_eval_xfe(coeffs3, point):
    acc = (0, 0, 0)
    for k in range(len(coeffs3) - 1, -1, -1):
        acc = sxfe.add(sxfe.mul(acc, tuple(point)),
                       tuple(int(x) for x in coeffs3[k]))
    return acc


def poly_eval_bfe_at_xfe(coeffs, point):
    acc = (0, 0, 0)
    for k in range(len(coeffs) - 1, -1, -1):
        acc = sxfe.add(sxfe.mul(acc, tuple(point)), (int(coeffs[k]), 0, 0))
    return acc


# ------------------------------------------------------------ merkle (naive)

class NaiveMerkleTree:
    def __init__(self, leaf_digests):
        n = len(leaf_digests)
        assert n & (n - 1) == 0
        self.num_leafs = n
        nodes = [None] * (2 * n)
        for i, d in enumerate(leaf_digests):
            nodes[n + i] = tuple(d)
        for i in range(n - 1, 0, -1):
            nodes[i] = tuple(tip5.hash_pair(nodes[2 * i], nodes[2 * i + 1]))
        self.nodes = nodes

    def root(self):
        return self.nodes[1]

    def authentication_structure(self, leaf_indices):
        needed, computable = set(), set()
        for li in leaf_indices:
            node = li + self.num_leafs
            while node > 1:
                computable.add(node)
                needed.add(node ^ 1)
                node //= 2
        return [self.nodes[i] for i in sorted(needed - computable,
                                              reverse=True)]


# ------------------------------------------------------- codec (re-derived)

def enc_vec_static(items, flatten):
    out = [len(items)]
    for it in items:
        out.extend(flatten(it))
    return out


def flat_xfe(x):
    return [int(c) % P for c in x]


def flat_digest(d):
    return [int(c) % P for c in d]


def encode_item(variant, payload):
    """BFieldCodec enum encode: [discriminant] ++ fields (length-prepended
    when dynamically sized)."""
    disc = {"MerkleRoot": 0, "Log2PaddedHeight": 1, "OutOfDomainMainRow": 2,
            "OutOfDomainAuxRow": 3, "OutOfDomainQuotientSegments": 4,
            "Polynomial": 5, "StirOutOfDomainValues": 6,
            "AuthenticationStructure": 7, "MasterMainTableRows": 8,
            "MasterAuxTableRows": 9, "QuotientSegmentsElements": 10,
            "FriCodeword": 11, "FriResponse": 12, "StirResponse": 13}[variant]
    if variant == "MerkleRoot":
        return [disc] + flat_digest(payload)
    if variant == "Log2PaddedHeight":
        return [disc, int(payload)]
    if variant in ("OutOfDomainMainRow", "OutOfDomainAuxRow",
                   "OutOfDomainQuotientSegments"):
        return [disc] + [w for x in payload for w in flat_xfe(x)]
    if variant in ("Polynomial", "FriCodeword"):
        body = enc_vec_static(payload, flat_xfe)
        return [disc, len(body)] + body
    if variant == "AuthenticationStructure":
        body = enc_vec_static(payload, flat_digest)
        return [disc, len(body)] + body
    if variant == "MasterMainTableRows":
        body = enc_vec_static(payload, lambda row: [int(v) % P for v in row])
        return [disc, len(body)] + body
    if variant in ("MasterAuxTableRows", "QuotientSegmentsElements"):
        body = enc_vec_static(
            payload, lambda row: [w for x in row for w in flat_xfe(x)])
        return [disc, len(body)] + body
    if variant == "FriResponse":
        leaves = enc_vec_static(payload["queried_leaves"], flat_xfe)
        auth = enc_vec_static(payload["auth_structure"], flat_digest)
        body = [len(leaves)] + leaves + [len(auth)] + auth
        return [disc, len(body)] + body
    raise ValueError(variant)


FS_INCLUDED = {"MerkleRoot", "Log2PaddedHeight", "OutOfDomainMainRow",
               "OutOfDomainAuxRow", "OutOfDomainQuotientSegments",
               "Polynomial", "StirOutOfDomainValues"}


class NaiveProofStream:
    def __init__(self):
        self.sponge = tip5.Tip5Sponge()
        self.encoded_items = []
        self.log = []

    def absorb(self, words):
        self.sponge.pad_and_absorb_all(words)

    def enqueue(self, variant, payload):
        enc = encode_item(variant, payload)
        if variant in FS_INCLUDED:
            self.absorb(enc)
        self.encoded_items.append(enc)
        self.log.append((variant, len(enc)))

    def sample_scalars(self, n):
        return self.sponge.sample_scalars(n)

    def sample_indices(self, upper_bound, n):
        return self.sponge.sample_indices(upper_bound, n)

    def proof_words(self):
        vec = [len(self.encoded_items)]
        for enc in self.encoded_items:
            vec.append(len(enc))
            vec.extend(enc)
        return [len(vec)] + vec


# --------------------------------------------------------------- randomness

def offset_seed(seed, off):
    v = (int.from_bytes(seed, "little") + off) % (1 << 256)
    return v.to_bytes(32, "little")


def randomizer_bfes(seed, col, n):
    return ChaCha12Rng(offset_seed(seed, col)).random_bfes(n)


def randomizer_xfes(seed, col, n):
    return ChaCha12Rng(offset_seed(seed, col)).random_xfes(n)


# ------------------------------------------------------------------- prover

def prove():
    # Shared, *forced* components: program/VM/AET/table fill + challenges
    # mapping + AIR evaluators (all pinned by reference golden vectors).
    from triton_vm_tpu.air import evaluate as ev
    from triton_vm_tpu.air.challenges import SAMPLE_COUNT, Challenges
    from triton_vm_tpu.air.master import master_air
    from triton_vm_tpu.isa.program import triton_program
    from triton_vm_tpu.stark.proof_stream import Claim
    from triton_vm_tpu.stark.prover import Stark
    from triton_vm_tpu.tables import master as mt
    from triton_vm_tpu.vm.machine import VM, PublicInput

    program = triton_program("""
        pick 11 pick 12 pick 13 pick 14 pick 15
        read_io 5 assert_vector halt
    """)
    claim = Claim.about_program(program).with_input(program.hash())
    aet, _ = VM.trace_execution(program, PublicInput(list(claim.input)))
    seed = std_rng_seed_from_u64(4742841043836029231)

    stark = Stark()
    padded_height = aet.padded_height()
    fri, ntr, trace_dom_p, rand_dom_p, quot_dom_p, ldt_dom_p = \
        stark.derive_domains(padded_height)
    # naive domains
    trace_dom = Domain(trace_dom_p.length, trace_dom_p.offset)
    quot_dom = Domain(quot_dom_p.length, quot_dom_p.offset)
    ldt_dom = Domain(ldt_dom_p.length, ldt_dom_p.offset)
    h, Q, L = trace_dom.length, quot_dom.length, ldt_dom.length
    print(f"h={h} Q={Q} L={L} ntr={ntr} "
          f"nq={fri.num_collinearity_checks}", flush=True)

    ps = NaiveProofStream()
    ps.absorb(claim.encode())
    ps.enqueue("Log2PaddedHeight", padded_height.bit_length() - 1)

    # ---- main table fill (shared, forced) + naive commit
    main = mt.fill_main_table(aet, padded_height=h)
    mt.fill_derived_main_columns(main)
    main_obj = main.astype(object)  # (h, NUM_MAIN)

    t0 = time.time()
    main_rand = [randomizer_bfes(seed, i, ntr) for i in range(NUM_MAIN)]
    zerofier_ldt = (ldt_dom.values() ** 1)  # placeholder, computed below
    xs = ldt_dom.values()
    z_ldt = (np.array([pow(int(x), h, P) for x in xs], object) - 1) % P

    main_ldt = np.empty((L, NUM_MAIN), object)
    for i in range(NUM_MAIN):
        interp = trace_dom.interpolate_bfe(main_obj[:, i])
        lde = ldt_dom.evaluate_bfe(interp)
        rand_cw = ldt_dom.evaluate_bfe(np.array(main_rand[i], object))
        main_ldt[:, i] = (lde + z_ldt * rand_cw) % P
    main_row_digests = [tuple(tip5.hash_varlen([int(v) for v in row]))
                        for row in main_ldt]
    main_tree = NaiveMerkleTree(main_row_digests)
    ps.enqueue("MerkleRoot", main_tree.root())
    print(f"main commit {time.time()-t0:.0f}s", flush=True)

    challenges = Challenges(ps.sample_scalars(SAMPLE_COUNT), claim)

    # ---- aux table (shared fill, forced) + naive commit
    aux = mt.extend(main, challenges)
    mt.fill_derived_aux_columns(main, aux, challenges.challenges)
    batch_rng = ChaCha12Rng(offset_seed(seed, NUM_MAIN + NUM_AUX))
    aux[:, NUM_AUX - 1, :] = np.array(batch_rng.random_xfes(h),
                                      np.uint64)
    aux_obj = aux.astype(object)  # (h, NUM_AUX, 3)

    t0 = time.time()
    aux_rand = [randomizer_xfes(seed, NUM_MAIN + i, ntr)
                for i in range(NUM_AUX)]
    aux_ldt = np.empty((L, NUM_AUX, 3), object)
    for i in range(NUM_AUX):
        interp = trace_dom.interpolate_xfe(aux_obj[:, i, :])
        lde = ldt_dom.evaluate_xfe(interp)
        rc = np.array([list(x) for x in aux_rand[i]], object)
        rand_cw = ldt_dom.evaluate_xfe(rc)
        aux_ldt[:, i, :] = (lde + z_ldt[:, None] * rand_cw) % P
    aux_row_digests = [
        tuple(tip5.hash_varlen([int(v) for x in row for v in x]))
        for row in aux_ldt]
    aux_tree = NaiveMerkleTree(aux_row_digests)
    ps.enqueue("MerkleRoot", aux_tree.root())
    print(f"aux commit {time.time()-t0:.0f}s", flush=True)

    # ---- quotients (cached path): evaluate AIR over quotient domain
    t0 = time.time()
    qw0 = ps.sample_scalars(1)[0]
    air = master_air()
    num_constraints = sum(len(cs) for cs in air.constraints.values())
    quot_weights = []
    acc = (1, 0, 0)
    for _ in range(num_constraints):
        quot_weights.append(acc)
        acc = sxfe.mul(acc, qw0)

    # Quotient VALUES are forced by the (golden-pinned) AIR + tables +
    # FS weights; reuse the production host evaluator for them. The
    # conventions under test here are everything around them.
    from triton_vm_tpu.stark.prover import _all_quotients_combined

    stride = L // Q
    main_q_u64 = np.ascontiguousarray(
        np.array(main_ldt[::stride].tolist(), np.uint64).T)
    aux_q_u64 = np.stack([
        np.array(aux_ldt[::stride, :, c].tolist(), np.uint64).T
        for c in range(3)])
    quot_u64 = np.asarray(_all_quotients_combined(
        main_q_u64, aux_q_u64, trace_dom_p, quot_dom_p, challenges,
        quot_weights), np.uint64)
    quot_cw = quot_u64.astype(object)  # list of Q 3-tuples -> (Q, 3)
    assert quot_cw.shape == (Q, 3), quot_cw.shape
    print(f"quotients {time.time()-t0:.0f}s", flush=True)

    # ---- segmentify (interpolate + interleaved split) + zeta chain
    t0 = time.time()
    quot_poly = quot_dom.interpolate_xfe(quot_cw)  # (Q, 3)
    seg_polys = [quot_poly[s::K].copy() for s in range(K)]
    n_qr = Stark.num_quotient_table_randomizers(ntr)
    qr_rng = ChaCha12Rng(offset_seed(seed, NUM_MAIN + NUM_AUX + 1))
    qrand = np.array([list(x) for x in qr_rng.random_xfes(n_qr)], object)
    polys = [np.array(p, object) for p in seg_polys] + [qrand]
    cws = [ldt_dom.evaluate_xfe(p) for p in polys]
    zeta_k = pow(ZETA, K, P)
    for i in range(K - 1, -1, -1):
        nxt = polys[i + 1]
        scale = np.empty(len(nxt), object)
        s = 1
        for j in range(len(nxt)):
            scale[j] = s * (P - pow(ZETA, i, P)) % P
            s = s * zeta_k % P
        addend = nxt * scale[:, None] % P
        m = max(len(polys[i]), len(addend))
        merged = np.zeros((m, 3), object)
        merged[:len(polys[i])] = polys[i]
        merged[:len(addend)] = (merged[:len(addend)] + addend) % P
        polys[i] = merged
        cws[i] = (cws[i] + ldt_dom.evaluate_xfe(addend)) % P
    quot_rows = np.stack(cws, axis=1)  # (L, 5, 3)
    quot_row_digests = [
        tuple(tip5.hash_varlen([int(v) for x in row for v in x]))
        for row in quot_rows]
    quot_tree = NaiveMerkleTree(quot_row_digests)
    ps.enqueue("MerkleRoot", quot_tree.root())
    print(f"segmentify {time.time()-t0:.0f}s", flush=True)

    # ---- OOD rows
    t0 = time.time()
    alpha = ps.sample_scalars(1)[0]
    omega_alpha = sxfe.bfe_mul(alpha, trace_dom.generator)

    def ood_row_main(point):
        zh = sxfe.sub(sxfe.mod_pow(point, h), (1, 0, 0))
        out = []
        for i in range(NUM_MAIN):
            interp = trace_dom.interpolate_bfe(main_obj[:, i])
            v = poly_eval_bfe_at_xfe(interp, point)
            r = poly_eval_bfe_at_xfe(np.array(main_rand[i], object), point)
            out.append(sxfe.add(v, sxfe.mul(zh, r)))
        return out

    def ood_row_aux(point):
        zh = sxfe.sub(sxfe.mod_pow(point, h), (1, 0, 0))
        out = []
        for i in range(NUM_AUX):
            interp = trace_dom.interpolate_xfe(aux_obj[:, i, :])
            v = poly_eval_xfe(interp, point)
            rc = np.array([list(x) for x in aux_rand[i]], object)
            r = poly_eval_xfe(rc, point)
            out.append(sxfe.add(v, sxfe.mul(zh, r)))
        return out

    ps.enqueue("OutOfDomainMainRow", ood_row_main(alpha))
    ps.enqueue("OutOfDomainAuxRow", ood_row_aux(alpha))
    ps.enqueue("OutOfDomainMainRow", ood_row_main(omega_alpha))
    ps.enqueue("OutOfDomainAuxRow", ood_row_aux(omega_alpha))

    alpha_k = sxfe.mod_pow(alpha, K)
    zeta_alpha_k = sxfe.mod_pow(sxfe.bfe_mul(alpha, ZETA), K)
    ood_p = [poly_eval_xfe(polys[i], alpha_k) for i in range(K)]
    ps.enqueue("OutOfDomainQuotientSegments", ood_p)
    ood_r = [poly_eval_xfe(polys[i + 1], zeta_alpha_k) for i in range(K)]
    ps.enqueue("OutOfDomainQuotientSegments", ood_r)
    print(f"OOD {time.time()-t0:.0f}s", flush=True)

    # ---- combination weights + DEEP + FRI
    t0 = time.time()
    initials = ps.sample_scalars(3)
    w_main_aux = []
    acc = (1, 0, 0)
    for _ in range(NUM_MAIN + NUM_AUX):
        w_main_aux.append(acc)
        acc = sxfe.mul(acc, initials[0])
    w_qs = []
    acc = (1, 0, 0)
    for _ in range(K + 1):
        w_qs.append(acc)
        acc = sxfe.mul(acc, initials[1])
    w_deep = []
    acc = (1, 0, 0)
    for _ in range(4):
        w_deep.append(acc)
        acc = sxfe.mul(acc, initials[2])

    # weighted sum of randomized column interpolants (degree < h + ntr)
    comb = np.zeros((h + ntr, 3), object)
    for i in range(NUM_MAIN):
        interp = trace_dom.interpolate_bfe(main_obj[:, i])
        w = w_main_aux[i]
        for c in range(3):
            comb[:h, c] = (comb[:h, c] + interp * w[c]) % P
        # zerofier * randomizer = (x^h - 1) * r(x)
        r = np.array(main_rand[i], object)
        for c in range(3):
            comb[h:h + ntr, c] = (comb[h:h + ntr, c] + r * w[c]) % P
            comb[:ntr, c] = (comb[:ntr, c] - r * w[c]) % P
    for i in range(NUM_AUX):
        interp = trace_dom.interpolate_xfe(aux_obj[:, i, :])
        w = w_main_aux[NUM_MAIN + i]
        rc = np.array([list(x) for x in aux_rand[i]], object)
        for k in range(h):
            v = sxfe.mul((int(interp[k, 0]), int(interp[k, 1]),
                          int(interp[k, 2])), w)
            comb[k] = [(int(comb[k, c]) + v[c]) % P for c in range(3)]
        for k in range(ntr):
            v = sxfe.mul((int(rc[k, 0]), int(rc[k, 1]), int(rc[k, 2])), w)
            comb[h + k] = [(int(comb[h + k, c]) + v[c]) % P for c in range(3)]
            comb[k] = [(int(comb[k, c]) - v[c]) % P for c in range(3)]

    short_dom = ldt_dom if L <= Q else quot_dom
    main_aux_cw = np.zeros((short_dom.length, 3), object)
    padded = np.zeros((short_dom.length, 3), object)
    padded[:h + ntr] = comb
    main_aux_cw = short_dom.evaluate_xfe(padded)

    shared = None
    for i in range(1, K):
        term = np.array(
            [[c for c in sxfe.mul((int(x[0]), int(x[1]), int(x[2])),
                                  w_qs[i])] for x in polys[i]], object)
        if shared is None:
            shared = term
        else:
            m = max(len(shared), len(term))
            mg = np.zeros((m, 3), object)
            mg[:len(shared)] = shared
            mg[:len(term)] = (mg[:len(term)] + term) % P
            shared = mg
    def padd(a, b):
        m = max(len(a), len(b))
        mg = np.zeros((m, 3), object)
        mg[:len(a)] = a
        mg[:len(b)] = (mg[:len(b)] + b) % P
        return mg
    poly_p = padd(np.array(
        [[c for c in sxfe.mul((int(x[0]), int(x[1]), int(x[2])), w_qs[0])]
         for x in polys[0]], object), shared)
    poly_r = padd(np.array(
        [[c for c in sxfe.mul((int(x[0]), int(x[1]), int(x[2])), w_qs[K])]
         for x in polys[K]], object), shared)

    def eval_on_short(p):
        buf = np.zeros((short_dom.length, 3), object)
        buf[:len(p)] = p
        return short_dom.evaluate_xfe(buf)

    cw_p = eval_on_short(poly_p)
    cw_r = eval_on_short(poly_r)

    sxs = short_dom.values()

    def deep(codeword, point, value):
        out = np.empty((len(codeword), 3), object)
        for i in range(len(codeword)):
            num = sxfe.sub((int(codeword[i, 0]), int(codeword[i, 1]),
                            int(codeword[i, 2])), value)
            den = sxfe.inv(sxfe.sub((int(sxs[i]), 0, 0), point))
            out[i] = sxfe.mul(num, den)
        return out

    comb_padded = np.zeros((short_dom.length, 3), object)
    comb_padded[:h + ntr] = comb
    deep0 = deep(main_aux_cw, alpha, poly_eval_xfe(comb, alpha))
    deep1 = deep(main_aux_cw, omega_alpha, poly_eval_xfe(comb, omega_alpha))
    deep2 = deep(cw_p, alpha_k, poly_eval_xfe(poly_p, alpha_k))
    deep3 = deep(cw_r, zeta_alpha_k, poly_eval_xfe(poly_r, zeta_alpha_k))
    combination = np.zeros((short_dom.length, 3), object)
    for w, d in zip(w_deep, (deep0, deep1, deep2, deep3)):
        for i in range(short_dom.length):
            v = sxfe.mul((int(d[i, 0]), int(d[i, 1]), int(d[i, 2])), w)
            combination[i] = [(int(combination[i, c]) + v[c]) % P
                              for c in range(3)]
    if short_dom.length != L:
        cf = short_dom.interpolate_xfe(combination)
        buf = np.zeros((L, 3), object)
        buf[:len(cf)] = cf
        combination = ldt_dom.evaluate_xfe(buf)
    print(f"DEEP {time.time()-t0:.0f}s", flush=True)

    # ---- FRI
    t0 = time.time()
    num_rounds = fri.num_rounds()
    nq = fri.num_collinearity_checks
    rounds = []
    domain = ldt_dom
    cw = combination
    for r in range(num_rounds + 1):
        digests = [(int(x[0]), int(x[1]), int(x[2]), 0, 0) for x in cw]
        tree = NaiveMerkleTree(digests)
        ps.enqueue("MerkleRoot", tree.root())
        rounds.append((domain, cw, tree))
        if r < num_rounds:
            ch = ps.sample_scalars(1)[0]
            n = len(cw)
            xs_d = domain.values()
            folded = np.empty((n // 2, 3), object)
            inv2 = pow(2, P - 2, P)
            for i in range(n // 2):
                xinv = pow(int(xs_d[i]), P - 2, P)
                soi = sxfe.bfe_mul(ch, xinv)
                left = sxfe.mul(sxfe.add((1, 0, 0), soi),
                                (int(cw[i, 0]), int(cw[i, 1]), int(cw[i, 2])))
                rgt = sxfe.mul(
                    sxfe.sub((1, 0, 0), soi),
                    (int(cw[n // 2 + i, 0]), int(cw[n // 2 + i, 1]),
                     int(cw[n // 2 + i, 2])))
                folded[i] = sxfe.bfe_mul(sxfe.add(left, rgt), inv2)
            cw = folded
            domain = domain.pow(2)
    last_domain, last_cw, _ = rounds[-1]
    ps.enqueue("FriCodeword",
               [(int(x[0]), int(x[1]), int(x[2])) for x in last_cw])
    last_poly = Domain(last_domain.length, 1).interpolate_xfe(last_cw)
    ps.enqueue("Polynomial",
               [(int(x[0]), int(x[1]), int(x[2])) for x in last_poly])
    a_indices = ps.sample_indices(L, nq)
    def reveal(round_idx, indices):
        domain_r, cw_r_, tree = rounds[round_idx]
        leaves = [(int(cw_r_[i, 0]), int(cw_r_[i, 1]), int(cw_r_[i, 2]))
                  for i in indices]
        ps.enqueue("FriResponse", {
            "queried_leaves": leaves,
            "auth_structure": tree.authentication_structure(indices)})
    reveal(0, a_indices)
    for r in range(len(rounds) - 1):
        dl = rounds[r][0].length
        reveal(r, [(a + dl // 2) % dl for a in a_indices])
    ps.sample_scalars(1)  # discarded barycentric indeterminate
    print(f"FRI {time.time()-t0:.0f}s", flush=True)

    # ---- reveals
    ps.enqueue("MasterMainTableRows",
               [[int(v) for v in main_ldt[i]] for i in a_indices])
    ps.enqueue("AuthenticationStructure",
               main_tree.authentication_structure(a_indices))
    ps.enqueue("MasterAuxTableRows",
               [[(int(x[0]), int(x[1]), int(x[2])) for x in aux_ldt[i]]
                for i in a_indices])
    ps.enqueue("AuthenticationStructure",
               aux_tree.authentication_structure(a_indices))
    ps.enqueue("QuotientSegmentsElements",
               [[(int(x[0]), int(x[1]), int(x[2])) for x in quot_rows[i]]
                for i in a_indices])
    ps.enqueue("AuthenticationStructure",
               quot_tree.authentication_structure(a_indices))

    return ps


def main():
    ps = prove()
    words = ps.proof_words()
    n = len(words)
    digest = tuple(tip5.hash_varlen([n + 1, n] + words))
    print("naive proof words:", n)
    print("digest:", digest)
    print("GOLD MATCH!" if digest == GOLD else "no match")

    import pickle
    path = "/tmp/golden_small_proof.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            prod = pickle.load(f)["words"]
        m = min(len(prod), n)
        first_div = next((i for i in range(m) if prod[i] != words[i]), None)
        print(f"production words: {len(prod)}")
        if first_div is None and len(prod) == n:
            print("production == naive, word for word")
        else:
            print(f"FIRST DIVERGENCE at word {first_div} "
                  f"(prod={prod[first_div] if first_div is not None else '-'}"
                  f" naive={words[first_div] if first_div is not None else '-'})")
            # locate the item containing the divergence
            pos = 2
            for k, (variant, ln) in enumerate(ps.log):
                if first_div is not None and pos <= first_div < pos + ln + 1:
                    print(f"inside item {k}: {variant} "
                          f"(offset {first_div - pos - 1} into its encoding)")
                    break
                pos += ln + 1


if __name__ == "__main__":
    main()
