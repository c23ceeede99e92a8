"""Field arithmetic: scalar semantics and vectorized limb kernels agree."""

import numpy as np
import pytest

from triton_vm_tpu.fields import bfe, xfe
from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.ops import gf, gfx

EDGE = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF, 7,
        (1 << 63), (1 << 63) + 12345, P // 2]


def _rand_bfe(rng, n):
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    vals[: len(EDGE)] = EDGE[: min(len(EDGE), n)]
    return vals


# ------------------------------------------------------------ scalar layer

def test_scalar_bfe_basics():
    assert bfe.add(P - 1, 1) == 0
    assert bfe.mul(P - 1, P - 1) == 1
    assert bfe.inv(2) == (P + 1) // 2
    for a in [1, 2, 7, P - 1, 0xdeadbeef]:
        assert bfe.mul(a, bfe.inv(a)) == 1
    r32 = bfe.primitive_root_of_unity(1 << 32)
    assert r32 == 0x185629DCDA58878C  # twenty-first tabulated value
    assert pow(r32, 1 << 32, P) == 1 and pow(r32, 1 << 31, P) == P - 1


def test_scalar_batch_inverse():
    vals = [1, 2, 3, 12345, P - 1]
    for v, i in zip(vals, bfe.batch_inverse(vals)):
        assert v * i % P == 1


def test_scalar_xfe():
    a = (3, 5, 7)
    b = (11, 13, 17)
    ab = xfe.mul(a, b)
    # multiply out by hand: reduce x^3 = x - 1, x^4 = x^2 - x
    assert ab == xfe.mul(b, a)
    assert xfe.mul(a, xfe.inv(a)) == xfe.ONE
    assert xfe.mul(xfe.X, xfe.mul(xfe.X, xfe.X)) == (P - 1, 1, 0)  # x^3 = x-1
    assert xfe.mod_pow(a, 0) == xfe.ONE
    assert xfe.mod_pow(a, 5) == xfe.mul(a, xfe.mul(a, xfe.mul(a, xfe.mul(a, a))))
    assert xfe.unlift(xfe.lift(42)) == 42


# -------------------------------------------------------- vectorized layer

def test_gf_roundtrip(rng):
    vals = _rand_bfe(rng, 64)
    v = gf.from_u64(vals)
    assert gf.shape(v) == (64,)
    np.testing.assert_array_equal(gf.to_u64(v), vals)


@pytest.mark.parametrize("op,sop", [
    (gf.add, bfe.add), (gf.sub, bfe.sub), (gf.mul, bfe.mul),
])
def test_gf_binops(rng, op, sop):
    a = _rand_bfe(rng, 257)
    b = _rand_bfe(rng, 257)[::-1].copy()
    got = gf.to_u64(op(gf.from_u64(a), gf.from_u64(b)))
    want = np.array([sop(int(x), int(y)) for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_gf_neg_inv_pow(rng):
    a = _rand_bfe(rng, 33)
    v = gf.from_u64(a)
    np.testing.assert_array_equal(
        gf.to_u64(gf.neg(v)), [bfe.neg(int(x)) for x in a])
    nz = a.copy()
    nz[nz == 0] = 1
    vi = gf.inv(gf.from_u64(nz))
    np.testing.assert_array_equal(
        gf.to_u64(vi), [bfe.inv(int(x)) for x in nz])
    np.testing.assert_array_equal(
        gf.to_u64(gf.pow_const(v, 7)), [pow(int(x), 7, P) for x in a])


def test_gf_batch_inverse(rng):
    a = _rand_bfe(rng, 40)
    a[5] = 0
    a[17] = 0  # zeros map to zero
    out = gf.to_u64(gf.batch_inverse(gf.from_u64(a), axis=0))
    for x, y in zip(a, out):
        if x == 0:
            assert y == 0
        else:
            assert int(x) * int(y) % P == 1


def test_gfx_ops(rng):
    a = _rand_bfe(rng, 3 * 21).reshape(21, 3)
    b = _rand_bfe(rng, 3 * 21)[::-1].reshape(21, 3)
    va, vb = gfx.from_u64(a), gfx.from_u64(b)
    assert gfx.shape(va) == (21,)

    got = gfx.to_u64(gfx.mul(va, vb))
    want = np.array([xfe.mul(tuple(map(int, x)), tuple(map(int, y)))
                     for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(got, want)

    got = gfx.to_u64(gfx.add(va, vb))
    want = np.array([xfe.add(tuple(map(int, x)), tuple(map(int, y)))
                     for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(got, want)

    # inverses (avoid the zero element)
    a[0] = (1, 0, 0)
    va = gfx.from_u64(a)
    vi = gfx.inv(va)
    prod = gfx.to_u64(gfx.mul(va, vi))
    for row in prod:
        assert tuple(map(int, row)) == (1, 0, 0)


def test_gfx_batch_inverse(rng):
    a = _rand_bfe(rng, 3 * 16).reshape(16, 3)
    a[3] = (0, 0, 0)
    v = gfx.from_u64(a)
    out = gfx.batch_inverse(v, axis=0)
    prod = gfx.to_u64(gfx.mul(v, out))
    for i, row in enumerate(prod):
        want = (0, 0, 0) if i == 3 else (1, 0, 0)
        assert tuple(map(int, row)) == want
