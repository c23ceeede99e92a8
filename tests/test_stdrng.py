"""ChaCha12 StdRng: core keystream vector, word order, seed offsetting."""

from triton_vm_tpu.fields.bfe import P
from triton_vm_tpu.utils.stdrng import ChaCha12Rng


def test_chacha12_zero_key_ecrypt_vector():
    r = ChaCha12Rng(bytes(32))
    ks = b"".join(r.next_u32().to_bytes(4, "little") for _ in range(8))
    assert ks.hex() == ("9bf49a6a0755f953811fce125f2683d5"
                        "0429c3bb49e074147e0089a52eae155f")


def test_next_u64_is_low_word_first():
    a = ChaCha12Rng(bytes(32))
    b = ChaCha12Rng(bytes(32))
    lo, hi = b.next_u32(), b.next_u32()
    assert a.next_u64() == lo | (hi << 32)


def test_block_counter_advances():
    r = ChaCha12Rng(bytes(range(32)))
    first = [r.next_u32() for _ in range(16)]
    second = [r.next_u32() for _ in range(16)]
    assert first != second


def test_bfe_sampling_canon_method():
    """Default sampling follows rand 0.9+'s `random_range(0..=P-1)`
    (Canon's method): widening multiply, one bias-correction draw when
    the low-order product exceeds 2^64 - P."""
    r = ChaCha12Rng(bytes(range(32)))
    vals = r.random_bfes(1000)
    assert all(0 <= v < P for v in vals)

    r2 = ChaCha12Rng(bytes(range(32)))
    expect = []
    mask = (1 << 64) - 1
    for _ in range(1000):
        v = r2.next_u64() * P
        hi, lo = v >> 64, v & mask
        if lo > (1 << 32) - 1:  # (-P) mod 2^64
            hi2 = (r2.next_u64() * P) >> 64
            if lo + hi2 > mask:
                hi += 1
        expect.append(hi)
    assert vals == expect


def test_bfe_sampling_modp_variant(monkeypatch):
    monkeypatch.setenv("TVM_RNG_BFE", "modp")
    r = ChaCha12Rng(bytes(range(32)))
    vals = r.random_bfes(1000)
    r2 = ChaCha12Rng(bytes(range(32)))
    assert vals == [r2.next_u64() % P for _ in range(1000)]


def test_prover_seed_offsetting_is_le_wrapping_addition():
    from triton_vm_tpu.stark.prover import _offset_seed

    seed = bytes([0xFF] * 4 + [0] * 28)
    out = _offset_seed(seed, 1)
    assert out[:5] == bytes([0, 0, 0, 0, 1])


def test_batched_drbg_matches_scalar():
    from triton_vm_tpu.utils.stdrng import drbg_bfes_batch
    from triton_vm_tpu.stark.prover import _drbg_bfes

    seed = bytes(range(32))
    batch = drbg_bfes_batch(seed, range(5), 17)
    for off in range(5):
        assert list(batch[off]) == _drbg_bfes(seed, off, 17)


def test_batched_drbg_matches_scalar_modp(monkeypatch):
    monkeypatch.setenv("TVM_RNG_BFE", "modp")
    from triton_vm_tpu.utils.stdrng import drbg_bfes_batch
    from triton_vm_tpu.stark.prover import _drbg_bfes

    seed = bytes(reversed(range(32)))
    batch = drbg_bfes_batch(seed, [0, 3, 470], 9)
    for i, off in enumerate([0, 3, 470]):
        assert list(batch[i]) == _drbg_bfes(seed, off, 9)


def test_rand_stdrng_value_stability_vector():
    """rand's own rngs/std.rs `test_stdrng_construction` known-answer:
    pins StdRng = ChaCha12 `from_seed` + `next_u64` exactly."""
    seed = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0]
                 + [0] * 16)
    assert ChaCha12Rng(seed).next_u64() == 10719222850664546238
