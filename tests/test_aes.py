"""FIPS-197 pin for the stdlib AES used by the PDF AESV2 crypt
filter (pdfspark/sources/aes.py)."""

import pytest

from pdfspark.sources.aes import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    cbc_decrypt,
    cbc_encrypt,
)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
K128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
K256 = bytes.fromhex(
    "000102030405060708090a0b0c0d0e0f"
    "101112131415161718191a1b1c1d1e1f")


def test_fips197_appendix_c_vectors():
    ct = _encrypt_block(PT, _expand_key(K128))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _decrypt_block(ct, _expand_key(K128)) == PT
    ct = _encrypt_block(PT, _expand_key(K256))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct, _expand_key(K256)) == PT


def test_cbc_round_trip_and_padding_guards():
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 7) % 256 for i in range(n))
        ct = cbc_encrypt(K128, iv, data)
        assert len(ct) % 16 == 0 and len(ct) >= n + 1
        assert cbc_decrypt(K128, iv, ct) == data
    with pytest.raises(ValueError):
        cbc_decrypt(K128, iv, b"short")
    # corrupt the final block -> padding error, never silent garbage
    ct = cbc_encrypt(K128, iv, b"x" * 32)
    bad = ct[:-1] + bytes([ct[-1] ^ 0xFF])
    with pytest.raises(ValueError):
        cbc_decrypt(K128, iv, bad)
    with pytest.raises(ValueError):
        _expand_key(bytes(24))  # 192-bit outside the PDF slice
