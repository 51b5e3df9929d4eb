"""Minimal AES-CBC for the PDF standard security handler's AESV2/V3
crypt filters (PDF 32000-1 §7.6.2-7.6.3; FIPS-197).

Pure stdlib, written from the published FIPS-197 algorithm: the
container ships no crypto library, and the decode path only ever
touches owner-locked empty-user-password documents (the
world-readable shape), so a compact table-driven implementation is
the right tool — byte-exact, deterministic, and fast enough for the
fixture-sized ciphertexts the codec sees per document. The S-box is
GENERATED (GF(2^8) inverse + affine transform) rather than pasted,
so a typo cannot silently corrupt one entry.

Not constant-time and not for protecting secrets: this DECODES
already-world-readable documents (and builds test fixtures). That is
the same threat model as the RC4 slice shipped in round 4.
"""

from __future__ import annotations


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    sbox = [0] * 256
    for c in range(256):
        inv = 0 if c == 0 else exp[(255 - log[c]) % 255]
        # affine transform: b ^= rot(b,1..4) ^ 0x63
        s = inv
        for sh in range(1, 5):
            s ^= ((inv << sh) | (inv >> (8 - sh))) & 0xFF
        sbox[c] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, s in enumerate(sbox):
        inv_sbox[s] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]
# precomputed GF(2^8) multiplication tables for the fixed MixColumns
# coefficients — the R6 KDF (Algorithm 2.B) runs thousands of blocks
# per key derivation, and per-bit _gmul loops make that minutes in
# pure Python; table lookups make it tenths of a second
_MUL = {c: [_gmul(x, c) for x in range(256)]
        for c in (2, 3, 9, 11, 13, 14)}


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 128 or 256 bits")
    nr = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # one 16-byte round key per round, column-major state order
    return [sum(words[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(st: list[int], rk: list[int]) -> None:
    for i in range(16):
        st[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    st = list(block)
    _add_round_key(st, rks[0])
    nr = len(rks) - 1
    m2, m3 = _MUL[2], _MUL[3]
    for rnd in range(1, nr + 1):
        st = [_SBOX[st[_SHIFT[i]]] for i in range(16)]  # sub+shift
        if rnd != nr:
            out = []
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = st[c:c + 4]
                out += [
                    m2[a0] ^ m3[a1] ^ a2 ^ a3,
                    a0 ^ m2[a1] ^ m3[a2] ^ a3,
                    a0 ^ a1 ^ m2[a2] ^ m3[a3],
                    m3[a0] ^ a1 ^ a2 ^ m2[a3],
                ]
            st = out
        _add_round_key(st, rks[rnd])
    return bytes(st)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    st = list(block)
    nr = len(rks) - 1
    _add_round_key(st, rks[nr])
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, -1, -1):
        st = [_INV_SBOX[st[_INV_SHIFT[i]]] for i in range(16)]
        _add_round_key(st, rks[rnd])
        if rnd != 0:
            out = []
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = st[c:c + 4]
                out += [
                    m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3],
                    m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3],
                    m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3],
                    m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3],
                ]
            st = out
    return bytes(st)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC with PKCS#7-style padding (what /AESV2 streams carry,
    §7.6.2: ciphertext = IV || CBC(pad(data))). ``pad=False`` is the
    R6 key-wrap mode (/UE /OE: exactly 32 bytes, no padding)."""
    rks = _expand_key(key)
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs block-aligned input")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """Block-aligned AES-ECB (the R6 /Perms entry, §7.6.4.3)."""
    if len(data) % 16:
        raise ValueError("ECB needs block-aligned input")
    rks = _expand_key(key)
    return b"".join(_encrypt_block(data[i:i + 16], rks)
                    for i in range(0, len(data), 16))


def ecb_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("ECB needs block-aligned input")
    rks = _expand_key(key)
    return b"".join(_decrypt_block(data[i:i + 16], rks)
                    for i in range(0, len(data), 16))


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    """Inverse of cbc_encrypt; raises ValueError on ragged input or a
    malformed pad (a wrong key shows up here — quarantine, never
    emit garbage plaintext)."""
    if len(data) % 16 or not data:
        raise ValueError("AES ciphertext not a multiple of 16")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        out += bytes(x ^ y
                     for x, y in zip(_decrypt_block(block, rks), prev))
        prev = block
    if not unpad:
        return bytes(out)
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES padding")
    return bytes(out[:-pad])
