"""Vendored pure-python AES (FIPS-197) — numpy-vectorized across blocks.

No crypto libs ship in this container; PDF Standard-security V4 (/AESV2,
AES-128-CBC) and V5 (/AESV3, AES-256-CBC) need a block cipher, so this
implements the public FIPS-197 algorithm directly: S-box generated from
the GF(2^8) inverse + affine map (not a pasted table), key expansion per
§5.2, and ECB en/decryption where each round transforms ALL blocks of the
input at once as a (n_blocks, 4, 4) uint8 ndarray — InvMixColumns etc.
are table lookups + XORs over the whole array, so CBC decryption of a
long stream costs rounds x a few numpy ops, not per-block Python.

Known-answer tests pin the FIPS-197 Appendix C vectors (AES-128 and
AES-256); the PDF layer builds CBC + PKCS#7 on top."""

from __future__ import annotations

import numpy as np


def _gf_mul(a: int, b: int) -> int:
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


def _build_tables():
    # GF(2^8) inverse via exp/log tables (generator 3), then the affine map
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(a):
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        q = inv(a)
        r = 0x63
        for i in range(8):
            bit = (
                (q >> i) ^ (q >> ((i + 4) % 8)) ^ (q >> ((i + 5) % 8))
                ^ (q >> ((i + 6) % 8)) ^ (q >> ((i + 7) % 8))
            ) & 1
            r ^= bit << i
        sbox[a] = r
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    mul = {
        m: np.array([_gf_mul(a, m) for a in range(256)], dtype=np.uint8)
        for m in (2, 3, 9, 11, 13, 14)
    }
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()
_RCON = np.array(
    [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D],
    dtype=np.uint8,
)


def _expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 §5.2 -> (rounds+1, 4, 4) round keys (column-major state)."""
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES key must be 128/192/256-bit"
    rounds = nk + 6
    w = [np.frombuffer(key[4 * i : 4 * i + 4], dtype=np.uint8).copy() for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = w[i - 1].copy()
        if i % nk == 0:
            t = np.roll(t, -1)
            t = _SBOX[t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = _SBOX[t]
        w.append(w[i - nk] ^ t)
    rk = np.stack(w).reshape(rounds + 1, 4, 4)  # (round, word, byte)
    return rk.transpose(0, 2, 1)  # state is column-major: [round][row][col]


# state layout: (n, 4, 4) where state[b][r][c] = byte r of column c
_SHIFT_COLS = np.array([[(c + r) % 4 for c in range(4)] for r in range(4)])
_INV_SHIFT_COLS = np.array([[(c - r) % 4 for c in range(4)] for r in range(4)])
_ROWS = np.arange(4)[:, None].repeat(4, axis=1)


def _to_state(data: bytes) -> np.ndarray:
    a = np.frombuffer(data, dtype=np.uint8).reshape(-1, 4, 4)  # (n, col, row)
    return a.transpose(0, 2, 1)


def _from_state(s: np.ndarray) -> bytes:
    return s.transpose(0, 2, 1).tobytes()


def _encrypt_state(s: np.ndarray, rk: np.ndarray) -> np.ndarray:
    rounds = rk.shape[0] - 1
    s = s ^ rk[0]
    for rnd in range(1, rounds):
        s = _SBOX[s][:, _ROWS, _SHIFT_COLS]
        a = s
        m2, m3 = _MUL[2][a], _MUL[3][a]
        s = np.empty_like(a)
        s[:, 0] = m2[:, 0] ^ m3[:, 1] ^ a[:, 2] ^ a[:, 3]
        s[:, 1] = a[:, 0] ^ m2[:, 1] ^ m3[:, 2] ^ a[:, 3]
        s[:, 2] = a[:, 0] ^ a[:, 1] ^ m2[:, 2] ^ m3[:, 3]
        s[:, 3] = m3[:, 0] ^ a[:, 1] ^ a[:, 2] ^ m2[:, 3]
        s = s ^ rk[rnd]
    s = _SBOX[s][:, _ROWS, _SHIFT_COLS]
    return s ^ rk[rounds]


def _decrypt_state(s: np.ndarray, rk: np.ndarray) -> np.ndarray:
    rounds = rk.shape[0] - 1
    s = s ^ rk[rounds]
    for rnd in range(rounds - 1, 0, -1):
        s = _INV_SBOX[s[:, _ROWS, _INV_SHIFT_COLS]]
        s = s ^ rk[rnd]
        a = s
        m9, m11, m13, m14 = (_MUL[9][a], _MUL[11][a], _MUL[13][a], _MUL[14][a])
        s = np.empty_like(a)
        s[:, 0] = m14[:, 0] ^ m11[:, 1] ^ m13[:, 2] ^ m9[:, 3]
        s[:, 1] = m9[:, 0] ^ m14[:, 1] ^ m11[:, 2] ^ m13[:, 3]
        s[:, 2] = m13[:, 0] ^ m9[:, 1] ^ m14[:, 2] ^ m11[:, 3]
        s[:, 3] = m11[:, 0] ^ m13[:, 1] ^ m9[:, 2] ^ m14[:, 3]
    s = _INV_SBOX[s[:, _ROWS, _INV_SHIFT_COLS]]
    return s ^ rk[0]


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    assert len(data) % 16 == 0
    if not data:
        return b""
    return _from_state(_encrypt_state(_to_state(data), _expand_key(key)))


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    assert len(data) % 16 == 0
    if not data:
        return b""
    return _from_state(_decrypt_state(_to_state(data), _expand_key(key)))


# ---------------------------------------------------------------------------
# Scalar T-table fast path (CBC encryption is sequential across blocks, so
# the batch-vectorized state machinery pays ~130 us of numpy overhead PER
# BLOCK there; the classic 32-bit T-table round is ~25 us of python ints.
# Used by aes_cbc_encrypt — the hot path of PDF R6's Algorithm 2.B hash,
# which CBC-encrypts ~200 blocks per round for up to 128 rounds.)
# ---------------------------------------------------------------------------
def _build_enc_tables():
    sbox, m2, m3 = _SBOX.tolist(), _MUL[2].tolist(), _MUL[3].tolist()
    t0 = [0] * 256
    for a in range(256):
        s = sbox[a]
        t0[a] = (m2[s] << 24) | (s << 16) | (s << 8) | m3[s]
    rot = lambda t: ((t >> 8) | (t << 24)) & 0xFFFFFFFF
    t1 = [rot(t) for t in t0]
    t2 = [rot(t) for t in t1]
    t3 = [rot(t) for t in t2]
    return t0, t1, t2, t3, sbox


_T0, _T1, _T2, _T3, _SBOX_L = _build_enc_tables()


def _expand_key_words(key: bytes) -> list[int]:
    """Key schedule as big-endian 32-bit words (one list, 4*(rounds+1))."""
    nk = len(key) // 4
    rounds = nk + 6
    sb = _SBOX_L
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (sb[(t >> 24) & 255] << 24) | (sb[(t >> 16) & 255] << 16) | (
                sb[(t >> 8) & 255] << 8
            ) | sb[t & 255]
            t ^= int(_RCON[i // nk - 1]) << 24
        elif nk > 6 and i % nk == 4:
            t = (sb[(t >> 24) & 255] << 24) | (sb[(t >> 16) & 255] << 16) | (
                sb[(t >> 8) & 255] << 8
            ) | sb[t & 255]
        w.append(w[i - nk] ^ t)
    return w


def _encrypt_words(w0, w1, w2, w3, wk: list[int]) -> tuple[int, int, int, int]:
    rounds = len(wk) // 4 - 1
    t0, t1, t2, t3, sb = _T0, _T1, _T2, _T3, _SBOX_L
    w0 ^= wk[0]
    w1 ^= wk[1]
    w2 ^= wk[2]
    w3 ^= wk[3]
    for r in range(1, rounds):
        k = 4 * r
        n0 = t0[(w0 >> 24) & 255] ^ t1[(w1 >> 16) & 255] ^ t2[(w2 >> 8) & 255] ^ t3[w3 & 255] ^ wk[k]
        n1 = t0[(w1 >> 24) & 255] ^ t1[(w2 >> 16) & 255] ^ t2[(w3 >> 8) & 255] ^ t3[w0 & 255] ^ wk[k + 1]
        n2 = t0[(w2 >> 24) & 255] ^ t1[(w3 >> 16) & 255] ^ t2[(w0 >> 8) & 255] ^ t3[w1 & 255] ^ wk[k + 2]
        n3 = t0[(w3 >> 24) & 255] ^ t1[(w0 >> 16) & 255] ^ t2[(w1 >> 8) & 255] ^ t3[w2 & 255] ^ wk[k + 3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    k = 4 * rounds
    n0 = (sb[(w0 >> 24) & 255] << 24) | (sb[(w1 >> 16) & 255] << 16) | (sb[(w2 >> 8) & 255] << 8) | sb[w3 & 255]
    n1 = (sb[(w1 >> 24) & 255] << 24) | (sb[(w2 >> 16) & 255] << 16) | (sb[(w3 >> 8) & 255] << 8) | sb[w0 & 255]
    n2 = (sb[(w2 >> 24) & 255] << 24) | (sb[(w3 >> 16) & 255] << 16) | (sb[(w0 >> 8) & 255] << 8) | sb[w1 & 255]
    n3 = (sb[(w3 >> 24) & 255] << 24) | (sb[(w0 >> 16) & 255] << 16) | (sb[(w1 >> 8) & 255] << 8) | sb[w2 & 255]
    return n0 ^ wk[k], n1 ^ wk[k + 1], n2 ^ wk[k + 2], n3 ^ wk[k + 3]


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC mode, no padding (caller pads).  Sequential across blocks by
    definition — runs on the scalar T-table path (consistency with the
    vectorized core is pinned by tests on the FIPS-197 vectors)."""
    assert len(data) % 16 == 0
    wk = _expand_key_words(key)
    p0, p1, p2, p3 = (int.from_bytes(iv[i : i + 4], "big") for i in (0, 4, 8, 12))
    out = bytearray()
    for i in range(0, len(data), 16):
        b = data[i : i + 16]
        p0, p1, p2, p3 = _encrypt_words(
            p0 ^ int.from_bytes(b[0:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"),
            wk,
        )
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big") + p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decryption parallelizes: ECB-decrypt every block at once, then
    XOR with the shifted ciphertext (numpy over the whole stream)."""
    assert len(data) % 16 == 0
    if not data:
        return b""
    ct = _to_state(data)
    pt = _decrypt_state(ct, _expand_key(key))
    prev = np.concatenate([_to_state(iv), ct[:-1]])
    return _from_state(pt ^ prev)


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and len(data) >= n:
        return data[:-n]
    return data  # tolerate malformed padding (salvage spirit)
