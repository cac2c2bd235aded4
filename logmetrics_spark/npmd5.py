"""Numpy-vectorized MD5 — the engine's 52-bit hash convention without
per-row Python.

The fused kernel derives two deterministic ids per datapoint from md5
(``record_id`` and the histogram reservoir seed ``h52``) — the bit
contract shared with both the Python and the DuckDB oracles. hashlib
costs a Python-level loop per row on the widest data in the job; this
module runs the MD5 compression function across ALL rows at once with
uint32 numpy lanes (~6 vector ops per round x 64 rounds per block), so
hashing scales with numpy throughput instead of interpreter dispatch.

Bit-exactness vs hashlib is property-tested over lengths 0..3 blocks
and unicode inputs (tests/test_npmd5.py). Messages are grouped by
padded block count; each group is one vectorized pass. Below
``_SMALL_N`` rows the fixed numpy overhead loses to hashlib, so tiny
batches fall back (identical results either way).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint8,
)
_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)], dtype=np.uint32
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.uint8,
)

_SMALL_N = 384  # measured crossover vs the hashlib loop


def _compress(M: np.ndarray, n_blocks: int) -> tuple[np.ndarray, np.ndarray]:
    """M: (n, n_blocks*16) little-endian uint32 words. Returns the
    final (A, B) state words (C/D never feed the 52-bit prefix)."""
    n = M.shape[0]
    A = np.full(n, 0x67452301, dtype=np.uint32)
    B = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    C = np.full(n, 0x98BADCFE, dtype=np.uint32)
    D = np.full(n, 0x10325476, dtype=np.uint32)
    for blk in range(n_blocks):
        a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
        base = blk * 16
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            x = a + f + _K[i] + M[:, base + int(_G[i])]  # uint32 wrap
            s = int(_S[i])
            rot = (x << np.uint32(s)) | (x >> np.uint32(32 - s))
            a, d, c, b = d, c, b, b + rot
        A += a
        B += b
        C += c
        D += d
    return A, B


def _prefix52(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """int(hexdigest[:13], 16) from the digest's first words: the
    first 13 hex chars are digest bytes 0..5 plus the high nibble of
    byte 6, with A/B serialized little-endian."""
    A64 = A.astype(np.uint64)
    B64 = B.astype(np.uint64)
    big7 = (
        ((A64 & 0xFF) << np.uint64(48))
        | (((A64 >> np.uint64(8)) & 0xFF) << np.uint64(40))
        | (((A64 >> np.uint64(16)) & 0xFF) << np.uint64(32))
        | (((A64 >> np.uint64(24)) & 0xFF) << np.uint64(24))
        | ((B64 & 0xFF) << np.uint64(16))
        | (((B64 >> np.uint64(8)) & 0xFF) << np.uint64(8))
        | ((B64 >> np.uint64(16)) & 0xFF)
    )
    return (big7 >> np.uint64(4)).astype(np.int64)


def _hashlib_52(msgs) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(m).hexdigest()[:13], 16) for m in msgs),
        dtype=np.int64,
        count=len(msgs),
    )


def md5_52_bytes(msgs: list[bytes] | np.ndarray) -> np.ndarray:
    """52-bit md5 prefix (== int(md5(m).hexdigest()[:13], 16)) for a
    sequence of bytes messages, vectorized. Messages are grouped by
    padded block count; each group runs one numpy compression pass."""
    n = len(msgs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n < _SMALL_N:
        return _hashlib_52(msgs)
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    # padded byte length: len + 1 (0x80) + zeros to 56 mod 64 + 8
    padded_len = ((lens + 8) // 64 + 1) * 64
    out = np.empty(n, dtype=np.int64)
    flat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    for L in np.unique(padded_len):
        sel = np.nonzero(padded_len == L)[0]
        m = len(sel)
        sl = lens[sel]
        padded = np.zeros((m, int(L)), dtype=np.uint8)
        # scatter all message bytes in one fancy-index assignment
        total = int(sl.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(sl)[:-1])), sl
        )
        src = np.repeat(starts[sel], sl) + within
        tgt = np.repeat(np.arange(m, dtype=np.int64) * int(L), sl) + within
        padded.reshape(-1)[tgt] = flat[src]
        padded[np.arange(m), sl] = 0x80
        padded[:, -8:] = (
            (sl * 8).astype("<u8").reshape(m, 1).view(np.uint8)
        )
        M = padded.view("<u4").reshape(m, int(L) // 4)
        A, B = _compress(M, int(L) // 64)
        out[sel] = _prefix52(A, B)
    return out


def md5_52_str(strs) -> np.ndarray:
    """52-bit md5 prefix for a sequence of strings (utf-8 encoded).
    Accepts any iterable of str (pandas Series values, lists)."""
    return md5_52_bytes([s.encode("utf-8") for s in strs])
