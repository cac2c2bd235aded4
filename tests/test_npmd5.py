"""Bit-exactness + performance-shape tests for the vectorized MD5."""

import hashlib
import random

import numpy as np

from logmetrics_spark.npmd5 import _SMALL_N, _hashlib_52, md5_52_bytes, md5_52_str


def _ref(msgs):
    return [int(hashlib.md5(m).hexdigest()[:13], 16) for m in msgs]


def test_known_vectors():
    msgs = [b"", b"a", b"abc", b"message digest", b"x" * 55, b"x" * 56, b"x" * 64]
    assert md5_52_bytes(msgs * 100)[: len(msgs)].tolist() == _ref(msgs)


def test_random_lengths_multi_block():
    rng = random.Random(42)
    msgs = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for _ in range(1500)
    ]
    assert md5_52_bytes(msgs).tolist() == _ref(msgs)


def test_block_boundary_lengths():
    # every padding-critical length: 0..64 plus the 2->3 block edge
    msgs = [b"q" * n for n in list(range(0, 130)) + [119, 120, 121, 183, 184, 185]]
    msgs = msgs * 8  # push past the small-batch fallback
    assert md5_52_bytes(msgs).tolist() == _ref(msgs)


def test_unicode_strings():
    strs = ["héllo wörld", "日本語テキスト", "plain", "", "naïve|123|456"] * 200
    expect = _ref([s.encode("utf-8") for s in strs])
    assert md5_52_str(strs).tolist() == expect


def test_small_batch_fallback_identical():
    msgs = [f"url{i}|17000{i}|{i}".encode() for i in range(_SMALL_N - 1)]
    assert md5_52_bytes(msgs).tolist() == _ref(msgs)
    assert _hashlib_52(msgs).tolist() == _ref(msgs)


def test_empty():
    assert md5_52_bytes([]).shape == (0,)
    assert md5_52_bytes([]).dtype == np.int64
