"""C++ native runtime vs hashlib/secrets."""

import hashlib

from zkecdsa_tpu.runtime import native


def test_sha256_matches_hashlib():
    for msg in (b"", b"abc", b"x" * 55, b"y" * 56, b"z" * 64, b"w" * 1000):
        assert native.sha256(msg) == hashlib.sha256(msg).digest()


def test_sha256_batch_matches():
    msgs = [bytes([i]) * (i * 7 % 200) for i in range(50)]
    assert native.sha256_batch(msgs) == [
        hashlib.sha256(m).digest() for m in msgs
    ]


def test_fill_random():
    a = native.fill_random(32)
    b = native.fill_random(32)
    assert len(a) == 32 and a != b
