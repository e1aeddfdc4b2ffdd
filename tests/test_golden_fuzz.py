"""Property/fuzz tests: golden round-trip identity on random and
adversarial inputs (SURVEY.md §4: the reference has no such suite)."""
import random

import pytest

from csc_tpu.golden import compress, decompress


def _roundtrip(data, level=2):
    blob = compress(data, level=level, dict_size=max(len(data), 1))
    assert decompress(blob) == data


@pytest.mark.parametrize("seed", range(4))
def test_random_bytes(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 30000)
    _roundtrip(bytes(rng.getrandbits(8) for _ in range(n)))


@pytest.mark.parametrize("seed", range(4))
def test_structured_random(seed):
    rng = random.Random(100 + seed)
    parts = []
    vocab = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 40)))
             for _ in range(12)]
    while sum(map(len, parts)) < 20000:
        parts.append(rng.choice(vocab) * rng.randint(1, 6))
    _roundtrip(b"".join(parts), level=rng.choice([1, 2, 5]))


def test_adversarial_patterns():
    cases = [
        b"\x00" * 9000,                      # long zero run (rep chains)
        b"\xff" * 9000,                      # carry-heavy
        bytes(range(256)) * 40,              # max distinct, low entropy order-1
        b"ab" * 5000,                        # dist-2 period
        b"a" * 142 + b"b" + b"a" * 300,      # len-143 boundary
        b"x" + b"\xe8\x00\x00\x00\x00" * 400,  # E8 trigger soup
        (b"the and for with " * 1200),       # dict-filter heavy
    ]
    for data in cases:
        _roundtrip(data, level=2)
        _roundtrip(data, level=5)


def test_all_levels_one_input():
    rng = random.Random(7)
    data = bytes(rng.choice(b"abcdefgh \n") for _ in range(15000))
    for lvl in (1, 2, 3, 4, 5):
        _roundtrip(data, lvl)
