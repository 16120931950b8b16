"""XXH3-64 parity tests.

The reference keys tile dedup with XXH3-64 (dedup.rs:48-59). These tests
pin our implementation THREE ways:

1. GOLDEN vectors: 35 (length -> hash) pairs covering every size-class
   boundary of the algorithm (0/1-3/4-8/9-16/17-128/129-240/long, block
   and stripe edges), captured from the canonical library (libxxhash
   0.8.1, whose empty-input value matches the published spec constant
   0x2D06800538D394C2) — these hold even on hosts with no libxxhash.
2. Library cross-check: when a system libxxhash is present (it is, in
   this container), the pure fallback is swept against it over every
   length 0..600 plus larger randoms — bit-identical.
3. Backend agreement: the public xxh3_64() and the pure xxh3_64_py()
   agree, so a mixed cluster (some nodes with the C library, some
   without) cannot diverge on dedup keys.
"""

import random

import pytest

from gpq_tiles_spark.kernels.hashes import content_hash64
from gpq_tiles_spark.kernels.xxh3 import lib_available, xxh3_64, xxh3_64_py


def _pat(n: int) -> bytes:
    return bytes((i * 37 + (i >> 8)) & 0xFF for i in range(n))


# captured from libxxhash 0.8.1 over _pat(n); empty matches the spec's
# published XXH3_64bits("") constant
GOLDEN = [
    (0, 0x2D06800538D394C2),
    (1, 0xC44BDFF4074EECDB),
    (2, 0x638DE1946D9EE402),
    (3, 0x2B15AA0B3D075427),
    (4, 0xE41090FA396E2123),
    (7, 0xBE6069E4A00347E8),
    (8, 0x44DB4D702E7AF307),
    (9, 0x699D61966D226A40),
    (15, 0x0CEE4898BF8801EC),
    (16, 0x79E8AAB409BF708C),
    (17, 0xEAB8A05663E5E451),
    (31, 0xD594B7D758EEDFE5),
    (32, 0x714A8D2CEFE994D1),
    (33, 0x8C7DD4127BBD9FB2),
    (63, 0xE3BB851F6CB8317C),
    (64, 0x895F676D4BCE2E93),
    (96, 0xF95FAC39833AA3C8),
    (97, 0x571B928F918186EA),
    (128, 0xD0C5F5CBBCE75E08),
    (129, 0xB983F428E1F4B8CD),
    (130, 0x32FC7E08E3AF199E),
    (175, 0x0C803C3AE6A50DE8),
    (240, 0x97CA2E159EBF5174),
    (241, 0x8A70955E58EC2034),
    (256, 0xA37FD471FBEAD12A),
    (512, 0xB0E2B122F2E4BBEE),
    (1023, 0x4A93A7D6E0754F64),
    (1024, 0x4ADCACEB384E2D8B),
    (1025, 0x2D9EFB2B7FCBBB3A),
    (2047, 0x2B9D8F046DD30530),
    (2048, 0x1593B55E2530D3C4),
    (2049, 0xDE493BEAAFCB1B47),
    (5000, 0x6CB0CEB9D1DEFBCF),
    (65599, 0xA29531B15637BC11),
    (1048576 + 513, 0x43D9464965E66173),
]


def test_golden_vectors_pure():
    for n, want in GOLDEN:
        assert xxh3_64_py(_pat(n)) == want, f"len {n}"


def test_golden_vectors_public_entry():
    for n, want in GOLDEN:
        assert xxh3_64(_pat(n)) == want, f"len {n}"


def test_reference_dedup_test_string():
    """dedup.rs:203 hashes b"Hello, PMTiles!" — pin its actual value."""
    assert xxh3_64(b"Hello, PMTiles!") == 0xA0C874329974DFDA
    assert xxh3_64_py(b"Hello, PMTiles!") == 0xA0C874329974DFDA


@pytest.mark.skipif(not lib_available(), reason="no system libxxhash")
def test_pure_matches_system_library_exhaustive():
    from gpq_tiles_spark.kernels import xxh3 as X

    lib = X._load()  # the already-resolved handle, whatever its soname
    rng = random.Random(42)
    for n in list(range(0, 600)) + [1024 * k + d for k in (1, 2, 3, 7)
                                    for d in (-65, -1, 0, 1, 63, 64, 65)]:
        data = rng.randbytes(n)
        assert xxh3_64_py(data) == lib.XXH3_64bits(data, n), f"len {n}"


def test_content_hash_is_xxh3():
    """The tile dedup key IS xxh3_64 now (reference TileHasher parity)."""
    blob = b"\x1a\x09" + _pat(9)
    assert content_hash64(blob) == xxh3_64(blob) == xxh3_64_py(blob)
