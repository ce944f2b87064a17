"""Byte parity of the pure-Python XXH64 with Spark's xxhash64 — the
foundation for computing oracle ground truth of xxhash64-derived operators
(simhash) outside Spark."""

from dbt_extrica_spark.functions.xxh64 import xxh64, xxh64_signed

# probes cover every tail path: empty, 1-3 bytes (byte loop only), 4-7
# (4-byte lane + bytes), 8-31 (8-byte lanes + tail), >=32 (main loop)
PROBES = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
          "hello world", "x" * 31, "y" * 32, "z" * 33,
          "The quick brown fox jumps over the lazy dog",
          "tok123", "naïve-utf8-ñ", "a" * 100]


def test_matches_spark_xxhash64(spark):
    row = spark.sql("SELECT " + ", ".join(
        f"xxhash64('{t}') AS h{i}" for i, t in enumerate(PROBES)
    )).collect()[0]
    for i, t in enumerate(PROBES):
        assert xxh64_signed(t.encode("utf-8")) == row[i], repr(t)


def test_unsigned_signed_consistency():
    for t in PROBES:
        u = xxh64(t.encode())
        s = xxh64_signed(t.encode())
        assert s == (u - (1 << 64) if u >= (1 << 63) else u)
        assert 0 <= u < (1 << 64)


def test_seed_changes_hash():
    assert xxh64(b"abc", 42) != xxh64(b"abc", 43)
