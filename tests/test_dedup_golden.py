"""Golden tests: the native-SQL minhash/simhash signature math vs an
independent pure-Python (hashlib + int ops) reimplementation.

This is the third leg of the dedup correctness tripod:
  1. DuckDB oracle (driver gate) replays the SQL math in another engine,
  2. behavioral recall tests (test_extras.py) check the LSH plumbing,
  3. THIS file recomputes signatures from the written definition —
     per shingle/token s: a = int(md5(s)[:15 hex]), b = int(md5(s)[16:30 / 16:20 hex]);
     minhash sig[j] = min_s(a + j*b); simhash bit j from a (j<60) or b (j>=60).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lumbermill_spark.extras import dedup

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog!",
    "pack my box with five dozen liquor jugs",
    "ab",  # shorter than SHINGLE_K → single-shingle fallback
    "",
    "   ",  # whitespace only → zero tokens
    "repeat repeat repeat repeat",
    "unicode café naïve über",
]


def _md5ab(s: str, b_digits: int) -> tuple[int, int]:
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(h[:15], 16), int(h[15 : 15 + b_digits], 16)


def py_minhash_sig(text: str) -> list[int]:
    k, p = dedup.SHINGLE_K, dedup.MINHASH_P
    n = max(len(text) - k + 1, 1)
    shingles = {text[i : i + k] for i in range(n)}
    xs = [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % p for s in shingles]
    return [
        min((dedup.PERM_A[j] * x + dedup.PERM_B[j]) % p for x in xs)
        for j in range(dedup.MINHASH_PERMS)
    ]


def py_simhash_bands(text: str) -> list[int]:
    toks = [t for t in __import__("re").split(r"[ \t\n\r]+", text) if t]
    acc = [0] * dedup.SIMHASH_BITS
    for t in toks:
        a, b = _md5ab(t, 4)
        for j in range(dedup.SIMHASH_BITS):
            bit = (a >> j) & 1 if j < 60 else (b >> (j - 60)) & 1
            acc[j] += 2 * bit - 1
    sbits = [1 if v > 0 else 0 for v in acc]
    return [
        sum(sbits[16 * band + i] << i for i in range(16)) for band in range(dedup.SIMHASH_BANDS)
    ]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )


def test_minhash_signatures_match_pure_python(spark):
    import pytest

    for impl in ("arrow", "native"):
        got = {
            r["doc_id"]: list(r["sig"])
            for r in dedup.minhash_signatures(_df(spark), impl=impl)
            .select("doc_id", "sig")
            .collect()
        }
        for i, t in enumerate(TEXTS):
            assert got[i] == py_minhash_sig(t), f"[{impl}] minhash sig mismatch for {t!r}"


def test_simhash_bands_match_pure_python(spark):
    got = {
        r["doc_id"]: list(r["bands"])
        for r in dedup.simhash_signatures(_df(spark)).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == py_simhash_bands(t), f"simhash bands mismatch for {t!r}"
        assert all(0 <= b < (1 << 16) for b in got[i])


def test_minhash_shingles_are_distinct_ordered_sets(spark):
    rows = dedup.minhash_signatures(_df(spark)).select("doc_id", "shingles").collect()
    for r in rows:
        sh = list(r["shingles"])
        assert len(sh) == len(set(sh))
    # len<k fallback: whole text is the single shingle
    by_id = {r["doc_id"]: list(r["shingles"]) for r in rows}
    assert by_id[3] == ["ab"]
    assert by_id[4] == [""]


def test_jaccard_expr_exact(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"])], "x array<string>, y array<string>"
    )
    (val,) = df.select(dedup.jaccard_expr(F.col("x"), F.col("y")).alias("j")).collect()[0]
    assert val == 0.5
