"""Deduplication over the documents table: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale design notes (what survives 100 TB):
  * exact: one hash-shuffle on the 32-byte fingerprint — the md5 groups are
    tiny so skew is impossible; no text moves after the first projection.
  * n-gram Jaccard: candidate generation is a BAND JOIN on (lang,
    length-band) with ±1 band explode — the O(n²) cross product never exists;
    the expensive set-similarity runs only on candidate pairs inside an
    Arrow-batched UDF.
  * MinHash/LSH: signatures are numpy-vectorized per Arrow batch; each band
    becomes a shuffle key so candidates meet in a groupBy, classic
    shingle→minhash→band→bucket-join; exact verification only on candidates.
  * SimHash: 4×16-bit band blocking (any pair with hamming ≤3 over 64 bits
    shares at least one exact band by pigeonhole) → equality join, no scan.
  * embedding cosine: blocked on the label column (stand-in for a coarse
    quantizer cell); at real scale the block key is an IVF/LSH cell id.

The synthetic documents table has no natural duplicates, so the dedup queries
operate on AUGMENTED input: base ∪ exact copies (doc_id % 10 == 0) ∪ near
copies with a perturbed tail (doc_id % 17 == 0) — constructed identically in
the DuckDB oracle (oracle_extras.py), so outputs are value-comparable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import textstats

EXACT_COPY_MOD = 10
NEAR_COPY_MOD = 17
EXACT_ID_OFFSET = 1_000_000
NEAR_ID_OFFSET = 2_000_000
NEAR_TAIL = " near dup tail"

LEN_BAND = 32  # n-gram candidate blocking: |len(a)-len(b)| <= LEN_BAND
NGRAM_THRESHOLD = 0.82

MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 bands x 8 rows → s-curve threshold ≈ 0.77
SHINGLE_K = 5
MINHASH_VERIFY_THRESHOLD = 0.7
_MERSENNE_P = (1 << 61) - 1

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits each; hamming ≤ 3 ⇒ ≥1 identical band
SIMHASH_MAX_HAMMING = 3

COSINE_DUP_THRESHOLD = 0.98
EMBED_EXACT_MOD = 7
EMBED_NEAR_MOD = 11
EMBED_EXACT_OFFSET = 100_000
EMBED_NEAR_OFFSET = 200_000
EMBED_PERTURB = 0.5  # added to the first component of near-copies


def augmented_docs(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", "text", "lang", "n_chars")
    exact = (
        base.filter(F.col("doc_id") % EXACT_COPY_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + EXACT_ID_OFFSET)
    )
    near = (
        base.filter(F.col("doc_id") % NEAR_COPY_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + NEAR_ID_OFFSET)
        .withColumn("text", F.concat(F.col("text"), F.lit(NEAR_TAIL)))
        .withColumn("n_chars", F.col("n_chars") + F.lit(len(NEAR_TAIL)))
    )
    return base.unionByName(exact).unionByName(near)


# ---------------------------------------------------------------------------
# 1. exact dedup (hash-groupBy on normalized fingerprint)
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Per doc: its fingerprint, the canonical (min) doc_id of its group, the
    group size, and whether this row is the keeper."""
    from pyspark.sql import Window

    fp = docs.withColumn("fingerprint", textstats.fingerprint(F.col("text")))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(w).cast("bigint").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# 2. n-gram (character trigram) Jaccard with band-join blocking
# ---------------------------------------------------------------------------


def _trigrams(s: str) -> set:
    return {s[i : i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else {s}


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = NGRAM_THRESHOLD) -> DataFrame:
    """Near-dup pairs by exact character-trigram Jaccard ≥ threshold, with
    (lang, length-band ±1) candidate blocking. Any pair within LEN_BAND chars
    lands in adjacent bands, so blocking loses nothing vs the oracle's
    |Δlen| ≤ LEN_BAND predicate."""
    d = docs.select("doc_id", "text", "lang", F.length("text").alias("n"))
    left = d.withColumn(
        "band", F.explode(F.array(*[F.floor(F.col("n") / LEN_BAND) + i for i in (-1, 0, 1)]))
    )
    right = d.withColumn("band", F.floor(F.col("n") / LEN_BAND))
    cand = (
        left.alias("a")
        .join(right.alias("b"), on=["lang", "band"])
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n") - F.col("b.n")) <= LEN_BAND)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.text").alias("text_a"),
            F.col("b.text").alias("text_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    def score(batches):
        for pdf in batches:
            ta, tb = pdf["text_a"], pdf["text_b"]
            sims = np.empty(len(pdf))
            for i in range(len(pdf)):
                A, B = _trigrams(ta.iat[i]), _trigrams(tb.iat[i])
                sims[i] = len(A & B) / len(A | B) if A | B else 0.0
            yield pd.DataFrame(
                {"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "sim": sims}
            )

    scored = cand.mapInPandas(score, schema=_PAIR_SCHEMA)
    return scored.filter(F.col("sim") >= threshold).select(
        "doc_a", "doc_b", F.round("sim", 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# 3. MinHash + LSH (shingle → minhash → band → bucket-join → exact verify)
# ---------------------------------------------------------------------------


def _perm_params(n: int = MINHASH_PERMS):
    rng = np.random.default_rng(12345)
    a = rng.integers(1, _MERSENNE_P - 1, size=n, dtype=np.int64).astype(object)
    b = rng.integers(0, _MERSENNE_P - 1, size=n, dtype=np.int64).astype(object)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def _minhash_sig(text: str) -> np.ndarray:
    shingles = (
        {text[i : i + SHINGLE_K] for i in range(len(text) - SHINGLE_K + 1)}
        if len(text) >= SHINGLE_K
        else {text}
    )
    h = np.array([zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.int64)
    # universal-hash permutations: min over ((a*h + b) mod p) per perm
    sig = np.empty(MINHASH_PERMS, dtype=np.int64)
    for j in range(MINHASH_PERMS):
        sig[j] = int(np.min((int(_PERM_A[j]) * h + int(_PERM_B[j])) % _MERSENNE_P))
    return sig


def _shingles(text: str) -> set:
    return (
        {text[i : i + SHINGLE_K] for i in range(len(text) - SHINGLE_K + 1)}
        if len(text) >= SHINGLE_K
        else {text}
    )


_BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
    ]
)


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = MINHASH_VERIFY_THRESHOLD
) -> DataFrame:
    """LSH candidates via banded minhash signatures, then EXACT shingle
    Jaccard verification on candidates only (the estimate never reaches the
    output — no approximation in the result, only in recall)."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS

    def bands(batches):
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "band_idx": [], "band_key": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                sig = _minhash_sig(text)
                for bi in range(MINHASH_BANDS):
                    chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                    key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                    out["doc_id"].append(did)
                    out["band_idx"].append(bi)
                    out["band_key"].append(key)
            yield pd.DataFrame(out)

    banded = docs.select("doc_id", "text").mapInPandas(bands, schema=_BAND_SCHEMA)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    texts = docs.select(F.col("doc_id"), F.col("text"))
    pairs = (
        cand.join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
        .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
    )

    def verify(batches):
        for pdf in batches:
            sims = np.empty(len(pdf))
            for i in range(len(pdf)):
                A, B = _shingles(pdf["text_a"].iat[i]), _shingles(pdf["text_b"].iat[i])
                sims[i] = len(A & B) / len(A | B) if A | B else 0.0
            yield pd.DataFrame({"doc_a": pdf["doc_a"], "doc_b": pdf["doc_b"], "sim": sims})

    scored = pairs.mapInPandas(verify, schema=_PAIR_SCHEMA)
    return scored.filter(F.col("sim") >= threshold).select(
        "doc_a", "doc_b", F.round("sim", 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# 4. SimHash with band blocking
# ---------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for tok in text.split():
        hi = zlib.crc32(tok.encode("utf-8"))
        lo = zlib.crc32((tok + "#s2").encode("utf-8"))
        h = (hi << 32) | lo
        for bit in range(SIMHASH_BITS):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    v = 0
    for bit in range(SIMHASH_BITS):
        if acc[bit] > 0:
            v |= 1 << bit
    return v


_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def simhash_signatures(docs: DataFrame) -> DataFrame:
    def sig(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # store as signed int64 (bit pattern preserved)
                    "simhash": [np.int64(np.uint64(_simhash64(t))) for t in pdf["text"]],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(sig, schema=_SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Hamming-≤k pairs via pigeonhole band blocking: 4 exact-match 16-bit
    bands guarantee recall for hamming ≤ 3."""
    sigs = simhash_signatures(docs)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * band_width)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
                        .alias("band_val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band_idx", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup (label-blocked; see similarity.py for the
#    generic cosine machinery)
# ---------------------------------------------------------------------------


def augmented_embeddings(embeddings: DataFrame) -> DataFrame:
    """Embeddings table ∪ exact copies ∪ first-component-perturbed copies —
    the synthetic table has no natural near-identical vectors (within-label
    cosine tops out ≈0.47), so the near-dup signal is injected
    deterministically (same construction in the DuckDB oracle)."""
    base = embeddings.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    exact = base.filter(F.col("vec_id") % EMBED_EXACT_MOD == 0).withColumn(
        "vec_id", F.col("vec_id") + EMBED_EXACT_OFFSET
    )
    near = (
        base.filter(F.col("vec_id") % EMBED_NEAR_MOD == 0)
        .withColumn("vec_id", F.col("vec_id") + EMBED_NEAR_OFFSET)
        .withColumn(
            "v",
            F.concat(
                F.array(F.element_at(F.col("v"), 1) + F.lit(EMBED_PERTURB)),
                F.slice(F.col("v"), 2, 10_000),
            ),
        )
    )
    return base.unionByName(exact).unionByName(near)


def embedding_cosine_pairs(embeddings: DataFrame, threshold: float = COSINE_DUP_THRESHOLD) -> DataFrame:
    from .similarity import cosine_expr

    e = augmented_embeddings(embeddings)
    pairs = (
        e.alias("a")
        .join(e.alias("b"), on="label")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    )
