"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a clearly
marked stub (deterministic fake features derived from the payload's md5, or
NotImplementedError when strict=True). Everything around the stub — binary
column through Arrow, schema, batching, partition-parallel UDF execution — is
real and is exactly the shape a production decode/resize/frame-sample
operator plugs into: replace ``_fake_features`` with PIL/librosa calls and
nothing else changes.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal shape from the documents table: the UTF-8
    bytes of text stand in for an image/audio blob, plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> tuple[str, int, int]:
    """STUB decode: deterministic pseudo-dimensions from the content digest.
    A real deployment decodes the blob here (PIL.Image.open(BytesIO(b))...)."""
    digest = hashlib.md5(payload).hexdigest()
    width = (int(digest[0:2], 16) % 32 + 1) * 16
    height = (int(digest[2:4], 16) % 32 + 1) * 16
    return digest, width, height


def decode_features(payloads: DataFrame, strict: bool = False) -> DataFrame:
    """(doc_id, payload binary) → per-item features via mapInPandas. The
    batch shape (Arrow RecordBatch of binary + ids) is what a real GPU/codec
    stage consumes."""
    if strict:
        raise NotImplementedError(
            "no image/audio codecs in this environment; decode stage is stubbed"
        )

    def fn(batches):
        for pdf in batches:
            digests, ws, hs, ns = [], [], [], []
            for b in pdf["payload"]:
                d, w, h = _fake_features(bytes(b))
                digests.append(d)
                ws.append(w)
                hs.append(h)
                ns.append(len(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(ns, dtype="int32"),
                    "content_md5": digests,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, schema=MM_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling: variable-fanout decode (one input blob → N output rows),
# the plumbing shape of a video frame-sampler / audio chunker. The "frame"
# is a fixed-byte slice of the payload (no codecs here); a real deployment
# replaces the slicing with av.open(...).decode() and nothing else changes.
# ---------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_STRIDE = 4  # keep every 4th frame

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    payloads: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """(doc_id, payload) → one row per SAMPLED frame: fixed-size slices at
    indices 0, stride, 2·stride… (last frame may be short). Exercises the
    one-to-many Arrow batch fan-out a real frame-sampler needs — output row
    count is data-dependent, not 1:1 with input.

    Frames are CHARACTER slices of the decoded payload (md5 of the slice's
    UTF-8 bytes) so the DuckDB oracle — whose substring/md5 are VARCHAR-only
    — computes the identical value; on this ASCII corpus char == byte."""

    def fn(batches):
        for pdf in batches:
            ids, idxs, totals, digests = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b).decode("utf-8")
                n_frames = max((len(data) + frame_bytes - 1) // frame_bytes, 1)
                for fi in range(0, n_frames, stride):
                    chunk = data[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(did)
                    idxs.append(fi)
                    totals.append(n_frames)
                    digests.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame_md5": digests,
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# embedding extraction: the payload → vector stage between decode and the
# ANN suite. The encoder is a STUB (md5-derived components; a real
# deployment runs a CLIP/wav2vec forward pass in this exact mapInPandas
# body), but the handoff is real: the stub's output feeds
# similarity.topk_bruteforce / topk_ivf unchanged, and the components are
# built from power-of-two scalings only (n / 2^31 − 1), so float64 is
# bit-identical across engines and the WHOLE payload→vector→ANN chain sits
# under the value-exact driver gate.
# ---------------------------------------------------------------------------

MM_EMBED_DIM = 8

_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def embed_stub(payloads: DataFrame, dim: int = MM_EMBED_DIM) -> DataFrame:
    """(doc_id, payload) → (vec_id, label, embedding): component j is
    int(md5(payload_utf8 || ':emb<j>')[:8 hex], 16) / 2^31 − 1 ∈ [−1, 1)."""

    def fn(batches):
        for pdf in batches:
            ids, vecs = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                s = bytes(b).decode("utf-8")
                v = [
                    int(hashlib.md5(f"{s}:emb{j}".encode("utf-8")).hexdigest()[:8], 16)
                    / 2147483648.0
                    - 1.0
                    for j in range(dim)
                ]
                ids.append(did)
                vecs.append(v)
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "label": pd.Series(["mm"] * len(ids), dtype="object"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, schema=_EMBED_SCHEMA)
