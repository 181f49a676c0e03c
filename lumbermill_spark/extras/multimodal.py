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
