"""Multimodal column plumbing (beyond-reference M4): image/audio/video as
opaque `binary` columns with typed metadata, processed in Arrow batches
via mapInPandas.

The decode step is STUBBED — the real codec libraries (PIL/librosa/ffmpeg)
are not in this container. `decode_media` raises NotImplementedError;
`fake_decode` is the deterministic stand-in (md5-derived dimensions) used
by tests and the oracle-checked query. Everything around the stub — the
binary schema, batch iteration, UDF signature, output schema — is real
and is exactly what a production decoder would slot into.

Scale notes: mapInPandas streams Arrow record batches (no per-row pickle);
payload bytes never hit the driver. Partitioning is inherited from the
upstream scan — repartition by a size-balanced key before heavy decodes
so one executor doesn't get all the large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Model a multimodal table: payload = utf-8 bytes of the text column
    (stand-in for real image/audio bytes), plus a typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(kind).alias("kind"), F.length(payload).alias("n_bytes")
    )
    return df.select("doc_id", payload.alias("media"), meta.alias("meta"))


def decode_media(payload: bytes):  # pragma: no cover - stub by design
    """REAL decode stub: needs PIL/librosa/ffmpeg, absent in this image."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this container; "
        "swap in PIL.Image.open / librosa.load here in production"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: pseudo width/height from the payload's
    md5 — keeps the full pipeline testable and oracle-checkable."""
    h = hashlib.md5(payload).hexdigest()
    return int(h[:4], 16) % 1024, int(h[4:8], 16) % 1024


def extract_features(df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (Arrow batches).

    Output: (doc_id, kind, n_bytes, digest, width, height).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"]
            dims = [
                decode_media(p) if use_real_decode else fake_decode(p)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
