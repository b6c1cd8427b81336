"""Multimodal columns: opaque binary payloads + typed metadata (engine extension).

The interleaved table's media spans carry a ``media_ref``; at fetch time the
payload lands in a sibling ``media`` table as an opaque ``binary`` column with
typed metadata. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the image/audio libraries are NOT in
this container, so the codec call itself is stubbed (deterministic fake
honoring the real signature), while all Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.

Schema: (media_ref:string, payload:binary, media_kind:string,
         width:int, height:int, duration_ms:int)
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, width int, height int, "
    "duration_ms int, feature_hash long"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB for the real codec (PIL/ffmpeg not available in this container).

    Deterministic fake: derives (width, height, duration_ms) from the payload
    digest. Replace the body with e.g. ``PIL.Image.open(io.BytesIO(payload))``
    on a cluster with codecs installed — the Spark plumbing is unchanged.
    """
    d = hashlib.md5(payload).digest()
    return 64 + d[0], 64 + d[1], int.from_bytes(d[2:4], "big")


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Derive the media payload table from a documents table's media spans
    (payload = deterministic bytes; in production this is the fetch output)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.media_ref").isNotNull())
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("media_kind"))
        .distinct()
    )
    return refs.select(
        "media_ref",
        "media_kind",
        F.unhex(F.md5("media_ref")).alias("payload"),
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched decode+feature stage over (media_ref, media_kind, payload)."""

    def run(batches):
        for pdf in batches:
            metas = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "duration_ms": [m[2] for m in metas],
                    # feature extraction stub: stable 60-bit content hash
                    "feature_hash": [
                        int.from_bytes(hashlib.md5(p).digest()[:7], "big") for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, MEDIA_META_SCHEMA)
