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


EMBED_SCHEMA = "media_ref string, embedding array<double>"


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Media-encoder stage (CLIP-style image/audio → vector), Arrow-batched
    ``mapInPandas`` — the exact batch shape a GPU encoder uses (one model
    call per Arrow batch, one vector row out per payload row).

    STUB: no encoder weights in this container, so the vector is derived
    deterministically from ``media_ref`` via the cross-engine h60 hash
    (components uniform in [-1, 1)) — which is precisely what lets the
    DuckDB oracle replicate the downstream near-dup pipeline bit-for-bit
    (plans/queries.py mm_embed_near_dup). A real deployment replaces the
    body with ``model(pdf["payload"])``; schema and plumbing are unchanged.
    """

    def run(batches):
        from dataset_crawler_spark.functions.hashing import h60_py

        for pdf in batches:
            embs = [
                [(h60_py(f"{ref}|e{i}") % 2001 - 1000) / 1000.0 for i in range(dim)]
                for ref in pdf["media_ref"]
            ]
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "embedding": embs})

    return media.mapInPandas(run, EMBED_SCHEMA)


RESIZED_SCHEMA = (
    "media_ref string, src_width int, src_height int, width int, height int, "
    "payload binary"
)


def resize_media(media_meta: DataFrame, max_dim: int) -> DataFrame:
    """Aspect-preserving resize stage over (media_ref, payload, width, height).

    The GEOMETRY is real (longest side clamped to ``max_dim``, never
    upscaled, aspect ratio preserved; half-up rounding — floor(x+0.5), NOT
    pandas' banker's rounding, so the DuckDB oracle twin reproduces it
    bit-for-bit); only the pixel transform is the container stub (a digest of
    payload+target-geometry — swap for PIL's ``Image.resize`` on a cluster
    with codecs). One Arrow batch per partition, one output row per input
    row."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            new_w = np.floor(pdf["width"] * scale + 0.5).astype(int)
            new_h = np.floor(pdf["height"] * scale + 0.5).astype(int)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "src_width": pdf["width"],
                    "src_height": pdf["height"],
                    "width": new_w,
                    "height": new_h,
                    "payload": [
                        hashlib.md5(p + f":resize:{w}x{h}".encode()).digest()
                        for p, w, h in zip(pdf["payload"], new_w, new_h)
                    ],
                }
            )

    return media_meta.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "media_ref string, frame_idx int, ts_ms int, frame_payload binary"


def sample_frames(media_meta: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling stage over (media_ref, payload, duration_ms): one output
    row per sampled timestamp (0, every_ms, … ≤ duration_ms) — the
    one-row-in / many-rows-out ``mapInPandas`` batch shape a real ffmpeg
    frame extractor needs. Timestamps and counts are real; the frame bytes
    are the container stub (digest of payload+ts)."""

    def run(batches):
        for pdf in batches:
            refs, idxs, tss, payloads = [], [], [], []
            for ref, payload, dur in zip(
                pdf["media_ref"], pdf["payload"], pdf["duration_ms"]
            ):
                for i, ts in enumerate(range(0, int(dur) + 1, every_ms)):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(ts)
                    payloads.append(hashlib.md5(payload + f":frame:{ts}".encode()).digest())
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "ts_ms": tss, "frame_payload": payloads}
            )

    return media_meta.mapInPandas(run, FRAME_SCHEMA)
