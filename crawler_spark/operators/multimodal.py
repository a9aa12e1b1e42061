"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The reference stores image *URLs* only (demo/items.py:7, JSON-encoded at
pipelines.py:54); at training-data scale the media bytes ride along as
binary columns. Decode libraries (PIL/ffmpeg) are absent in this container,
so the decode kernel is a deterministic fake behind ``FAKE_DECODE=True``
(clearly marked); everything Spark-side — schema, batching, partition
sizing, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Container has no PIL/ffmpeg: feature extraction below is a deterministic
# fake keyed on content bytes. Swap in a real decoder behind the same
# mapInPandas contract in production.
FAKE_DECODE = True

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, media_type string, n_bytes long, "
    "content_sha256 string, width int, height int, n_frames int"
)


def attach_fake_media(docs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Derive a deterministic binary payload per media_ref (test stand-in
    for bytes fetched at crawl time). Pure built-ins: the utf8 bytes of the
    sha256 hex digest — chosen so a SQL oracle (DuckDB sha256(varchar)) can
    reproduce the content hash exactly."""
    return docs.withColumn(
        "media_bytes",
        F.sha2(F.col(ref_col).cast("binary"), 256).cast("binary"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_ref, media_bytes).

    Arrow-batched: each pandas chunk is one executor-side call. The fake
    decoder derives width/height/frames from the content hash so tests are
    deterministic; a real decoder replaces ``_decode_one`` only.
    """
    def _decode_one(buf: bytes) -> tuple[str, int, int, int]:
        if not FAKE_DECODE:  # pragma: no cover
            raise NotImplementedError("real decoders not available in this env")
        h = hashlib.sha256(buf).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        n_frames = 1 + h[2] % 4
        return hashlib.sha256(buf).hexdigest(), width, height, n_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_one(b or b"") for b in pdf["media_bytes"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_type": [
                        "image" if r and r.endswith((".jpg", ".png")) else "binary"
                        for r in pdf["media_ref"]
                    ],
                    "n_bytes": [len(b or b"") for b in pdf["media_bytes"]],
                    "content_sha256": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_frames": [d[3] for d in decoded],
                }
            )

    return media.select("doc_id", "media_ref", "media_bytes").mapInPandas(
        run, MEDIA_META_SCHEMA
    )


FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, frame_sha256 string, "
    "out_width int, out_height int"
)


def sample_frames_and_resize(
    features: DataFrame, k: int = 2, target: int = 224
) -> DataFrame:
    """Frame sampling + resize planning over decoded media metadata
    (mapInPandas; one output row per sampled frame).

    Stride sampling picks up to ``k`` frames at indices
    ``(j * n_frames) // k`` (deduplicated — a 1-frame image yields one
    row); the resize step fits (width, height) into a ``target`` square
    preserving aspect ratio with integer floor math. The frame payload
    hash is the deterministic fake-decode stand-in
    ``sha256(content_sha256 || ':' || frame_idx)`` so the DuckDB oracle
    reproduces it exactly; a real decoder replaces the hash with actual
    frame bytes behind the same row-explosion contract."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "media_ref": [], "frame_idx": [],
                "frame_sha256": [], "out_width": [], "out_height": [],
            }
            for row in pdf.itertuples(index=False):
                n = int(row.n_frames)
                idxs = sorted({(j * n) // k for j in range(k)})
                mx = max(int(row.width), int(row.height))
                ow = (int(row.width) * target) // mx
                oh = (int(row.height) * target) // mx
                for idx in idxs:
                    out["doc_id"].append(row.doc_id)
                    out["media_ref"].append(row.media_ref)
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(
                        hashlib.sha256(
                            f"{row.content_sha256}:{idx}".encode()
                        ).hexdigest()
                    )
                    out["out_width"].append(ow)
                    out["out_height"].append(oh)
            yield pd.DataFrame(out)

    return features.select(
        "doc_id", "media_ref", "content_sha256", "width", "height",
        "n_frames",
    ).mapInPandas(run, FRAME_SCHEMA)


def image_spans(docs_with_spans: DataFrame) -> DataFrame:
    """Flatten interleaved documents to their image spans, preserving
    document order (the span-sequence invariant): one row per image span
    with its 0-based offset."""
    return (
        docs_with_spans.select(
            "doc_id", F.explode("spans").alias("span")
        )
        .filter(F.col("span.kind") == "image")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )
