"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema contract, Arrow-batched
``mapInPandas`` operators, partition sizing. The actual media decoding is
STUBBED (this container ships no image/audio libraries) behind
``_decode_image_stub`` — a deterministic fake that derives "pixels" from the
byte content — with the real implementation's seam clearly marked.

Design for 100 TB: binary payloads stay in executor memory only within one
Arrow batch (bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``);
metadata-only predicates (width/height/format) prune before any decode; the
decode runs per-partition with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, fmt string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_mean double, "
    "feature array<double>"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake media table from any table (fixture
    helper): payload = utf-8 bytes of the text, metadata derived from id."""
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("kind"),
        (F.when(F.col(id_col) % 2 == 0, "raw").otherwise("compressed")).alias("fmt"),
        (F.col(id_col) % 640 + 16).cast("int").alias("width"),
        (F.col(id_col) % 480 + 16).cast("int").alias("height"),
        (F.col(id_col) % 60000).cast("int").alias("duration_ms"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB for the real decoder (PIL/libvips/ffmpeg not in this container).

    Replace with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # real path
        raise NotImplementedError                    # if lib missing

    The deterministic fake hashes byte windows into an 8-dim feature so the
    plumbing (batching, schema, ordering) is fully testable.
    """
    n = max(len(payload), 1)
    return [
        sum(payload[i::8]) % 256 / 255.0 for i in range(min(8, n))
    ] + [0.0] * max(0, 8 - min(8, n))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched per-partition feature extraction over binary payloads.

    ``mapInPandas``: the iterator yields bounded Arrow batches — constant
    executor memory regardless of table size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the payload column is nullable binary: a NULL payload is an
            # empty media object, not an executor-killing TypeError
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / max(len(b), 1)
                    ),
                    "feature": payloads.map(_decode_image_stub),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


#: resize_images' output schema (out_w/out_h are attached as JVM-side
#: literals after the Python map — see the function body)
RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "out_w int, out_h int, payload binary"
)


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize plan for image rows: metadata filter prunes non-images before
    any Python hop; the resize itself is a bounded Arrow-batched
    ``mapInPandas``. The pixel resample is STUBBED (no PIL/libvips here) by
    a deterministic byte re-sampling with the same contract — replace the
    marked line with `PIL.Image.resize` when the lib exists. Aspect-ratio
    metadata (out_w/out_h) is computed JVM-side so downstream metadata-only
    queries never touch payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = out_w * out_h
        for pdf in batches:
            def fake_resize(b: bytes) -> bytes:
                # STUB — real path: PIL.Image.open(...).resize((out_w, out_h))
                if not b:  # NULL or zero-byte payload: a blank canvas,
                    return bytes(target)  # not an IndexError on b[0]
                n = len(b)
                return bytes(b[(i * n) // target] for i in range(target))

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "payload": pdf["payload"].map(fake_resize),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(
            run,
            schema=(
                "media_id long, kind string, width int, height int, "
                "payload binary"
            ),
        )
        # out_w/out_h attach JVM-side AFTER the map, as foldable literals
        # (the docstring's contract) — a metadata-only projection then
        # prunes the payload column out of the map's Arrow OUTPUT instead
        # of serializing resized bytes back just to read two constants.
        # (The Python stage itself still runs for row delivery — only an
        # operator that skips resize_images entirely avoids the hop.)
        .select(
            "media_id", "kind", "width", "height",
            F.lit(out_w).alias("out_w"), F.lit(out_h).alias("out_h"),
            "payload",
        )
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps from
    metadata only — no payload decode until a downstream operator needs the
    actual frame (metadata pruning before decode)."""
    if every_ms <= 0:
        # a zero step would fail per-task deep in the sequence expression
        # ("sequence step must not be zero"); validate at the boundary
        # like chunk_documents' stride guard
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    return (
        media.filter(F.col("kind") == "video")
        # NULL or zero duration → NO frames: greatest() skips NULLs, so an
        # unguarded sequence(0, greatest(NULL-1, 0)) would emit a phantom
        # frame at ts 0 for a video of unknown/zero length, and downstream
        # per-frame decode would read a frame that does not exist
        .filter(F.col("duration_ms") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
