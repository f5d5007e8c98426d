"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (north-star extension; schemas.MEDIA).

Design for 100 TB: payloads stay in parquet binary columns, metadata
columns drive partition pruning, and all per-payload work happens in
Arrow-batched ``mapInPandas`` — one Python worker per partition, never
per row. The actual image/audio codecs are NOT in this container, so
the decode kernel is a clearly-marked deterministic stub behind an
import-try (``_decode_payload``); the Spark-side plumbing — schema,
batch iteration, UDF signatures, partitioning — is real and tested.

The media table is derived deterministically from ``documents`` so
every scale factor has a multimodal fixture without writing anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

KINDS = ["image", "audio", "video"]
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media fixture: payload = utf-8 bytes of the text,
    kind cycles by doc_id, dimensions derived from n_chars."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        kind.alias("_k"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
    ).withColumn("mime", F.element_at(
        F.create_map(*[F.lit(x) for kv in MIMES.items() for x in kv]), F.col("_k")
    )).drop("_k")


@register(
    "q_multimodal_meta",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       sha256(text) AS payload_sha256
FROM documents
ORDER BY media_id
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length +
    content hash — the scan-side of any multimodal pipeline (pure
    JVM expressions on the binary column; no Python)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    ).orderBy("media_id")


# --------------------------------------------------------------- decode

try:  # real codecs unavailable in this container — keep the gate honest
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False


def _decode_payload(payload: bytes, kind: str) -> dict:
    """STUB decode kernel. With real codecs this is PIL/librosa/pyav;
    here it is a deterministic fake so the distributed plumbing can be
    exercised and asserted. Raises if someone expects real decoding."""
    if _HAVE_CODECS:
        raise NotImplementedError(
            "real codec path not implemented in this container; "
            "the deterministic fake below defines the test contract"
        )
    checksum = sum(payload) % 256
    return {
        "decoded_ok": True,
        "checksum": checksum,
        "first_byte": payload[0] if payload else 0,
        "n_frames": (len(payload) // 64) + 1 if kind == "video" else 1,
    }


FEATURE_SCHEMA = (
    "media_id long, kind string, payload_bytes long, checksum long, "
    "first_byte long, n_frames long, feature array<double>"
)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches in, one
    feature row per media out. This is the one legitimately-Python
    operator in the engine (model/codec scoring), batched exactly the
    way a real GPU/codec kernel would want."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_payload(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"], strict=True)
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [m["checksum"] for m in meta],
                    "first_byte": [m["first_byte"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                }
            )
            out["feature"] = [
                [
                    float(b),
                    float(m["checksum"]) / 256.0,
                    float(m["first_byte"]) / 256.0,
                    float(m["n_frames"]),
                ]
                for b, m in zip(out["payload_bytes"], meta, strict=True)
            ]
            yield out

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


@register("q_multimodal_features", oracle=None)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (stubbed codec, real plumbing). Python-side by necessity → no SQL
    oracle; tests/test_llm_ops.py pins exact expected values."""
    return decode_features(media_table(spark, sf_dir)).orderBy("media_id")


@register("q_multimodal_frame_sample", oracle=None)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: decode n_frames, emit one row
    per sampled frame (every 8th) — the explode-after-decode shape of
    video pipelines. posexplode keeps frame indices deterministic."""
    feats = decode_features(
        media_table(spark, sf_dir).filter(F.col("kind") == "video")
    )
    frame_idx = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(8)
    )
    return (
        feats.select("media_id", "n_frames", F.explode(frame_idx).alias("frame_no"))
        .orderBy("media_id", "frame_no")
    )
