"""Multimodal columns: opaque BINARY payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched pandas UDFs over ``mapInPandas``. The decode
libraries (PIL / torchaudio / av) are NOT in this container, so the
actual byte->pixels step is STUBBED: ``decode_real`` raises
NotImplementedError behind an import-try, and ``decode_fake`` is a
deterministic byte-level stand-in. Everything Spark-side — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and
tested; swapping in the real decoder changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),  # normalized 16-bin byte histogram
        StructField("counts", ArrayType(IntegerType())),  # raw 16-bin counts (exact ints)
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

N_BINS = 16


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from text bytes (sandbox
    stand-in for a WARC payload column) — native expressions only."""
    kind = F.expr(f"element_at(array('image', 'audio', 'video'), 1 + int({id_col} % 3))")
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
    )


def decode_real(payload: bytes, kind: str):  # pragma: no cover - needs media libs
    """Real decode path; requires PIL/torchaudio/av on the cluster."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode libraries are not installed in this environment; "
            "use decode_fake (deterministic) or install PIL/torchaudio/av"
        ) from e
    raise NotImplementedError("wire the cluster decoder here")


def decode_fake(payload: bytes, kind: str) -> tuple[np.ndarray, int, int]:
    """Deterministic stand-in: byte values as the 'signal'; fake
    width/height derived from the payload length."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return arr, side, max(arr.size // side, 1)


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """payload BINARY -> normalized 16-bin byte histogram feature per
    media row; one Arrow batch in/out, numpy-vectorized per batch."""
    decoder = decode_real if use_real_decoder else decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, N_BINS + 1)
        fast_bins = decoder is decode_fake and N_BINS == 16
        for pdf in batches:
            if len(pdf) == 0 or not fast_bins:
                # generic path: arbitrary decoder output, per-row histogram
                feats, counts, ws, hs = [], [], [], []
                for payload, kind in zip(pdf["payload"], pdf["kind"]):
                    arr, w, h = decoder(bytes(payload), kind)
                    hist, _ = np.histogram(arr, bins=edges)
                    total = max(arr.size, 1)
                    feats.append((hist / total).astype(np.float32).tolist())
                    counts.append(hist.astype(np.int32).tolist())
                    ws.append(w)
                    hs.append(h)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].astype("int64"),
                        "kind": pdf["kind"],
                        "feature": feats,
                        "counts": counts,
                        "width": np.asarray(ws, dtype="int32"),
                        "height": np.asarray(hs, dtype="int32"),
                    }
                )
                continue
            # Vectorized byte-histogram path: the fake decoder's
            # "signal" is the raw payload bytes, and 16 uniform bins
            # over [0, 256) are exactly value >> 4 — one bincount over
            # the whole batch replaces one np.histogram call per row
            # (identical counts: uint8 < 256 never reaches the closed
            # upper edge of np.histogram's last bin).
            payloads = [bytes(p) for p in pdf["payload"]]
            sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                count=len(payloads))
            arr = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(len(payloads)), sizes)
            flat = np.bincount(
                row_idx * N_BINS + (arr >> 4),
                minlength=len(payloads) * N_BINS,
            ).reshape(len(payloads), N_BINS)
            totals = np.maximum(sizes, 1)
            feats2 = (flat / totals[:, None]).astype(np.float32)
            # decode_fake geometry: side = max(int(sqrt(n)), 1),
            # height = max(n // side, 1) — IEEE sqrt is exact on
            # perfect squares, so the vectorized form matches int()
            ws2 = np.maximum(np.sqrt(sizes).astype(np.int64), 1)
            hs2 = np.maximum(sizes // ws2, 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feature": feats2.tolist(),
                    "counts": flat.astype(np.int32).tolist(),
                    "width": ws2.astype("int32"),
                    "height": hs2.astype("int32"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per
    sampled offset (video -> frames generalization; deterministic).
    Native posexplode over a generated offset sequence — the 1->N
    explode shape a real frame sampler produces."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.expr(f"sequence(0, greatest(n_bytes - 1, 0), {every_n_bytes})")
            ).alias("frame_no", "byte_offset"),
        )
    )
