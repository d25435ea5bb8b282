"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the actual byte→pixels/samples decode is STUBBED behind
``set_decoder``: the default deterministic fake derives features from the
md5 of the payload (so tests are stable), and a real deployment plugs a
codec in without touching the Spark plumbing. Everything Spark-side —
schema, batch iteration, partition sizing, null handling — is real and
tested.

Scale notes: binary payloads dominate row width, so the pipeline (a)
never shuffles the binary column (features are computed in a map-only
stage and the payload is dropped immediately), and (b) relies on
``spark.sql.files.maxPartitionBytes`` to keep scan splits memory-bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = ("id long, kind string, n_bytes long, "
                  "width int, height int, feature array<float>")

_FEATURE_DIM = 8


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in decoder: md5-derived pseudo-features.

    Replace via ``set_decoder`` when a real codec is available."""
    if payload is None:
        payload = b""
    d = hashlib.md5(payload).digest()
    feats = [((d[i] << 8 | d[i + 1]) / 65535.0 - 0.5)
             for i in range(0, 2 * _FEATURE_DIM, 2)]
    return {
        "n_bytes": len(payload),
        "width": 16 + d[0] % 64 if kind == "image" else 0,
        "height": 16 + d[1] % 64 if kind == "image" else 0,
        "feature": feats,
    }


_decoder: Callable[[bytes, str], dict] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], dict]) -> None:
    """Plug in a real decode/feature-extract implementation."""
    global _decoder
    _decoder = fn


def real_decoder(payload: bytes, kind: str) -> dict:
    """The production decode hook — requires codec libs absent here."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this "
        "environment; call set_decoder() with a real implementation")


def extract_features(media: DataFrame, id_col: str = "id",
                     payload_col: str = "payload",
                     kind_col: str = "kind") -> DataFrame:
    """media(id, kind, payload binary, …) → feature table.

    Arrow-batched mapInPandas; the binary column is consumed inside the
    map stage and never shuffled.
    """
    dec = _decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over columns, not iterrows: iterrows builds a Series
            # per row (the slowest pandas iteration idiom)
            for i, kind, payload in zip(pdf[id_col], pdf[kind_col],
                                        pdf[payload_col]):
                if isinstance(payload, bytearray):
                    payload = bytes(payload)
                out = dec(payload, kind)
                rows.append({"id": i, "kind": kind, **out})
            yield pd.DataFrame(
                rows, columns=["id", "kind", "n_bytes", "width",
                               "height", "feature"])

    cols = [id_col, kind_col, payload_col]
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (the decode itself goes through the pluggable decoder).
    Demonstrates the fan-out shape: explode BEFORE decode so each frame
    decodes independently (parallelism at frame granularity)."""
    from pyspark.sql import functions as F
    n_frames = (F.length("payload") / every_n).cast("int") + 1
    return (media
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0), n_frames - 1)))
            .select("id", "kind", "frame_idx", "payload"))
