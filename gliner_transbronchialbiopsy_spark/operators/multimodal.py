"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The reference ingests opaque bytes and dispatches on file type
(file_handler.py:45-107 — pdf/txt); this module generalizes that shape
to media blobs for training-data pipelines. Real decoders (PIL,
torchaudio, av) are NOT in this environment, so the image path carries
BOTH kernels — the real PIL decode (_pil_image_features, engaged when
the executor can import PIL) and a deterministic fake fallback — and
the probe happens worker-side inside the UDF, where it belongs. The
Spark-side contract (schema, Arrow batching, partitioning, UDF
signatures) is identical for both kernels and fully tested; the real
branch is exercised by a PYTHONPATH-injected fake PIL in
tests/test_multimodal.py (the gliner pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) matching
    MEDIA_SCHEMA — the fixture generator for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                {"source": f"src{i % 4}", "idx": str(i)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode→resize→embed kernel: byte
    histogram moments. The real kernel is _pil_image_features."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr, dim)
    return [round(float(c.mean()) / 255.0, 6) for c in chunks]


def _pil_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """The REAL image kernel: PIL decode -> grayscale -> dim x dim
    resize -> per-row mean in [0, 1]. Deterministic (nearest-neighbor
    resample pins the interpolation), so a test can precompute the
    expected vector from the raw pixels. Imported lazily so the module
    stays loadable without PIL; executor processes re-run this import
    (a worker-side PYTHONPATH fake engages it — the gliner pattern,
    tests/test_scale_paths.py)."""
    import io

    from PIL import Image  # raises ImportError when absent

    img = Image.open(io.BytesIO(payload)).convert("L").resize(
        (dim, dim), resample=0  # 0 = NEAREST in every PIL version
    )
    arr = np.asarray(img, dtype=np.float64).reshape(dim, dim)
    return [round(float(r.mean()) / 255.0, 6) for r in arr]


def extract_features(
    media: DataFrame, kind: str = "image", dim: int = 8,
    decoder: str = "auto",
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Scale contract: filter on `kind` BEFORE the UDF (partition-prunable),
    Arrow-batched bytes in, fixed-width float array out.

    ``decoder`` selects the kernel: 'pil' requires the real PIL decode
    (the UDF raises an actionable NotImplementedError on executors
    without it), 'fake' pins the deterministic byte-histogram stand-in,
    'auto' probes for PIL ONCE PER PYTHON WORKER inside the UDF (the
    driver's import state is irrelevant — executors are separate
    processes) and falls back to the fake. The kernel choice never
    changes the Spark plan: schema, batching, and partitioning are
    identical either way, which is the multimodal plumbing contract."""
    if decoder not in ("auto", "pil", "fake"):
        raise ValueError(f"decoder must be auto|pil|fake, got {decoder!r}")
    schema = "media_id string, kind string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _fake_image_features
        if decoder != "fake":
            try:
                import PIL  # noqa: F401 — worker-side probe

                kernel = _pil_image_features
            except ImportError:
                if decoder == "pil":
                    raise NotImplementedError(
                        "decoder='pil' requires pillow on the executors "
                        "(not installed); install it or use "
                        "decoder='auto'/'fake'"
                    )
        for pdf in batches:
            feats = [
                kernel(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    pruned = media.filter(F.col("kind") == kind).select(
        "media_id", "kind", "payload"
    )
    return pruned.mapInPandas(run, schema=schema)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video frame-sampling PLAN: explode deterministic frame indices per
    video (JVM-side); the per-frame decode would be a downstream
    mapInPandas kernel. Shows the explode-before-decode partitioning
    pattern (frames of one video spread across tasks)."""
    n_frames = F.least(
        F.floor(F.length("payload") / every_n), F.lit(max_frames)
    ).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * every_n)
        .repartition(F.col("media_id"), F.col("frame_idx"))
    )


def decode_audio_stub(media: DataFrame) -> DataFrame:
    """Audio decode stub: real implementation requires torchaudio/librosa
    (absent); the plumbing raises clearly at execution."""
    schema = "media_id string, waveform array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires torchaudio/librosa (not installed); "
            "plug the decoder into this mapInPandas kernel"
        )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=schema)
