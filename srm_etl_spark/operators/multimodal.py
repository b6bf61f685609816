"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct, processed by Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through Python row objects. The Spark-side plumbing here —
schemas, batch iteration, partition behavior, content addressing — is real
and tested; the codec kernels themselves are stubbed deterministically
because media libraries aren't available in this environment (each stub is
marked and raises ``NotImplementedError`` when a real decode is demanded).

Scale notes:
- decode/feature stages are ``mapInPandas`` over partitions: no shuffle, the
  batch size bounds peak memory (``spark.sql.execution.arrow.maxRecordsPerBatch``);
- content ids are sha1 over bytes (JVM-side) → dedup/joins on media become
  ordinary string-key operations;
- format sniffing reads magic prefixes natively (hex/substring), no UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes → format tag (hex, uppercase)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "494433": "mp3",
    "664C6143": "flac",
    "1A45DFA3": "mkv/webm",
    "0000001866747970": "mp4",
}


def attach_media_metadata(df: DataFrame, bin_col: str = "media") -> DataFrame:
    """size_bytes / sniffed format / sha1 content id — all JVM-side."""
    hexhead = F.upper(F.hex(F.substring(F.col(bin_col), 1, 8)))
    fmt = F.lit("unknown")
    for magic, tag in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        fmt = F.when(hexhead.startswith(magic), F.lit(tag)).otherwise(fmt)
    return (
        df.withColumn("media_size_bytes", F.length(F.col(bin_col)).cast("long"))
        .withColumn("media_format", fmt)
        .withColumn("media_content_id", F.sha1(F.col(bin_col)))
    )


# --- decode kernels (STUBBED: no media libs in this container) ---------------

def _decode_image_bytes(data: bytes) -> tuple[int, int, float]:
    """STUB image decoder.

    Real implementation: ``PIL.Image.open(io.BytesIO(data))`` → (width,
    height, mean luminance). Unavailable here, so bytes produced by
    :func:`fake_png` decode deterministically and anything else raises —
    the Spark plumbing around this function is the tested artifact.
    """
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[8:12] == b"FAKE":
        w = int.from_bytes(data[12:14], "big")
        h = int.from_bytes(data[14:16], "big")
        lum = (data[16] if len(data) > 16 else 0) / 255.0
        return w, h, lum
    raise NotImplementedError("real image decoding requires PIL (not in this container)")


def fake_png(width: int, height: int, lum_byte: int = 128) -> bytes:
    """Deterministic fake PNG payload the stub decoder understands."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"FAKE"
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + bytes([lum_byte])
    )


IMAGE_FEATURES_SCHEMA = (
    "media_content_id string, width int, height int, mean_luminance double, decode_error string"
)


def decode_image_features(
    df: DataFrame, bin_col: str = "media", passthrough: list[str] | None = None
) -> DataFrame:
    """Arrow-batched decode → (content_id, width, height, luminance).

    Errors are captured per row (``decode_error``) rather than failing the
    stage — at 100 TB some corrupt bytes are a statistical certainty and a
    task retry loop must not be the error channel.

    ``passthrough``: extra columns carried through the decode stage unchanged
    (e.g. the document key), so callers don't need a post-decode join.
    """
    passthrough = list(passthrough or [])
    with_id = df.withColumn("media_content_id", F.sha1(F.col(bin_col)))
    extra_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in passthrough
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_content_id": [],
                "width": [],
                "height": [],
                "mean_luminance": [],
                "decode_error": [],
            }
            for cid, data in zip(pdf["media_content_id"], pdf[bin_col]):
                out["media_content_id"].append(cid)
                try:
                    w, h, lum = _decode_image_bytes(bytes(data))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_luminance"].append(lum)
                    out["decode_error"].append(None)
                except Exception as ex:  # noqa: BLE001
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_luminance"].append(None)
                    out["decode_error"].append(type(ex).__name__)
            res = pd.DataFrame(out)
            for c in passthrough:
                res[c] = pdf[c].values
            yield res

    return with_id.select("media_content_id", bin_col, *passthrough).mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA + extra_schema
    )


def _sample_frame_offsets(size_bytes: int, n_frames: int) -> list[int]:
    """STUB frame sampler: evenly spaced byte offsets standing in for video
    timestamps (real impl: pyav/ffmpeg keyframe index)."""
    if n_frames <= 0 or size_bytes <= 0:
        return []
    step = max(size_bytes // n_frames, 1)
    return [min(i * step, size_bytes - 1) for i in range(n_frames)]


FRAME_SAMPLE_SCHEMA = "media_content_id string, frame_index int, byte_offset long"


def sample_video_frames(df: DataFrame, bin_col: str = "media", n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame (UDTF shape,
    0..N rows out per input row) via mapInPandas."""
    with_id = df.withColumn("media_content_id", F.sha1(F.col(bin_col)))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_content_id": [], "frame_index": [], "byte_offset": []}
            for cid, data in zip(pdf["media_content_id"], pdf[bin_col]):
                for i, off in enumerate(_sample_frame_offsets(len(bytes(data)), n_frames)):
                    rows["media_content_id"].append(cid)
                    rows["frame_index"].append(i)
                    rows["byte_offset"].append(off)
            yield pd.DataFrame(rows)

    return with_id.select("media_content_id", bin_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


# --- resize (STUB kernel, real Arrow plumbing) -------------------------------

RESIZE_SCHEMA = "media_content_id string, media binary, width int, height int, resize_error string"


def resize_images(
    df: DataFrame, bin_col: str = "media", target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize plumbing: binary in → binary out through an Arrow batch stage.

    STUB kernel: real implementation is ``PIL.Image.resize`` — here payloads
    from :func:`fake_png` are re-encoded at the target dimensions with their
    luminance preserved, and anything undecodable reports ``resize_error``
    instead of failing the stage. The tested artifact is the binary→binary
    Arrow round-trip: bytes stay in Arrow buffers between stages, and the
    output is itself a valid input to :func:`decode_image_features`.
    """

    with_id = df.withColumn("media_content_id", F.sha1(F.col(bin_col)))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_content_id": [],
                "media": [],
                "width": [],
                "height": [],
                "resize_error": [],
            }
            for cid, data in zip(pdf["media_content_id"], pdf[bin_col]):
                out["media_content_id"].append(cid)
                try:
                    _, _, lum = _decode_image_bytes(bytes(data))
                    out["media"].append(fake_png(target_w, target_h, int(round(lum * 255))))
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["resize_error"].append(None)
                except Exception as ex:  # noqa: BLE001
                    out["media"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resize_error"].append(type(ex).__name__)
            yield pd.DataFrame(out)

    return with_id.select("media_content_id", bin_col).mapInPandas(batches, RESIZE_SCHEMA)


# --- audio (STUB kernel, real Arrow plumbing) --------------------------------

def fake_wav(sample_rate: int, n_samples: int, amp_byte: int = 100) -> bytes:
    """Deterministic fake WAV payload (RIFF magic + packed params) the stub
    audio decoder understands."""
    return (
        b"RIFF"
        + b"FAKE"
        + sample_rate.to_bytes(4, "big")
        + n_samples.to_bytes(4, "big")
        + bytes([amp_byte])
    )


def _decode_audio_bytes(data: bytes) -> tuple[int, int, float]:
    """STUB audio decoder.

    Real implementation: ``soundfile``/``librosa`` → (sample_rate, n_samples,
    rms). Payloads from :func:`fake_wav` decode deterministically; anything
    else raises — the mapInPandas plumbing is the tested artifact.
    """
    if data[:4] == b"RIFF" and data[4:8] == b"FAKE":
        sr = int.from_bytes(data[8:12], "big")
        n = int.from_bytes(data[12:16], "big")
        rms = (data[16] if len(data) > 16 else 0) / 255.0
        return sr, n, rms
    raise NotImplementedError("real audio decoding requires soundfile (not in this container)")


AUDIO_FEATURES_SCHEMA = (
    "media_content_id string, sample_rate int, n_samples long, duration_s double,"
    " rms double, decode_error string"
)


def decode_audio_features(
    df: DataFrame, bin_col: str = "media", passthrough: list[str] | None = None
) -> DataFrame:
    """Arrow-batched audio feature extraction: (sample_rate, n_samples,
    duration, rms), errors captured per row — same contract as
    :func:`decode_image_features`."""
    passthrough = list(passthrough or [])
    with_id = df.withColumn("media_content_id", F.sha1(F.col(bin_col)))
    extra_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in passthrough
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_content_id": [],
                "sample_rate": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
                "decode_error": [],
            }
            for cid, data in zip(pdf["media_content_id"], pdf[bin_col]):
                out["media_content_id"].append(cid)
                try:
                    sr, n, rms = _decode_audio_bytes(bytes(data))
                    out["sample_rate"].append(sr)
                    out["n_samples"].append(n)
                    out["duration_s"].append(n / sr if sr else 0.0)
                    out["rms"].append(rms)
                    out["decode_error"].append(None)
                except Exception as ex:  # noqa: BLE001
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["rms"].append(None)
                    out["decode_error"].append(type(ex).__name__)
            res = pd.DataFrame(out)
            for c in passthrough:
                res[c] = pdf[c].values
            yield res

    return with_id.select("media_content_id", bin_col, *passthrough).mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA + extra_schema
    )
