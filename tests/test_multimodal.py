"""Multimodal plumbing tests: binary columns, metadata sniffing, Arrow-batched
decode stages, frame-sampling UDTF shape. Codecs are stubs; the Spark
plumbing (schemas, batching, error channels) is the artifact under test."""

import hashlib

from pyspark.sql import functions as F

from srm_etl_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_features,
    fake_png,
    sample_video_frames,
)


def _media_df(spark):
    rows = [
        (1, fake_png(640, 480, 100)),
        (2, fake_png(64, 64, 200)),
        (3, b"\xff\xd8\xff\xe0corrupt-jpeg-bytes"),
        (4, b"not media at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_metadata_sniffing(spark):
    out = attach_media_metadata(_media_df(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].media_format == "png"
    assert by_id[3].media_format == "jpeg"
    assert by_id[4].media_format == "unknown"
    assert by_id[1].media_size_bytes == len(fake_png(640, 480, 100))
    assert by_id[2].media_content_id == hashlib.sha1(fake_png(64, 64, 200)).hexdigest()


def test_decode_features_and_error_channel(spark):
    feats = decode_image_features(_media_df(spark)).collect()
    assert len(feats) == 4
    by_cid = {r.media_content_id: r for r in feats}
    ok = by_cid[hashlib.sha1(fake_png(640, 480, 100)).hexdigest()]
    assert (ok.width, ok.height) == (640, 480)
    assert abs(ok.mean_luminance - 100 / 255) < 1e-9
    assert ok.decode_error is None
    # corrupt/real media fails per-row, not per-stage
    bad = by_cid[hashlib.sha1(b"not media at all").hexdigest()]
    assert bad.width is None
    assert bad.decode_error == "NotImplementedError"


def test_frame_sampling_udtf_shape(spark):
    frames = sample_video_frames(_media_df(spark), n_frames=4)
    counts = frames.groupBy("media_content_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    offs = frames.filter(F.col("frame_index") == 0).select("byte_offset").collect()
    assert all(r.byte_offset == 0 for r in offs)


def test_resize_roundtrips_through_decoder(spark):
    from srm_etl_spark.operators.multimodal import resize_images

    resized = resize_images(_media_df(spark), target_w=32, target_h=16)
    # output binary is itself decodable: luminance preserved, dims replaced
    feats = decode_image_features(resized.filter(F.col("resize_error").isNull())).collect()
    assert len(feats) > 0
    assert all((r.width, r.height) == (32, 16) for r in feats)
    lums = sorted(round(r.mean_luminance * 255) for r in feats)
    assert 100 in lums and 200 in lums
    # undecodable inputs surface on the error channel, not as task failures
    errs = resize_images(_media_df(spark)).filter(F.col("resize_error").isNotNull()).collect()
    assert len(errs) >= 1 and all(r.media is None for r in errs)


def test_audio_features_and_error_channel(spark):
    import hashlib

    from srm_etl_spark.operators.multimodal import decode_audio_features, fake_wav

    df = spark.createDataFrame(
        [(1, fake_wav(16000, 48000, 64)), (2, fake_wav(8000, 4000, 255)), (3, b"junk")],
        "doc_id long, media binary",
    )
    out = {r.media_content_id: r for r in decode_audio_features(df, passthrough=["doc_id"]).collect()}
    a = out[hashlib.sha1(fake_wav(16000, 48000, 64)).hexdigest()]
    assert (a.sample_rate, a.n_samples) == (16000, 48000)
    assert abs(a.duration_s - 3.0) < 1e-9
    assert abs(a.rms - 64 / 255) < 1e-9
    assert a.doc_id == 1
    bad = out[hashlib.sha1(b"junk").hexdigest()]
    assert bad.sample_rate is None and bad.decode_error == "NotImplementedError"


def test_audio_metadata_sniffs_riff(spark):
    from srm_etl_spark.operators.multimodal import fake_wav

    df = spark.createDataFrame([(1, fake_wav(44100, 1000))], "doc_id long, media binary")
    assert attach_media_metadata(df).collect()[0].media_format == "riff"
