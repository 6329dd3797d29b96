"""Streaming/batch equivalence, proto emission, multimodal plumbing."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from schema_inference_spark.datagen import codec
from schema_inference_spark.multimodal.stubs import (
    extract_image_features,
    frame_concat,
    resize_images,
    sample_video_frames,
)
from schema_inference_spark.operators.proto import (
    concat_proto_files,
    proto_hierarchy,
    proto_lines_df,
)


def test_streaming_equals_batch(spark, sf_dir):
    from schema_inference_spark.queries.catalog_core import hourly_event_windows
    from schema_inference_spark.queries.catalog_images import streaming_hourly_windows

    batch = {tuple(r) for r in hourly_event_windows(spark, sf_dir).collect()}
    stream = {tuple(r) for r in streaming_hourly_windows(spark, sf_dir).collect()}
    assert batch == stream and len(batch) > 0


def test_streaming_validation_foreachbatch(spark):
    from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df
    from schema_inference_spark.plans.checkpoint import write_checkpoint
    from schema_inference_spark.plans.validation import run_validation
    from schema_inference_spark.streaming.validate_stream import validate_stream

    corpus = generate_image_corpus(400, n_parts=2)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        images.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(images.schema).parquet(f"{d}/in")
        q = validate_stream(
            stream,
            captions,
            checkpoint_path=f"{d}/ckpt",
            run_validation_fn=run_validation,
            checkpoint_fn=write_checkpoint,
            checkpoint_location=f"{d}/stream_ck",
        )
        q.awaitTermination(120)
        ckpt = spark.read.parquet(f"{d}/ckpt")
        rows = ckpt.collect()
        assert {r["part"] for r in rows} == {0, 1}
        assert all(r["run_id"].startswith("stream-epoch-") for r in rows)


NESTED = {
    "type": "object",
    "properties": {
        "ts": {"type": "integer"},
        "killer": {
            "type": "object",
            "properties": {"id": {"type": "integer"}, "score": {"type": "number"}},
        },
        "assists": {"type": "array", "items": {"type": "object", "properties": {"id": {"type": "integer"}}}},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
}


def test_proto_hierarchy_semantics():
    h = proto_hierarchy(NESTED, root="Event")
    assert h["Event"]["ts"] == "int32"
    assert h["Event"]["killer"] == "EventKiller"
    assert h["Event"]["assists"] == "repeated EventAssists"
    assert h["Event"]["tags"] == "repeated string"
    assert h["EventKiller"] == {"id": "int32", "score": "float"}
    assert h["EventAssists"] == {"id": "int32"}


def test_proto_concat_order_safe(spark):
    h = proto_hierarchy(NESTED, root="Event")
    lines = proto_lines_df(spark, h).repartition(7)  # scramble partitioning
    files = {r["file_name"]: r["content"] for r in concat_proto_files(lines).collect()}
    ev = files["Event.proto"].splitlines()
    assert ev[0] == 'syntax = "proto3";'
    assert 'import "EventAssists.proto";' in ev and 'import "EventKiller.proto";' in ev
    assert ev[-1] == "}"
    body = [ln for ln in ev if ln.startswith("  ")]
    assert body == [
        "  repeated EventAssists assists = 1;",
        "  EventKiller killer = 2;",
        "  repeated string tags = 3;",
        "  int32 ts = 4;",
    ]


@pytest.fixture(scope="module")
def small_images(spark):
    rows = []
    for i in range(10):
        px = codec.reference_pixels(f"m{i}", 16, 16)
        rows.append((f"m{i}", codec.encode_image(px, "png")))
    rows.append(("bad", b"\x00\x01\x02"))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_image_feature_extraction(small_images):
    feats = extract_image_features(small_images).collect()
    assert len(feats) == 10  # bad payload skipped
    for r in feats:
        assert r["w"] == 16 and r["h"] == 16
        assert 0 <= r["mean_luma"] <= 255 and r["std_luma"] > 0 and r["edge_energy"] > 0


def test_resize_roundtrip(small_images):
    resized = resize_images(small_images, 8, 8).collect()
    assert len(resized) == 10
    w, h, px = codec.decode_image(resized[0]["bytes"])
    assert (w, h) == (8, 8)


def test_video_frame_sampling(spark):
    frames = [codec.encode_image(codec.reference_pixels(f"f{i}", 8, 8), "png") for i in range(25)]
    df = spark.createDataFrame([("v0", frame_concat(frames))], "video_id string, bytes binary")
    sampled = sample_video_frames(df, every_n=10).collect()
    assert [r["frame_index"] for r in sampled] == [0, 10, 20]
    for r in sampled:
        w, h, _ = codec.decode_image(r["frame_bytes"])
        assert (w, h) == (8, 8)


def test_video_unknown_container_raises(spark):
    df = spark.createDataFrame([("v1", b"RIFFxxxxWEBP")], "video_id string, bytes binary")
    with pytest.raises(Exception, match="NotImplementedError|non-engine"):
        sample_video_frames(df, every_n=1).collect()


def test_metadata_envelope_injected(spark):
    """Reference TransformProtobufHierarchy.createMetadataFileWriter:244-252
    injects a ts/hostname/dt/h envelope message into every hierarchy."""
    from schema_inference_spark.operators.proto import with_metadata_message

    h = with_metadata_message(proto_hierarchy(NESTED, root="Event"))
    assert h["Metadata"] == {
        "ts": "int32",
        "hostname": "string",
        "dt": "string",
        "h": "string",
    }
    files = {
        r["file_name"]: r["content"]
        for r in concat_proto_files(proto_lines_df(spark, h)).collect()
    }
    meta = files["Metadata.proto"]
    assert "message Metadata {" in meta
    assert "int32 ts" in meta and "string hostname" in meta
    assert "string dt" in meta and "string h" in meta


def test_streaming_session_windows_equal_batch(spark, sf_dir):
    """F.session_window under Structured Streaming (watermark + availableNow)
    must produce the same per-user session summary as the batch run of the
    IDENTICAL groupBy — the streaming-ready sessionization claim of
    user_session_windows."""
    import tempfile

    from pyspark.sql import functions as F

    from schema_inference_spark.sources.tables import load_table
    from schema_inference_spark.streaming.validate_stream import run_stream_to_memory

    # watermarks require TIMESTAMP (the parquet carries TIMESTAMP_NTZ)
    ev = load_table(spark, sf_dir, "events", parallelize=False).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def summarize(df):
        sessions = df.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
            F.count(F.lit(1)).alias("n_events")
        )
        return sessions.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )

    batch = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in summarize(ev).collect()
    }

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/in")
        stream = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
        sessions = (
            stream.withWatermark("ts", "10 days")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        got_sessions = run_stream_to_memory(
            spark, sessions, "session_windows_sink", output_mode="complete"
        )
        streamed = {
            (r["user_id"], r["n_sessions"], r["n_events"])
            for r in got_sessions.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            .collect()
        }
    assert streamed == batch


def test_audio_feature_extraction(spark):
    """Engine-codec audio decode + features: a pure 440Hz sine has
    RMS ~ A/sqrt(2) and zero-crossing rate ~ 2f/sr; silence has zero
    everything; a foreign container is skipped at the swap point."""
    import numpy as np

    from schema_inference_spark.multimodal.stubs import (
        encode_audio,
        extract_audio_features,
    )

    sr = 16000
    t = np.arange(sr) / sr  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    silence = np.zeros(sr // 2)
    rows = [
        ("sine", encode_audio(sine, sr)),
        ("silence", encode_audio(silence, sr)),
        ("foreign", b"RIFF....WAVE"),  # real WAV magic: not the engine codec
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {r["audio_id"]: r for r in extract_audio_features(df).collect()}

    assert set(got) == {"sine", "silence"}  # foreign skipped, not crashed
    s = got["sine"]
    assert abs(s["duration_sec"] - 1.0) < 1e-9
    assert abs(s["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(s["zero_crossing_rate"] - 2 * 440 / sr) < 0.005
    assert 0.49 < s["peak"] < 0.501  # int16 quantization can tip just past 0.5
    z = got["silence"]
    assert z["rms"] == 0.0 and z["peak"] == 0.0


def test_video_temporal_features(spark):
    """Static video -> zero frame delta; alternating-content video -> large
    delta; foreign container skipped."""
    import numpy as np

    from schema_inference_spark.datagen import codec
    from schema_inference_spark.multimodal.stubs import (
        extract_video_features,
        frame_concat,
    )

    px_a = codec.reference_pixels("vidA", 16, 16)
    px_b = 255 - px_a
    static = frame_concat([codec.encode_image(px_a, "png")] * 4)
    flicker = frame_concat(
        [codec.encode_image(px_a if i % 2 == 0 else px_b, "png") for i in range(4)]
    )
    rows = [("static", static), ("flicker", flicker), ("foreign", b"\x00\x01\x02\x03mp4")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = {r["video_id"]: r for r in extract_video_features(df).collect()}

    assert set(got) == {"static", "flicker"}
    assert got["static"]["n_frames"] == 4
    assert got["static"]["max_frame_delta"] == 0.0
    assert got["flicker"]["mean_frame_delta"] > 50.0  # inverted frames
