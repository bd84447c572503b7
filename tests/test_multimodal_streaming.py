"""Multimodal binary-column plumbing + Structured Streaming operators."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    decode_image_features,
    encode_stub_image,
    frame_sample_plan,
)
from crawler_spark.streaming.events import (
    deduped_stream,
    stream_events_from_dir,
    windowed_event_counts,
)


def test_image_decode_plumbing(spark):
    rows = [
        {"key": f"img{i}", "image": encode_stub_image(f"img{i}", 16 + i, 8)}
        for i in range(20)
    ]
    rows.append({"key": "broken", "image": b"NOTANIMAGE"})
    rows.append({"key": "null", "image": None})
    df = spark.createDataFrame(rows, "key string, image binary")

    feats = decode_image_features(df).collect()
    by_key = {r["key"]: r for r in feats}
    assert len(feats) == 22
    assert by_key["img0"]["valid"] and by_key["img0"]["width"] == 16
    assert by_key["img3"]["height"] == 8
    assert not by_key["broken"]["valid"] and by_key["broken"]["phash"] is None
    assert not by_key["null"]["valid"] and by_key["null"]["n_bytes"] == 0
    # determinism: same key → same features
    again = {r["key"]: r for r in decode_image_features(df).collect()}
    assert again["img5"]["phash"] == by_key["img5"]["phash"]
    assert again["img5"]["mean_luma"] == by_key["img5"]["mean_luma"]


def test_frame_sampling_plan(spark):
    vids = spark.createDataFrame(
        [{"key": "v1", "n_frames": 25}, {"key": "v2", "n_frames": 1}],
        "key string, n_frames int",
    )
    frames = frame_sample_plan(vids, every_n=10).collect()
    got = {(r["key"], r["frame_idx"]) for r in frames}
    assert got == {("v1", 0), ("v1", 10), ("v1", 20), ("v2", 0)}


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    """The same transformation runs batch and streaming with equal results."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = windowed_event_counts(events)
    want = {tuple(r) for r in batch.collect()}

    src_dir = tmp_path / "stream_src"
    events.write.mode("overwrite").parquet(str(src_dir))
    stream = stream_events_from_dir(spark, str(src_dir), events.schema)
    assert stream.isStreaming
    out = windowed_event_counts(stream)

    query = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == want


def test_streaming_dedup(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    doubled = events.unionByName(events)
    src = tmp_path / "dedup_src"
    doubled.write.mode("overwrite").parquet(str(src))

    stream = stream_events_from_dir(spark, str(src), events.schema)
    query = (
        deduped_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_out").first()
    assert n["c"] == n["n"] == 500
