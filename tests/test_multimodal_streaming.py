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
from crawler_spark.streaming.sessions import sessionize_stream


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


def test_streaming_sessionize_sandwich(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer vs the batch twin.

    Events are replayed in order across several micro-batches. Every
    non-final session per user is closed IN-DATA by a later event, so the
    emitted set must contain all of them; each user's open tail session can
    only be emitted by a watermark timeout (which needs a subsequent batch),
    so the emitted set is sandwiched:

        batch_sessions − final_per_user  ⊆  emitted  ⊆  batch_sessions
    """
    from crawler_spark.plans.queries import q_sessionize_events

    batch = q_sessionize_events(spark, sf_dir).collect()
    want = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["session_start"], r["session_end"])
        for r in batch
    }
    finals = {}
    for uid, seq in want:
        finals[uid] = max(finals.get(uid, 0), seq)
    must_emit = {k for k in want if k[1] != finals[k[0]]}

    # replay in event order over 4 sequential files, one file per trigger
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pdf = events.orderBy("ts", "event_id").toPandas()
    src = tmp_path / "sess_src"
    src.mkdir()
    quarter = (len(pdf) + 3) // 4
    for i in range(4):
        chunk = pdf.iloc[i * quarter:(i + 1) * quarter]
        chunk.to_parquet(str(src / f"part{i:02d}.parquet"), index=False,
                         coerce_timestamps="us")
        time.sleep(0.05)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    query = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    assert set(got) <= set(want), f"phantom sessions: {set(got) - set(want)}"
    assert must_emit <= set(got), f"missing closed sessions: {must_emit - set(got)}"
    for k in got:
        assert got[k] == want[k], f"session {k}: {got[k]} != {want[k]}"
