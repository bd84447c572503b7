"""Unit tests for the vectorized stub embedder and snapshot-store scratch."""

from __future__ import annotations

import numpy as np

from crawler_spark.functions.embed import (
    EMBED_DIM,
    stub_embedding,
    stub_embedding_batch,
)
from crawler_spark.sources.tables import SnapshotStore


def test_batch_embedding_deterministic_and_normalized():
    texts = [f"essential text {i}" for i in range(300)]
    a = stub_embedding_batch(texts)
    b = stub_embedding_batch(texts)
    assert a.shape == (300, EMBED_DIM)
    assert a.dtype == np.float32
    assert np.array_equal(a, b)
    norms = np.linalg.norm(a, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # distinct texts → distinct vectors; same text → same vector
    assert not np.array_equal(a[0], a[1])
    assert np.array_equal(a[0], stub_embedding(texts[0]))


def test_batch_embedding_none_is_zero_vector():
    out = stub_embedding_batch(["x", None, "y"])
    assert np.all(out[1] == 0.0)
    assert np.linalg.norm(out[0]) > 0.99


def test_batch_embedding_chunk_boundaries_consistent():
    """Values must not depend on where the row falls in the internal chunks."""
    texts = [f"t{i}" for i in range(2500)]  # spans multiple 1024-row chunks
    whole = stub_embedding_batch(texts)
    per_row = np.stack([stub_embedding(t) for t in texts[:5] + texts[1020:1030]])
    assert np.array_equal(whole[:5], per_row[:5])
    assert np.array_equal(whole[1020:1030], per_row[5:])


def test_binary_packing_roundtrip():
    vec = stub_embedding("roundtrip me")
    blob = vec.astype("<f4").tobytes()
    assert len(blob) == EMBED_DIM * 4
    assert np.array_equal(np.frombuffer(blob, dtype="<f4"), vec)


def test_store_materialize_pins_data(spark, tmp_path):
    store = SnapshotStore(tmp_path / "state")
    df = spark.range(100).withColumnRenamed("id", "k")
    pinned = store.materialize(spark, df, "probe")
    assert pinned.count() == 100
    # scratch is not manifest-tracked and is overwritable (epoch re-run)
    assert not store.exists("probe")
    again = store.materialize(spark, spark.range(7).withColumnRenamed("id", "k"), "probe")
    assert again.count() == 7
