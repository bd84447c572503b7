"""Embedding stage: deterministic stub + pluggable provider semantics.

The reference embeds essential-field text through Azure OpenAI in batches of
50 with backoff on 429 and binary batch-splitting on token-limit errors
(``code/core/embedding_provider/azure_oai_embedding.py:50-98``,
``code/core/vector_db.py:286-316``). In this engine the whole stage is one
Arrow-batched pandas UDF:

* batching is Arrow's job (``spark.sql.execution.arrow.maxRecordsPerBatch``);
* retry/backoff/split live *inside* the UDF per batch (provider path);
* tests/bench use the deterministic hash-seeded stub below — same shape
  (1536-dim float32, L2-normalized), zero network, reproducible bit-for-bit.

Texts are truncated to 20 000 chars before embedding (reference
``vector_db.py:146-149``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 1536  # reference text-embedding-3-small (vector_db.py:209)
TEXT_CAP = 20000  # reference truncation (vector_db.py:146-149)


def stub_embedding(text: str | None, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic unit vector derived from the text bytes.

    Oversized-single-item semantics from the reference (zero vector for an
    item that cannot be embedded — ``azure_oai_embedding.py:94-96``) are kept
    for ``None``.
    """
    if text is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.sha256(text[:TEXT_CAP].encode("utf-8")).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    vec = rng.standard_normal(dim).astype(np.float32)
    norm = float(np.linalg.norm(vec))
    return vec / norm if norm > 0 else vec


@pandas_udf(ArrayType(FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched stub embedder (swap point for a real provider)."""
    return pd.Series([stub_embedding(t) for t in texts], dtype="object")
