"""Engine table schemas (explicit StructTypes — never inferred).

Shapes follow FIXTURES.md, which derives them from the reference data model:
``files``/``ids``/``sites`` tables (reference ``code/core/db.py:62-139``),
job-message dicts (``code/core/master.py:171-178``) and the vector-index
document (``code/core/vector_db.py:198-224``). The ``pages`` shape is the
authoritative ``input_hint``: Common-Crawl-style
``(url, warc_ts, html, text, lang)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: input corpus — one row per fetchable URL (BASELINE.json input_hint)
PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

#: crawl seeds (reference sites table, db.py:86-98)
SEEDS = StructType([
    StructField("site_url", StringType(), False),
    StructField("user_id", StringType(), False),
    StructField("interval_hours", IntegerType(), True),
    StructField("last_processed", TimestampType(), True),
    StructField("is_active", BooleanType(), True),
])

#: the frontier — reference files table + job message + north_rule columns
FRONTIER = StructType([
    StructField("file_url", StringType(), False),
    StructField("user_id", StringType(), False),
    StructField("site_url", StringType(), True),
    StructField("schema_map", StringType(), True),
    StructField("job_type", StringType(), True),     # process_file | process_removed_file
    StructField("status", StringType(), True),       # pending | in_flight | done | error
    StructField("retries", IntegerType(), True),
    StructField("depth", IntegerType(), True),
    StructField("score", DoubleType(), True),
    StructField("host", StringType(), True),
    StructField("host_hash", IntegerType(), True),
    StructField("queued_at", TimestampType(), True),
    StructField("epoch", IntegerType(), True),
    StructField("is_manual", BooleanType(), True),
    StructField("is_active", BooleanType(), True),
    StructField("last_read_time", TimestampType(), True),
    StructField("number_of_items", IntegerType(), True),
])

#: URL-seen set — reference ids table (db.py:116-124), duplicates by design
URL_SEEN = StructType([
    StructField("file_url", StringType(), False),
    StructField("user_id", StringType(), False),
    StructField("id", StringType(), False),
    StructField("host_hash", IntegerType(), True),
])

#: vector-index documents (reference vector_db.py:198-224 / _prepare_document)
DOCUMENTS = StructType([
    StructField("bucket", IntegerType(), True),      # id-hash bucket (partition-level replace)
    StructField("id", StringType(), False),          # sha256(url)[:32]
    StructField("url", StringType(), False),         # the @id
    StructField("site", StringType(), True),
    StructField("type", StringType(), True),         # '@type' joined with ', '
    StructField("content", StringType(), True),      # json.dumps(obj)
    StructField("essential_text", StringType(), True),
    StructField("timestamp", TimestampType(), True),
    # packed little-endian float32 (1536 × 4 B); see functions/embed.py for
    # why binary beats array<float> at the parquet layer
    StructField("embedding", BinaryType(), True),
])

#: per-(epoch, partition) lineage + fetch log (reference worker.py:57-73)
METRICS = StructType([
    StructField("epoch", IntegerType(), False),
    StructField("partition_id", IntegerType(), True),
    StructField("url", StringType(), True),
    StructField("status_code", IntegerType(), True),
    StructField("content_length", LongType(), True),
    StructField("num_ids_extracted", IntegerType(), True),
    StructField("error", StringType(), True),
    StructField("ts", TimestampType(), True),
])

#: incremental materialization of `url_seen GROUP BY (id, user_id)` — the
#: reference's ref-count query (db.py:278-282) as a maintained view, bucketed
#: by the id's host bucket so each epoch merges only its own buckets' deltas
REFCOUNTS = StructType([
    StructField("rbucket", IntegerType(), True),
    StructField("id", StringType(), False),
    StructField("user_id", StringType(), False),
    StructField("ref_count", LongType(), False),
])

#: per-file error history — reference processing_errors (db.py:126-137);
#: cleared for a file when it later processes successfully (db.py:161-168)
PROCESSING_ERRORS = StructType([
    StructField("file_url", StringType(), False),
    StructField("user_id", StringType(), False),
    StructField("error_type", StringType(), False),   # fetch_error | extract_error
    StructField("error_message", StringType(), True),
    StructField("error_details", StringType(), True),
    StructField("occurred_at", TimestampType(), True),
    StructField("epoch", IntegerType(), True),
])

#: robots/politeness broadcast state (north_rule)
ROBOTS = StructType([
    StructField("host", StringType(), False),
    StructField("schema_maps", ArrayType(StringType()), True),
    StructField("crawl_delay", DoubleType(), True),
    StructField("fetched_at", TimestampType(), True),
])
