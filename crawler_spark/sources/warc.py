"""WARC (Web ARChive) record reader — the Common Crawl source format.

Common-Crawl-style corpora arrive as WARC/1.0 files: concatenated records,
each a CRLF-terminated header block (``WARC/1.0`` version line + ``Name:
value`` headers), a blank line, ``Content-Length`` payload bytes, and a
``\\r\\n\\r\\n`` record separator (ISO 28500). The reference crawler consumes
already-fetched HTML (``code/core/worker.py:103-111``); a 100-TB training
build additionally has to *bootstrap* from existing crawl archives, so the
engine ships a WARC splitter as a source operator.

Design (Spark-first):

* **Arrow-batched ``mapInPandas`` kernel, one record-splitter per batch** —
  parsing is byte-offset arithmetic driven by ``Content-Length``, which is
  irreducibly imperative; everything around it (file listing, partitioning,
  downstream filters/aggs) stays in the DataFrame API. No per-row Python.
* **Payload-agnostic framing**: records are advanced by the declared
  ``Content-Length``, never by scanning for the next magic — a payload that
  itself contains ``WARC/1.0`` or ``\\r\\n\\r\\n`` cannot desynchronize the
  splitter (``test_warc_payload_containing_magic_bytes``).
* **Byte-exact lengths**: offsets are computed over UTF-8 *bytes* (WARC
  Content-Length is octets), so multi-byte text cannot shift frames.
* At cluster scale each input row is one WARC *file* (binary column read
  via ``spark.read.format("binaryFile")`` or a blob store manifest), so
  parallelism = #files and a file never crosses an executor; the catalog
  fixture assembles small per-segment blobs from the ``documents`` table
  instead (no archive files ship with the sandbox).

Malformed tails (truncated header block or payload shorter than declared)
yield a final record with ``truncated = true`` rather than an exception —
at 10^5 real WARC files a torn tail must not kill the stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: output schema of the splitter kernel
WARC_RECORD_SCHEMA = (
    "url string, warc_type string, n_bytes bigint, payload_md5 string, "
    "truncated boolean"
)

_HDR_END = b"\r\n\r\n"
_REC_SEP = b"\r\n\r\n"


def split_warc_blob(blob: bytes) -> list[tuple[str, str, int, str, bool]]:
    """Split one WARC blob into (url, type, n_bytes, payload_md5, truncated)
    tuples. Pure function — unit-testable without Spark."""
    out: list[tuple[str, str, int, str, bool]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(_HDR_END, pos)
        if hdr_end < 0:  # torn header block at the tail
            out.append(("", "", 0, "", True))
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:  # [0] = version line
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = -1
        if length < 0:
            # Unparsable or negative Content-Length: the frame boundary is
            # unknowable, so resynchronizing would risk an infinite loop
            # (negative length moves ``pos`` backwards). Emit a truncated
            # record and stop — same contract as a torn tail.
            out.append(
                (
                    headers.get("warc-target-uri", ""),
                    headers.get("warc-type", ""),
                    0,
                    "",
                    True,
                )
            )
            break
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + length
        payload = blob[body_start:body_end]
        truncated = len(payload) < length
        out.append(
            (
                headers.get("warc-target-uri", ""),
                headers.get("warc-type", ""),
                len(payload),
                hashlib.md5(payload).hexdigest(),
                truncated,
            )
        )
        pos = body_end + len(_REC_SEP)
    return out


def parse_warc_records(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Explode a DataFrame of WARC blobs (``blob_col``: binary or string)
    into one row per archived record. Map-side only: no shuffle is
    introduced — the output inherits the input partitioning."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, int, str, bool]] = []
            for raw in pdf[blob_col]:
                blob = raw.encode("utf-8") if isinstance(raw, str) else bytes(raw)
                rows.extend(split_warc_blob(blob))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_type", "n_bytes", "payload_md5", "truncated"],
            )

    return blobs.mapInPandas(kernel, schema=WARC_RECORD_SCHEMA)
