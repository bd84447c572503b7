"""WARC splitter kernel: framing robustness + catalog-plan shape."""

from __future__ import annotations

import hashlib

from crawler_spark.plans.queries import CATALOG
from crawler_spark.sources.warc import split_warc_blob


def _record(uri: str, payload: bytes, warc_type: str = "response") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


def test_warc_roundtrip_two_records():
    blob = _record("https://a/1", b"hello") + _record("https://a/2", b"world!!")
    got = split_warc_blob(blob)
    assert [(u, n, t) for u, _, n, _, t in got] == [
        ("https://a/1", 5, False),
        ("https://a/2", 7, False),
    ]
    assert got[0][3] == hashlib.md5(b"hello").hexdigest()


def test_warc_payload_containing_magic_bytes():
    """Framing is Content-Length-driven: a payload that embeds the WARC
    version magic and the record separator must not desynchronize the
    splitter (a scan-for-next-magic splitter corrupts here)."""
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\ny"
    blob = _record("https://a/evil", evil) + _record("https://a/after", b"ok")
    got = split_warc_blob(blob)
    assert [(u, n) for u, _, n, _, _ in got] == [
        ("https://a/evil", len(evil)),
        ("https://a/after", 2),
    ]


def test_warc_multibyte_payload_framed_by_octets():
    payload = "héllo wörld — 你好".encode("utf-8")
    blob = _record("https://a/mb", payload) + _record("https://a/next", b"z")
    got = split_warc_blob(blob)
    assert got[0][2] == len(payload)
    assert got[1][0] == "https://a/next"


def test_warc_torn_tail_marks_truncated_not_raises():
    whole = _record("https://a/1", b"complete")
    torn = _record("https://a/2", b"0123456789")[:-8]  # payload cut short
    got = split_warc_blob(whole + torn)
    assert got[0][4] is False
    assert got[1][0] == "https://a/2"
    assert got[1][4] is True
    # torn header block (no \r\n\r\n before EOF) also survives
    got2 = split_warc_blob(whole + b"WARC/1.0\r\nWARC-Type: resp")
    assert got2[1][4] is True


def test_warc_catalog_single_fixture_exchange(spark, sf_dir):
    """The splitter itself is map-side: the only Exchange in the catalog
    plan belongs to the fixture's per-segment blob assembly (groupBy seg).
    At cluster scale the input is one row per archive file and the
    operator runs with ZERO shuffles."""
    fn, _ = CATALOG["warc_extract"]
    plan = (
        fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange") == 1, plan


def test_warc_malformed_content_length_terminates_truncated():
    """ADVICE r4: a non-numeric Content-Length must not raise (torn-tail
    contract), and a negative one must not move the cursor backwards
    (infinite loop). Both yield a truncated record and stop."""
    whole = _record("https://a/1", b"fine")

    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/nan\r\n"
        b"Content-Length: banana\r\n\r\npayload\r\n\r\n"
    )
    got = split_warc_blob(whole + bad)
    assert [(u, t) for u, _, _, _, t in got] == [
        ("https://a/1", False),
        ("https://a/nan", True),
    ]

    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/neg\r\n"
        b"Content-Length: -7\r\n\r\npayload\r\n\r\n"
    )
    got2 = split_warc_blob(whole + neg)  # must terminate, not loop
    assert got2[1] == ("https://a/neg", "response", 0, "", True)
