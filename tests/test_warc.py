"""WARC source roundtrip and framing tests (sources/warc.py)."""

import gzip
from datetime import datetime

from pyspark.sql import functions as F

from pdf_plumber_util_spark.sources import synth_pages
from pdf_plumber_util_spark.sources.warc import (
    build_record,
    parse_warc_blobs,
    split_records,
    to_warc_records,
)


def _pages_set(df):
    return {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in df.select("url", "warc_ts", "html").collect()
    }


def test_warc_roundtrip(spark):
    pages = synth_pages(spark, 20)
    records = [bytes(r["record"]) for r in to_warc_records(pages).collect()]
    blob = b"".join(records)
    parsed = parse_warc_blobs(
        spark.createDataFrame([(blob,)], "content binary")
    )
    assert _pages_set(parsed) == _pages_set(pages)


def test_warc_gzip_members_roundtrip(spark):
    """Common Crawl convention: one gzip member per record."""
    pages = synth_pages(spark, 8)
    records = [bytes(r["record"]) for r in to_warc_records(pages).collect()]
    blob = b"".join(gzip.compress(r) for r in records)
    parsed = parse_warc_blobs(
        spark.createDataFrame([(blob,)], "content binary")
    )
    assert _pages_set(parsed) == _pages_set(pages)


def test_warc_framing_survives_header_bytes_in_payload():
    """Content-Length framing: a payload containing a full fake record
    must not split the stream."""
    evil = (
        b"<html>WARC/1.1\r\nWARC-Type: resource\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n</html>"
    )
    ts = datetime(2026, 8, 17, 12, 0, 0, 123456)
    blob = build_record("https://a.example/x", ts, evil) + build_record(
        "https://a.example/y", ts, b"<p>ok</p>"
    )
    got = list(split_records(blob))
    assert [(u, p) for u, _, p in got] == [
        ("https://a.example/x", evil),
        ("https://a.example/y", b"<p>ok</p>"),
    ]
    assert all(t == ts for _, t, _ in got)


def test_warc_multiple_blobs_parse_independently(spark):
    pages = synth_pages(spark, 6).collect()
    recs = [
        build_record(r["url"], r["warc_ts"], bytes(r["html"])) for r in pages
    ]
    df = spark.createDataFrame(
        [(b"".join(recs[:4]),), (b"".join(recs[4:]),)], "content binary"
    )
    parsed = parse_warc_blobs(df, batch_rows=2)
    assert parsed.count() == 6
    assert {r["url"] for r in parsed.collect()} == {r["url"] for r in pages}


def test_warc_batching_bounds_output_frames(spark):
    """batch_rows chunks the per-task output (scale guard, not behavior)."""
    pages = synth_pages(spark, 12)
    records = [bytes(r["record"]) for r in to_warc_records(pages).collect()]
    blob = b"".join(records)
    parsed = parse_warc_blobs(
        spark.createDataFrame([(blob,)], "content binary"), batch_rows=3
    )
    assert parsed.count() == 12


def test_split_records_tolerates_warcinfo_and_garbage():
    """Real Common-Crawl files open with a warcinfo record (no
    WARC-Target-URI, date without fractional seconds) and may end with
    truncated bytes; neither crashes the parser and only URI-bearing
    records yield."""
    from pdf_plumber_util_spark.sources.warc import build_record, split_records
    from datetime import datetime

    info_payload = b"software: test\r\n"
    warcinfo = (
        b"WARC/1.1\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Date: 2023-01-01T00:00:15Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(info_payload)).encode() + b"\r\n"
        b"\r\n" + info_payload + b"\r\n\r\n"
    )
    page = build_record("https://a.example.com/x",
                        datetime(2024, 2, 3, 4, 5, 6, 789000), b"<p>hi</p>")
    blob = warcinfo + page + b"\x00\x00trailing-garbage"
    got = list(split_records(blob))
    assert len(got) == 1
    url, ts, payload = got[0]
    assert url == "https://a.example.com/x" and payload == b"<p>hi</p>"
    assert ts == datetime(2024, 2, 3, 4, 5, 6, 789000)


def test_split_records_skips_dateless_record():
    from pdf_plumber_util_spark.sources.warc import split_records

    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://b.example.com/\r\n"
        b"WARC-Date: not-a-date\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    assert list(split_records(rec)) == []
