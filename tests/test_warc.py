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
