"""WARC record source: serialize pages to WARC records and parse WARC
blobs back into the pages schema.

The crawl-native ingest format (ISO 28500 / WARC 1.1, public spec):
Common-Crawl-style corpora arrive as .warc(.gz) files, one gzip member
per record. This module provides both directions:

  - ``to_warc_records(pages)``: one WARC *resource* record per page
    (url, warc_ts, html payload), as a binary column — map-only,
    Arrow-batched.
  - ``parse_warc_blobs(df, blob_col)``: mapInPandas over whole-file
    blobs -> (url, warc_ts, html). Handles raw record concatenation AND
    multi-member gzip (each member one record, the Common Crawl
    convention) via stdlib zlib — no external dependency. Framing is
    Content-Length based, so payloads containing "WARC/1.0" bytes can
    never split a record.

100 TB shape: real deployments read ``spark.read.format("binaryFile")
.load(".../*.warc.gz")`` — one task per file (crawl files are ~1 GB, a
good task size), and the parse is a streamed iterator per blob: records
are yielded in bounded pandas batches, never materializing more than one
batch per task. Column pruning happens downstream (html is the payload;
callers that only need urls should select before any wide op).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CRLF = b"\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"  # WARC 1.1 allows fractional seconds

PARSED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
    ]
)


def build_record(url: str, ts: datetime, payload: bytes) -> bytes:
    """One WARC 1.1 resource record (pure function; UDF body and tests)."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    headers = (
        b"WARC/1.1" + _CRLF
        + b"WARC-Type: resource" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts.strftime(_DATE_FMT).encode() + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def _parse_warc_date(s: str) -> datetime | None:
    for fmt in (_DATE_FMT, "%Y-%m-%dT%H:%M:%SZ"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            pass
    return None


def split_records(blob: bytes) -> Iterator[tuple[str, datetime, bytes]]:
    """Iterate (url, ts, payload) from a raw or multi-member-gzip blob.

    Content-Length framing: after the header block, exactly that many
    payload bytes are consumed, then the two record-separator CRLFs —
    header-like bytes inside a payload can never start a new record.
    """
    if blob[:2] == b"\x1f\x8b":  # gzip: decompress member stream
        out = bytearray()
        rest = bytes(blob)
        while rest:
            d = zlib.decompressobj(wbits=31)
            out += d.decompress(rest)
            out += d.flush()
            rest = d.unused_data
        blob = bytes(out)
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:  # trailing garbage / truncated record: stop
            break
        header = blob[pos:head_end].decode("utf-8", "replace")
        fields: dict[str, str] = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            break  # Content-Length IS the framing; without it, resync is unsafe
        body_start = head_end + 4
        payload = blob[body_start : body_start + length]
        pos = body_start + length + 4  # skip record-separator CRLFCRLF
        # poison-record isolation (the tokenizer's per-doc principle):
        # warcinfo/request/metadata records carry no Target-URI — skip,
        # don't crash the task; dates appear with and without fractional
        # seconds in the wild
        uri = fields.get("warc-target-uri")
        ts = _parse_warc_date(fields.get("warc-date", ""))
        if uri is None or ts is None:
            continue
        yield uri, ts, payload


def to_warc_records(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html) -> (url, record:binary), one record per page."""

    @F.pandas_udf("binary")
    def rec(url: pd.Series, ts: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                build_record(u, t.to_pydatetime(), bytes(h))
                for u, t, h in zip(url, ts, html)
            ]
        )

    return pages.select(
        "url", rec(F.col("url"), F.col("warc_ts"), F.col("html")).alias("record")
    )


def parse_warc_blobs(df: DataFrame, blob_col: str = "content",
                     batch_rows: int = 256) -> DataFrame:
    """Whole-file WARC blobs -> pages rows. Iterator mapInPandas: one
    input row (file) may yield many records; emitted in ``batch_rows``
    chunks so a 1 GB crawl file never materializes as one pandas frame.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[tuple[str, datetime, bytes]] = []
        for pdf in batches:
            for blob in pdf[blob_col]:
                for rec in split_records(bytes(blob)):
                    buf.append(rec)
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf, columns=["url", "warc_ts", "html"])
                        buf = []
        if buf:
            yield pd.DataFrame(buf, columns=["url", "warc_ts", "html"])

    return df.select(blob_col).mapInPandas(gen, PARSED_SCHEMA)
