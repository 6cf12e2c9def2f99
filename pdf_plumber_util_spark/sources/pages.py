"""Distributed deterministic generator of Common-Crawl-style pages.

Produces the driver-contract input table (BASELINE.json input_hint):
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is seed-stable per url and fully distributed: spark.range(n) ->
Arrow-batched pandas UDF builds the html; no driver-side loops, so the
same code generates 10^3 or 10^9 rows. A configurable fraction of urls
lands on a handful of "hot hosts" to exercise skew handling (salting) in
the pipeline, mirroring real crawl host skew.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_VOCAB = (
    "the data spark table query scan filter join merge sort window group "
    "page line block text font size gap header footer body section title "
    "crawl parse token shuffle partition skew hash broadcast stream batch "
    "layout column row value count index range limit order union distinct"
).split()

_LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def _rng_for(doc_id: int, seed: int) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def build_doc(doc_id: int, seed: int = 42, hot_host_frac: float = 0.05) -> dict:
    """One synthetic document (pure function; used by UDF and tests)."""
    rng = _rng_for(doc_id, seed)
    if rng.random() < hot_host_frac:
        host = f"hot{int(rng.integers(3))}.example.com"
    else:
        host = f"site{int(rng.integers(100000))}.example.org"
    url = f"https://{host}/doc/{doc_id}"

    def sent(n: int) -> str:
        return " ".join(_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n))

    parts = [f"<header>{host} crawl archive</header>",
             f"<footer>page footer {host}</footer>"]
    n_blocks = int(rng.integers(6, 28))
    parts.append(f"<h1>{sent(int(rng.integers(3, 7)))}</h1>")
    for _ in range(n_blocks):
        r = rng.random()
        if r < 0.12:
            parts.append(f"<h2>{sent(int(rng.integers(2, 6)))}</h2>")
        elif r < 0.2:
            parts.append(f"<h3>{sent(int(rng.integers(2, 6)))}</h3>")
        elif r < 0.28:
            items = "".join(
                f"<li>{sent(int(rng.integers(3, 8)))}</li>"
                for _ in range(int(rng.integers(2, 5)))
            )
            parts.append(items)
        elif r < 0.36:
            links = " ".join(
                f"<a>{_VOCAB[int(rng.integers(0, len(_VOCAB)))]}</a>"
                for _ in range(int(rng.integers(4, 10)))
            )
            parts.append(f"<nav>{links}</nav>")
        else:
            body = sent(int(rng.integers(15, 60)))
            if rng.random() < 0.3:
                body += f" <b>{sent(2)}</b> {sent(4)}"
            if rng.random() < 0.2:
                body += f" <a>{sent(1)}</a> {sent(3)}"
            parts.append(f"<p>{body}</p>")
    html = "".join(parts)

    from .render import plain_text

    ts = pd.Timestamp("2025-01-01", tz="UTC") + pd.Timedelta(
        seconds=int(rng.integers(0, 365 * 24 * 3600))
    )
    return {
        "url": url,
        "warc_ts": ts.tz_localize(None),
        "html": html.encode("utf-8"),
        "text": plain_text(html),
        "lang": _LANGS[int(rng.integers(0, len(_LANGS)))],
    }


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed pages table; deterministic in (n_docs, seed)."""

    def gen(batches):
        for pdf in batches:
            rows = [build_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_df = spark.range(n_docs)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)
