"""Property-based tests (hypothesis) for the pure kernels whose byte-
identity claims anchor the rest of the engine.

Spark round-trips are batched: each hypothesis example is a LIST of
values evaluated in one job (a per-value job would be pathologically
slow), with deadline disabled because JVM latency is not the property
under test.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_plumber_util_spark.operators.lines import _cluster_anchor


def _cluster_anchor_oracle(tops: list[float], y_tol: float) -> list[int]:
    """Direct transcription of the reference's anchor loop
    (extractor.py:221-235): break when top - anchor > tol; the anchor is
    the top that STARTED the cluster."""
    ids = []
    line = -1
    anchor = None
    for t in tops:
        if anchor is None or t - anchor > y_tol:
            line += 1
            anchor = t
        ids.append(line)
    return ids


@given(
    tops=st.lists(
        st.floats(min_value=0.0, max_value=1e4, allow_nan=False, width=64),
        min_size=0,
        max_size=200,
    ),
    y_tol=st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_cluster_anchor_matches_reference_loop(tops, y_tol):
    tops = sorted(tops)
    got = _cluster_anchor(np.array(tops, dtype=np.float64), y_tol).tolist()
    assert got == _cluster_anchor_oracle(tops, y_tol)


@given(
    tops=st.lists(
        st.floats(min_value=0.0, max_value=1e4, allow_nan=False, width=64),
        min_size=1,
        max_size=100,
    ),
    y_tol=st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_cluster_anchor_invariants(tops, y_tol):
    tops = np.array(sorted(tops), dtype=np.float64)
    ids = _cluster_anchor(tops, y_tol)
    # ids are 0-based, consecutive, nondecreasing
    assert ids[0] == 0
    steps = np.diff(ids)
    assert set(steps.tolist()) <= {0, 1}
    # every member is within tol of its cluster's anchor (first member)
    for line in range(ids.max() + 1):
        member_tops = tops[ids == line]
        assert np.all(member_tops - member_tops[0] <= y_tol)


# ---- Spark Column kernels vs CPython, batched per example ----


def _spark_eval(spark, values, colfn, in_type="double"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["o"] for r in df.select(colfn("v").alias("o")).collect()]


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=64
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=12, deadline=None)
def test_py_round_matches_cpython(spark, values):
    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.rounding import py_round

    got = _spark_eval(spark, values, lambda c: py_round(F.col(c)))
    want = [float(round(v)) for v in values]
    assert got == want


@given(
    values=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
        min_size=1,
        max_size=300,
    ),
    step=st.sampled_from([0.25, 0.5, 1.0, 2.0]),
)
@settings(max_examples=12, deadline=None)
def test_round_to_nearest_matches_cpython(spark, values, step):
    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.rounding import round_to_nearest

    got = _spark_eval(spark, values, lambda c: round_to_nearest(F.col(c), step))
    want = [float(round(v / step) * step) for v in values]
    assert got == want


@given(
    values=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=12, deadline=None)
def test_normalize_line_matches_cpython(spark, values):
    import re

    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.functions.text import normalize_line

    got = _spark_eval(spark, values, lambda c: normalize_line(F.col(c)),
                      in_type="string")
    want = [re.sub(r"\s+", " ", v).strip() for v in values]
    assert got == want


# ---------------------------------------------------------------- urls

_SEG = st.text(
    alphabet=st.sampled_from("aBcDe019._~-"), min_size=0, max_size=6
)
_PARAM_KEY = st.sampled_from(
    ["a", "B", "q", "x2", "utm_source", "utm_campaign", "fbclid", "gclid", "ref"]
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTTpS"]))
    host = draw(st.sampled_from(
        ["Example.COM", "www.example.org", "A.b.C.de", "HOT0.example.com",
         "alice@Example.COM", "u:Pw1@WWW.example.org", "[2001:DB8::1]",
         "bob@[::1]"]
    ))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":8443"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=4))
    path = "".join(
        draw(st.sampled_from(["/", "//", "///"])) + s for s in segs
    )
    if draw(st.booleans()):
        path += draw(st.sampled_from(["/", "//"]))
    params = draw(st.lists(
        st.tuples(_PARAM_KEY, st.text(alphabet="abc01", max_size=3)),
        min_size=0, max_size=4,
    ))
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#frag", "#a/b?c=1"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{query}" if query else "") + frag


def _canonical_twin(url: str) -> str:
    """Pure-Python restatement of the canonicalization rules via
    urllib.parse (independent of the Spark regexes)."""
    import re as _re
    from urllib.parse import urlsplit

    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    host = (sp.hostname or "").lower()
    if ":" in host:  # urlsplit strips IPv6 brackets; canonical form keeps them
        host = f"[{host}]"
    port = ""
    if sp.port is not None and not (
        (scheme == "http" and sp.port == 80)
        or (scheme == "https" and sp.port == 443)
    ):
        port = f":{sp.port}"
    path = _re.sub(r"/{2,}", "/", sp.path)
    path = _re.sub(r"/$", "", path) or "/"
    params = [
        p for p in sp.query.split("&")
        if p and not _re.match(r"^(utm_[^=]*|fbclid|gclid|ref)=", p)
    ]
    q = "?" + "&".join(sorted(params)) if params else ""
    return f"{scheme}://{host}{port}{path}{q}"


@given(st.lists(_urls(), min_size=1, max_size=50))
@settings(max_examples=12, deadline=None)
def test_canonical_url_matches_urllib_twin_and_is_idempotent(spark, urls):
    from pyspark.sql import functions as F

    from pdf_plumber_util_spark.operators.webtext import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        (r["c1"], r["c2"])
        for r in df.select(
            canonical_url(F.col("url")).alias("c1"),
            canonical_url(canonical_url(F.col("url"))).alias("c2"),
        ).collect()
    ]
    for u, (c1, c2) in zip(urls, got):
        assert c1 == _canonical_twin(u), (u, c1)
        assert c2 == c1, f"not idempotent: {u} -> {c1} -> {c2}"


# ------------------------------------------------ crawl-curation ops


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["a.com", "b.com", "mega.com", "tiny.org"]),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.sampled_from([1, 3, 8]),
)
@settings(max_examples=10, deadline=None)
def test_cap_per_host_invariant_to_salt_buckets(spark, rows, buckets):
    """The salted two-level top-n must select exactly the global top-n
    per host, for any salt_buckets — equal to the pure-Python answer."""
    from pdf_plumber_util_spark.operators.webtext import cap_per_host

    df = spark.createDataFrame(
        [(i, f"https://{h}/p/{i}") for i, h in rows], "doc_id long, url string"
    )
    got = sorted(
        r["doc_id"]
        for r in cap_per_host(df, max_per_host=3, salt_buckets=buckets).collect()
    )
    by_host: dict[str, list[int]] = {}
    for i, h in rows:
        by_host.setdefault(h, []).append(i)
    want = sorted(i for ids in by_host.values() for i in sorted(ids)[:3])
    assert got == want


@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=2,
                 max_size=30),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_repetition_stats_matches_python_twin(spark, docs_words):
    """Spark repetition fractions equal an independent pure-Python
    restatement (collections.Counter) on random small-vocab docs."""
    from collections import Counter

    from pdf_plumber_util_spark.operators.text_analysis import repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, ws in enumerate(docs_words):
        text = " ".join(ws)
        g2 = Counter(" ".join(ws[j:j + 2]) for j in range(len(ws) - 1))
        # tie-break: max count, then lexicographically greatest gram
        top_g = max(g2, key=lambda g: (g2[g], g))
        assert got[i]["top_gram"] == top_g
        assert got[i]["top_gram_frac"] == len(top_g) * g2[top_g] / len(text)
        g5 = Counter(
            " ".join(ws[j:j + 5]) for j in range(len(ws) - 4)
        ) if len(ws) >= 5 else Counter()
        dup = sum(len(g) * c for g, c in g5.items() if c > 1)
        assert got[i]["dup_gram_frac"] == dup / len(text)


@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc dd".split()), min_size=1,
                 max_size=25),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=10, deadline=None)
def test_paragraph_dedup_matches_python_twin(spark, docs_words, chunk_words):
    """Chunk dedup equals an independent pure-Python restatement on
    random small-vocab docs, for any chunk size: globally first
    (doc_id, chunk_idx) per chunk text wins, survivors reassemble in
    order."""
    from pdf_plumber_util_spark.operators.dedup import paragraph_dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(df, chunk_words).collect()}

    seen: set[str] = set()
    for i, ws in enumerate(docs_words):  # doc_id order == first-wins order
        chunks = [
            " ".join(ws[j:j + chunk_words])
            for j in range(0, len(ws), chunk_words)
        ]
        kept = []
        for c in chunks:  # chunk_idx order
            if c not in seen:
                seen.add(c)
                kept.append(c)
        assert got[i]["n_chunks"] == len(chunks)
        assert got[i]["n_chunks_kept"] == len(kept)
        assert got[i]["deduped_text"] == " ".join(kept)


@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc".split()), min_size=0,
                 max_size=20),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10, deadline=None)
def test_duplicate_span_stats_matches_python_twin(spark, docs_words,
                                                  span_words, stride):
    """Sliding-window duplicate coverage equals an independent
    pure-Python restatement on random small-vocab docs for any
    (span_words, stride): global first (doc_id, pos) per window text
    wins, later instances cover their exact interval union."""
    from pdf_plumber_util_spark.operators.dedup import duplicate_span_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           duplicate_span_stats(df, span_words, stride).collect()}

    # twin: tokenization mirrors _norm (split on single space after
    # collapse; '' -> [''])
    toks = {i: " ".join(ws).split(" ") for i, ws in enumerate(docs_words)}
    insts = []  # (doc, pos, text) in (doc, pos) order
    for i in sorted(toks):
        t = toks[i]
        if len(t) >= span_words:
            for p in range(1, len(t) - span_words + 2, stride):
                insts.append((i, p, " ".join(t[p - 1:p - 1 + span_words])))
    from collections import Counter
    cnt = Counter(text for _, _, text in insts)
    first = {}
    for d, p, text in insts:  # already (doc, pos) sorted
        first.setdefault(text, (d, p))
    per_doc_dups: dict[int, list[tuple[int, int]]] = {}
    for d, p, text in insts:
        if cnt[text] > 1 and first[text] != (d, p):
            per_doc_dups.setdefault(d, []).append((p, p + span_words - 1))
    for i in sorted(toks):
        t = toks[i]
        n_spans = max(0, (len(t) - span_words) // stride + 1) if len(t) >= span_words else 0
        ivs = per_doc_dups.get(i, [])
        covered, max_end = 0, 0
        for s, e in sorted(ivs):
            covered += max(0, e - max(max_end, s - 1))
            max_end = max(max_end, e)
        assert got[i]["n_spans"] == n_spans
        assert got[i]["n_dup_spans"] == len(ivs)
        assert got[i]["dup_tokens"] == covered
        assert got[i]["n_tokens"] == len(t)
