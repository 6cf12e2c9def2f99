"""Deterministic page sampling (M1-M3, llm/sampling.py:37-213).

The reference seeds `random`; a cluster engine needs *cluster-size
invariant* sampling, so every choice is a hash rank: md5(url, page, salt)
orders pages pseudo-randomly but reproducibly on any partitioning
(SURVEY.md §4 custom-work item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_rank(salt: str):
    return F.md5(F.concat_ws(":", F.col("url"), F.col("page").cast("string"), F.lit(salt)))


def sample_sections_stratified(pages: DataFrame, pct: float = 0.15,
                               floor: int = 10, salt: str = "m2") -> DataFrame:
    """M2 (sampling.py:123-175): stratified 60/30/10% of target from
    first/middle/last thirds of each document.

    pages: (url, page) distinct. Returns sampled (url, page, tercile).
    """
    w = Window.partitionBy("url").orderBy("page")
    n = Window.partitionBy("url")
    df = (
        pages.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(n))
        .withColumn("tercile", F.least(F.lit(3), F.ceil(F.col("_rn") * 3 / F.col("_n")).cast("int")))
        .withColumn(
            "_target",
            F.greatest(F.lit(floor), F.ceil(F.col("_n") * pct).cast("int")),
        )
        .withColumn(
            "_quota",
            F.when(F.col("tercile") == 1, F.ceil(F.col("_target") * 0.6))
            .when(F.col("tercile") == 2, F.ceil(F.col("_target") * 0.3))
            .otherwise(F.ceil(F.col("_target") * 0.1))
            .cast("int"),
        )
        .withColumn(
            "_hr",
            F.row_number().over(
                Window.partitionBy("url", "tercile").orderBy(_hash_rank(salt), "page")
            ),
        )
    )
    return df.filter(F.col("_hr") <= F.col("_quota")).select("url", "page", "tercile")


def sample_toc(pages: DataFrame, head: int = 20, tail_pct: float = 0.10,
               salt: str = "m3") -> DataFrame:
    """M3 (sampling.py:177-213): first min(head, total) pages plus a
    hash-deterministic tail_pct of the remainder."""
    w = Window.partitionBy("url").orderBy("page")
    df = pages.withColumn("_rn", F.row_number().over(w))
    head_df = df.filter(F.col("_rn") <= head).select(
        "url", "page", F.lit("head").alias("part")
    )
    tail = df.filter(F.col("_rn") > head)
    tail_n = tail.groupBy("url").agg(F.count("*").alias("_tn"))
    tail_sel = (
        tail.join(tail_n, "url")
        .withColumn(
            "_hr",
            F.row_number().over(Window.partitionBy("url").orderBy(_hash_rank(salt), "page")),
        )
        .filter(F.col("_hr") <= F.ceil(F.col("_tn") * tail_pct))
        .select("url", "page", F.lit("tail").alias("part"))
    )
    return head_df.unionByName(tail_sel)


def sample_header_footer_groups(pages: DataFrame, group_size: int = 4,
                                n_groups: int = 3, n_individuals: int = 4,
                                salt: str = "m1") -> DataFrame:
    """M1 (sampling.py:37-121): if total <= 3*4+4 take all; else pick
    n_groups non-overlapping consecutive runs of group_size pages (greedy
    over hash-ranked candidate starts) + n_individuals single pages from
    the remainder.

    The greedy overlap rejection is inherently sequential over a tiny
    per-document candidate list -> applyInPandas per url (bounded work),
    hash-seeded so results are partitioning-invariant.
    """
    import hashlib

    import pandas as pd

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("page")
        url = pdf["url"].iloc[0]
        pages_list = list(pdf["page"])
        total = len(pages_list)
        take_all = total <= group_size * n_groups + n_individuals

        def hrank(p: int, tag: str) -> str:
            return hashlib.md5(f"{url}:{p}:{salt}:{tag}".encode()).hexdigest()

        rows = []
        if take_all:
            for p in pages_list:
                rows.append({"url": url, "page": p, "kind": "all"})
            return pd.DataFrame(rows)
        starts = sorted(range(total - group_size + 1),
                        key=lambda i: hrank(pages_list[i], "g"))
        used: set[int] = set()
        chosen = 0
        for s in starts:
            # guard at the top so n_groups=0 selects nothing (the
            # reference's individuals-only mode, test_sampling.py:256)
            if chosen >= n_groups:
                break
            span = set(range(s, s + group_size))
            if span & used:
                continue
            used |= span
            chosen += 1
            for i in sorted(span):
                rows.append({"url": url, "page": pages_list[i], "kind": "group"})
        remainder = [i for i in range(total) if i not in used]
        for i in sorted(remainder, key=lambda i: hrank(pages_list[i], "s"))[:n_individuals]:
            rows.append({"url": url, "page": pages_list[i], "kind": "individual"})
        return pd.DataFrame(rows)

    return pages.select("url", "page").groupBy("url").applyInPandas(
        per_doc, schema="url string, page int, kind string"
    )
