"""Composed corpus-curation funnel as a library plan.

The CLI `curate` subcommand is a thin wrapper over `curate_corpus`; the
function exists so pipelines can embed the funnel (and so its plan shape
can be pinned by tests, like every other composed plan in `plans/`).

Gate composition. The four row-preserving MAP-ONLY gates are computed
in ONE projection over the input (no join, no re-scan):

  quality_keep      Gopher quality rules (webtext.gopher_quality_cols)
  domain_keep       optional UT1 blocklist (webtext.domain_match_col,
                    literal zero-shuffle path)
  mix (in keep)     optional deterministic mix subsample
                    (webtext.mix_sample_cols)
  scrubbed text     PII redaction + counts (webtext.pii_scrub_cols)

Only the gates that genuinely aggregate join back, all doc_id-keyed so
they co-partition; the only text-sized exchanges are the ones the
underlying operators document — the dedup fingerprint groupBy, the
span-hash groupBy when the span gate is on, the (doc, word) explode of
the perplexity gate, and the broadcast eval n-grams:

  repetition_keep   Gopher repetition gates (text_analysis)
  is_duplicate      exact dedup, first occurrence survives; with
                    ``dedup_index`` ALSO true for docs whose fingerprint
                    is in the prior corpus index (incremental_dedup
                    semantics — continuous-ingestion snapshots)
  span_keep         optional ExactSubstr duplicate-span coverage gate
  perplexity_keep   optional CCNet head/middle gate (drop the tail
                    tertile under corpus-estimated approx_percentile
                    cutoffs; text_analysis.lm_perplexity +
                    perplexity_cutoffs + perplexity_bucket)
  classifier_keep   optional fastText-style linear quality classifier
                    (text_analysis.linear_quality scored against a
                    trained (word, weight) model table — the
                    FineWeb-Edu / CCNet-wikiref gate shape)
  is_contaminated   optional benchmark decontamination (broadcast evals)

Optional pre-clean (``drop_dup_paragraphs=True``): cross-doc near-dup
PARAGRAPHS are removed and the text re-assembled (dedup.
drop_dup_paragraphs) before any gate runs, so every gate judges the
de-boilerplated document; a doc reduced to nothing fails the quality
gate, same as null text.

Output: one row per input doc — (doc_id, keep, per-gate flags,
PII-scrubbed text, n_pii_redactions). Identical values to the
round-3 all-joins formulation (the a19 oracle and CLI pytests pin
this); the fold only removes four doc_id exchanges and four re-scans
of the text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import EngineError


def curate_corpus(docs: DataFrame, *, min_words: int = 50,
                  eval_docs: DataFrame | None = None,
                  decontaminate_ngram: int = 13,
                  block_domains: list[str] | None = None,
                  max_dup_span_frac: float | None = None,
                  span_words: int = 20, span_stride: int = 5,
                  mix_rates: dict[str, float] | None = None,
                  mix_salt: str = "mix1",
                  drop_perplexity_tail: bool = False,
                  quality_model: DataFrame | None = None,
                  model_bias: float = 0.0,
                  model_threshold: float = 0.5,
                  dedup_index: DataFrame | None = None,
                  drop_dup_paragraphs: bool = False) -> DataFrame:
    from ..operators.dedup import decontaminate, exact_duplicates
    from ..operators.text_analysis import repetition_stats
    from ..operators.webtext import (
        domain_match_col,
        gopher_quality_cols,
        mix_sample_cols,
        pii_scrub_cols,
    )

    if drop_dup_paragraphs:
        # Dolma-style pre-clean: delete cross-doc near-dup PARAGRAPHS
        # before any gate sees the text, so quality/repetition/dedup all
        # judge the de-boilerplated document (a doc reduced to nothing
        # fails the quality gate downstream, same as null text)
        from ..operators.dedup import drop_dup_paragraphs as _ddp

        docs = _ddp(docs).drop("n_paras", "n_paras_removed")

    # the four row-preserving map-only gates, folded into ONE projection
    # (round-3 formulation joined each back by doc_id — identical values,
    # four more exchanges and four more scans of the text column)
    q = gopher_quality_cols(min_words=min_words)
    p = pii_scrub_cols()
    base_cols = [
        F.col("doc_id"),
        # null/too-short text must fail quality, never give keep=NULL
        F.coalesce(q["keep"], F.lit(False)).alias("quality_keep"),
        p["scrubbed_text"].alias("_scrubbed_text"),
        (p["n_emails"] + p["n_ips"] + p["n_phones"]).alias("_n_pii"),
    ]
    if block_domains:
        if "url" not in docs.columns:
            raise EngineError(
                "block_domains needs a 'url' column on the input",
                suggestion="add a url column or drop block_domains",
            )
        rules = sorted(set(d.lower() for d in block_domains))
        base_cols.append(
            domain_match_col(rules).isNull().alias("domain_keep")
        )
    else:
        base_cols.append(F.lit(True).alias("domain_keep"))
    if mix_rates:
        if "lang" not in docs.columns:
            raise EngineError(
                "mix_rates needs a 'lang' column on the input",
                suggestion="add a lang column (e.g. via lang_id) or drop "
                "mix_rates",
            )
        _, mix_keep = mix_sample_cols(mix_rates, salt=mix_salt)
        base_cols.append(
            F.coalesce(mix_keep, F.lit(True)).alias("_mix_keep")
        )
    else:
        base_cols.append(F.lit(True).alias("_mix_keep"))

    repetition = repetition_stats(docs).select(
        "doc_id", F.col("keep").alias("repetition_keep")
    )
    if dedup_index is not None:
        # incremental snapshot semantics: prior-corpus membership counts
        # as duplication alongside within-batch first-wins
        from ..operators.dedup import incremental_dedup

        dup = incremental_dedup(docs, dedup_index).select(
            "doc_id", "is_duplicate"
        )
    else:
        dup = exact_duplicates(docs).select("doc_id", "is_duplicate")
    span_keep = None
    if max_dup_span_frac is not None:
        from ..operators.dedup import duplicate_span_stats

        span_keep = duplicate_span_stats(
            docs, span_words=span_words, stride=span_stride
        ).select(
            "doc_id",
            (F.col("dup_token_frac") <= max_dup_span_frac).alias("span_keep"),
        )
    perplexity_keep = None
    if drop_perplexity_tail:
        from ..operators.text_analysis import (
            lm_perplexity,
            perplexity_cutoffs,
        )

        by_lang = "lang" in docs.columns
        scored = lm_perplexity(docs, by_lang=by_lang)
        cuts = perplexity_cutoffs(scored, by_lang=by_lang)
        # cutoffs are strata-sized (one row per language) — broadcast;
        # keep head+middle = perplexity <= tail_cutoff (the CCNet rule)
        if by_lang:
            joined = scored.alias("s").join(
                F.broadcast(cuts.alias("c")),
                F.col("s.lang").eqNullSafe(F.col("c.lang")),
            )
        else:
            joined = scored.crossJoin(F.broadcast(cuts))
        perplexity_keep = joined.select(
            "doc_id",
            (F.col("perplexity") <= F.col("tail_cutoff")).alias(
                "perplexity_keep"
            ),
        )
    flags = (
        docs.select(*base_cols)
        .join(repetition, "doc_id", "left")
        .withColumn(
            # docs too short for any 5-gram have nothing to repeat
            "repetition_keep", F.coalesce("repetition_keep", F.lit(True))
        )
        .join(dup, "doc_id", "left")
        # exact_duplicates now fingerprints null text as empty, but the
        # coalesce stays as belt-and-braces: a doc missing from the dup
        # output must count as non-duplicate, never as keep=NULL
        # (silently excluded from both kept and dropped funnel counts)
        .withColumn("is_duplicate", F.coalesce("is_duplicate", F.lit(False)))
    )
    if span_keep is not None:
        flags = flags.join(span_keep, "doc_id", "left").withColumn(
            "span_keep", F.coalesce("span_keep", F.lit(True))
        )
    else:
        flags = flags.withColumn("span_keep", F.lit(True))
    if perplexity_keep is not None:
        # docs lm_perplexity omits (zero alphanumeric tokens) cannot be
        # scored — they pass this gate and fail the quality gate instead
        flags = flags.join(perplexity_keep, "doc_id", "left").withColumn(
            "perplexity_keep", F.coalesce("perplexity_keep", F.lit(True))
        )
    else:
        flags = flags.withColumn("perplexity_keep", F.lit(True))
    if quality_model is not None:
        from ..operators.text_analysis import linear_quality

        clf = linear_quality(docs, quality_model, bias=model_bias).select(
            "doc_id",
            (F.col("score") >= model_threshold).alias("classifier_keep"),
        )
        # linear_quality scores EVERY doc (zero-token docs score
        # sigmoid(bias)); the coalesce is belt-and-braces like the others
        flags = flags.join(clf, "doc_id", "left").withColumn(
            "classifier_keep", F.coalesce("classifier_keep", F.lit(True))
        )
    else:
        flags = flags.withColumn("classifier_keep", F.lit(True))
    if eval_docs is not None:
        cont = decontaminate(docs, eval_docs, n=decontaminate_ngram).select(
            "doc_id", "is_contaminated"
        )
        flags = flags.join(cont, "doc_id", "left").withColumn(
            "is_contaminated", F.coalesce("is_contaminated", F.lit(False))
        )
    else:
        flags = flags.withColumn("is_contaminated", F.lit(False))
    keep = (
        F.col("domain_keep")
        & F.col("span_keep")
        & F.col("quality_keep")
        & F.col("repetition_keep")
        & F.col("perplexity_keep")
        & F.col("classifier_keep")
        & ~F.col("is_duplicate")
        & ~F.col("is_contaminated")
        & F.col("_mix_keep")
    )
    return flags.select(
        "doc_id", keep.alias("keep"), "domain_keep", "span_keep",
        "quality_keep", "repetition_keep", "perplexity_keep",
        "classifier_keep", "is_duplicate", "is_contaminated",
        F.col("_scrubbed_text").alias("text"),
        F.col("_n_pii").alias("n_pii_redactions"),
    )
