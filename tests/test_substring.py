"""Semantic invariants of the exact-substring span dedup.

The oracle hash-match proves Spark and DuckDB agree; these tests pin
properties a bug SHARED by both implementations would break:

- spans are disjoint and the scrub cuts exactly their union, so for
  every doc kept_tokens + dup_tokens == total_tokens;
- the injected boilerplate is actually detected (every enriched doc
  carries at least one span covering at least the template length);
- a span never extends past its document.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sierradb_spark.operators import REGISTRY


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    stats = (
        REGISTRY.queries["repeated_span_stats"].spark(spark, sf_dir).cache()
    )
    scrub = (
        REGISTRY.queries["substring_scrubbed_corpus"]
        .spark(spark, sf_dir)
        .cache()
    )
    yield stats, scrub
    stats.unpersist()
    scrub.unpersist()


def test_kept_plus_dup_equals_total(frames):
    stats, scrub = frames
    joined = stats.join(scrub, "doc_id", "left").select(
        "doc_id",
        "total_tokens",
        "dup_tokens",
        # a doc scrubbed to nothing drops from the survivor corpus
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
    )
    bad = joined.where(
        F.col("kept_tokens") + F.col("dup_tokens") != F.col("total_tokens")
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_boilerplate_docs_have_spans(frames):
    stats, _ = frames
    from sierradb_spark.functions.substring import SPAN_WORDS, _TPL_A

    tagged = stats.where(F.col("doc_id") % 4 == 0)
    n_tagged = tagged.count()
    assert n_tagged > 0
    # every template-carrying doc has at least one span at least as long
    # as the injected disclaimer
    tpl_len = len(_TPL_A.split())
    assert tpl_len >= SPAN_WORDS
    ok = tagged.where(
        (F.col("n_spans") >= 1) & (F.col("dup_tokens") >= tpl_len)
    ).count()
    assert ok == n_tagged


def test_spans_stay_inside_documents(frames):
    stats, _ = frames
    bad = stats.where(
        (F.col("dup_tokens") > F.col("total_tokens"))
        | (F.col("dup_tokens") < 0)
        | ((F.col("n_spans") == 0) & (F.col("dup_tokens") != 0))
    )
    assert bad.count() == 0, bad.limit(5).collect()
