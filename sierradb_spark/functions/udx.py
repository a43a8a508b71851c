"""User-defined function surface: pandas UDAF + Python UDTF, value-checked.

SURVEY §2.7: the reference has no UDF surface at all; a Spark engine's
extension points are (a) scalar pandas UDFs (Arrow-vectorized — used by
the multimodal codec stages), (b) grouped-agg pandas UDFs (custom
aggregates with numpy bodies), and (c) Python UDTFs (one-to-many table
functions). This module demonstrates (b) and (c) with closed-form
semantics a SQL oracle can recompute, so even the Python-boundary
operators are value-hash-checked.

Scale notes: a grouped-agg pandas UDF receives each group as one Arrow
batch — fine for bounded groups (here: per event_type series), wrong
for unbounded ones (use built-in partial aggregates there). The UDTF
fans out rows 1->N executor-side with no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


def _geo_mean_udf():
    """Grouped-agg pandas UDF, built lazily: the decorator parses its DDL
    return type through the active session, so it cannot run at import."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _geo_mean(v: pd.Series) -> float:
        import numpy as np

        a = np.log(v.to_numpy(dtype="float64"))
        return float(np.exp(a.mean()))

    return _geo_mean


@REG.add(
    "udaf_geomean_value",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(exp(avg(ln(value + 1.0))), 4) AS geo_mean_value
        FROM events
        GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (the UDAF extension point): per-type "
    "geometric mean of value+1, computed in numpy log-space per Arrow group "
    "batch. The oracle recomputes the closed form exp(avg(ln(x))) in SQL, so "
    "the Python aggregate is value-checked. Rounded to 4dp: both engines "
    "average the same log set, differing only in summation order.",
)
def udaf_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    geo_mean = _geo_mean_udf()
    # A grouped-agg pandas UDF cannot share an agg with built-in
    # aggregates; the count comes from a separate built-in aggregation
    # joined on the (tiny) group key set.
    v1 = ev.withColumn("v1", F.col("value") + 1.0)
    gm = v1.groupBy("event_type").agg(
        F.round(geo_mean("v1"), 4).alias("geo_mean_value")
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return counts.join(gm, "event_type").select(
        "event_type", "n_events", "geo_mean_value"
    )


@REG.add(
    "udtf_sentence_split",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   list_filter(string_split(text, '. '),
                               x -> trim(x) <> '') AS parts
            FROM documents WHERE doc_id < 50
        ),
        z AS (
            SELECT doc_id,
                   unnest(list_zip(parts, generate_series(0, len(parts) - 1)))
                       AS pair
            FROM p
        )
        SELECT doc_id, CAST(pair[2] AS INT) AS sent_no,
               CAST(length(pair[1]) AS BIGINT) AS sent_len
        FROM z
    """,
    doc="Python UDTF (table function): one document row -> N sentence rows, "
    "the lateral-view extension point. Emits (doc_id, sent_no, sent_len); "
    "lengths (not raw sentences) keep the oracle's split semantics exactly "
    "comparable. The fan-out happens executor-side per input partition.",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_no int, sent_len bigint")
    class SentenceSplit:
        def eval(self, doc_id, text):  # noqa: ANN001
            n = 0
            for part in str(text).split(". "):
                if part.strip():
                    yield int(doc_id), n, len(part)
                    n += 1

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT s.doc_id, s.sent_no, s.sent_len "
        "FROM udtf_docs_in, LATERAL sentence_split(doc_id, text) s"
    )
