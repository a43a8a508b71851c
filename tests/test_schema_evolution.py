"""Parquet schema evolution: additive columns across file generations.

A 100 TB table is never rewritten to add a column; new files simply
carry the new field. These tests pin the two behaviors a long-lived
events/documents table depends on: `mergeSchema` unifies generations
(old rows read NULL for new columns), and a PINNED read schema keeps
old readers working untouched as new-generation files land — the
additive-evolution contract the event store's fixed read schemas
(eventstore/store.py, streaming read schemas) rely on.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _write(dirpath: str, name: str, cols: dict) -> None:
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(pa.table(cols), os.path.join(dirpath, name))


def _two_generations(tmp_path) -> str:
    src = str(tmp_path / "evolving")
    _write(src, "gen1.parquet", {"id": [1, 2], "value": [10.0, 20.0]})
    _write(
        src,
        "gen2.parquet",
        {"id": [3, 4], "value": [30.0, 40.0], "tag": ["a", "b"]},
    )
    return src


def test_merge_schema_unifies_generations(spark, tmp_path):
    src = _two_generations(tmp_path)
    df = spark.read.option("mergeSchema", "true").parquet(src)
    assert set(df.columns) == {"id", "value", "tag"}
    rows = {r["id"]: (r["value"], r["tag"]) for r in df.collect()}
    assert rows[1] == (10.0, None)  # old generation: new column is NULL
    assert rows[3] == (30.0, "a")


def test_pinned_schema_reads_across_generations(spark, tmp_path):
    """An old reader with a pinned 2-column schema keeps working as
    new-generation files land, and a pinned 3-column schema backfills
    NULLs from old files — no rewrite either way."""
    src = _two_generations(tmp_path)
    old_reader = spark.read.schema("id long, value double").parquet(src)
    assert set(old_reader.columns) == {"id", "value"}
    assert old_reader.count() == 4

    new_reader = spark.read.schema("id long, value double, tag string").parquet(src)
    n_null = new_reader.where(F.col("tag").isNull()).count()
    assert n_null == 2


def test_aggregates_span_generations(spark, tmp_path):
    src = _two_generations(tmp_path)
    df = spark.read.option("mergeSchema", "true").parquet(src)
    agg = df.agg(
        F.sum("value").alias("s"), F.count("tag").alias("tagged")
    ).collect()[0]
    assert agg["s"] == 100.0
    assert agg["tagged"] == 2  # count() skips the old generation's NULLs
