"""Materialized IVF index: partition-pruned ANN probing (the 100 TB
layout made real — cell id as a hive partition column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sierradb_spark.operators  # noqa: F401 — break the functions<->operators import cycle
from sierradb_spark.functions.similarity import build_ivf_index, probe_ivf
from sierradb_spark.registry import load
from sierradb_spark.plans import plan_features


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(load(spark, sf_dir, "embeddings"), path)
    return path


def _query_vec(spark, sf_dir):
    [row] = (
        load(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).collect()
    )
    return [float(x) for x in row["embedding"]]


def test_probe_scans_only_probed_partitions(spark, sf_dir, index):
    qv = _query_vec(spark, sf_dir)
    df = probe_ivf(spark, index, qv, k=10, nprobe=1)
    f = plan_features(df)
    # The cell filter must reach the scan as a PARTITION filter (pruned
    # directories), not a post-scan predicate.
    assert "PartitionFilters" in f["plan"] and "cell_id" in f["plan"]
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", f["plan"])
    assert m and "cell_id" in m.group(1), f["plan"][:1500]
    assert f["top_k"] >= 1  # exact rerank is TakeOrderedAndProject


def test_full_probe_equals_brute_force(spark, sf_dir, index):
    """nprobe == n_cells degrades to the exact answer: the index layout
    loses nothing."""
    qv = _query_vec(spark, sf_dir)
    n_cells = spark.read.parquet(index + "/centroids").count()
    approx = probe_ivf(spark, index, qv, k=10, nprobe=n_cells)
    e = load(spark, sf_dir, "embeddings")
    qarr = F.array(*[F.lit(x) for x in qv])
    from sierradb_spark.functions.similarity import dot_col, norm_col

    v = F.col("embedding").cast("array<double>")
    qn = sum(x * x for x in qv) ** 0.5
    cos = F.round(dot_col(v, qarr) / F.nullif(norm_col(v) * F.lit(qn), F.lit(0.0)), 4)
    brute = (
        e.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    assert [tuple(r) for r in approx.collect()] == [tuple(r) for r in brute.collect()]


def test_probe1_results_come_from_one_cell(spark, sf_dir, index):
    qv = _query_vec(spark, sf_dir)
    got = probe_ivf(spark, index, qv, k=10, nprobe=1).collect()
    assert len(got) == 10
    vec_ids = [r["vec_id"] for r in got]
    cells = (
        spark.read.parquet(index + "/vectors")
        .where(F.col("vec_id").isin(vec_ids))
        .select("cell_id")
        .distinct()
        .collect()
    )
    assert len(cells) == 1  # every hit lives in the single probed cell


def test_index_is_complete_partitioning(spark, sf_dir, index):
    """Every vector is in exactly one cell — the index is a partition of
    the corpus, not a lossy sample."""
    vecs = spark.read.parquet(index + "/vectors")
    src = load(spark, sf_dir, "embeddings")
    assert vecs.count() == src.count()
    assert vecs.select("vec_id").distinct().count() == src.count()


# --- IVF-PQ: codes on disk, ADC probing -------------------------------------


@pytest.fixture(scope="module")
def pq_index(spark, sf_dir, tmp_path_factory):
    from sierradb_spark.functions.quantize import build_ivf_pq_index

    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    build_ivf_pq_index(load(spark, sf_dir, "embeddings"), path)
    return path


def test_ivf_pq_layout_complete(spark, sf_dir, pq_index):
    """Every vector keeps its row, gains an m-length code array, and the
    codebooks hold m x k centroids of the subspace width."""
    from sierradb_spark.functions.quantize import _PQ_K, _PQ_M, _PQ_SD

    vecs = spark.read.parquet(pq_index + "/vectors")
    n = load(spark, sf_dir, "embeddings").count()
    assert vecs.count() == n
    assert vecs.where(F.size("codes") != _PQ_M).count() == 0
    assert (
        vecs.where(
            (F.array_min("codes") < 0) | (F.array_max("codes") >= _PQ_K)
        ).count()
        == 0
    )
    books = spark.read.parquet(pq_index + "/codebooks")
    assert books.count() <= _PQ_M * _PQ_K
    assert books.where(F.size("cent") != _PQ_SD).count() == 0


def test_ivf_pq_adc_scan_prunes_cells_and_columns(spark, sf_dir, pq_index):
    """The ADC probe must (a) reach the scan as a PARTITION filter on
    cell_id, and (b) read ONLY ids + codes — the embedding column stays
    out of ReadSchema entirely (the memory-bandwidth win of PQ)."""
    import re

    from sierradb_spark.functions.quantize import probe_ivf_pq

    qv = _query_vec(spark, sf_dir)
    df = probe_ivf_pq(spark, pq_index, qv, k=10, nprobe=1)
    f = plan_features(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", f["plan"])
    assert m and "cell_id" in m.group(1), f["plan"][:1500]
    rs = re.search(r"ReadSchema: ([^\n]*)", f["plan"])
    assert rs and "codes" in rs.group(1), f["plan"][:1500]
    assert "embedding" not in rs.group(1), rs.group(1)
    assert f["top_k"] >= 1


def test_ivf_pq_adc_equals_reconstruction_form(spark, sf_dir, pq_index):
    """The on-disk codes + driver LUT must reproduce the registry
    audit's ADC exactly: sum_j ||q_j - cent(j, code_j)||^2 over the
    stored codes IS the reconstruction distance ||q - recon||^2 the
    pq_adc_recall query computes (the LUT is that computation factored
    per subspace), so a full probe's top-10 must match the
    reconstruction-path top-10 vec-for-vec. (How well either tracks
    EXACT neighbors is the registry audit's reported overlap_at_10 —
    deliberately small on this unclusterable synthetic corpus — not an
    index property.)"""
    from sierradb_spark.functions.quantize import (
        _pq_reconstruction,
        probe_ivf_pq,
    )
    from sierradb_spark.functions.similarity import dot_col, _dvec

    qv = _query_vec(spark, sf_dir)
    n_cells = spark.read.parquet(pq_index + "/centroids").count()
    got = [
        r["vec_id"]
        for r in probe_ivf_pq(
            spark, pq_index, qv, k=10, nprobe=n_cells
        ).collect()
    ]
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _dvec("embedding").alias("emb"))
    recon = _pq_reconstruction(v)
    qarr = F.array(*[F.lit(float(x)) for x in qv])
    ad = (
        dot_col(qarr, qarr)
        - 2 * dot_col(qarr, F.col("rv"))
        + dot_col(F.col("rv"), F.col("rv"))
    )
    want = [
        r["vec_id"]
        for r in recon.select("vec_id", F.round(ad, 6).alias("ad"))
        .orderBy(F.col("ad").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    assert got == want, (got, want)


def test_incremental_add_routes_like_build_and_loses_nothing(
    spark, sf_dir, tmp_path
):
    """add_to_ivf_index with frozen centroids: (a) every added vector
    lands in the cell the build's own argmax would choose, (b) a full
    probe over the grown index equals brute force over the union — the
    incremental path loses nothing."""
    from sierradb_spark.functions.similarity import (
        add_to_ivf_index,
        assign_cells,
        dot_col,
        norm_col,
    )

    e = load(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 5 != 0)
    extra = e.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "index")
    build_ivf_index(base, path)

    n_added = add_to_ivf_index(extra, path)
    assert n_added == extra.count()

    vecs = spark.read.parquet(path + "/vectors")
    assert vecs.count() == e.count()  # nothing lost, nothing duplicated
    assert vecs.select("vec_id").distinct().count() == e.count()

    # (a) assignment parity: re-deriving the added vectors' cells with
    # the shared expression over the frozen centroid table matches what
    # was written.
    cent_rows = [
        (int(r["cell_id"]), list(r["centroid"]))
        for r in sorted(
            spark.read.parquet(path + "/centroids").collect(),
            key=lambda r: r["cell_id"],
        )
    ]
    want = {
        r["vec_id"]: r["cell_id"]
        for r in assign_cells(extra, cent_rows).collect()
    }
    got = {
        r["vec_id"]: r["cell_id"]
        for r in vecs.join(
            extra.select("vec_id"), "vec_id"
        ).select("vec_id", "cell_id").collect()
    }
    assert got == want

    # (b) full probe == brute force over base ∪ extra.
    qv = _query_vec(spark, sf_dir)
    n_cells = len(cent_rows)
    approx = probe_ivf(spark, path, qv, k=10, nprobe=n_cells)
    v = F.col("embedding").cast("array<double>")
    qarr = F.array(*[F.lit(x) for x in qv])
    qn = sum(x * x for x in qv) ** 0.5
    cos = F.round(
        dot_col(v, qarr) / F.nullif(norm_col(v) * F.lit(qn), F.lit(0.0)), 4
    )
    brute = (
        e.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    assert [tuple(r) for r in approx.collect()] == [
        tuple(r) for r in brute.collect()
    ]


def test_gemm_topk_drops_zero_norm_vectors(spark, sf_dir, tmp_path):
    """A zero-norm vector scores NaN, and Spark's global orderBy ranks
    NaN ABOVE every double — without the generator-side drop, a NaN row
    surviving a small Arrow batch (<10 finite rows here) would outrank
    every real match. With it, the result is exactly the finite-only
    brute-force answer."""
    import math
    import os

    from sierradb_spark.functions.similarity import gemm_topk_cosine

    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 8)
    dims = len(e.head()["embedding"])
    zero = spark.createDataFrame(
        [(10_000_000, 0, [0.0] * dims)],
        "vec_id long, label int, embedding array<float>",
    )
    sf2 = str(tmp_path / "sf_zero")
    os.makedirs(sf2, exist_ok=True)
    e.unionByName(zero, allowMissingColumns=True).write.mode(
        "overwrite"
    ).parquet(f"{sf2}/embeddings.parquet")

    got = [tuple(r) for r in gemm_topk_cosine(spark, sf2).collect()]

    rows = e.collect()
    [q] = [r for r in rows if r["vec_id"] == 0]
    qv = [float(x) for x in q["embedding"]]
    qn = math.sqrt(sum(x * x for x in qv))

    def cos(emb):
        d = sum(a * b for a, b in zip(emb, qv))
        c = d / (math.sqrt(sum(a * a for a in emb)) * qn)
        return math.copysign(math.floor(abs(c) * 1e4 + 0.5) / 1e4, c)

    want = sorted(
        (
            (r["vec_id"], r["label"], cos([float(x) for x in r["embedding"]]))
            for r in rows
            if r["vec_id"] != 0
        ),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert got == want  # zero vector gone, no NaN anywhere
    assert all(not math.isnan(c) for _, _, c in got)
