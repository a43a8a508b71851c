"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidates from hyperplane sign buckets, so
the full scan is replaced by a bucket join). All arithmetic is done in
DOUBLE on both engines (embeddings are float32 on disk; casting before
the dot product makes Spark and DuckDB agree to ~1e-14 relative, which
survives rounding to 4-6 decimals).

The dot product is `F.aggregate(F.zip_with(a, b, *), ...)` — pure
JVM-side higher-order functions, no Python in the loop. For very wide
vectors a Pandas UDF over numpy would win on constant factors; at 64
dims the built-in path is faster than the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load, spread

REG = Registry()


def dot_col(a: Column, b: Column) -> Column:
    # Kept as the zip_with/aggregate fold DELIBERATELY (r11 measured):
    # unrolling the 64-term dot into a flat element_at multiply-add
    # chain — nominally "codegen-friendly" — ran ~5x SLOWER on the
    # banded near-dup candidate filter (10.5 s vs 2.0 s warm at sf0.1,
    # single- and double-evaluation variants alike); Spark 4.1 executes
    # the array fold as a tight specialized loop, while the 129-node
    # expression tree loses to per-node overhead. An Arrow/numpy einsum
    # over broadcast vectors measured ~equal to the fold (1.15 vs
    # 1.9 s) — not worth a Python-boundary node. Details in
    # OPTIMIZATION_r11.md.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


# --- SQL-text builders for literal-heavy expressions (r11) -------------
# Column construction crosses py4j once per node, so expressions that
# embed collected vectors (k centroids x 64 dims, built per round) cost
# ~1 ms per literal to BUILD — multiple seconds per query before any
# data moves. Building the same expression as ONE SQL string (Python
# string work is free; F.expr is a single py4j call + JVM parse) is
# ~20x cheaper and bit-exact: repr(float) is the shortest round-trip
# decimal and a D-suffixed SQL literal parses via correctly-rounded
# Double.parseDouble back to the identical bits (verified for
# subnormals, -0.0 and exponents in tests), while sql_dot compiles to
# the IDENTICAL Catalyst aggregate/zip_with fold dot_col builds.


def sql_dlit(x: float) -> str:
    """One double literal, bit-exact round trip. Finite values only —
    centroid/query vectors are; NaN/Inf would need special forms."""
    import math

    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"sql_dlit requires a finite double, got {x!r}")
    return f"{x!r}D"


def sql_arr(vals) -> str:
    return "array(" + ",".join(sql_dlit(x) for x in vals) + ")"


def sql_dot(a: str, b: str) -> str:
    """SQL text of dot_col(a, b) — same zip_with/aggregate fold, same
    left-associated accumulation, same doubles."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / F.nullif(norm_col(a) * norm_col(b), F.lit(0.0))


def _dvec(col: str) -> Column:
    return F.col(col).cast("array<double>")


# DuckDB-side double-precision cosine pieces.
def _sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def _sql_cos(a: str, b: str) -> str:
    return (
        f"({_sql_dot(a, b)} / nullif(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}), 0))"
    )


@REG.add(
    "embedding_norms",
    oracle="""
        SELECT vec_id, label,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
               CAST(len(embedding) AS BIGINT) AS dim
        FROM embeddings
    """,
    doc="Per-vector L2 norms — the normalization pass every ANN index build needs. "
    "Embarrassingly parallel, no shuffle.",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = _dvec("embedding")
    return e.select(
        "vec_id",
        "label",
        F.round(norm_col(v), 6).alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


@REG.add(
    "similarity_topk_cosine",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    headline=True,
    doc="Brute-force cosine top-k against a query vector (vec_id 0) — the exact "
    "baseline ANN answers are judged against. The query vector is a broadcast "
    "(1-row cross join); top-k is TakeOrderedAndProject, so no global sort. "
    "Ordering is on the ROUNDED score with vec_id tiebreak → engine-stable.",
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    cos = F.round(
        cosine_col(_dvec("embedding"), F.col("qv")), 4
    ).alias("cosine")
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@REG.add(
    "knn_label_recall",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(count(*) FILTER (WHERE {_sql_cos('e.embedding', 'q.qv')} >= 0.5)
                    AS BIGINT) AS n_close,
               round(avg({_sql_cos('e.embedding', 'q.qv')}), 4) AS avg_cosine
        FROM embeddings e, q
        GROUP BY e.label
    """,
    doc="Threshold kNN per label: how many vectors of each label fall within a "
    "cosine ball of the query — the recall diagnostic for partitioned ANN.",
)
def knn_label_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    cos = cosine_col(_dvec("embedding"), F.col("qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count(F.when(cos >= 0.5, 1)).alias("n_close"),
            F.round(F.avg(cos), 4).alias("avg_cosine"),
        )
    )


@REG.add(
    "label_centroid_summary",
    oracle="""
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_e1,
               round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS avg_e2,
               round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS avg_e3,
               round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS avg_e4
        FROM embeddings GROUP BY label
    """,
    doc="Per-label centroid components (first 4 dims) — the centroid build step of "
    "IVF-style partitioned ANN: one partial-aggregated pass, shuffle carries "
    "|labels| rows.",
)
def label_centroid_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    comp = lambda i: F.round(  # noqa: E731
        F.avg(F.element_at("embedding", i).cast("double")), 6
    ).alias(f"avg_e{i}")
    return e.groupBy("label").agg(
        F.count("*").alias("n_vectors"), comp(1), comp(2), comp(3), comp(4)
    )


@REG.add(
    "ivf_probe1_topk",
    oracle=f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        comp AS (
            SELECT e.label, t.i, avg(e.embedding[t.i]::DOUBLE) AS c
            FROM embeddings e, range(1, 65) t(i)
            GROUP BY e.label, t.i
        ),
        cent AS (
            SELECT label, list(c ORDER BY i) AS cv FROM comp GROUP BY label
        ),
        best AS (
            SELECT cent.label
            FROM cent, q
            ORDER BY list_dot_product(cent.cv, q.qv)
                     / nullif(sqrt(list_dot_product(cent.cv, cent.cv))
                              * sqrt(list_dot_product(q.qv, q.qv)), 0) DESC,
                     cent.label ASC
            LIMIT 1
        )
        SELECT e.vec_id, e.label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e, q, best
        WHERE e.label = best.label AND e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    doc="IVF-style ANN, nprobe=1: build per-cell centroids (cells = labels here; "
    "k-means assignments in production), route the query to its nearest centroid, "
    "exact-rerank only that cell — the scan touches ~1/|cells| of the data. At "
    "100 TB the cell id is a partition column, so probing is partition pruning; "
    "recall is tuned by probing more cells. Centroid build is one partial-agg "
    "pass (shuffle carries |cells|x|dims| rows, never vectors).",
)
def ivf_probe1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, nprobe=1)


def ivf_route(e: DataFrame, q: DataFrame, nprobe: int) -> DataFrame:
    """The IVF coarse router: build per-cell centroids (cells = labels
    here; one posexplode -> per-(label, dim) partial-agg pass) and
    return the ``nprobe`` cell labels nearest the broadcast query
    vector by cosine (deterministic label tie-break). The ONE routing
    construction — shared by the inline IVF top-k queries and the
    IVF-PQ composite (functions/quantize.py), so a tie-break or guard
    fix cannot diverge their probe sets."""
    comp = (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", "pos")
        .agg(F.avg("col").alias("c"))
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    return (
        cent.crossJoin(F.broadcast(q))
        .select("label", cosine_col(F.col("cv"), F.col("qv")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), F.col("label").asc())
        .limit(nprobe)
        .select("label")
    )


def _ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """IVF top-10 probing the query's ``nprobe`` nearest cells."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    best = ivf_route(e, q, nprobe)
    cos = F.round(cosine_col(_dvec("embedding"), F.col("qv")), 4).alias("cosine")
    return (
        e.join(F.broadcast(best), "label")  # probe: only routed cells are scanned
        .where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# --- materialized IVF index (the 100 TB layout, made real) ------------------


def build_ivf_index(
    embeddings: DataFrame, path: str, n_seed_dims: int = 4
) -> None:
    """Materialize an IVF index: vectors hive-partitioned by ``cell_id``.

    Cell assignment is deterministic two-phase "k-means lite": seed cells
    from the 2^n_seed_dims hyperplane sign buckets, compute each seed
    cell's centroid (one partial-agg pass), then assign every vector to
    its NEAREST centroid by cosine (one map-side pass against the
    broadcast centroid table — no shuffle of vectors beyond the
    partitioned write). The index directory is::

        path/vectors/cell_id=N/*.parquet   (the partition column IS the cell)
        path/centroids.parquet             (cell_id -> centroid vector)

    Probing (:func:`probe_ivf`) then reads only the probed cells'
    directories — ANN recall/cost turns into plain partition pruning,
    which is the point of the layout at 100 TB.
    """
    import os

    spark = embeddings.sparkSession
    assigned, cent_rows = _ivf_assignments(embeddings, n_seed_dims)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        os.path.join(path, "vectors")
    )
    spark.createDataFrame(
        cent_rows, "cell_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def _ivf_assignments(
    embeddings: DataFrame, n_seed_dims: int = 4
) -> "tuple[DataFrame, list]":
    """Cell assignment for the materialized indexes: returns the
    embeddings frame with its ``cell_id`` column (unwritten — callers
    attach further columns, e.g. PQ codes, and write ONCE) plus the
    dense centroid rows. Shared by :func:`build_ivf_index` and
    :func:`~sierradb_spark.functions.quantize.build_ivf_pq_index`."""
    v = F.col("embedding").cast("array<double>")

    def seed_bucket(col: Column) -> Column:
        b = F.lit(0)
        for i in range(n_seed_dims):
            b = b + F.when(
                F.element_at(col, i + 1) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        return b

    seeded = embeddings.select("vec_id", "label", "embedding", seed_bucket(v).alias("seed"))
    comp = (
        seeded.select("seed", F.posexplode(v))
        .groupBy("seed", "pos")
        .agg(F.avg("col").alias("c"))
    )
    cent = comp.groupBy("seed").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    # Re-number cells densely 0..k-1 in seed order (empty seeds vanish).
    cents = sorted(
        ((r["seed"], r["cv"]) for r in cent.collect()), key=lambda t: t[0]
    )
    cent_rows = [(i, list(cv)) for i, (_, cv) in enumerate(cents)]
    return assign_cells(embeddings, cent_rows), cent_rows


def assign_cells(embeddings: DataFrame, cent_rows: list) -> DataFrame:
    """Nearest-centroid assignment as one JVM expression over the
    (small) centroid literal array: argmax of cosine. ``cent_rows``
    must be dense ``(cell_id, centroid)`` pairs in cell_id order 0..k-1
    (the build layout) — the argmax's array position IS the cell id.
    The ONE assignment construction: the initial build and
    :func:`add_to_ivf_index` both route through it, so a vector added
    later lands in exactly the cell the original build would have
    chosen."""
    assert [c for c, _ in cent_rows] == list(range(len(cent_rows)))
    v_sql = "cast(embedding as array<double>)"

    def cos_to(cv: list) -> str:
        # A zero-norm vector has NULL cosine to every centroid; without
        # the coalesce its cell_id is NULL, it lands in the
        # __HIVE_DEFAULT_PARTITION__ directory, and probe_ivf (which
        # filters cell_id.isin(...)) can never return it. The -2.0
        # sentinel (< any real cosine) assigns such rows to cell 0
        # deterministically so every vector stays probeable.
        # SQL-text form (r11): the k x dim centroid literals cost ~1 ms
        # of py4j per node as Columns; sql_dot/sql_arr compile to the
        # identical Catalyst folds and literal bits via one F.expr.
        return (
            f"coalesce({sql_dot(v_sql, sql_arr(cv))}"
            f" / nullif(sqrt({sql_dot(v_sql, v_sql)})"
            f" * {sql_dlit(sum(x * x for x in cv) ** 0.5)}, 0.0D), -2.0D)"
        )

    # Argmax via array_max + array_position (first match → ties break to
    # the lowest cell id, deterministic). Building the argmax as a
    # when-chain instead would reference the running best twice per step
    # and double the expression tree per centroid — O(2^cells) blowup.
    cos_arr = F.expr(
        "array(" + ", ".join(cos_to(cv) for _, cv in cent_rows) + ")"
    )
    cell = (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
    return embeddings.select(
        "vec_id", "label", "embedding", cell.alias("cell_id")
    )


def add_to_ivf_index(new_vectors: DataFrame, path: str) -> int:
    """Incrementally add vectors to a materialized IVF index without a
    rebuild: centroids stay FROZEN (the production contract — rerouting
    existing vectors would mean rewriting the whole layout), each new
    vector is assigned to its nearest frozen centroid by the same
    argmax expression the build used, and the new rows are APPENDED to
    their cells' hive partitions. Probing needs no change: partition
    pruning reads old and new files of the probed cells alike.

    Returns the number of vectors added. Periodic full rebuilds remain
    the centroid-drift hygiene (same trade as every IVF store); until
    then, recall changes only through cell-balance drift, which
    ``ivf_cell_balance_audit`` measures.
    """
    import os

    spark = new_vectors.sparkSession
    cent_rows = [
        (int(r["cell_id"]), list(r["centroid"]))
        for r in sorted(
            spark.read.parquet(os.path.join(path, "centroids")).collect(),
            key=lambda r: r["cell_id"],
        )
    ]
    # Pin the assignment before the write: without it, the returned
    # count() would re-run the full assignment lineage (a second pass
    # over new_vectors + the centroid argmax), and a non-deterministic
    # source (fresh sample / stream batch) could make the returned
    # count differ from the rows actually written.
    assigned = assign_cells(new_vectors, cent_rows).localCheckpoint(eager=True)
    assigned.write.mode("append").partitionBy("cell_id").parquet(
        os.path.join(path, "vectors")
    )
    return assigned.count()


def route_probed_cells(cent_rows, query_vec: list, nprobe: int) -> list:
    """Driver-side IVF routing over a collected centroid table: the
    ``nprobe`` cell_ids nearest the query by cosine (deterministic
    cell_id tie-break). The ONE routing construction for materialized
    indexes — shared by :func:`probe_ivf` and
    :func:`~sierradb_spark.functions.quantize.probe_ivf_pq` (the
    inline-query twin is :func:`ivf_route`)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec))

    def cos(cv):
        d = sum(a * b for a, b in zip(cv, query_vec))
        n = math.sqrt(sum(a * a for a in cv)) * qn
        return d / n if n else 0.0

    return [
        int(r["cell_id"])
        for r in sorted(
            cent_rows, key=lambda r: (-cos(r["centroid"]), r["cell_id"])
        )[:nprobe]
    ]


def probe_ivf(
    spark: SparkSession, path: str, query_vec: list, k: int = 10, nprobe: int = 1
) -> DataFrame:
    """ANN top-k over a materialized IVF index (:func:`build_ivf_index`).

    Routing happens driver-side against the tiny centroid table; the
    vector scan reads ONLY the probed cells' hive partitions (partition
    pruning — assert via PartitionFilters in the physical plan), then
    exact-reranks with TakeOrderedAndProject. nprobe is the recall/cost
    knob: cells scanned / total cells.
    """
    import math
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids")).collect()
    qn = math.sqrt(sum(x * x for x in query_vec))
    probed = route_probed_cells(cents, query_vec, nprobe)
    vecs = spark.read.parquet(os.path.join(path, "vectors"))
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    cosc = dot_col(F.col("embedding").cast("array<double>"), qarr) / F.nullif(
        norm_col(F.col("embedding").cast("array<double>")) * F.lit(qn), F.lit(0.0)
    )
    return (
        vecs.where(F.col("cell_id").isin(probed))
        .select("vec_id", "label", F.round(cosc, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


@REG.add(
    "lsh_bucket_candidates",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        sketch AS (
            SELECT e.vec_id, e.label,
                   (CASE WHEN e.embedding[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN e.embedding[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN e.embedding[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN e.embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket,
                   {_sql_cos('e.embedding', 'q.qv')} AS cos
            FROM embeddings e, q
        ),
        qb AS (
            SELECT (CASE WHEN qv[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN qv[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN qv[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN qv[4] >= 0 THEN 1 ELSE 0 END) AS qbucket FROM q
        )
        SELECT s.vec_id, s.label, round(s.cos, 4) AS cosine
        FROM sketch s, qb
        WHERE s.bucket = qb.qbucket AND s.vec_id <> 0
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
    doc="LSH-bucketed ANN (sign-sketch on 4 dims = 16 hyperplane buckets): only the "
    "query's bucket is scanned. This is the scale path — at 100 TB the bucket id is "
    "a partition column and the scan prunes to ~1/16 of the data; recall is tuned by "
    "multi-probe over adjacent buckets.",
)
def lsh_bucket_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )

    def bucket_of(col: Column) -> Column:
        bit = lambda i, w: F.when(  # noqa: E731
            F.element_at(col, i) >= 0, F.lit(w)
        ).otherwise(F.lit(0))
        return bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1)

    sketch = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        bucket_of(F.col("embedding")).alias("bucket"),
        bucket_of(F.col("qv")).alias("qbucket"),
        cosine_col(_dvec("embedding"), F.col("qv")).alias("cos"),
    )
    return (
        sketch.where((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.round("cos", 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@REG.add(
    "ivf_probe2_topk",
    oracle=f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        comp AS (
            SELECT e.label, t.i, avg(e.embedding[t.i]::DOUBLE) AS c
            FROM embeddings e, range(1, 65) t(i)
            GROUP BY e.label, t.i
        ),
        cent AS (
            SELECT label, list(c ORDER BY i) AS cv FROM comp GROUP BY label
        ),
        best AS (
            SELECT cent.label
            FROM cent, q
            ORDER BY list_dot_product(cent.cv, q.qv)
                     / nullif(sqrt(list_dot_product(cent.cv, cent.cv))
                              * sqrt(list_dot_product(q.qv, q.qv)), 0) DESC,
                     cent.label ASC
            LIMIT 2
        )
        SELECT e.vec_id, e.label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e, q
        WHERE e.label IN (SELECT label FROM best) AND e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    doc="IVF ANN with nprobe=2: probe the query's TWO nearest cells — the "
    "recall/cost knob in action (2/|cells| of the data scanned instead of "
    "1/|cells|, strictly higher recall). Same centroid build; probing more "
    "cells only widens the broadcast semi join on the cell id.",
)
def ivf_probe2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, nprobe=2)


@REG.add(
    "hybrid_filtered_topk",
    oracle=f"""
        WITH q AS (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id, e.label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e, q
        WHERE e.label % 3 = 1 AND e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    doc="Hybrid structured+vector query (AnalyticDB-V's query-fusion shape, "
    "VLDB 2020): top-k cosine restricted by a structured predicate. The "
    "structured filter is pushed to the scan FIRST, then exact cosine ranks "
    "only survivors — right when the predicate is selective (here ~1/3). "
    "When the predicate passes most rows, route through the IVF probe "
    "instead and apply the filter inside probed cells; selectivity picks "
    "the plan, exactly the fusion planner's decision. Plan-asserted: "
    "predicate reaches PushedFilters, top-k is TakeOrderedAndProject.",
)
def hybrid_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    cos = F.round(cosine_col(_dvec("embedding"), F.col("qv")), 4).alias("cosine")
    return (
        e.where((F.col("label") % 3 == 1) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# IVF cell-balance audit
# ---------------------------------------------------------------------------

_BAL_SEED_DIMS = 4


@REG.add(
    "ivf_cell_balance_audit",
    oracle=f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        seeded AS (
            SELECT vec_id, emb,
                   {" + ".join(f"(CASE WHEN emb[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(_BAL_SEED_DIMS))}
                       AS seed
            FROM v
        ),
        dims AS (
            SELECT seed, unnest(emb) AS x,
                   unnest(generate_series(1, len(emb))) AS i
            FROM seeded
        ),
        comp AS (SELECT seed, i, round(avg(x), 9) AS c
                 FROM dims GROUP BY seed, i),
        cent AS (SELECT seed, list(c ORDER BY i) AS cv FROM comp GROUP BY seed),
        dense AS (
            SELECT seed, cv,
                   dense_rank() OVER (ORDER BY seed) - 1 AS cell_id
            FROM cent
        ),
        cos AS (
            SELECT s.vec_id, d.cell_id,
                   coalesce(round(
                       list_dot_product(s.emb, d.cv)
                       / nullif(sqrt(list_dot_product(s.emb, s.emb))
                                * sqrt(list_dot_product(d.cv, d.cv)), 0),
                       9), -2.0) AS c
            FROM seeded s, dense d
        ),
        best AS (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY c DESC, cell_id) AS rn
            FROM cos
        ),
        hist AS (SELECT cell_id, count(*) AS n FROM best WHERE rn = 1
                 GROUP BY cell_id)
        SELECT CAST(cell_id AS INT) AS cell_id,
               CAST(n AS BIGINT) AS n_vectors,
               round(n / (SELECT sum(n) FROM hist), 6) AS share,
               round(n / (SELECT avg(n) FROM hist), 4) AS load_ratio
        FROM hist
    """,
    doc="IVF cell-balance audit: vectors per cell under the materialized "
    "index's assignment recipe (sign-seeded cells, one averaging round, "
    "nearest-centroid by cosine), with each cell's corpus share and its "
    "load relative to the mean cell. Probe latency at 100 TB is gated "
    "by the HOTTEST probed cell, so this histogram is the go/no-go for "
    "an index layout — a load_ratio far above 1 says re-seed or split "
    "before shipping. Audit determinism: centroid components and "
    "cosines are rounded to 9 decimals on BOTH engines before the "
    "argmax (the k-means convention), ties break to the lowest cell. "
    "Scale shape: centroids are an O(k) driver literal; assignment is "
    "a broadcast map; only (cell_id, count) rows aggregate.",
)
def ivf_cell_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    seed = F.lit(0)
    for i in range(_BAL_SEED_DIMS):
        seed = seed + F.when(
            F.element_at(v, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    # spread: both consumers (the per-dim posexplode and the k-cosine
    # assignment scan) do their per-row array math upstream of any
    # exchange (see registry.spread)
    seeded = spread(e, "vec_id").select(
        "vec_id", v.alias("emb"), seed.alias("seed")
    )
    comp = (
        seeded.select("seed", F.posexplode("emb"))
        .groupBy("seed", "pos")
        .agg(F.round(F.avg("col"), 9).alias("c"))
    )
    cent = comp.groupBy("seed").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    cents = sorted(
        ((r["seed"], list(r["cv"])) for r in cent.collect()), key=lambda t: t[0]
    )

    def cos_to(cv: list) -> str:
        # SQL-text form (r11): identical folds/literals to the Column
        # construction it replaces, one F.expr instead of ~75 py4j
        # round-trips per centroid (see sql_dlit).
        return (
            f"coalesce(round({sql_dot('emb', sql_arr(cv))}"
            f" / nullif(sqrt({sql_dot('emb', 'emb')})"
            f" * {sql_dlit(sum(x * x for x in cv) ** 0.5)}, 0.0D), 9),"
            " -2.0D)"
        )

    arr = F.expr("array(" + ", ".join(cos_to(cv) for _, cv in cents) + ")")
    assigned = seeded.select(
        (F.array_position(arr, F.array_max(arr)) - 1)
        .cast("int")
        .alias("cell_id")
    )
    hist = assigned.groupBy("cell_id").agg(F.count("*").alias("n"))
    tot = hist.agg(
        F.sum("n").cast("double").alias("total"),
        F.avg("n").alias("mean_n"),
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "cell_id",
        F.col("n").alias("n_vectors"),
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        F.round(F.col("n") / F.col("mean_n"), 4).alias("load_ratio"),
    )


@REG.add(
    "gemm_topk_cosine",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    doc="Brute-force cosine top-k via Arrow-batched numpy GEMM "
    "(mapInPandas): each executor batch is stacked into a float64 "
    "matrix and scored with one BLAS matrix-vector product, keeping "
    "only its local top-10 (ordered by the ROUNDED score + vec_id, the "
    "same key the global TakeOrderedAndProject uses — so no boundary "
    "row can be lost). Semantically identical to similarity_topk_cosine "
    "(same oracle); operationally the wide-vector scale path: at 64 "
    "dims the JVM higher-order-function fold wins on Arrow overhead, "
    "but at 1024+ dims the BLAS batch dominates — keeping both lets "
    "bench.py measure the crossover instead of guessing. The query "
    "vector ships as a closure constant (one driver-side row), NOT a "
    "join.",
)
def gemm_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    qrow = (
        e.where(F.col("vec_id") == 0).select("embedding").head()
    )
    q = np.asarray(qrow[0], dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1)) * qn
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(norms == 0, np.nan, (m @ q) / norms)
            # Half-away-from-zero, matching Spark/DuckDB round();
            # np.round is half-even and would diverge at exact ties.
            cos = np.sign(cos) * np.floor(np.abs(cos) * 1e4 + 0.5) / 1e4
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "cosine": cos,
                }
            )
            # Zero-norm vectors score NaN. pandas sorts NaN last, but
            # Spark's global orderBy treats NaN as GREATER than any
            # double — a NaN row surviving a small batch (<10 finite
            # rows) would outrank every real match in the final top-10.
            # Drop them here, matching assign_cells' zero-norm handling.
            out = out[np.isfinite(out["cosine"])]
            yield out.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(10)

    scored = e.where(F.col("vec_id") != 0).mapInPandas(
        score, "vec_id long, label int, cosine double"
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    ).limit(10)


@REG.add(
    "embedding_label_margin",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS emb
            FROM embeddings
        ),
        u AS (
            SELECT vec_id, label, unnest(range(len(emb))) AS i,
                   unnest(emb) AS x
            FROM v
        ),
        cent AS (
            SELECT label, i, round(avg(x), 9) AS mu
            FROM u GROUP BY label, i
        ),
        cv AS (
            SELECT label AS clabel, list(mu ORDER BY i) AS cvec
            FROM cent GROUP BY label
        ),
        scored AS (
            SELECT v.vec_id, v.label, cv.clabel,
                   round({_sql_cos('v.emb', 'cv.cvec')}, 6) AS c
            FROM v CROSS JOIN cv
        ),
        agg AS (
            SELECT vec_id, label,
                   max(CASE WHEN clabel = label THEN c END) AS own,
                   max(CASE WHEN clabel <> label THEN c END) AS best_other
            FROM scored GROUP BY vec_id, label
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(own - best_other), 6) AS mean_margin,
               CAST(count(CASE WHEN own <= best_other THEN 1 END)
                    AS BIGINT) AS n_confusable,
               round(count(CASE WHEN own <= best_other THEN 1 END)::DOUBLE
                     / count(*), 6) AS confusable_share
        FROM agg GROUP BY label
    """,
    doc="Per-label separability margin: each vector's cosine to its OWN "
    "label centroid minus its best cosine to any OTHER centroid — "
    "positive mean = compact well-separated class; the confusable share "
    "(margin <= 0) names the labels whose members sit closer to a "
    "foreign centroid, the curation signal for relabeling/filtering. "
    "Centroids are per-dimension averages rounded to 9 dp (the kmeans "
    "determinism convention) and broadcast (|labels| rows); the corpus "
    "is scanned once for centroids (map-side partial on (label, dim)) "
    "and once for scoring.",
)
def embedding_label_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _dvec("embedding").alias("emb"))
    u = v.select(
        "label", F.posexplode("emb").alias("i", "x")
    )
    cent = u.groupBy("label", "i").agg(F.round(F.avg("x"), 9).alias("mu"))
    cv = (
        cent.groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mu"))),
                lambda s: s["mu"],
            ).alias("cvec")
        )
    )
    scored = v.crossJoin(F.broadcast(cv)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(cosine_col(F.col("emb"), F.col("cvec")), 6).alias("c"),
    )
    agg = scored.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("c"))
        ).alias("own"),
        F.max(
            F.when(F.col("clabel") != F.col("label"), F.col("c"))
        ).alias("best_other"),
    )
    conf = F.count(F.when(F.col("own") <= F.col("best_other"), 1))
    return agg.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.avg(F.col("own") - F.col("best_other")), 6).alias(
            "mean_margin"
        ),
        conf.cast("bigint").alias("n_confusable"),
        F.round(conf.cast("double") / F.count("*"), 6).alias(
            "confusable_share"
        ),
    )
