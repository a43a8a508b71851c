"""Spectral diagnostics over the embedding corpus.

Before building ANN indexes or quantizers over a 100 TB vector corpus
you profile its geometry: per-dimension moments (dead / dominant
dimensions break SQ8 and PQ codebook training) and the dominant
principal component (anisotropy — embedding models notoriously
concentrate variance in a few directions; whitening or centering
decisions hang off this).

The top PC comes from power iteration: v_{k+1} = normalize(E^T E v_k),
computed as two corpus-shaped passes per round (per-doc projection
s_i = e_i . v, then per-dimension weighted sum). The iterate is rounded
to 9 decimals each round ON BOTH ENGINES (the k-means/PQ centroid
convention — see functions/clustering.py) so cross-engine float drift
cannot compound across rounds; per-doc dot products use the sequential
fold that matches DuckDB's list_dot_product exactly.

Scale shape: the iterate v is DIMS doubles — broadcast-trivial; each
round shuffles only (dim, partial-sum) pairs after map-side combine.
The driver holds v between rounds (O(dims), like the k-means
centroids), never any per-document data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load
from sierradb_spark.functions.similarity import _dvec, dot_col


def _round9(x: float) -> float:
    """Round half AWAY from zero to 9 decimals — the DuckDB round() /
    Spark F.round semantics (Python's round() is half-even and would
    diverge on ties in the driver-held iterate)."""
    r = math.floor(abs(x) * 1e9 + 0.5) / 1e9
    return (-r if x < 0 else r) + 0.0

REG = Registry()

_DIMS = 64
_PC_ITERS = 4

# ---------------------------------------------------------------------------
# Per-dimension moments
# ---------------------------------------------------------------------------

_SQL_DIM_STATS = """
    SELECT i - 1 AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(x) / count(*), 6) AS mean,
           round(sum(x * x) / count(*)
                 - (sum(x) / count(*)) * (sum(x) / count(*)), 6) AS var_pop,
           round(min(x), 6) AS min_val,
           round(max(x), 6) AS max_val
    FROM (
        SELECT unnest(embedding::DOUBLE[]) AS x,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    )
    GROUP BY i - 1
"""


@REG.add(
    "embedding_dim_stats",
    oracle=_SQL_DIM_STATS,
    doc="Per-dimension moment profile of the embedding corpus (mean, "
    "population variance via the explicit sum formula so both engines "
    "compute the identical expression, min/max) — the pre-flight check "
    "for SQ8 ranges, PQ subspace balance, and dead-dimension pruning. "
    "Scale shape: one scan, posexplode to (dim, value), map-side-combined "
    "aggregate on a DIMS-cardinality key; nothing else moves.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    d = e.select(F.posexplode(_dvec("embedding")).alias("dim", "x"))
    n = F.count("*")
    return d.groupBy("dim").agg(
        n.alias("n"),
        F.round(F.sum("x") / n, 6).alias("mean"),
        F.round(
            F.sum(F.col("x") * F.col("x")) / n
            - (F.sum("x") / n) * (F.sum("x") / n),
            6,
        ).alias("var_pop"),
        F.round(F.min("x"), 6).alias("min_val"),
        F.round(F.max("x"), 6).alias("max_val"),
    ).select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        "mean",
        "var_pop",
        "min_val",
        "max_val",
    )


# ---------------------------------------------------------------------------
# Power-iteration dominant principal component
# ---------------------------------------------------------------------------


def _sql_top_pc() -> str:
    # v0 = ones/sqrt(DIMS) = exactly 0.125 for 64 dims; each round:
    # project, per-dim weighted sum, L2-normalize, round to 9.
    assert _DIMS == 64  # 1/sqrt(64) must stay exactly representable
    ctes = [
        f"""
        dims AS MATERIALIZED (
            SELECT vec_id, i - 1 AS dim, x FROM (
                SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings
            )
        ),
        v0 AS (SELECT i AS dim, 0.125 AS val
               FROM generate_series(0, {_DIMS - 1}) t(i))
        """
    ]
    for k in range(_PC_ITERS):
        ctes.append(
            f"""
        s{k} AS MATERIALIZED (
            SELECT vec_id,
                   list_dot_product(embedding::DOUBLE[],
                       (SELECT list(val ORDER BY dim) FROM v{k})) AS s
            FROM embeddings
        ),
        u{k} AS MATERIALIZED (
            SELECT d.dim, sum(d.x * s{k}.s) AS u
            FROM dims d JOIN s{k} ON s{k}.vec_id = d.vec_id
            GROUP BY d.dim
        ),
        v{k + 1} AS (
            SELECT dim,
                   round(u / sqrt((SELECT sum(u * u) FROM u{k})), 9) AS val
            FROM u{k}
        )
        """
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
        SELECT dim::BIGINT AS dim, val AS loading FROM v{_PC_ITERS}
        """
    )


@REG.add(
    "embedding_top_pc_power",
    oracle=_sql_top_pc(),
    doc=f"Dominant principal component of the (uncentered) embedding "
    f"second-moment matrix by {_PC_ITERS} rounds of power iteration from "
    "the deterministic ones/sqrt(dims) start, iterate L2-normalized and "
    "rounded to 9 decimals per round on both engines (the k-means "
    "convention that stops cross-engine float drift compounding). The "
    "anisotropy / common-direction diagnostic that motivates centering "
    "before cosine ANN. Scale shape: per round, one broadcast of the "
    "64-double iterate, one projection scan (sequential-fold dot), one "
    "map-side-combined (dim, sum) aggregate; the driver holds O(dims) "
    "state only.",
)
def embedding_top_pc_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", _dvec("embedding").alias("emb"))
        .localCheckpoint(eager=True)  # scanned twice per round
    )
    dims = e.select("vec_id", F.posexplode("emb").alias("dim", "x"))
    from sierradb_spark.functions.similarity import sql_arr, sql_dot

    v = [0.125] * _DIMS
    for _ in range(_PC_ITERS):
        # SQL-text dot against the iterate (r11): identical fold,
        # one F.expr instead of ~75 py4j calls per round.
        s = e.select(
            "vec_id", F.expr(sql_dot("emb", sql_arr(v))).alias("s")
        )
        u_rows = (
            dims.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("x") * F.col("s")).alias("u"))
            .collect()  # O(dims) driver state, as in k-means
        )
        u = [0.0] * _DIMS
        for r in u_rows:
            u[r["dim"]] = r["u"]
        norm = sum(x * x for x in u) ** 0.5
        # Half-away-from-zero to match DuckDB round() / Spark F.round —
        # Python's round() is banker's and would diverge on ties.
        v = [_round9(x / norm) for x in u]
    out = [(d, v[d]) for d in range(_DIMS)]
    return spark.createDataFrame(out, "dim bigint, loading double")


# ---------------------------------------------------------------------------
# Anisotropy score: top-PC variance share
# ---------------------------------------------------------------------------

_SQL_ANISOTROPY = f"""
    WITH pc AS MATERIALIZED ({_sql_top_pc()}),
    proj AS (
        SELECT list_dot_product(embedding::DOUBLE[],
                   (SELECT list(loading ORDER BY dim) FROM pc)) AS s,
               list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS sq
        FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(sum(s * s) / count(*), 6) AS top_pc_energy,
           round(sum(sq) / count(*), 6) AS total_energy,
           round(sum(s * s) / sum(sq), 6) AS top_pc_share
    FROM proj
"""


@REG.add(
    "embedding_anisotropy",
    oracle=_SQL_ANISOTROPY,
    doc="Anisotropy audit: share of total embedding energy captured by "
    "the power-iteration dominant component (mean squared projection / "
    "mean squared norm). Isotropic corpora score ~1/dims; a large share "
    "means a common direction dominates cosine similarity and centering "
    "will change ANN neighborhoods. One extra corpus scan over the "
    "broadcast 64-double component.",
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    pc = embedding_top_pc_power(spark, sf_dir).collect()
    v = [0.0] * _DIMS
    for r in pc:
        v[r["dim"]] = r["loading"]
    from sierradb_spark.functions.similarity import sql_arr, sql_dot

    e = load(spark, sf_dir, "embeddings").select(_dvec("embedding").alias("emb"))
    proj = e.select(
        F.expr(sql_dot("emb", sql_arr(v))).alias("s"),
        dot_col(F.col("emb"), F.col("emb")).alias("sq"),
    )
    return proj.agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(F.col("s") * F.col("s")) / F.count("*"), 6).alias(
            "top_pc_energy"
        ),
        F.round(F.sum("sq") / F.count("*"), 6).alias("total_energy"),
        F.round(F.sum(F.col("s") * F.col("s")) / F.sum("sq"), 6).alias(
            "top_pc_share"
        ),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distance-distortion audit
# ---------------------------------------------------------------------------

_JL_K = 16
# Deterministic +-1/sqrt(k) sign matrix from md5 — generated with
# hashlib here and reproduced by md5() in the oracle builder below, so
# both engines project with the SAME literal matrix and the dot products
# (sequential fold == list_dot_product) agree bit-for-bit.
import hashlib as _hashlib  # noqa: E402


def _jl_row(p: int) -> list[float]:
    scale = 1.0 / _JL_K ** 0.5
    return [
        scale
        if int(_hashlib.md5(f"jl:{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
        else -scale
        for d in range(_DIMS)
    ]


_JL_R = [_jl_row(p) for p in range(_JL_K)]

# Pair sample: the shared multiplicative-hash doc-sampling convention
# (see functions/pipeline.py) — vectors whose 32-bit Knuth hash falls
# under the threshold join pairwise, so the audit is O(sample^2) at any
# corpus size.
from sierradb_spark.functions.pipeline import _KNUTH, _RING  # noqa: E402

_JL_SAMPLE_THRESHOLD = (1 << 32) // 12  # ~1/12 of vectors


def _sql_jl() -> str:
    def lits(row: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in row) + "]"

    proj_cols = ", ".join(
        f"list_dot_product(embedding::DOUBLE[], {lits(_JL_R[p])}::DOUBLE[]) AS y{p}"
        for p in range(_JL_K)
    )
    y_dist = " + ".join(f"(a.y{p} - b.y{p}) * (a.y{p} - b.y{p})" for p in range(_JL_K))
    return f"""
        WITH sample AS MATERIALIZED (
            SELECT vec_id, embedding, {proj_cols}
            FROM embeddings
            WHERE (vec_id * {_KNUTH}) % {_RING} < {_JL_SAMPLE_THRESHOLD}
        ),
        pairs AS (
            SELECT (list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                    + list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    - 2 * list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
                       AS d_orig,
                   ({y_dist}) AS d_proj
            FROM sample a JOIN sample b ON a.vec_id < b.vec_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(d_proj / d_orig), 6) AS mean_distortion,
               round(min(d_proj / d_orig), 6) AS min_distortion,
               round(max(d_proj / d_orig), 6) AS max_distortion,
               round(sum(CASE WHEN d_proj / d_orig BETWEEN 0.5 AND 1.5
                              THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
                   AS frac_within_pm50
        FROM pairs
    """


@REG.add(
    "jl_projection_distortion",
    oracle=_sql_jl(),
    doc=f"Johnson-Lindenstrauss audit: project {_DIMS}-d embeddings to "
    f"{_JL_K}-d with a deterministic md5-derived sign matrix "
    "(+-1/sqrt(k)), then measure squared-distance distortion "
    "d_proj^2/d_orig^2 over all pairs of a deterministic hash sample — "
    "the acceptance test before using cheap projected distances as an "
    "ANN pre-filter. Scale shape: projection is a per-row map (k "
    "sequential-fold dots against broadcast literal rows); the pairwise "
    "audit is confined to the O(sample^2) hash sample like the MinHash "
    "recall ground truth; full-corpus projection would write a column, "
    "never shuffle.",
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    from sierradb_spark.functions.similarity import sql_arr, sql_dot

    # SQL-text projections (r11): 16 x 64 row literals cost ~1 s of
    # py4j as Columns; identical folds/literal bits via one F.expr each.
    _emb_sql = "cast(embedding as array<double>)"
    sample = e.filter(
        (F.col("vec_id") * _KNUTH) % _RING < _JL_SAMPLE_THRESHOLD
    ).select(
        "vec_id",
        _dvec("embedding").alias("emb"),
        *[
            F.expr(sql_dot(_emb_sql, sql_arr(_JL_R[p]))).alias(f"y{p}")
            for p in range(_JL_K)
        ],
    )
    a, b = sample.alias("a"), sample.alias("b")
    d_orig = (
        dot_col(F.col("a.emb"), F.col("a.emb"))
        + dot_col(F.col("b.emb"), F.col("b.emb"))
        - 2 * dot_col(F.col("a.emb"), F.col("b.emb"))
    )
    d_proj = None
    for p in range(_JL_K):
        term = (F.col(f"a.y{p}") - F.col(f"b.y{p}")) * (
            F.col(f"a.y{p}") - F.col(f"b.y{p}")
        )
        d_proj = term if d_proj is None else d_proj + term
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        d_orig.alias("d_orig"), d_proj.alias("d_proj")
    )
    r = F.col("d_proj") / F.col("d_orig")
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(r), 6).alias("mean_distortion"),
        F.round(F.min(r), 6).alias("min_distortion"),
        F.round(F.max(r), 6).alias("max_distortion"),
        F.round(
            F.sum(F.when((r >= 0.5) & (r <= 1.5), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("frac_within_pm50"),
    )
