"""Similarity search over embedding columns.

Beyond-reference extensions (BASELINE.json): brute-force cosine top-k
as the exact baseline, and an LSH-bucketed (random hyperplane) variant
as the scale path. Embeddings are ``array<float>`` columns; all vector
math uses built-in higher-order functions (zip_with + aggregate), which
execute JVM-side — no Python UDFs.

Scale design (100 TB):
- brute force is O(|Q| * |N|): correct for verification and small
  query sets (broadcast the queries, one pass over the corpus).
- LSH: each vector gets a ``planes``-bit signature from sign(v · r_p)
  with pseudo-random hyperplanes derived from a hash (deterministic,
  no stored model); candidates share a signature bucket; exact cosine
  only runs inside buckets. Bucket count 2^planes controls recall vs
  fanout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Returns (q, neighbor, sim, rank); sim rounded to 4 decimals and
    ties broken by neighbor id so results are deterministic across
    engines. Queries are broadcast — one scan of the corpus.
    """

    from pyspark.sql.window import Window

    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q"), F.col(vec_col).alias("qv")
    )
    n = embeddings.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("nv")
    )
    sims = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("q") != F.col("neighbor"))
        .withColumn(
            "sim",
            # nullif guards zero-norm vectors (ANSI divide-by-zero);
            # they have no meaningful cosine neighbors and drop out.
            F.round(
                _dot("qv", "nv")
                / F.nullif(_norm("qv") * _norm("nv"), F.lit(0.0)),
                4,
            ),
        )
        .filter(F.col("sim").isNotNull())
    )
    w = Window.partitionBy("q").orderBy(
        F.col("sim").desc(), F.col("neighbor").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "neighbor", "sim", "rank")
    )


def hyperplane_signature(
    embeddings: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH bucket id per vector: ``planes``-bit random-hyperplane
    signature. Plane weights are +1/-1 from a hash of (plane, dim) —
    deterministic, nothing to store or broadcast."""

    # sig bit p = 1 iff sum_i v[i] * w(p, i) > 0, w = ±1 from
    # uint32(md5(p || '_' || i)) parity.
    sig_terms = []
    for p in range(planes):
        dot = F.expr(
            "aggregate(zip_with({v}, sequence(0, size({v}) - 1), "
            "(x, i) -> CAST(x AS DOUBLE) * (CAST(conv(substring(md5(concat('{p}_', i)), 1, 8), 16, 10) AS BIGINT) % 2 * 2 - 1)), "
            "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)".format(v=vec_col, p=p)
        )
        sig_terms.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = sig_terms[0]
    for t in sig_terms[1:]:
        bucket = bucket + t
    return embeddings.select(
        F.col(id_col).alias("vec_id"), bucket.alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within hyperplane buckets.

    The scale path: the corpus self-join is restricted to equal
    signatures (2^planes buckets), so comparisons drop by ~2^planes
    versus brute force at the cost of recall.
    """

    from pyspark.sql.window import Window

    sig = hyperplane_signature(embeddings, planes, id_col, vec_col)
    emb = embeddings.join(sig, embeddings[id_col] == sig["vec_id"]).select(
        embeddings[id_col].alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    q = emb.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("q"), F.col("v").alias("qv"), F.col("bucket")
    )
    n = emb.select(
        F.col("id").alias("neighbor"), F.col("v").alias("nv"), F.col("bucket")
    )
    sims = (
        n.join(F.broadcast(q), "bucket")
        .filter(F.col("q") != F.col("neighbor"))
        .withColumn(
            "sim",
            F.round(
                _dot("qv", "nv")
                / F.nullif(_norm("qv") * _norm("nv"), F.lit(0.0)),
                4,
            ),
        )
        .filter(F.col("sim").isNotNull())
    )
    w = Window.partitionBy("q").orderBy(
        F.col("sim").desc(), F.col("neighbor").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "neighbor", "sim", "rank")
    )
