"""Deduplication operators for training-data pipelines.

Beyond-reference extensions (BASELINE.json): exact hash dedup,
n-gram Jaccard near-dup, MinHash+LSH, SimHash. All built from JVM-side
SQL primitives (md5, higher-order array functions, hash-joins) — no
Python in the hot path — and each with an exact DuckDB twin for the
correctness gate.

Scale design (100 TB):
- exact dedup: one shuffle on the content hash.
- shingle/minhash pipelines: explode -> groupBy doc (map-side combine),
  signatures are fixed-width (k ints) regardless of doc size.
- LSH banding: candidate generation is a self-join on (band, band_hash)
  buckets — the join key is uniformly distributed by construction, so
  no skew; the quadratic verify step only runs inside buckets.
- brute-force pair join is only used by `jaccard_pairs` for
  verification and small corpora; the LSH path is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# uint32 from the first 8 hex chars of md5 — portable to DuckDB as
# ('0x' || substr(md5(x),1,8))::BIGINT.
def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group documents by content hash: (h, n, canonical doc_id)."""

    return (
        docs.select(F.md5(F.col(text_col)).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("canonical"))
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Tokenization is a plain space split; n-grams join tokens with '_'.
    For n=1 this is the distinct word set.
    """

    words = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select("doc_id", words.alias("w")).filter(F.size("w") >= n)
    if n == 1:
        sh = F.col("w")
    else:
        parts = " , ".join(f"w[i + {j}]" for j in range(n))
        sh = F.expr(
            f"transform(sequence(0, size(w) - {n}), i -> concat_ws('_', {parts}))"
        )
    return base.select("doc_id", F.explode(sh).alias("shingle")).dropDuplicates(
        ["doc_id", "shingle"]
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 1,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Document pairs with shingle-set Jaccard >= threshold.

    |A ∩ B| via a self-join on shingle, |A ∪ B| = |A| + |B| - |∩|;
    all integer arithmetic until the final rounded division.
    """

    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.toDF("a", "shingle")
    b = sh.toDF("b", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sz_a = sizes.toDF("a", "sz_a")
    sz_b = sizes.toDF("b", "sz_b")
    jac = (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("a", "b", "jaccard")


# Linear-permutation MinHash: one md5 per shingle, then k cheap
# (a*h + b) mod P transforms instead of k md5s (~k× less hashing work
# at 100 TB). P is the smallest prime > 2^32; a_i odd, b_i arbitrary
# fixed constants. Mirrored verbatim in the DuckDB oracle.
MINHASH_P = 4294967311


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    return [(2 * i + 1, i * 7919 + 1) for i in range(k)]


def minhash_signatures(
    docs: DataFrame, k: int = 16, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """k-permutation MinHash signatures: (doc_id, sig array<long>).

    h_i(s) = (a_i * uint32(md5(s)) + b_i) mod P; the signature is
    fixed-width, so downstream state is O(k) per document regardless
    of length.
    """

    sh = shingles(docs, n, text_col).select(
        "doc_id", _h32(F.col("shingle")).alias("h")
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """MinHash LSH near-duplicate pairs.

    Band the k-wide signature into ``bands`` groups of k/bands rows;
    candidates collide on at least one full band; candidates are then
    verified with exact Jaccard >= threshold. Returns (a, b, jaccard).
    """

    rows = k // bands
    # One shingle pass: everything downstream (signatures, candidate
    # bands, exact verify) works on the md5-derived uint32 per shingle —
    # long joins instead of string joins, and the text is parsed once.
    # Jaccard is computed over hashed shingle sets (deterministic; the
    # oracle mirrors the same hashing).
    sh = (
        shingles(docs, n, text_col)
        .select("doc_id", _h32(F.col("shingle")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
        .persist()
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    sig = sig.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col("sig")[bi * rows + ri].cast("string")
                                for ri in range(rows)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    left = banded.toDF("a", "band", "key")
    right = banded.toDF("b", "band", "key")
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )

    # Verify candidates with exact Jaccard over the hashed shingle sets.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.toDF("a", "h")
    b_sh = sh.toDF("b", "h")
    inter = (
        candidates.join(a_sh, "a")
        .join(b_sh, ["b", "h"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = (
        inter.join(sizes.toDF("a", "sz_a"), "a")
        .join(sizes.toDF("b", "sz_b"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("a", "b", "jaccard")


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """Per-document SimHash over the distinct word set: (doc_id, simhash).

    For each bit b: sum +1/-1 over tokens by whether bit b of the
    token's 32-bit hash is set; the fingerprint sets bit b iff the sum
    is positive. Pure integer arithmetic -> portable to SQL.
    """

    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .dropDuplicates(["doc_id", "w"])
        .select("doc_id", _h32(F.col("w")).alias("h"))
    )
    bit = words.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "h",
    ).withColumn(
        "c", F.when(F.expr("(h >> b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
    )
    per_bit = bit.groupBy("doc_id", "b").agg(F.sum("c").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << b")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
