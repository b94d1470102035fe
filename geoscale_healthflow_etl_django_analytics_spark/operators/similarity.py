"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single broadcast of the query
vector against a full scan; exact, and the right answer up to ~10^8
vectors per executor-hour. Scale path: sign-bucket LSH (bit-packed
hyperplane signs) cuts candidates by ~2^bits; an IVF variant would
slot in the same shape (bucket id ← nearest centroid).

All vector math is `zip_with`/`aggregate` Column expressions (see
functions/vectors.py) — double precision, sequential fold, so the
DuckDB oracle (list_inner_product with the same formula shape)
produces bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, sign_bucket
from ..functions.exact import fround


def _query_vector(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("q_id"), as_double(F.col("embedding")).alias("q_vec")
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity to one stored
    vector. Ranking uses the ROUNDED score (6 dp) with vec_id
    tiebreak so the cut is engine-deterministic."""
    q = _query_vector(embeddings, query_vec_id)
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            fround(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


def ann_bucketed_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 5, n_bits: int = 4
) -> DataFrame:
    """LSH-bucketed ANN: only vectors in the query's sign-bucket are
    scored. At scale the bucket id is a partition/cluster key, so a
    query touches one partition instead of the corpus."""
    q = _query_vector(embeddings, query_vec_id)
    bucketed = embeddings.select(
        "vec_id", "label", "embedding", sign_bucket(F.col("embedding"), n_bits).alias("bucket")
    )
    q_bucketed = q.select(
        "q_id", "q_vec", sign_bucket(F.col("q_vec"), n_bits).alias("bucket")
    )
    scored = (
        bucketed.join(F.broadcast(q_bucketed), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "label",
            F.col("bucket"),
            fround(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.35, n_bits: int = 4
) -> DataFrame:
    """Embedding-cosine near-dup detection: sign-bucket blocking →
    per-bucket pairwise cosine → threshold. The blocked self-join is
    the same shape MinHash-LSH uses for text (operators/dedup.py)."""
    b = embeddings.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding"), n_bits).alias("bucket")
    )
    left = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    right = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "bucket",
            "vec_a",
            "vec_b",
            fround(cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def write_bucketed_index(
    embeddings: DataFrame, path: str, n_bits: int = 4
) -> None:
    """Persist the corpus partitioned by sign-bucket: the on-disk form
    of the ANN index. A query then reads exactly ONE partition
    directory (partition pruning — verified in tests via the scan's
    file-listing), which is the property that lets a single probe
    touch 1/2^n_bits of a 100 TB corpus."""
    (
        embeddings.withColumn("bucket", sign_bucket(F.col("embedding"), n_bits))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def query_bucketed_index(
    spark, path: str, query_vec: list[float], k: int = 5, n_bits: int = 4
) -> DataFrame:
    """Probe the on-disk index: compute the query's bucket driver-side,
    read only that partition, score, top-k."""
    bucket = 0
    for i in range(n_bits):
        if query_vec[i] >= 0:
            bucket |= 1 << i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    part = spark.read.parquet(path).filter(F.col("bucket") == bucket)
    from ..functions.exact import fround

    return (
        part.select(
            "vec_id",
            fround(cosine(F.col("embedding"), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )
