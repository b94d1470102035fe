"""Persisted IVF-PQ index: build ONCE on disk, query many times.

The missing production half of ``operators/pq.py`` (VERDICT r9
next-round #1): ``sim_ivfpq_trained_topk`` proves the trained
routing + compact-code + integer-ADC chain value-exactly, but every
invocation re-pays Lloyd training and corpus encoding in-plan — at
bench x200 the cell is build-dominated (336 s), and at 100 TB nobody
trains a quantizer per query.  A real ANN deployment (FAISS
``IVFx,PQy`` on disk, DiskANN, ScaNN serving trees) separates the
lifecycle:

- **build** (once, amortized over every query the index ever
  serves): train codebooks, encode the corpus, assign coarse lists,
  and persist four artifacts under one root —
  ``centroids/`` (n_centroids rows), ``codebooks/`` (m*ks rows),
  ``codes/`` and ``vectors/`` BOTH partitioned by the coarse list id,
  so each inverted list is a partition directory
  (``similarity.write_bucketed_index``'s layout, proven
  partition-pruned in its tests);
- **query** (cheap, repeated): pick ``nprobe`` lists from the tiny
  centroid table, read ONLY those partition directories (literal
  ``isin`` filters -> static partition pruning, file-listing
  visible), broadcast the m*ks LUT, ADC-score the 4-byte codes,
  exact-rerank the shortlist against the probed lists' full vectors.

Value contract: the persisted codes/centroids/codebooks are the SAME
deterministic fragments the in-plan chain produces (parquet round-
trips doubles exactly), so a query against the index returns
BIT-IDENTICAL rows to ``pq.ivfpq_topk(..., codebooks=trained)`` and
replays under the identical DuckDB oracle (``_ivfpq_trained_sql``) —
the index is a materialization, not an approximation.

Driver-side work is bounded by construction: probe selection
collects ``nprobe`` ints from an ``n_centroids``-row table (the
``query_bucketed_index`` precedent); everything corpus-sized stays
distributed.

Reference scope note: the reference app has no ANN index at all
(beyond-reference brief item); the design here follows the public
FAISS/DiskANN lifecycle split.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround
from ..functions.vectors import dot, normalized
from .pq import PQ_KS, PQ_M, _CELL_STRIDE, _MICRO, _query_lut, _subspaces
from .similarity import ivf_assignments


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
    n_vectors: int | None = None,
) -> None:
    """Train + encode + persist the index under ``path``.

    One Lloyd training pass (``pq.pq_train_codebooks``), one coarse
    assignment pass, one encode pass; the corpus-sized artifacts
    (codes, vectors) write partitioned by ``list_id`` so a probe
    later reads ``nprobe`` directories, not the corpus.  ``_meta.json``
    records the build parameters and corpus row count for the cheap
    staleness check in :func:`ensure_ivfpq_index`.
    """
    from .pq import pq_codes, pq_train_codebooks

    trained = pq_train_codebooks(embeddings, dim, m, ks, iters)
    assign = ivf_assignments(embeddings, n_centroids)
    # inverted-list membership for both corpus-sized artifacts
    lists = assign.select(
        "vec_id", "label", "nv", F.col("cid").alias("list_id")
    )
    codes = pq_codes(embeddings, dim, m, ks, codebooks=trained).join(
        lists.select("vec_id", "list_id"), "vec_id"
    )
    assign.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("nv").alias("cv")
    ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    trained.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    # static overwrite pinned at the write site (ADVICE r11 #3): a
    # REBUILD over an existing index path must drop every old list_id
    # partition, and a session that previously ran a dynamic
    # partition-overwrite elsewhere must not leak that mode in here —
    # dynamic semantics would keep stale inverted lists alive and
    # silently corrupt later probes.
    codes.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("list_id").parquet(os.path.join(path, "codes"))
    lists.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("list_id").parquet(os.path.join(path, "vectors"))
    n = embeddings.count() if n_vectors is None else n_vectors
    with open(os.path.join(path, "_meta.json"), "w") as fh:
        json.dump(
            {
                "n_vectors": n,
                "n_centroids": n_centroids,
                "dim": dim,
                "m": m,
                "ks": ks,
                "iters": iters,
            },
            fh,
        )


def ensure_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
) -> None:
    """Build the index iff ``path`` doesn't already hold a current
    one.  Currency check = build params + corpus row count (the
    count(*) is a parquet-footer aggregate under aggregatePushdown —
    metadata IO, not a corpus scan, so repeated queries stay cheap);
    a corpus edit that preserves the row count is NOT caught — a
    production catalog would version the corpus snapshot id into the
    meta instead."""
    meta_path = os.path.join(path, "_meta.json")
    want = {
        "n_vectors": embeddings.count(),
        "n_centroids": n_centroids,
        "dim": dim,
        "m": m,
        "ks": ks,
        "iters": iters,
    }
    try:
        with open(meta_path) as fh:
            if json.load(fh) == want:
                return
    except (OSError, ValueError):
        pass
    write_ivfpq_index(embeddings, path, n_centroids, dim, m, ks, iters)


def add_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    dim: int = 64,
    n_batch: int | None = None,
) -> None:
    """The FAISS ``add()`` lifecycle (VERDICT r10 next-round #4 —
    :func:`ensure_ivfpq_index` rebuilt from scratch on any row-count
    change): fold a new vector batch into the persisted index WITHOUT
    retraining.

    The batch is encoded with the EXISTING codebooks and routed to the
    EXISTING centroids — both read back from disk, so the quantizer is
    frozen exactly as FAISS freezes it after ``train()`` — and the
    resulting codes/vectors rows are APPENDED to their inverted-list
    partition directories.  No stored row is rewritten: queries whose
    probes see only unchanged vectors are bit-identical before and
    after the add (pinned in tests/test_pq.py), and the add costs one
    batch-sized encode + one batch-sized broadcast assignment — never
    the 499 s corpus rebuild the r10 A/B measured for the build.

    Append safety: neither write's plan reads the directory it appends
    to (codes derive from codebooks/, vectors from the batch alone),
    so no self-read checkpoint is needed — unlike the cluster-table
    fold, whose assignment reads the table it extends."""
    from pyspark.sql import Window

    from .pq import pq_codes

    spark = new_vectors.sparkSession
    with open(os.path.join(path, "_meta.json")) as fh:
        meta = json.load(fh)
    m, ks = meta["m"], meta["ks"]
    cent = spark.read.parquet(os.path.join(path, "centroids"))
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    b = new_vectors.select(
        "vec_id", "label", normalized(F.col("embedding")).alias("nv")
    )
    # routing against the PERSISTED centroids — same rounded-argmax
    # contract as similarity.ivf_assignments, which must NOT be reused
    # here: it derives centroids from its input, and the add path's
    # whole point is that the quantizer is frozen
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cid"))
    lists = (
        b.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "nv",
            "cid",
            fround(dot(F.col("nv"), F.col("cv")), 6).alias("c_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "nv", F.col("cid").alias("list_id"))
    )
    codes = pq_codes(new_vectors, dim, m, ks, codebooks=cb).join(
        lists.select("vec_id", "list_id"), "vec_id"
    )
    codes.write.mode("append").partitionBy("list_id").parquet(
        os.path.join(path, "codes")
    )
    lists.write.mode("append").partitionBy("list_id").parquet(
        os.path.join(path, "vectors")
    )
    meta["n_vectors"] += (
        new_vectors.count() if n_batch is None else n_batch
    )
    meta["adds"] = meta.get("adds", 0) + 1
    with open(os.path.join(path, "_meta.json"), "w") as fh:
        json.dump(meta, fh)


def ensure_ivfpq_index_lifecycle(
    embeddings: DataFrame,
    index_pred,
    batch_preds,
    path: str,
    n_centroids: int = 8,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
    compact: bool = False,
) -> None:
    """Idempotently materialize the STEADY-STATE index: build over
    ``index_pred`` vectors (training and centroid seeding see ONLY
    them), then :func:`add_to_ivfpq_index` each of ``batch_preds`` in
    order, optionally followed by a small-file compaction
    (``functions.compaction.compact_ivfpq_index`` — bit-identical
    rewrite, ledger-neutral).

    The week-2-onward state of a served ANN index (VERDICT r11
    "What's missing" #2: the r11 ledger hard-coded ``adds == 1``, so
    no registered query exercised a CHAIN of adds plus the compaction
    that a run of appends eventually needs).  Because the quantizer is
    frozen at build time, per-vector encode/routing is independent of
    batching: add(b1); add(b2) lands the identical stored rows as
    add(b1 ∪ b2), so the value oracle is the single frozen-quantizer
    replay regardless of the batch count.  The meta ledger keys on the
    post-add row count + add counter so a completed lifecycle is
    reused and a replayed batch can never double-append."""
    preds = list(batch_preds)
    # ONE aggregation job for the ledger total plus every per-batch
    # count the build/add chain needs (previously: a .count() here,
    # another inside write_ivfpq_index, and one per add).
    counts = embeddings.agg(
        F.count("*").alias("total"),
        *[
            F.sum(p(F.col("vec_id")).cast("long")).alias(f"c{i}")
            for i, p in enumerate([index_pred, *preds])
        ],
    ).collect()[0]
    total = int(counts[0] or 0)
    n_index = int(counts[1] or 0)
    batch_ns = [int(counts[i + 2] or 0) for i in range(len(preds))]
    meta_path = os.path.join(path, "_meta.json")
    want = {
        "n_vectors": total,
        "n_centroids": n_centroids,
        "dim": dim,
        "m": m,
        "ks": ks,
        "iters": iters,
        "adds": len(preds),
    }
    try:
        with open(meta_path) as fh:
            if json.load(fh) == want:
                return
    except (OSError, ValueError):
        pass
    write_ivfpq_index(
        embeddings.filter(index_pred(F.col("vec_id"))),
        path,
        n_centroids,
        dim,
        m,
        ks,
        iters,
        n_vectors=n_index,
    )
    for bp, n_b in zip(preds, batch_ns):
        add_to_ivfpq_index(
            embeddings.filter(bp(F.col("vec_id"))), path, dim, n_batch=n_b
        )
    if compact:
        from ..functions.compaction import compact_ivfpq_index

        compact_ivfpq_index(embeddings.sparkSession, path)


def ensure_added_ivfpq_index(
    embeddings: DataFrame,
    index_pred,
    path: str,
    n_centroids: int = 8,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
) -> None:
    """Single-add form of :func:`ensure_ivfpq_index_lifecycle` (kept
    for the registered one-add query): build over ``index_pred``
    vectors, then add the rest as one batch."""
    ensure_ivfpq_index_lifecycle(
        embeddings,
        index_pred,
        [lambda c: ~index_pred(c)],
        path,
        n_centroids,
        dim,
        m,
        ks,
        iters,
    )


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    query: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    rerank: int = 50,
    m: int = PQ_M,
    dim: int = 64,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query-path-only IVF-PQ top-k against a persisted index.

    ``query`` is a ONE-row DataFrame with a unit-normalized ``qv``
    (array<double>) column — see :func:`query_row`.  Probe selection
    scores the ``n_centroids``-row centroid table in Spark (identical
    JVM arithmetic to the in-plan chain) and collects the ``nprobe``
    winning list ids — a bounded-by-construction driver collect —
    into LITERAL ``isin`` filters, so both corpus-sized reads prune
    statically to the probed partition directories (PartitionFilters
    in the scan, pinned in tests).  The rest is the proven chain:
    broadcast m*ks LUT, exact-integer ADC over 4-byte codes,
    top-``rerank`` shortlist, exact cosine rerank over the probed
    lists' full vectors, top ``k``.
    """
    cent = spark.read.parquet(os.path.join(path, "centroids"))
    probed = [
        r["cid"]
        for r in (
            cent.crossJoin(F.broadcast(query))
            .select(
                "cid",
                fround(dot(F.col("cv"), F.col("qv")), 6).alias("c_sim"),
            )
            .orderBy(F.desc("c_sim"), F.asc("cid"))
            .limit(nprobe)
            .collect()
        )
    ]
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    qsub = query.select(
        F.explode(_subspaces(F.col("qv"), dim, m)).alias("p")
    ).select(F.col("p.s").alias("s"), F.col("p.sv").alias("qs"))
    lut = _query_lut(cb, qsub)
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("list_id").isin(probed)
    )
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    approx = (
        codes.crossJoin(F.broadcast(lut))
        .select(
            "vec_id",
            F.element_at(
                F.col("lut"),
                F.col("s").cast("long") * _CELL_STRIDE + F.col("code"),
            ).alias("ip_u"),
        )
        .groupBy("vec_id")
        .agg(
            fround(F.sum("ip_u") / F.lit(float(_MICRO)), 6).alias(
                "approx_score"
            )
        )
    )
    short = approx.orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    ).limit(rerank)
    vectors = spark.read.parquet(os.path.join(path, "vectors")).filter(
        F.col("list_id").isin(probed)
    )
    reranked = (
        short.join(vectors, "vec_id")
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            "approx_score",
            fround(dot(F.col("nv"), F.col("qv")), 6).alias("cosine_sim"),
        )
    )
    return reranked.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


def query_row(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    """The one-row (qv) query frame for a corpus vector — normalized
    with the SAME JVM expression the build used, so query-side
    arithmetic is bit-identical to the in-plan chain's."""
    return embeddings.filter(F.col("vec_id") == query_vec_id).select(
        normalized(F.col("embedding")).alias("qv")
    )
