"""Product-quantization (PQ) ANN — asymmetric distance computation
over compact codes (Jégou, Douze & Schmid, TPAMI 2011).

Third member of the ANN family next to the sign-bucket LSH and the
IVF probe (``operators/similarity.py``): where IVF prunes WHICH
vectors a query scores, PQ shrinks WHAT is stored and scored per
vector.  Each (unit-normalized) vector is split into ``m`` subspaces;
each subvector is replaced by the id of its nearest entry in a
per-subspace codebook of ``ks`` centroids — here 4 codes of 16
entries, i.e. 4 bytes per vector instead of 256 (64 floats): a 64×
smaller index that keeps a billion-vector corpus memory-resident.  A
query builds one ``m × ks`` lookup table of subspace inner products
(ADC), after which scoring a vector is ``m`` table lookups and adds —
no per-vector float dot product at all.

Determinism / oracle contract (mirrors ``ivf_assignments``):
codebook entries are the subvectors of the first ``ks`` vectors by
id; encoding argmin ranks the 6-dp-ROUNDED squared L2 with
centroid-id tiebreak; and the ADC sum runs in integer micro-units
(each LUT cell is ``round(ip * 1e6)`` as a long) so the per-vector
sum is exact integer arithmetic — associative, hence independent of
both engines' aggregation order.  The whole chain (slice → encode →
LUT → ADC → rerank) replays value-exactly in DuckDB.

Scale shape: the codebook (m·ks rows) and the one-row LUT map are
constant-size broadcasts; encoding is one corpus pass against the
broadcast codebook with a map-side-combinable ``min_by`` per
(vector, subspace) — a one-time index-build cost, persisted in
production like ``write_bucketed_index``'s layout; query-time ADC
touches only the 4-byte codes.  A top-``rerank`` shortlist by ADC
score (TakeOrderedAndProject — no full sort) is exact-reranked with
true cosine, the standard PQ recall repair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import fround
from ..functions.vectors import dot, normalized

PQ_M = 4  # subspaces
PQ_KS = 16  # codebook entries per subspace
_MICRO = 1_000_000  # LUT micro-units: exact integer ADC sums
# LUT cell key = s * _CELL_STRIDE + cid.  A fixed stride, NOT ks: the
# codebooks parameter lets a trained table with more than ks entries
# drive the same chain, and a ks-based stride would silently collide
# cells across subspaces (cid=ks in subspace s lands on cid=0 of
# s+1).  2^20 is unreachable by any realistic per-subspace codebook.
_CELL_STRIDE = 1 << 20


def _subspaces(nv: Column, dim: int, m: int) -> Column:
    """array of m structs (s, sv) — the subvector decomposition."""
    sub = dim // m
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(nv, s * sub + 1, sub).alias("sv"),
            )
            for s in range(m)
        ]
    )


def pq_subvectors(
    embeddings: DataFrame, dim: int = 64, m: int = PQ_M
) -> DataFrame:
    """(vec_id, label, s, sv): unit-normalized vectors sliced into m
    subvectors — the shared front half of codebook, encode and LUT.

    Composed as SQL strings (r12, guide §5): this helper is built 3x
    per PQ query (codebooks, codes, query slices) and its normalize +
    slice + explode tree was measured costing ~1 s of py4j round
    trips PER BUILD; the string form parses in two expr() calls."""
    from ..functions.vectors import normalized_sql

    sub = dim // m
    cells = ", ".join(
        f"named_struct('s', {s}, 'sv', slice(nv, {s * sub + 1}, {sub}))"
        for s in range(m)
    )
    return embeddings.selectExpr(
        "vec_id", "label", f"{normalized_sql('embedding')} AS nv"
    ).selectExpr("vec_id", "label", f"inline(array({cells}))")


def pq_codebooks(
    embeddings: DataFrame, dim: int = 64, m: int = PQ_M, ks: int = PQ_KS
) -> DataFrame:
    """(s, cid, cv): per-subspace codebooks — the subvectors of the
    first ``ks`` vectors by id (deterministic seeds, the
    ivf_assignments convention; k-means refinement would improve
    quantization error but changes nothing about code/ADC mechanics)."""
    return pq_subvectors(
        embeddings.filter(F.col("vec_id") < ks), dim, m
    ).select("s", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))


def pq_codes(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, s, code): the compact index — nearest codebook entry
    per (vector, subspace) by 6-dp-rounded squared L2, cid tiebreak.
    ``codebooks`` overrides the seed codebooks (e.g. the Lloyd-trained
    table from :func:`pq_train_codebooks`).

    One pass against the broadcast codebook; the argmin is a
    map-side-combinable ``min_by`` (no window, no n·ks-row shuffle —
    the exchange carries one row per (vector, subspace))."""
    sub = pq_subvectors(embeddings, dim, m)
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, dim, m, ks
    )
    # delegate to the shared assign so the encode contract (6-dp
    # rounded L2, (d, cid) tiebreak) lives in exactly one place next
    # to the Lloyd training that must match it
    return _assign_subvectors(sub, cb, with_sv=False).select(
        "vec_id", "s", "code"
    )


def _query_lut(cb: DataFrame, qsub: DataFrame) -> DataFrame:
    """One-row ADC lookup table: key ``s*_CELL_STRIDE + cid`` ->
    ``round(ip * 1e6)`` as a long.  The SINGLE home of the LUT
    rounding contract (ADVICE r8: pq_topk and ivfpq_topk carried
    verbatim copies; the rounding is subtle enough that divergent
    edits would silently desynchronize two oracle-checked chains):
    half-away-from-zero on the BINARY double, like ``fround``
    (F.round rounds the shortest decimal repr — diverges from
    DuckDB); the integer is built directly, never via a
    reconstructed double that could truncate on cast."""
    from ..functions.vectors import dot_sql

    d = dot_sql("qs", "cv")
    return (
        cb.join(F.broadcast(qsub), "s")
        .selectExpr(
            f"CAST(s AS BIGINT) * {_CELL_STRIDE} + cid AS cell",
            f"CAST(signum({d}) * floor(abs({d}) * {_MICRO} + 0.5D) "
            "AS BIGINT) AS ip_u",
        )
        .agg(
            F.map_from_arrays(
                F.collect_list("cell"), F.collect_list("ip_u")
            ).alias("lut")
        )
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    k: int = 10,
    rerank: int = 50,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: score every code against the query's LUT (integer
    micro-unit adds), shortlist top ``rerank`` by approx score, exact
    cosine rerank, emit top ``k`` (query excluded).  ``codebooks``
    overrides the seed codebooks (e.g. Lloyd-trained)."""
    from ..functions.exact import fround_sql
    from ..functions.vectors import dot_sql, normalized_sql

    b = embeddings.selectExpr(
        "vec_id", "label", f"{normalized_sql('embedding')} AS nv"
    )
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, dim, m, ks
    )
    qsub = pq_subvectors(
        embeddings.filter(F.col("vec_id") == query_vec_id), dim, m
    ).select("s", F.col("sv").alias("qs"))
    lut = _query_lut(cb, qsub)
    codes = pq_codes(embeddings, dim, m, ks, codebooks=cb)
    approx = (
        codes.crossJoin(F.broadcast(lut))
        .selectExpr(
            "vec_id",
            f"element_at(lut, CAST(s AS BIGINT) * {_CELL_STRIDE} + code) "
            "AS ip_u",
        )
        .groupBy("vec_id")
        .agg(
            F.expr(
                fround_sql(f"sum(ip_u) / {float(_MICRO)!r}D", 6)
            ).alias("approx_score")
        )
        .filter(F.col("vec_id") != query_vec_id)
    )
    short = approx.orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    ).limit(rerank)
    q = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("nv").alias("qv")
    )
    reranked = (
        short.join(b, "vec_id")
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "label",
            "approx_score",
            f"{fround_sql(dot_sql('nv', 'qv'), 6)} AS cosine_sim",
        )
    )
    return reranked.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    n_centroids: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    k: int = 10,
    rerank: int = 50,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: coarse routing composed with compact-code scoring —
    the standard billion-scale ANN index layout (FAISS ``IVFx,PQy``
    shape, non-residual variant): IVF prunes WHICH inverted lists a
    query reads (IO/partition pruning — each list is a partition
    directory at scale, cf. ``write_bucketed_index``), PQ shrinks
    WHAT those lists store (4-byte codes) and how survivors are
    scored (LUT lookups, no float dot products).  The two
    approximations multiply: a probe touches ``nprobe/n_centroids``
    of the corpus and scores it at PQ cost; only the top-``rerank``
    shortlist ever reads a full vector again.

    Composes the verified pieces unchanged: coarse assignment is
    ``similarity.ivf_assignments`` (deterministic seed centroids,
    rounded-argmax), codes/LUT/ADC are this module's (integer
    micro-unit sums), so the full chain replays in DuckDB like both
    parents."""
    from ..functions.exact import fround_sql
    from ..functions.vectors import dot_sql
    from .similarity import ivf_assignments

    assign = ivf_assignments(embeddings, n_centroids)
    q = assign.filter(F.col("vec_id") == query_vec_id).select(
        F.col("nv").alias("qv")
    )
    cent = assign.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid_c"), F.col("nv").alias("cv_c")
    )
    probed = (
        cent.crossJoin(F.broadcast(q))
        .selectExpr(
            "cid_c",
            f"{fround_sql(dot_sql('cv_c', 'qv'), 6)} AS c_sim",
        )
        .orderBy(F.desc("c_sim"), F.asc("cid_c"))
        .limit(nprobe)
        .select(F.col("cid_c").alias("cid"))
    )
    # the probed lists' members — at scale this is partition pruning,
    # here a broadcast semi-join against the nprobe-row list ids
    members = assign.join(F.broadcast(probed), "cid").select(
        "vec_id", "label", "nv"
    )
    # ADC over member codes only (global, non-residual codebooks);
    # ``codebooks`` overrides the seed codebooks — the trained
    # quantizer from pq_train_codebooks plugs straight in (ADVICE r8)
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, dim, m, ks
    )
    qsub = pq_subvectors(
        embeddings.filter(F.col("vec_id") == query_vec_id), dim, m
    ).select("s", F.col("sv").alias("qs"))
    lut = _query_lut(cb, qsub)
    codes = pq_codes(embeddings, dim, m, ks, codebooks=cb).join(
        members.select("vec_id"), "vec_id", "left_semi"
    )
    approx = (
        codes.crossJoin(F.broadcast(lut))
        .selectExpr(
            "vec_id",
            f"element_at(lut, CAST(s AS BIGINT) * {_CELL_STRIDE} + code) "
            "AS ip_u",
        )
        .groupBy("vec_id")
        .agg(
            F.expr(
                fround_sql(f"sum(ip_u) / {float(_MICRO)!r}D", 6)
            ).alias("approx_score")
        )
        .filter(F.col("vec_id") != query_vec_id)
    )
    short = approx.orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    ).limit(rerank)
    reranked = (
        short.join(members, "vec_id")
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "label",
            "approx_score",
            f"{fround_sql(dot_sql('nv', 'qv'), 6)} AS cosine_sim",
        )
    )
    return reranked.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


def pq_lloyd_codebooks(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
) -> DataFrame:
    """Per-subspace k-means-refined PQ codebooks — the TRAINED
    quantizer (Jégou et al. §III trains each subspace codebook with
    Lloyd; the seed-codebook tier demonstrates code/ADC mechanics,
    this is what production would persist).  Same iterative-plan
    shape as ``similarity.lloyd_assignments``, run over all m
    subspaces at once: per round one broadcast-codebook scoring pass
    (the argmin is a single min(struct) aggregate — map-side
    combinable, no window), then exact-decimal 8-dp component means
    per (subspace, code, position), so both engines enter every
    round with bit-identical codebooks.  A code that loses all
    members simply drops out of the next round's codebook — the
    standard empty-cluster shrink, mirrored by the oracle.

    Output: one row per surviving (s, cid) — membership count and
    exact-mean quantization distance after refinement, the training
    summary a codebook registry would record."""
    from ..functions.exact import DECIMAL_TYPE

    sub = pq_subvectors(embeddings, dim, m)
    cur = pq_train_codebooks(embeddings, dim, m, ks, iters)
    final = _assign_subvectors(sub, cur, with_sv=False)
    return final.groupBy("s", F.col("code").alias("cid")).agg(
        F.count("*").alias("n_assigned"),
        fround(
            F.sum(F.col("d").cast(DECIMAL_TYPE)).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_l2"),
    )


def _assign_subvectors(
    sub: DataFrame, cb_df: DataFrame, with_sv: bool = True
) -> DataFrame:
    """(vec_id, s, code, d[, sv]): nearest codebook entry per
    (vector, subspace) by 6-dp-rounded squared L2, cid tiebreak — one
    broadcast join and one min(struct) aggregate (map-side
    combinable, no window).  This is the SINGLE home of the encode
    contract; pq_codes, Lloyd training and the training summary all
    delegate here so the rounding/tiebreak can never desynchronize.

    ``with_sv=False`` drops the subvector from the aggregate —
    consumers that only need (code, d) (the compact index, the
    training summary) should not drag ~d/m doubles per row through
    the groupBy exchange."""
    from ..functions.exact import fround_sql
    from ..functions.vectors import dot_sql

    l2 = F.expr(
        fround_sql(
            f"{dot_sql('sv', 'sv')} - 2 * {dot_sql('sv', 'cv')} "
            f"+ {dot_sql('cv', 'cv')}",
            6,
        )
    )
    scored = sub.join(F.broadcast(cb_df), "s").select(
        "vec_id", "s", "sv", "cid", l2.alias("d")
    )
    aggs = [F.min(F.struct("d", "cid")).alias("w")]
    cols = [
        F.col("vec_id"),
        F.col("s"),
        F.col("w.cid").alias("code"),
        F.col("w.d").alias("d"),
    ]
    if with_sv:
        aggs.append(F.min_by("sv", F.struct("d", "cid")).alias("sv"))
        cols.append(F.col("sv"))
    return scored.groupBy("vec_id", "s").agg(*aggs).select(*cols)


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 2,
) -> DataFrame:
    """(s, cid, cv): the Lloyd-trained codebooks — ``iters`` rounds of
    assign + exact-decimal 8-dp component means from the seed
    codebooks (see pq_lloyd_codebooks for the full contract)."""
    from ..functions.exact import DECIMAL_TYPE

    sub = pq_subvectors(embeddings, dim, m)
    cur = pq_codebooks(embeddings, dim, m, ks)
    for _ in range(iters):
        a = _assign_subvectors(sub, cur)
        comp = a.select(
            "s", F.col("code").alias("cid"), F.posexplode("sv").alias("pos", "x")
        )
        means = comp.groupBy("s", "cid", "pos").agg(
            fround(
                F.sum(F.col("x").cast(DECIMAL_TYPE)).cast("double")
                / F.count("*"),
                8,
            ).alias("mv")
        )
        # m*ks rows — per-round localCheckpoint flattens lineage so
        # the next round's broadcast never re-executes this round's
        # corpus pass (the sim_semantic_dedup r7 lesson)
        cur = (
            means.groupBy("s", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mv"))),
                    lambda t: t["mv"],
                ).alias("cv")
            )
            .localCheckpoint()
        )
    return cur
