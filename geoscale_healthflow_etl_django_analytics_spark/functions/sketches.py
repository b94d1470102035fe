"""Count-Min sketch as pure Column arithmetic — mergeable heavy-hitter
counting for streams/corpora too wide to count exactly.

Companion to the Bloom filter (``functions/bloom.py``) and the
GK/HLL bound query (``registry.a13_sketch_vs_exact_bounds``): the
sketch state is a CONSTANT-size table — ``depth x width`` cells
regardless of corpus size — built with one map-side-combinable
``groupBy().count()`` and collapsed to a one-row ``map<long,long>``
for scalar composition.  Each cell update and each point estimate is
JVM-side ``xxhash64`` + mask arithmetic; no Python, no UDF.

Guarantees (Cormode & Muthukrishnan 2005): a point estimate NEVER
underestimates (every cell the token hashes to counted every one of
its occurrences), and overestimates by more than ``e/width * N``
with probability at most ``e^-depth`` (N = total stream weight).
Both sides of that contract are what the registered bound query
checks live against the exact counts.

At 100 TB the exact token count is itself fine (it is one shuffle of
the distinct-token set) — what the sketch buys is the STREAMING /
pre-aggregation form: per-partition sketches merge by cell-wise
addition (the groupBy does exactly that), so a long-running ingest
can maintain heavy-hitter counts without ever holding the distinct
token set anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048  # eps = e/width ~ 0.00133 -> overestimate <= 0.133% of N


def _bucket(token: Column, i: int, width: int) -> Column:
    """Row-i bucket for a token.  ``width`` must be a power of two so
    the modulo is a mask (non-negative even for negative xxhash64)."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    return F.xxhash64(token, F.lit(i)).bitwiseAND(F.lit(width - 1))


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """ONE-row DataFrame ``(cms: map<long,long>, n_total: long)`` —
    the packed sketch over every row of ``tokens`` (one row = one
    occurrence; pre-aggregated ``(token, cnt)`` inputs should explode
    or, better, extend this with a weight column).

    Cell key is ``i * width + bucket`` — a flat 64-bit address so one
    map holds all rows of the sketch.  ``n_total`` (the stream length
    N in the error bound) falls out of row 0's cells for free.
    """
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _bucket(F.col(token_col), i, width).alias("b"),
                )
                for i in range(depth)
            ]
        )
    )
    cells = (
        tokens.select(probes.alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )
    key = F.col("i").cast("long") * width + F.col("b").cast("long")
    return cells.agg(
        F.map_from_arrays(
            F.collect_list(key), F.collect_list("cnt")
        ).alias("cms"),
        F.sum(F.when(F.col("i") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_total"),
    )


def cms_estimate(
    token: Column,
    cms: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> Column:
    """Point estimate: min over rows of the token's cell — the
    classic CM estimator.  Missing cells read 0 (a token the sketch
    never saw estimates 0 — correct, not an underestimate)."""
    return F.least(
        *[
            F.coalesce(
                F.element_at(
                    cms,
                    F.lit(i * width).cast("long")
                    + _bucket(token, i, width).cast("long"),
                ),
                F.lit(0).cast("long"),
            )
            for i in range(depth)
        ]
    )


# --------------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count sketch (Flajolet et al. 2007),
# the cardinality complement of the CMS above.  Unlike the CMS (whose
# xxhash64 buckets put the sketch itself outside the oracle replay and
# force a boolean error-bound gate), the HLL here is built on the
# md5-derived 60-bit hash (functions/hashing.md5_int60) that Spark and
# DuckDB agree on bit-for-bit, and its register reduction is kept as an
# EXACT INTEGER (sum of 2^(RHO_MAX - M_j) as BIGINT — every term a
# power of two, so the sum is associative and partitioning-independent)
# — which means the ENTIRE sketch, estimate included, replays in ANSI
# SQL and is value-hash-checked, not just bound-checked.
#
# Spark plan shape: one explode -> one map-side-combinable
# groupBy(register).max(rho) over exactly HLL_M=1024 groups -> a
# one-row scalar reduction.  CONSTANT state at any corpus size; two
# sketches merge by cell-wise max (the groupBy does exactly that),
# which is what buys streaming / pre-aggregated distinct counts at
# 100 TB where count(DISTINCT token) is a full shuffle of the token
# set.
# --------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers -> sigma ~ 1.04/sqrt(m) = 3.25%
HLL_W = 60 - HLL_P  # bits left for the rank after the register index
HLL_RHO_MAX = HLL_W + 1  # max rank (all-zero remainder); also the scale exp
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # published bias constant, m>=128
# alpha * m^2 * 2^RHO_MAX, folded to ONE double literal so both engines
# divide the identical numerator (no cross-engine constant-fold order).
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)
HLL_LINEAR_THRESHOLD = 2.5 * HLL_M  # below this, linear counting is better


def hll_registers(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """The HLL register table ``(j, mj)`` over every row of ``tokens``
    — at most HLL_M rows regardless of input size.  Duplicate tokens
    are free (max of an identical rank); the register index is the low
    HLL_P hash bits, the rank is "leading zeros in the remaining
    HLL_W bits, plus 1", computed exactly in BOTH engines as
    ``RHO_MAX - bitlength(remainder)`` via binary-string length (an
    all-zero remainder trims to '' -> bitlength 0 -> rank RHO_MAX).
    Merging two register tables = unionByName + this same groupBy.
    """
    from .hashing import md5_int60

    h = md5_int60(F.col(token_col))
    return (
        tokens.select(
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("j"),
            F.shiftright(h, HLL_P).alias("rem"),
        )
        .select(
            "j",
            (
                F.lit(HLL_RHO_MAX)
                - F.expr("length(trim(LEADING '0' FROM bin(rem)))")
            ).alias("rho"),
        )
        .groupBy("j")
        .agg(F.max("rho").alias("mj"))
    )


def hll_summary(registers: DataFrame) -> DataFrame:
    """ONE-row estimate frame from a register table:
    ``(seen_registers, zero_registers, register_sum,
    used_linear_counting, hll_estimate)``.

    ``register_sum`` is the integer-exact harmonic reduction
    ``sum_j 2^(RHO_MAX - M_j)`` over ALL m registers (empty register
    -> M_j = 0 -> 2^RHO_MAX), max m * 2^RHO_MAX = 2^61 — inside
    signed-64 in both engines and immune to aggregation order.  The
    raw estimate is then the single double division
    ``HLL_NUMER / register_sum``; the small-range regime (raw <= 2.5m
    with empty registers) switches to linear counting
    ``m * ln(m / V)`` per the published algorithm.  Rounded to 6
    decimals with the fround discipline so the oracle replay is
    value-exact.
    """
    from .exact import fround

    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RHO_MAX} - mj AS INT))"
    )
    agg = registers.agg(
        F.count("*").alias("seen_registers"),
        F.sum(term).alias("s_seen"),
    )
    v = F.lit(HLL_M) - F.col("seen_registers")
    s_all = F.col("s_seen") + v.cast("long") * F.lit(1 << HLL_RHO_MAX)
    raw = F.lit(HLL_NUMER) / s_all.cast("double")
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))
    # multiplicative form of "raw <= threshold" — both engines compare
    # an exactly-evaluated product instead of a rounded quotient, so
    # the regime switch can never straddle a division ulp.
    use_lin = (
        F.lit(HLL_NUMER) <= F.lit(HLL_LINEAR_THRESHOLD) * s_all.cast("double")
    ) & (v > 0)
    return agg.select(
        F.col("seen_registers").cast("long").alias("seen_registers"),
        v.cast("long").alias("zero_registers"),
        s_all.cast("long").alias("register_sum"),
        use_lin.alias("used_linear_counting"),
        fround(F.when(use_lin, linear).otherwise(raw), 6).alias(
            "hll_estimate"
        ),
    )
