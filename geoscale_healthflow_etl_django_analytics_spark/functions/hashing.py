"""Cross-engine-reproducible integer hashes.

Spark's native hash functions (murmur3 ``hash()``, ``xxhash64()``)
are JVM-side and fast, but no other engine reproduces them — which
makes any operator built on them impossible to oracle-check against
ANSI SQL. Both Spark and DuckDB (and Postgres, Trino, ...) agree
bit-for-bit on ``md5`` over UTF-8 text, so these helpers derive
uniform integers from md5 hex prefixes:

- :func:`md5_int32` — first 8 hex chars → [0, 2^32), as ``long``.
  DuckDB equivalent: ``('0x' || substr(md5(s), 1, 8))::BIGINT``.
- :func:`md5_int60` — first 15 hex chars → [0, 2^60), as ``long``
  (15, not 16: a full 16-hex parse can exceed the signed-64 range).
  DuckDB equivalent: ``('0x' || substr(md5(s), 1, 15))::BIGINT``.

Cost note: md5 is ~2-3x slower per call than xxhash64 but still
whole-stage-codegen JVM-side — the right trade for operators whose
correctness gate is an exact cross-engine value-hash (MinHash/LSH,
SimHash, rolling fingerprints). Pure-speed paths with no oracle can
keep xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int32(col: Column) -> Column:
    """Uniform integer in [0, 2^32) from md5's first 8 hex chars."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str) -> str:
    """SQL-string twin of :func:`md5_int32` — the IDENTICAL expression
    tree, composed as text so hot builders can hand a whole repetitive
    subtree to the JVM in ONE ``expr()`` parse instead of one py4j
    round trip per node (r12 optimization; guide §5 — the driver is
    single-threaded, and plan CONSTRUCTION was measured dominating
    several bench builders: 4k-9k py4j calls per build).  Each
    Column-form helper keeps a `_sql` twin next to it so the two
    spellings cannot drift apart silently; equality is pinned by the
    value oracles (same rows) and the plan tests (same plan)."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def md5_int60(col: Column, start: int = 1) -> Column:
    """Uniform integer in [0, 2^60) from 15 md5 hex chars beginning at
    1-based ``start`` (the 32-hex digest yields two disjoint slices:
    start=1 and start=16 — the wide-SimHash halves)."""
    return F.conv(F.substring(F.md5(col), start, 15), 16, 10).cast("long")


def md5_int60_sql(expr: str, start: int = 1) -> str:
    """SQL-string twin of :func:`md5_int60` (see md5_int32_sql)."""
    return (
        f"CAST(conv(substring(md5({expr}), {start}, 15), 16, 10) AS BIGINT)"
    )


# Mersenne prime 2^31 - 1: the modulus of the affine universal-hash
# family behind true-permutation MinHash.  Chosen so every product
# a_i * (h mod P) stays under 2^62 — inside signed-64 in BOTH engines
# (DuckDB errors on BIGINT overflow rather than wrapping).
MINHASH_PRIME = 2_147_483_647


def affine_perm_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic coefficients for the classic affine permutation
    family h_i(x) = (a_i * x + b_i) mod P (Broder's min-wise hashing
    via 2-universal hashes; Carter & Wegman 1979).

    Derived from md5 of fixed tags — no RNG state, and any engine
    (or the SQL-oracle generator) regenerates the identical table.
    ``a_i`` is forced non-zero so every h_i is a bijection on [0, P).
    """
    import hashlib

    out: list[tuple[int, int]] = []
    for i in range(num_perm):
        a = (
            int(hashlib.md5(f"minhash-perm-a-{i}".encode()).hexdigest()[:8], 16)
            % (MINHASH_PRIME - 1)
            + 1
        )
        b = (
            int(hashlib.md5(f"minhash-perm-b-{i}".encode()).hexdigest()[:8], 16)
            % MINHASH_PRIME
        )
        out.append((a, b))
    return out
