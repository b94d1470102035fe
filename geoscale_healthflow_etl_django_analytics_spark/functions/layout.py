"""Data-layout helpers: Z-order (Morton) interleaving for
multi-dimensional locality.

The 100 TB story: sorting files by a Morton code of (x, y) makes 2-D
range predicates touch a near-minimal set of parquet row groups
(min/max stats cover compact z-ranges), the same technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``. The interleave is pure integer
bit arithmetic, expressed both as a Column (JVM codegen) and as an
ANSI-SQL string so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints < 2**bits: bit i of x
    lands at position 2i, bit i of y at 2i+1."""
    acc: Column = F.lit(0).cast("long")
    xl, yl = x.cast("long"), y.cast("long")
    for i in range(bits):
        acc = acc + F.shiftleft(
            F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return acc


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton code as an ANSI-SQL expression (DuckDB
    bit operators) — generated from the same loop so the two engines
    cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int = 8, bits: int = 16
) -> None:
    """Layout writer: range-partition by the Morton code, sort within
    each partition, write parquet — every file covers one compact
    z-range, so parquet row-group min/max stats prune 2-D box queries
    down to the files whose z-interval intersects the box's z-range."""
    with_z = df.withColumn("__z", z_value(F.col(x), F.col(y), bits))
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
