"""Data-layout helpers: z-order (Morton-curve) clustering for
multi-dimensional data skipping.

The reference's author explicitly opted out of physical tuning (no
DISTKEY/SORTKEY anywhere in /root/reference/sql_queries.py:19-97 —
Redshift AUTO). At 100 TB that choice is the difference between
scanning everything and scanning 1%: parquet readers prune row groups
whose min/max statistics exclude the predicate, but a single-column
sort only tightens ONE column's statistics. Interleaving the bits of
two (or more) key columns into a Morton code and range-partitioning +
sorting by it tightens min/max on ALL interleaved columns at once, so
filters on any of them skip row groups.

Everything here is plain DataFrame expressions (codegen-friendly
shifts/ORs) — no UDFs, no collect beyond one tiny min/max agg row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _scale_to_grid(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by min/max scaling.

    Min/max scaling (vs exact rank) keeps this a one-pass, shuffle-free
    transform; heavy skew would want approx-quantile breakpoints
    instead, same interleave downstream.
    """
    span = F.when(cmax > cmin, cmax - cmin).otherwise(F.lit(1.0))
    frac = (col.cast("double") - cmin) / span
    cells = F.lit((1 << bits) - 1)
    return F.least(
        cells, F.greatest(F.lit(0), F.floor(frac * (1 << bits)).cast("long"))
    )


def morton_interleave(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Bit-interleave pre-scaled integer columns into one Morton code.

    With k columns at b bits each the code is k*b bits; keep k*b <= 63.
    The expression is a flat OR of shifted single-bit extracts — wide
    but branch-free, and whole-stage codegen compiles it to straight
    JVM shifts.
    """
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    parts = []
    for i, c in enumerate(cols):
        for b in range(bits):
            # bit b of column i lands at position b*k + i
            parts.append(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * len(cols) + i
                )
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def zorder_by(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS,
              num_partitions: int | None = None) -> DataFrame:
    """Return df re-laid-out along the z-curve of `cols`.

    One tiny agg collects global min/max per column (a scan with
    column pruning — at 100 TB this reads footer stats in practice),
    then a single range shuffle orders the data along the curve.
    Write the result with `.write.parquet(...)`: every row group's
    min/max is tight on every z-ordered column.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__max_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scale_to_grid(
            F.col(c),
            F.lit(float(stats[f"__min_{c}"])),
            F.lit(float(stats[f"__max_{c}"])),
            bits,
        )
        for c in cols
    ]
    z = df.withColumn("__z", morton_interleave(scaled, bits))
    parted = (
        z.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else z.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
