"""Split-window: scale-safe global-order window computations.

Spark executes ``Window.orderBy(...)`` with no ``partitionBy`` in ONE
task — a single-node sort of the whole input, the plan that dies first
at 100 TB.  Exact order statistics (global rank, running sum, ECDF
steps, LEAD over a monotone key) still need the total order, so this
module implements the standard split-window rewrite once, shared by
every exact-statistics query:

1. Compute exact ``min``/``max`` of a numeric ``bucket`` expression
   that is monotone in the order key (one column-pruned aggregate
   pass; broadcast back as a 1-row dimension).
2. Assign each row a DETERMINISTIC shard id by equal-width bucketing
   of ``bucket`` between those bounds.  Equal order keys get equal
   shards, so RANK tie semantics survive sharding.
3. Run the SAME window per shard (``Window.partitionBy(shard)``) —
   ``shards`` parallel tasks instead of one, behind a single hash
   exchange.
4. Correct shard boundaries with a shard-count-sized pass: per-shard
   totals → prefix offsets over ≤``shards`` rows (a deliberately tiny
   single-task window, bounded by cluster width, not data size) →
   broadcast-joined back.  LEAD's per-shard last row is patched with
   the next non-empty shard's first value the same way.

Why NOT ``repartitionByRange`` + ``spark_partition_id()``: the range
partitioner's boundaries come from reservoir sampling seeded by the
shuffle RDD's id, so the window branch and the offsets branch of the
same query can sample DIFFERENT boundaries unless exchange reuse
happens to fire — silently inconsistent shard ids, i.e. wrong
answers.  Equal-width bounds from exact min/max are pure functions of
the data: every branch, retry, and re-execution agrees by
construction.  The trade is balance, not correctness — heavy-tailed
keys should pass a variance-stabilizing monotone ``bucket`` (e.g.
``F.log`` for revenue); a single heavily-tied value serializes into
one shard, which any tie-colocating scheme must accept.

Cost model: one column-pruned stats scan + ONE full-data exchange
(the per-shard window's hash repartition), versus the built-in global
window's one exchange into ONE task.  At bench scale the naive form
is marginally cheaper; at cluster scale this form is linear speedup
in executors (SCALE.md "Windows").

No driver jobs: the bounds live inside the plan as a broadcast
cross-join, never a ``collect()``/``approxQuantile`` at build time.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SHARD = "__sw_shard"

__all__ = ["split_window", "str_bucket"]


def str_bucket(col: Column | str) -> Column:
    """Numeric proxy monotone in Spark's binary string order: the
    first 8 bytes of the UTF-8 encoding, zero-padded, as an unsigned
    big-endian DECIMAL(20,0).  Strings sharing an 8-byte prefix tie in
    the proxy (they land in one shard; the within-shard sort breaks
    the tie exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.rpad(F.encode(c, "UTF-8"), 8, bytes([0]))
    return F.conv(F.hex(padded), 16, 10).cast("decimal(20,0)")


def split_window(
    df: DataFrame,
    order: Sequence[Column | str],
    *,
    bucket: Column | str | None = None,
    descending: bool = False,
    running_sums: Mapping[str, Column | str] | None = None,
    row_number: str | None = None,
    rank: str | None = None,
    lead: Mapping[str, str] | None = None,
    shards: int | None = None,
) -> DataFrame:
    """Global-order window over ``order`` without a single-task sort.

    bucket:       numeric expression MONOTONE in the leading order key
        (default: the first ``order`` entry, which must then be a
        plain ascending column).  Equal order keys must yield equal
        bucket values; use :func:`str_bucket` for string keys and a
        monotone transform (``F.log``) for heavy-tailed ones.
    descending:   set True when the leading order key is descending —
        shard ids are mirrored so shard 0 still holds the FIRST rows
        of the total order.
    running_sums: out_col -> value expr, SUM(...) OVER (ORDER BY order
        ROWS UNBOUNDED PRECEDING .. CURRENT ROW).
    row_number:   out col for ROW_NUMBER() OVER (ORDER BY order); make
        ``order`` total (add a tiebreaker) or intra-tie numbering is
        arrival order, same caveat as the built-in.
    rank:         out col for RANK() OVER (ORDER BY order); min-rank
        ties are exact because equal keys share a shard.
    lead:         out_col -> source col, LEAD(src, 1) OVER (ORDER BY
        order); the global last row stays null.
    shards:       shard count; defaults to the session's
        ``spark.sql.shuffle.partitions``.
    """
    running_sums = dict(running_sums or {})
    lead = dict(lead or {})
    if shards is None:
        shards = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ocols = [F.col(c) if isinstance(c, str) else c for c in order]
    if bucket is None:
        bucket = order[0]
        if not isinstance(bucket, (str, Column)):
            raise TypeError("pass bucket= explicitly for sort-ordered keys")
    b = (F.col(bucket) if isinstance(bucket, str) else bucket).cast("double")

    stats = df.agg(F.min(b).alias("__sw_mn"), F.max(b).alias("__sw_mx"))
    s = df.crossJoin(F.broadcast(stats))
    mn, mx = F.col("__sw_mn"), F.col("__sw_mx")
    # Null keys sort first under asc, last under desc (Spark's
    # default placement): both cases mean "the extreme shard on the
    # null end", which is raw = 0 under either direction — asc maps
    # raw 0 to shard 0 (first), desc mirrors it to the LAST shard.
    # (desc_nulls_first / asc_nulls_last orders are not supported.)
    # The null guard must come FIRST: F.least SKIPS nulls, so
    # least(floor(null/w), shards-1) would silently return shards-1
    # and flip null placement under desc.
    raw = (
        F.when(b.isNull(), F.lit(0))
        .when(mx == mn, F.lit(0))
        .otherwise(F.least(F.floor((b - mn) / ((mx - mn) / shards)),
                           F.lit(shards - 1)))
    )
    shard = (F.lit(shards - 1) - raw) if descending else raw
    s = s.withColumn(_SHARD, shard.cast("int")).drop("__sw_mn", "__sw_mx")

    wloc = Window.partitionBy(_SHARD).orderBy(*ocols)
    wcum = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = s
    for out_col, val in running_sums.items():
        out = out.withColumn(out_col, F.sum(val).over(wcum))
    if row_number is not None:
        out = out.withColumn(row_number, F.row_number().over(wloc))
    if rank is not None:
        out = out.withColumn(rank, F.rank().over(wloc))
    for out_col, src in lead.items():
        out = out.withColumn(out_col, F.lead(src).over(wloc))

    # --- boundary pass: per-shard totals -> prefix offsets (tiny) ---
    need_count = row_number is not None or rank is not None
    aggs = [F.count(F.lit(1)).alias("__sw_n")]
    aggs += [
        F.sum(val).alias(f"__sw_s_{out_col}")
        for out_col, val in running_sums.items()
    ]
    per = s.groupBy(_SHARD).agg(*aggs)
    wpre = Window.orderBy(_SHARD).rowsBetween(Window.unboundedPreceding, -1)
    sel = [F.col(_SHARD)]
    if need_count:
        sel.append(
            F.coalesce(F.sum("__sw_n").over(wpre), F.lit(0))
            .alias("__sw_off_n")
        )
    sel += [
        F.sum(f"__sw_s_{out_col}").over(wpre).alias(f"__sw_off_{out_col}")
        for out_col in running_sums
    ]
    offs = per.select(*sel)
    out = out.join(F.broadcast(offs), _SHARD)

    for out_col in running_sums:
        off = F.col(f"__sw_off_{out_col}")
        out = out.withColumn(
            out_col,
            F.when(off.isNull(), F.col(out_col))
            .otherwise(F.col(out_col) + off),
        )
    if row_number is not None:
        out = out.withColumn(
            row_number, F.col(row_number) + F.col("__sw_off_n")
        )
    if rank is not None:
        out = out.withColumn(rank, F.col(rank) + F.col("__sw_off_n"))

    # --- LEAD seam: next non-empty shard's first value, broadcast ---
    if lead:
        firsts = (
            s.withColumn("__sw_rn", F.row_number().over(wloc))
            .filter(F.col("__sw_rn") == 1)
            .select(
                F.col(_SHARD),
                *[
                    F.col(src).alias(f"__sw_f_{out_col}")
                    for out_col, src in lead.items()
                ],
            )
        )
        wnext = Window.orderBy(_SHARD)
        nxt = firsts.select(
            F.col(_SHARD),
            *[
                F.lead(f"__sw_f_{out_col}").over(wnext)
                .alias(f"__sw_nf_{out_col}")
                for out_col in lead
            ],
        )
        out = out.join(F.broadcast(nxt), _SHARD, "left")
        for out_col in lead:
            out = out.withColumn(
                out_col,
                F.coalesce(F.col(out_col), F.col(f"__sw_nf_{out_col}")),
            )

    drop = [_SHARD]
    if need_count:
        drop.append("__sw_off_n")
    drop += [f"__sw_off_{c}" for c in running_sums]
    drop += [f"__sw_nf_{c}" for c in lead]
    return out.drop(*drop)
