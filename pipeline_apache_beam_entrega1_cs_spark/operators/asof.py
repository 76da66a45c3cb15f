"""As-of join: for each left row, attach the latest right row with
``right.ts <= left.ts`` per key (SURVEY.md §2B "Joins" row).

Spark lacks a native as-of join. The scalable idiom used here is
union + ordered window + last(ignorenulls) — ONE shuffle on the key,
no candidate-pair explosion. The naive alternative (equi-join on key +
range filter + row_number) materializes every (fact, dim-version) pair
before pruning, which blows up when a hot key has a long history; the
union-window form is linear in input size and survives 100× scale-up.
Skewed keys are handled by AQE's skew-split on the single shuffle.

(``applyInPandas`` + ``pd.merge_asof`` per group is the fallback for
semantics this can't express, e.g. nearest-neighbor tolerance joins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach, to each ``left`` row, the payload of the latest ``right``
    row with ``right[right_ts] <= left[left_ts]``, matching on ``on``.

    Payload columns surface with their own names (they must not collide
    with left's columns). Rows from ``right`` order BEFORE ties from
    ``left`` at equal timestamps, so an exactly-equal timestamp matches
    (``>=`` semantics, same as DuckDB's ASOF JOIN). If ``right`` can hold
    duplicate (key, ts) rows, pass ``tiebreak`` (a right column name);
    the row with the greatest tiebreak value wins.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_asof_tie"),
        payload,
    )
    l = (
        left.withColumn("_asof_ts", F.col(left_ts))
        .withColumn("_asof_side", F.lit(1))
        .withColumn("_asof_tie", F.lit(None).cast(r.schema["_asof_tie"].dataType))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", "_asof_side", "_asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_asof_match.{c}").alias(c) for c in payload_cols]
    return matched.filter(F.col("_asof_side") == 1).select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of: attach the EARLIEST ``right`` row with
    ``right[right_ts] >= left[left_ts]`` (mirror of ``asof_join``; DuckDB
    spells it ``ASOF JOIN ... ON l.ts <= r.ts``). Same union+window
    idiom — one shuffle, linear in input size. An exactly-equal timestamp
    matches; with duplicate (key, ts) right rows the greatest ``tiebreak``
    wins, matching the backward variant."""
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_asof_tie"),
        payload,
    )
    l = (
        left.withColumn("_asof_ts", F.col(left_ts))
        .withColumn("_asof_side", F.lit(0))
        .withColumn("_asof_tie", F.lit(None).cast(r.schema["_asof_tie"].dataType))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Left rows (side 0) sort before right rows (side 1) at equal ts, so a
    # forward window starting at the left row sees same-ts right rows
    # (>= semantics). Ties inside right: tiebreak DESC puts the greatest
    # first, so first() picks it.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc(), F.col("_asof_tie").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = unioned.withColumn(
        "_asof_match", F.first("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_asof_match.{c}").alias(c) for c in payload_cols]
    return matched.filter(F.col("_asof_side") == 0).select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest as-of: attach the ``right`` row whose timestamp is
    CLOSEST to the left's in either direction (pd.merge_asof
    direction='nearest'); equidistant ties resolve BACKWARD, and a
    one-sided match (only a predecessor or only a successor exists)
    always wins over no match.

    Composition of the two linear union+window passes — backward then
    forward over the backward result — plus a per-row CASE; still one
    shuffle per pass, no candidate-pair explosion. Adds
    ``<payload>`` columns from the winning side and an ``asof_dir``
    column ('bwd'/'fwd', NULL when neither side matched)."""
    if right_ts not in payload_cols:
        raise ValueError("payload_cols must include right_ts (distance compare)")
    bwd = asof_join(left, right, on, left_ts, right_ts, payload_cols, tiebreak=tiebreak)
    for c in payload_cols:
        bwd = bwd.withColumnRenamed(c, f"_b_{c}")
    both = asof_join_forward(
        bwd, right, on, left_ts, right_ts, payload_cols, tiebreak=tiebreak
    )
    for c in payload_cols:
        both = both.withColumnRenamed(c, f"_f_{c}")

    b_ts = F.col(f"_b_{right_ts}")
    f_ts = F.col(f"_f_{right_ts}")
    l_ts = F.col(left_ts)
    dist_b = F.unix_micros(l_ts) - F.unix_micros(b_ts)
    dist_f = F.unix_micros(f_ts) - F.unix_micros(l_ts)
    pick_bwd = b_ts.isNotNull() & (f_ts.isNull() | (dist_b <= dist_f))
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [
        F.when(pick_bwd, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")).alias(c)
        for c in payload_cols
    ]
    out_cols.append(
        F.when(pick_bwd, F.lit("bwd"))
        .when(f_ts.isNotNull(), F.lit("fwd"))
        .alias("asof_dir")
    )
    return both.select(*out_cols)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_s: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of with a match-window cap — pd.merge_asof's
    ``tolerance`` knob: a predecessor more than ``tolerance_s`` seconds
    back is treated as NO match (payload columns NULL), the semantics
    every stale-quote guard / sensor-sync job needs. Composition of the
    linear union+window backward pass plus a per-row mask — still one
    shuffle, no candidate-pair explosion (the naive range-join form
    materializes every in-window pair first). Adds a boolean
    ``asof_within_tolerance`` column (false both for no-predecessor and
    beyond-tolerance rows, matching the NULLed payload)."""
    if right_ts not in payload_cols:
        raise ValueError("payload_cols must include right_ts (distance compare)")
    bwd = asof_join(
        left, right, on, left_ts, right_ts, payload_cols, tiebreak=tiebreak
    )
    within = F.col(right_ts).isNotNull() & (
        F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
        <= F.lit(int(tolerance_s) * 1_000_000)
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.when(within, F.col(c)).alias(c) for c in payload_cols]
    out_cols.append(within.alias("asof_within_tolerance"))
    return bwd.select(*out_cols)
