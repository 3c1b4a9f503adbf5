"""As-of join: match each left row to the latest right row at-or-before it.

Spark has no built-in as-of join (the reference has none either — this is
part of the engine's extension surface). Semantics follow the standard
definition (DuckDB ASOF JOIN, pandas merge_asof, kdb aj): for every left
row, pick the right row with the greatest ``right_ts <= left_ts`` among
rows sharing the join key.

Implementation: equi-join on the key with the inequality as a join
predicate, then windowed argmax per left row. The equi-join shuffles both
sides on the key, so it scales horizontally; the window re-uses the same
hash partitioning (no second shuffle of the big side beyond the rank).
Right-side ties on (key, ts) are broken by a caller-supplied tiebreak so
the surviving row is deterministic.

For a genuinely huge right side with many versions per key, prefer
compacting the right side first (e.g. latest-per-interval) — the join
multiplies each left row by all earlier right versions before the rank
prunes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance: Column | None = None,
    tiebreak: list[str] | None = None,
    left_keys: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` to ``right``.

    :param how: 'inner' (drop unmatched left rows) or 'left' (keep them
        with null right columns).
    :param direction: 'backward' (latest right at-or-before, the
        default and the standard as-of), 'forward' (earliest right
        at-or-after), or 'nearest' (smallest absolute time distance;
        exact-distance ties prefer the backward side — the pandas
        ``merge_asof`` convention). 'nearest' joins on the key alone
        and prunes by |distance| afterwards, so pass a ``tolerance``
        whenever right keys carry many versions — it becomes a join
        predicate that bounds the pre-rank multiplicity.
    :param tolerance: optional max age, e.g. ``F.expr("INTERVAL 7 DAYS")``
        — right rows older than ``left_ts - tolerance`` don't match.
    :param tiebreak: right-side columns ordered DESC after right_ts to make
        the survivor deterministic when several right rows share the ts.
    :param left_keys: columns that uniquely identify a left row — the
        argmax window partitions on them. Defaults to *all* left columns;
        with that default, exact-duplicate left rows collapse to one
        output row each (callers with duplicate rows must pass a real
        unique key). A nondeterministic id (monotonically_increasing_id)
        is deliberately NOT used: it is assigned before the join shuffle,
        so a stage retry could re-tag rows differently between attempts
        (SPARK-23207 class) and silently corrupt the argmax grouping.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join supports direction='backward'|'forward'|'nearest', "
            f"got {direction!r}"
        )

    keys = list(left_keys) if left_keys else list(left.columns)

    cond = left[left_on] == right[right_on]
    if direction == "backward":
        cond = cond & (right[right_ts] <= left[left_ts])
        if tolerance is not None:
            cond = cond & (
                right[right_ts] >= left[left_ts].cast("timestamp") - tolerance
            )
    elif direction == "forward":
        cond = cond & (right[right_ts] >= left[left_ts])
        if tolerance is not None:
            cond = cond & (
                right[right_ts] <= left[left_ts].cast("timestamp") + tolerance
            )
    else:  # nearest: distance bounds only come from the tolerance
        if tolerance is not None:
            cond = (
                cond
                & (right[right_ts] >= left[left_ts].cast("timestamp") - tolerance)
                & (right[right_ts] <= left[left_ts].cast("timestamp") + tolerance)
            )

    joined = left.join(right, cond, "left" if how == "left" else "inner")

    if direction == "backward":
        primary = [F.col(right_ts).desc()]
    elif direction == "forward":
        primary = [F.col(right_ts).asc()]
    else:
        # smallest |distance| first; exact ties prefer the backward row
        # (False < True sorts at-or-before rows ahead), then earlier ts
        # for full determinism before the caller's tiebreak.
        dist = F.abs(
            F.unix_micros(F.col(right_ts).cast("timestamp"))
            - F.unix_micros(F.col(left_ts).cast("timestamp"))
        )
        primary = [
            dist.asc(),
            (F.col(right_ts) > F.col(left_ts)).asc(),
            F.col(right_ts).asc(),
        ]
    order = primary + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*[left[k] for k in keys]).orderBy(*order)
    ranked = joined.withColumn("__asof_rn", F.row_number().over(w))
    return ranked.filter(F.col("__asof_rn") == 1).drop("__asof_rn")
