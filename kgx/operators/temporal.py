"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference has no temporal operators (its tables carry versions, not
timestamps — reference models.py), but any event-log corpus feeding a
training pipeline needs both:

- :func:`asof_join` — for every left row, the single latest right row with
  ``r.ts <= l.ts`` per key (the "last quote before the trade" join).  Spark
  has no ASOF JOIN; the naive inequality join degenerates to a broadcast
  nested loop.  This is the standard distributed re-expression: union both
  sides tagged, one window per key ordered by ``(ts, side)``, ``last(...,
  ignorenulls)`` carries the most recent right payload forward onto left
  rows.  ONE shuffle on the key — no range explosion, no nested loop, and
  skewed keys degrade to a single fat partition handled by AQE rather than
  a quadratic blowup.
- :func:`range_join_binned` — all (left, right) pairs per key with
  ``r.ts ∈ [l.ts - window, l.ts]``.  Executed as an equi-join on
  ``(key, time_bin)`` with the left side exploded over the ≤ 2 bins a
  window can span, then an exact filter — Catalyst gets a plain
  shuffled-hash/sort-merge join instead of a nested loop, and bin width =
  window keeps the expansion factor at exactly 2.

The DuckDB oracles check these against a genuinely INDEPENDENT
implementation (DuckDB's native ``ASOF JOIN`` and a plain inequality
join), not a SQL transliteration of the same trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row: the latest right row with ``right_ts <= left_ts``
    sharing ``key``.  Right-side ties on ``ts`` resolve to the payload of
    the row that sorts LAST by the payload struct (deterministic; callers
    wanting a specific tie-break put that column first in ``payload``).

    Returns all left columns plus ``payload`` (NULL-filled when ``how`` is
    ``"left"`` and no right row precedes).
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    pay_struct = F.struct(*[F.col(c) for c in payload])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pay_struct.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        *lcols,
    )
    # equal timestamps: right rows sort before left (side 0 < 1) so an event
    # AT the query time is visible; among equal-ts right rows the payload
    # struct orders the window deterministically.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__last", F.last("__pay", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if how == "inner":
        matched = matched.where(F.col("__last").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    return matched.select(
        *lcols, *[F.col("__last").getField(c).alias(c) for c in payload]
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
    payload: list[str],
) -> DataFrame:
    """All (left, right) pairs per ``key`` with ``right_ts`` in
    ``[left_ts - window_sec, left_ts]`` — an equi-join on ``(key, bin)``
    with bin width = ``window_sec`` so each left row probes exactly 2 bins,
    then the exact range filter.  Plan: two narrow projections, one
    shuffled equi-join, zero nested loops.
    """
    lbin = F.floor(F.unix_timestamp(F.col(left_ts)) / window_sec).cast("long")
    rbin = F.floor(F.unix_timestamp(F.col(right_ts)) / window_sec).cast("long")
    l = left.withColumn("__bin", F.explode(F.array(lbin - 1, lbin)))
    r = right.select(
        F.col(key).alias("__rk"),
        rbin.alias("__rbin"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in payload],
    )
    return (
        l.join(r, (F.col(key) == F.col("__rk")) & (F.col("__bin") == F.col("__rbin")))
        .where(
            (F.col("__rts") <= F.col(left_ts))
            & (
                F.col("__rts")
                >= F.col(left_ts) - F.expr(f"INTERVAL {window_sec} SECOND")
            )
        )
        .drop("__bin", "__rbin", "__rk", "__rts")
    )


def sessionize(
    events: DataFrame, key: str, ts: str, gap_sec: int
) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE ``session_window``
    aggregate — the idiomatic form (merging is order-independent, so no
    per-key sort is needed; a single shuffle on the key feeds the session
    merge).  Two events share a session iff their gap is at most
    ``gap_sec`` (the merge boundary is inclusive — pinned by test); the
    session's ``session_end`` is ``last ts + gap``.

    Output: ``(key, session_id, session_start, session_end, n_events)``
    with ``session_id`` numbering a key's sessions by start time from 1.
    The DuckDB oracle derives identical sessions from the classic
    gaps-and-islands window cascade — an independent formulation.
    """
    from pyspark.sql.window import Window

    grouped = (
        events.groupBy(
            F.col(key), F.session_window(F.col(ts), f"{gap_sec} seconds")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    w = Window.partitionBy(key).orderBy("session_start")
    return grouped.select(
        key,
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
    )
