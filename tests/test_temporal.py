"""As-of and binned range joins: semantics, edges, and plan shape."""

import datetime as dt

import pandas as pd
import pytest

from kgx.operators.temporal import asof_join, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["A", "A", "A", "B"],
                "t_ts": [
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-01 10:05:00"),
                    _ts("2024-01-01 09:00:00"),  # before any quote
                    _ts("2024-01-01 10:00:00"),  # key with no quotes
                ],
                "trade_id": [1, 2, 3, 4],
            }
        )
    )
    quotes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["A", "A", "A"],
                "q_ts": [
                    _ts("2024-01-01 09:59:00"),
                    _ts("2024-01-01 10:00:00"),  # exactly at trade 1's ts
                    _ts("2024-01-01 10:04:00"),
                ],
                "quote_id": [10, 11, 12],
            }
        )
    )
    return trades, quotes


def test_asof_inner_picks_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["quote_id"]
        for r in asof_join(
            trades, quotes, "sym", "t_ts", "q_ts", ["quote_id", "q_ts"]
        ).collect()
    }
    # equal timestamp IS visible (<=); latest preceding otherwise
    assert out == {1: 11, 2: 12}


def test_asof_left_null_fills(spark, trades_quotes):
    trades, quotes = trades_quotes
    rows = {
        r["trade_id"]: r
        for r in asof_join(
            trades, quotes, "sym", "t_ts", "q_ts", ["quote_id", "q_ts"], how="left"
        ).collect()
    }
    assert len(rows) == 4
    assert rows[3]["quote_id"] is None  # trade before any quote
    assert rows[4]["quote_id"] is None  # key with no right rows
    assert rows[1]["quote_id"] == 11


def test_asof_tie_on_ts_takes_max_payload(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "lts": [_ts("2024-01-01 12:00:00")], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x"],
                "rts": [_ts("2024-01-01 11:00:00")] * 2,
                "rid": [5, 9],
            }
        )
    )
    out = asof_join(left, right, "k", "lts", "rts", ["rid"]).collect()
    assert out[0]["rid"] == 9  # payload-struct max breaks the tie


def test_asof_single_exchange(spark, trades_quotes):
    """The whole as-of join must cost ONE shuffle (the per-key window)."""
    trades, quotes = trades_quotes
    df = asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["quote_id"])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan  # union sides share one
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_binned_window_edges(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "lts": [_ts("2024-01-02 00:00:00")], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x"] * 4,
                "ts": [
                    _ts("2024-01-01 00:00:00"),  # exactly window start (kept)
                    _ts("2023-12-31 23:59:59"),  # 1 s too old
                    _ts("2024-01-02 00:00:00"),  # equal to left ts (kept)
                    _ts("2024-01-02 00:00:01"),  # after left ts
                ],
                "rid": [1, 2, 3, 4],
            }
        )
    )
    out = range_join_binned(left, right, "k", "lts", "ts", 86400, ["rid"])
    assert sorted(r["rid"] for r in out.collect()) == [1, 3]


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "lts": [_ts("2024-01-02 00:00:00")], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "ts": [_ts("2024-01-01 12:00:00")], "rid": [1]})
    )
    df = range_join_binned(left, right, "k", "lts", "ts", 86400, ["rid"])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_join_matches_naive_on_random_data(spark):
    import random

    rng = random.Random(11)
    base = _ts("2024-01-01 00:00:00")
    lrows = [
        ("k%d" % rng.randrange(4), base + dt.timedelta(seconds=rng.randrange(0, 400000)), i)
        for i in range(60)
    ]
    rrows = [
        ("k%d" % rng.randrange(4), base + dt.timedelta(seconds=rng.randrange(0, 400000)), i)
        for i in range(200)
    ]
    left = spark.createDataFrame(pd.DataFrame(lrows, columns=["k", "lts", "lid"]))
    right = spark.createDataFrame(pd.DataFrame(rrows, columns=["k", "ts", "rid"]))
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join_binned(left, right, "k", "lts", "ts", 3600, ["rid"]).collect()
    )
    want = sorted(
        (lid, rid)
        for (lk, lts, lid) in lrows
        for (rk, rts, rid) in rrows
        if lk == rk and rts <= lts and rts >= lts - dt.timedelta(seconds=3600)
    )
    assert got == want


def test_sessionize_gap_boundary_semantics(spark):
    """An event exactly gap seconds after the previous one still MERGES
    (Spark's session_window boundary is inclusive); only a strictly larger
    gap starts a new session — pinned here because the gaps-and-islands
    oracle must mirror it with `> gap`, not `>= gap`."""
    from kgx.operators.temporal import sessionize

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1] * 4,
                "ts": [
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-01 10:30:00"),  # exactly gap after: merges
                    _ts("2024-01-01 11:00:01"),  # gap + 1 s: new session
                    _ts("2024-01-01 11:10:00"),  # < gap after prev: same
                ],
                "event_id": [1, 2, 3, 4],
            }
        )
    )
    out = sessionize(ev, "user_id", "ts", 1800).orderBy("session_id").collect()
    assert [(r["session_id"], r["n_events"]) for r in out] == [(1, 2), (2, 2)]
    assert out[0]["session_start"] == _ts("2024-01-01 10:00:00")
    # session_end = last ts + gap
    assert out[0]["session_end"] == _ts("2024-01-01 11:00:00")
    assert out[1]["session_end"] == _ts("2024-01-01 11:40:00")


def test_sessionize_multi_user_numbering(spark):
    from kgx.operators.temporal import sessionize

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2],
                "ts": [
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-02 10:00:00"),
                    _ts("2024-01-01 10:00:00"),
                ],
                "event_id": [1, 2, 3],
            }
        )
    )
    out = sessionize(ev, "user_id", "ts", 3600).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["session_id"])
    assert sorted(per_user[1]) == [1, 2] and per_user[2] == [1]


def test_asof_join_matches_naive_on_random_data(spark):
    import random

    rng = random.Random(23)
    base = _ts("2024-01-01 00:00:00")
    lrows = [
        ("k%d" % rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(0, 100000)), i)
        for i in range(50)
    ]
    # distinct right timestamps per key so the naive argmax is unambiguous
    rrows = [
        ("k%d" % (i % 3), base + dt.timedelta(seconds=7 * i + (i % 3)), i)
        for i in range(120)
    ]
    left = spark.createDataFrame(pd.DataFrame(lrows, columns=["k", "lts", "lid"]))
    right = spark.createDataFrame(pd.DataFrame(rrows, columns=["k", "ts", "rid"]))
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, "k", "lts", "ts", ["rid", "ts"]).collect()
    }
    want = {}
    for lk, lts, lid in lrows:
        cand = [(rts, rid) for (rk, rts, rid) in rrows if rk == lk and rts <= lts]
        if cand:
            want[lid] = max(cand)[1]
    assert got == want


def test_sessionize_matches_naive_on_random_data(spark):
    import random

    from kgx.operators.temporal import sessionize

    rng = random.Random(31)
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(0, 200000)), i)
        for i in range(150)
    ]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts", "event_id"]))
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(ev, "user_id", "ts", 1800).collect()
    }
    # naive: sort each user's events, split where gap > 1800 s (inclusive merge)
    want = set()
    per_user = {}
    for uid, ts, _ in rows:
        per_user.setdefault(uid, []).append(ts)
    for uid, tss in per_user.items():
        tss.sort()
        sessions, cur = [], [tss[0]]
        for t in tss[1:]:
            if (t - cur[-1]).total_seconds() > 1800:
                sessions.append(cur)
                cur = [t]
            else:
                cur.append(t)
        sessions.append(cur)
        for s in sessions:
            want.add(
                (uid, str(s[0]), str(s[-1] + dt.timedelta(seconds=1800)), len(s))
            )
    assert got == want
