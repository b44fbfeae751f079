"""HyperLogLog register sketch (kgx.operators.sketches)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgx.operators import sketches


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def test_hll_merge_law(spark, events):
    """The sketch of a union equals the element-wise max of the parts'
    sketches — the property that makes registers a valid incremental/
    distributed state."""
    whole = {r.bucket: r.max_rho
             for r in sketches.hll_registers(events, "cast(event_id as string)").collect()}
    a = {r.bucket: r.max_rho
         for r in sketches.hll_registers(
             events.where("event_id % 2 = 0"), "cast(event_id as string)").collect()}
    b = {r.bucket: r.max_rho
         for r in sketches.hll_registers(
             events.where("event_id % 2 = 1"), "cast(event_id as string)").collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole


def test_hll_estimate_within_tolerance(spark, events):
    """m=64 gives ~13% standard error; assert within 4 sigma of the true
    distinct count."""
    regs = [(r.bucket, r.max_rho)
            for r in sketches.hll_registers(events, "cast(event_id as string)").collect()]
    true = events.select("event_id").distinct().count()
    est = sketches.estimate_cardinality(regs, m=64)
    assert abs(est - true) / true < 4 * 1.04 / (64 ** 0.5)


def test_hll_duplicates_do_not_move_registers(spark, events):
    """Registers depend only on the distinct value set."""
    doubled = events.union(events)
    a = {tuple(r) for r in sketches.hll_registers(events, "cast(event_id as string)").collect()}
    b = {tuple(r) for r in sketches.hll_registers(doubled, "cast(event_id as string)").collect()}
    assert a == b


def test_hll_rho_definition(spark):
    """Pin the leading-zero rank arithmetic on handmade hashes."""
    df = spark.createDataFrame(pd.DataFrame({"v": ["x"]}))
    # rest = 0 -> rho = w + 1; rest with known bit length -> w - len + 1
    out = df.selectExpr(
        "cast(CASE WHEN 0 = 0 THEN 55 ELSE 0 END as bigint) AS zero_case",
        "cast(54 - length(bin(1)) + 1 as bigint) AS one_case",
        "cast(54 - length(bin(255)) + 1 as bigint) AS byte_case",
    ).first()
    assert out.zero_case == 55
    assert out.one_case == 54      # bin(1)='1' -> 53 leading zeros + 1
    assert out.byte_case == 47     # bin(255) has 8 bits

    bad = pytest.raises(ValueError, sketches.hll_registers, df, "v", m=48)
    assert "power of two" in str(bad.value)


def test_cm_merge_law(spark, events):
    """Count-min of a union == element-wise SUM of the parts' counters."""
    expr = "cast(event_id as string)"
    whole = {(r.d, r.col): r.cnt
             for r in sketches.cm_registers(events, expr).collect()}
    a = {(r.d, r.col): r.cnt
         for r in sketches.cm_registers(
             events.where("event_id % 2 = 0"), expr).collect()}
    b = {(r.d, r.col): r.cnt
         for r in sketches.cm_registers(
             events.where("event_id % 2 = 1"), expr).collect()}
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == whole
    # total mass per row d == number of input rows
    n = events.count()
    for d in range(4):
        assert sum(c for (dd, _), c in whole.items() if dd == d) == n


def test_cm_point_estimate_never_underestimates(spark, events):
    """The count-min guarantee: estimate >= true multiplicity, and exact
    for values whose cells never collide."""
    import hashlib

    regs = [(r.d, r.col, r.cnt)
            for r in sketches.cm_registers(
                events, "cast(user_id as string)").collect()]
    true = {str(r[0]): r[1]
            for r in events.groupBy("user_id").count().collect()}
    checked = 0
    for uid, cnt in sorted(true.items())[:50]:
        h = int(hashlib.md5(uid.encode()).hexdigest()[:15], 16)
        est = sketches.estimate_count(regs, h)
        assert est >= cnt
        checked += 1
    assert checked > 0


def test_cm_rejects_bad_shape(spark, events):
    with pytest.raises(ValueError):
        sketches.cm_registers(events, "cast(event_id as string)", depth=0)
    with pytest.raises(ValueError):
        sketches.cm_registers(events, "cast(event_id as string)", width=1)
