"""As-of join (operators/asof.py) vs a pure-python reference."""

import datetime as dt

from gstored_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(5)), (2, 10, _t(20)), (3, 10, _t(2)), (4, 99, _t(30))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _t(5), 1.0), (10, _t(10), 2.0), (10, _t(19), 3.0)],
        "user_id int, ts timestamp, value double",
    )
    out = asof_join(left, right, key="user_id", ts="ts", value_cols=["value"])
    got = {r["event_id"]: (r["ts_asof"], r["value_asof"]) for r in out.collect()}
    assert got[1] == (_t(5), 1.0)   # equal ts matches (<= semantics)
    assert got[2] == (_t(19), 3.0)  # greatest prior, not just any prior
    assert got[3] == (None, None)   # no prior right -> NULLs (left join)
    assert got[4] == (None, None)   # key with no right rows at all
    assert out.count() == 4         # every left row survives


def test_asof_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    L = [(i, rng.randrange(3), _t(rng.randrange(60))) for i in range(120)]
    R = [(rng.randrange(3), _t(m), float(m)) for m in range(0, 60, 7)]
    left = spark.createDataFrame(L, "event_id int, user_id int, ts timestamp")
    right = spark.createDataFrame(R, "user_id int, ts timestamp, value double")
    out = asof_join(left, right, key="user_id", ts="ts", value_cols=["value"])
    got = {r["event_id"]: r["value_asof"] for r in out.collect()}
    for i, u, ts in L:
        prior = [v for (ru, rts, v) in R if ru == u and rts <= ts]
        best = max(prior, default=None, key=lambda v: v)  # value == minute
        assert got[i] == best, (i, u, ts)


def test_null_payload_in_matched_row_stays_null(spark):
    """All _asof columns must come from the SAME matched right row: a NULL
    payload in the newest prior right row must NOT be back-filled from an
    older right row."""
    left = spark.createDataFrame(
        [(1, 10, _t(30))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _t(5), 1.0, "a"), (10, _t(20), None, "b")],
        "user_id int, ts timestamp, value double, tag string",
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", value_cols=["value", "tag"]
    )
    row = out.collect()[0]
    assert row["ts_asof"] == _t(20)
    assert row["tag_asof"] == "b"
    assert row["value_asof"] is None  # from the matched row, not _t(5)'s 1.0
