"""Event-log analytics queries (funnel, retention cohorts): the ordering
semantics checked on a closed-form event log. Cross-engine value parity is
covered by the oracle gate (event_funnel / retention_cohorts)."""

import datetime as dt
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    """A crafted events.parquet exercising every funnel/retention edge:
    full conversion, pre-step-only activity, missing middle step, and an
    equal-timestamp pair (strictly-after must exclude it)."""
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def at(day, sec):
        return t0 + dt.timedelta(days=day, seconds=sec)

    rows = [
        # user 1: signup -> view -> click -> purchase, all in order
        (1, "signup", at(0, 0)),
        (1, "view", at(0, 10)),
        (1, "click", at(0, 20)),
        (1, "purchase", at(0, 30)),
        # user 2: view BEFORE signup only -> stops at signup
        (2, "view", at(0, 0)),
        (2, "signup", at(0, 5)),
        # user 3: signup -> view, click missing -> stops at view
        (3, "signup", at(0, 0)),
        (3, "view", at(0, 7)),
        (3, "purchase", at(0, 9)),
        # user 4: view at the SAME instant as signup -> strict > excludes
        (4, "signup", at(0, 3)),
        (4, "view", at(0, 3)),
        # retention shape: user 1 active again on day 2, user 2 on day 1,
        # user 5 cohorted a day later
        (1, "view", at(2, 0)),
        (2, "click", at(1, 0)),
        (5, "signup", at(1, 0)),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[2] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("tiny_events")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_event_funnel_strictly_after_semantics(spark, tiny_events_dir):
    import __spark_entry__ as entry

    got = {
        r.step: (r.n_users, r.conv_from_prev)
        for r in entry.q_event_funnel(spark, tiny_events_dir).collect()
    }
    # 5 signups; only user 1 and 3 have a view strictly after signup
    # (user 2's view precedes it, user 4's ties); only user 1 continues
    assert got["signup"] == (5, 1.0)
    assert got["view"] == (2, 0.4)
    assert got["click"] == (1, 0.5)
    assert got["purchase"] == (1, 1.0)


def test_retention_cohorts_day_offsets(spark, tiny_events_dir):
    import __spark_entry__ as entry

    got = {
        (r.cohort_day, r.offset_days): (
            r.n_active,
            r.cohort_users,
            r.retention,
        )
        for r in entry.q_retention_cohorts(spark, tiny_events_dir).collect()
    }
    # day-0 cohort = users 1-4 (all active on their signup day); user 2
    # returns on day 1, user 1 on day 2; user 5 forms the day-1 cohort
    assert got[("2024-03-01", 0)] == (4, 4, 1.0)
    assert got[("2024-03-01", 1)] == (1, 4, 0.25)
    assert got[("2024-03-01", 2)] == (1, 4, 0.25)
    assert got[("2024-03-02", 0)] == (1, 1, 1.0)
    assert len(got) == 4


def test_journey_transitions_order_and_normalization(spark, tmp_path):
    import __spark_entry__ as entry

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b (same-ts pair ordered by
        # event_id: the (ts, event_id) tiebreak is part of the contract)
        (0, 1, "a", t0),
        (1, 1, "b", t0 + dt.timedelta(seconds=1)),
        (2, 1, "a", t0 + dt.timedelta(seconds=2)),
        (3, 2, "a", t0 + dt.timedelta(seconds=5)),
        (4, 2, "b", t0 + dt.timedelta(seconds=5)),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": pd.Series([r[3] for r in rows], dtype="datetime64[us]"),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    df.to_parquet(str(d / "events.parquet"), index=False)
    got = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in entry.q_journey_transitions(spark, str(d)).collect()
    }
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 2


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    out = entry.q_weighted_sample(spark, sf_dir)
    # exactly min(50, n_lang) docs per language, ranks contiguous from 1
    per = out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert all(r.n == r.mx and r.n <= 50 for r in per.collect())
    # length-weighted draw: the sampled mean length must exceed the corpus
    # mean (P(select) ~ w), by a wide deterministic margin on this corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sel = out.agg(F.avg("w")).collect()[0][0]
    assert mean_sel > mean_all
