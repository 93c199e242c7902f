"""Unit tests for the time-series operators (resample/gap-fill, deltas,
SCD2) on hand-computed fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
    timeseries,
)


def _ts_df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_resample_gapfill_forward_fills_gaps(spark):
    df = _ts_df(
        spark,
        [
            ("a", "2024-01-01 00:00:30", 1.0),
            ("a", "2024-01-01 00:00:45", 2.0),
            # gap minute 00:01
            ("a", "2024-01-01 00:02:10", 5.0),
            ("b", "2024-01-01 00:05:00", 7.0),
        ],
    )
    out = timeseries.resample_gapfill(df, "key", "ts", "v", 60, agg="sum")
    got = {
        (r["key"], r["bucket_ts"].strftime("%H:%M"), r["value"], r["is_gap"])
        for r in out.collect()
    }
    assert got == {
        ("a", "00:00", 3.0, False),
        ("a", "00:01", 3.0, True),  # filled from previous bucket
        ("a", "00:02", 5.0, False),
        ("b", "00:05", 7.0, False),  # single-bucket key: no grid padding
    }


def test_event_deltas_and_spikes(spark):
    df = _ts_df(
        spark,
        [
            ("u", "2024-01-01 00:00:00", 10.0),
            ("u", "2024-01-01 00:01:00", 12.0),
            ("u", "2024-01-01 00:03:00", 30.0),  # > 2x prev -> spike
        ],
    )
    out = timeseries.event_deltas(df, "key", "ts", "v", spike_factor=2.0)
    rows = sorted(out.collect(), key=lambda r: r["ts"])
    assert [r["delta"] for r in rows] == [None, 2.0, 18.0]
    assert [r["gap_seconds"] for r in rows] == [None, 60, 120]
    assert [r["is_spike"] for r in rows] == [False, False, True]


def test_scd2_collapses_runs_and_marks_current(spark):
    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00", "x"),
            ("u", "2024-01-02 00:00:00", "x"),  # same attr: merges into run 1
            ("u", "2024-01-03 00:00:00", "y"),
            ("u", "2024-01-04 00:00:00", "x"),  # back to x: NEW interval
        ],
        "key string, ts string, attr string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = timeseries.scd2_from_events(df, "key", "ts", ["attr"])
    rows = sorted(out.collect(), key=lambda r: r["valid_from"])
    assert [(r["attr"], r["valid_from"].day, r["is_current"]) for r in rows] == [
        ("x", 1, False),
        ("y", 3, False),
        ("x", 4, True),
    ]
    # intervals tile: each valid_to equals the next valid_from
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None


def test_tfidf_top_terms_scores(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        textstats,
    )
    import math

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = textstats.tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    top = {r["doc_id"]: (r["term"], r["score"]) for r in out}
    # doc 1: apple tf=2 df=1 -> 2*ln(3)
    assert top[1] == ("apple", round(2 * math.log(3), 4))
    # doc 2: banana/cherry both tf=1 df=2 -> equal score; tie-break term asc
    assert top[2] == ("banana", round(math.log(3 / 2), 4))
    assert top[3][0] == "cherry"


def test_rolling_stats_frames(spark):
    df = _ts_df(
        spark,
        [
            ("u", "2024-01-01 00:00:00", 1.0),
            ("u", "2024-01-01 00:30:00", 2.0),
            ("u", "2024-01-01 01:10:00", 4.0),  # 00:00 falls out of 1h range
        ],
    )
    out = timeseries.rolling_stats(
        df, "key", "ts", "v", n_rows=2, range_seconds=3600
    )
    rows = sorted(out.collect(), key=lambda r: r["ts"])
    assert [r["avg_2r"] for r in rows] == [1.0, 1.5, 3.0]
    assert [r["range_sum"] for r in rows] == [1.0, 3.0, 6.0]
    assert [r["range_n"] for r in rows] == [1, 2, 2]


def test_decontaminate_flags_overlap(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        dedup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "one two three four five six"),          # clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = dedup.decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    assert {(r["doc_id"], r["n_overlapping"]) for r in out} == {(1, 1)}


def test_token_entropy_hand_computed(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        textstats,
    )
    import math

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "x x x x"), (3, "p q r s")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"])
        for r in textstats.token_entropy(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, round(math.log(2), 4))   # uniform over 2 tokens
    assert got[2] == (4, 0.0)                     # degenerate
    assert got[3] == (4, round(math.log(4), 4))   # uniform over 4


def test_iqr_outliers_fences_and_counts(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        outliers,
    )

    # group g: values 1..9 plus one extreme; Q1=2.5 Q3=7.5 IQR=5
    # fences: -5.0 / 15.0 -> only 100.0 is outside
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = outliers.iqr_outliers(df, ["k"], "v", k=1.5).collect()[0]
    assert out["n"] == 10 and out["n_outliers"] == 1
    assert out["lo_fence"] < 1.0 and out["hi_fence"] < 100.0


def test_incremental_dedup_history_and_batch(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        dedup,
    )

    hist = spark.createDataFrame(
        [(1, "seen before")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "Seen  BEFORE"),   # dup of history (normalization)
            (11, "fresh content"),
            (12, "fresh content"),  # in-batch dup: min id wins
            (13, "also new"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]
        for r in dedup.incremental_dedup(batch, hist, "doc_id", "text").collect()
    }
    assert got == {11, 13}


def test_time_weighted_avg_hand_computed(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries
    from pyspark.sql import functions as F

    # value 10 held 10s, value 20 held 30s, last obs contributes nothing:
    # twap = (10*10 + 20*30) / 40 = 17.5
    df = spark.createDataFrame(
        [("k", 0, 10.0), ("k", 10, 20.0), ("k", 40, 99.0)],
        "k string, t long, v double",
    )
    r = timeseries.time_weighted_avg(df, "k", "t", "v").collect()[0]
    assert r["twap"] == 17.5 and r["span_s"] == 40 and r["n_obs"] == 3


def test_activity_streaks_islands(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries

    # days 1,2,3 then 7,8 -> longest 3, active 5; duplicate day rows collapse
    df = spark.createDataFrame(
        [("u", d) for d in [1, 2, 3, 7, 8, 8]], "k string, day long"
    )
    r = timeseries.activity_streaks(df, "k", "day").collect()[0]
    assert r["longest_streak"] == 3 and r["n_active_days"] == 5


def test_rolling_median_interpolation_and_warmup(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries

    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "k string, i int, v double",
    )
    out = timeseries.rolling_median(df, "k", ["i"], "v", n_rows=3)
    got = {r["i"]: r["rmed"] for r in out.collect()}
    # warmup: [5] -> 5; [5,1] -> 3 (interpolated); then 3-row medians
    assert got == {0: 5.0, 1: 3.0, 2: 5.0, 3: 3.0, 4: 7.0}


def test_seasonal_anomalies_flags_cell_outlier(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries
    from pyspark.sql import functions as F

    # cell A (Mon 10:00): 19 values of 10 + one 100 -> mean 14.5,
    # sigma ~19.6, |100-14.5| = 85.5 > 3*sigma -> anomaly; the 10s are
    # within. cell B (Mon 11:00): constant -> sigma 0, residual 0, not
    # anomalous (strict >).
    rows = [(i, f"2024-01-01 10:00:{i:02d}", 10.0) for i in range(19)]
    rows.append((19, "2024-01-01 10:00:30", 100.0))
    rows += [(20 + i, f"2024-01-01 11:00:{i:02d}", 7.0) for i in range(4)]
    df = spark.createDataFrame(rows, "event_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        r["event_id"]: (r["is_anomaly"], r["expected"])
        for r in timeseries.seasonal_anomalies(df, "ts", "value").collect()
    }
    assert got[19] == (True, 14.5)
    assert all(not got[i][0] for i in range(19))
    assert all(got[20 + i] == (False, 7.0) for i in range(4))


def test_time_decayed_sum_hand_computed(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries

    # key 'a': value 10 at t_ref, value 10 one half-life earlier
    rows = [("a", 1000, 10.0), ("a", 900, 10.0), ("b", 1000, 4.0)]
    df = spark.createDataFrame(rows, "k string, s long, v double")
    got = {
        r["k"]: (r["n"], r["decayed_sum"], r["decayed_weight"])
        for r in timeseries.time_decayed_sum(df, "k", "s", "v", 100.0).collect()
    }
    assert got["a"] == (2, 15.0, 1.5)   # 10*1 + 10*0.5
    assert got["b"] == (1, 4.0, 1.0)


def test_cusum_flags_matches_sequential_recurrence(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import timeseries

    # series with a level shift at index 5
    xs = [1.0, 0.8, 1.2, 1.0, 0.9, 2.1, 2.2, 2.0, 2.3, 1.9]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, i int, x double"
    )
    got = {
        r["i"]: (r["cusum"], r["alarm"])
        for r in timeseries.cusum_flags(
            df, "k", "i", "x", target=1.0, slack=0.1, threshold=1.5
        ).collect()
    }
    # sequential replay of S_i = max(0, S_{i-1} + x - target - slack)
    s = 0.0
    for i, x in enumerate(xs):
        s = max(0.0, s + (x - 1.0 - 0.1))
        assert got[i] == (round(s, 6), s > 1.5), i
    # the shift is detected (some alarm fires after index 5)
    assert any(a for _, a in [got[i] for i in range(5, 10)])
    assert not any(a for _, a in [got[i] for i in range(0, 5)])


def test_point_in_time_join_semantics(spark):
    """Facts see the dim state valid AT their ts: open-edge inclusive,
    next-change exclusive (leakage-free), NULL before first interval,
    and a legitimately-NULL attribute value still carries."""
    import datetime as dt

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        timeseries,
    )

    t = lambda h: dt.datetime(2024, 1, 1, h)
    intervals = spark.createDataFrame(
        [(1, "bronze", t(10), t(12), False),
         (1, None, t(12), t(14), False),      # NULL attribute state
         (1, "gold", t(14), None, True),
         (2, "silver", t(11), None, True)],
        "user_id long, tier string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(100, 1, t(9)),    # before first interval -> NULL
         (101, 1, t(10)),   # exactly at open edge -> bronze (inclusive)
         (102, 1, t(13)),   # inside the NULL-state interval -> NULL (carried, not skipped)
         (103, 1, t(15)),   # open current interval -> gold
         (104, 2, t(12)),   # other key
         (105, 3, t(12))],  # key with no dim history -> NULL
        "event_id long, user_id long, ts timestamp",
    )
    out = timeseries.point_in_time_join(facts, intervals, "user_id", "ts", ["tier"])
    got = {r["event_id"]: r["tier"] for r in out.collect()}
    assert got == {100: None, 101: "bronze", 102: None, 103: "gold",
                   104: "silver", 105: None}
    assert out.count() == 6  # every fact survives exactly once


def test_point_in_time_matches_interval_join_on_scd2(spark, sf_dir):
    """Window implementation == interval-join semantics on real SCD2
    output (the oracle states the join form; this pins equivalence)."""
    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        timeseries,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = e.filter("event_id % 2 = 0").select("user_id", "ts", "event_type")
    iv = timeseries.scd2_from_events(dim, "user_id", "ts", ["event_type"])
    facts = e.filter("event_id % 2 = 1").select("user_id", "ts", "event_id")
    got = timeseries.point_in_time_join(facts, iv, "user_id", "ts", ["event_type"])
    want = facts.alias("f").join(
        iv.alias("i"),
        (F.col("f.user_id") == F.col("i.user_id"))
        & (F.col("f.ts") >= F.col("i.valid_from"))
        & (F.col("i.valid_to").isNull() | (F.col("f.ts") < F.col("i.valid_to"))),
        "left",
    ).select("f.event_id", F.col("i.event_type"))
    g = {(r["event_id"], r["event_type"]) for r in got.select("event_id", "event_type").collect()}
    w = {(r["event_id"], r["event_type"]) for r in want.collect()}
    assert g == w and len(g) == facts.count()


def test_seasonal_decompose_additivity_and_edges(spark):
    """trend NULL at incomplete edges; interior rows reconstruct
    exactly (value == trend + seasonal + remainder); constant series
    decomposes to zero seasonal and remainder."""
    import datetime as dt

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        timeseries,
    )

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), 100.0) for i in range(21)]
    df = spark.createDataFrame(rows, "d date, v double")
    out = timeseries.seasonal_decompose(df, "d", "v", window=3).collect()
    by_d = {r["d"]: r for r in out}
    assert len(out) == 21
    for i, (d, _) in enumerate(rows):
        r = by_d[d]
        if i < 3 or i >= 18:
            assert r["trend"] is None and r["remainder"] is None
        else:
            assert r["trend"] == 100.0
            assert abs(r["seasonal"]) < 1e-12 and abs(r["remainder"]) < 1e-12
    # weekly signal: +7 on one weekday; seasonal must absorb it
    rows2 = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i),
         100.0 + (7.0 if (dt.date(2024, 1, 1) + dt.timedelta(days=i)).weekday() == 2 else 0.0))
        for i in range(35)
    ]
    df2 = spark.createDataFrame(rows2, "d date, v double")
    out2 = timeseries.seasonal_decompose(df2, "d", "v", window=3).collect()
    mids = [r for r in out2 if r["trend"] is not None]
    for r in mids:
        assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 1e-9
    wed = [r for r in mids if r["d"].weekday() == 2]
    other = [r for r in mids if r["d"].weekday() != 2]
    assert min(r["seasonal"] for r in wed) > max(r["seasonal"] for r in other)
