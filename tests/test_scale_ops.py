"""Scale-path operators: salted joins, two-phase distinct, bucketed
co-located joins, stateful streaming."""

import random

import pytest
from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import skew


def test_salted_join_matches_plain_join(spark):
    rng = random.Random(11)
    # heavily skewed: 80% of fact rows share one key
    fact = spark.createDataFrame(
        [(i, "HOT" if rng.random() < 0.8 else rng.choice("ABCDE")) for i in range(2000)],
        "id long, k string",
    )
    dim = spark.createDataFrame(
        [(k, f"v_{k}") for k in ["HOT", "A", "B", "C", "D", "E"]], "k string, payload string"
    )
    plain = {(r["id"], r["payload"]) for r in fact.join(dim, "k").collect()}
    salted = {
        (r["id"], r["payload"])
        for r in skew.salted_join(fact, dim, "k", num_salts=8, salt_source="id").collect()
    }
    assert salted == plain


def test_two_phase_count_distinct(spark):
    rng = random.Random(12)
    df = spark.createDataFrame(
        [(rng.choice("XY"), rng.randint(0, 30)) for _ in range(500)], "g string, v int"
    )
    got = {
        r["g"]: r["n_distinct_v"]
        for r in skew.two_phase_count_distinct(df, "g", "v").collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed on the join key → the join
    plan has no shuffle Exchange for either side."""
    # note: warehouse dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored); dropped at the end
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.sources.readers import (
        write_bucketed_table,
    )

    for name in ["b_lineitem", "b_orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(
        li, "b_lineitem", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"]
    )
    j = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = j._jdf.queryExecution().toString()
    n = j.count()
    assert n == li.count()
    assert "Exchange hashpartitioning" not in plan
    for name in ["b_lineitem", "b_orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stateful_user_profiles_stream(spark, sf_dir, tmp_path):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.streaming import (
        jobs,
        stateful,
    )

    src = tmp_path / "ev"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df.repartition(2).write.mode("overwrite").parquet(str(src))

    stream = jobs.read_event_stream(spark, str(src))
    got = jobs.run_available_now(
        stateful.user_profiles(stream), str(tmp_path / "cp"), output_mode="update"
    )
    # single availableNow batch → one running-profile row per user,
    # totals equal to the batch aggregate
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    latest = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in got}
    assert latest == want
    assert all(not r["closed"] for r in got)


def test_pii_redaction_kinds_and_counts(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    rows = [
        (1, "contact bob.smith+x@ex-ample.co.uk or 10.0.255.3 id 123456789"),
        (2, "no pii here, just 12345 and v1.2.3.4.5"),
        (3, "two mails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in textstats.with_pii_redaction(df).collect()
    }
    assert got[1]["redacted"] == "contact <EMAIL> or <IP> id <NUM>"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_longnum"]) == (1, 1, 1)
    # dotted version string is 5 octet-ish groups: the \b-anchored ipv4
    # pattern still matches its leading 4 groups -- documented behavior
    assert got[2]["n_email"] == 0 and got[2]["n_longnum"] == 0
    assert got[3]["n_email"] == 2 and got[3]["redacted"] == "two mails <EMAIL> <EMAIL>"


def test_unigram_logprob_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c"), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in textstats.unigram_logprob(df, "doc_id", "text").collect()
    }
    # corpus: a=2, b=1, c=1, total=4
    exp1 = (2 * math.log(0.5) + math.log(0.25)) / 3
    assert got[1] == (3, round(exp1, 4))
    assert got[2] == (1, round(math.log(0.25), 4))
    assert 3 not in got  # empty doc has no tokens -> absent, both engines


def test_bigram_logprob_hand_computed_and_orders_scrambled_below(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    # 3 pattern docs share every bigram; the scrambled doc has the same
    # UNIGRAMS but one-off bigrams -> must score strictly lower
    pattern = "the cat sat on the mat"
    df = spark.createDataFrame(
        [(1, pattern), (2, pattern), (3, pattern),
         (4, "mat the on cat the sat"),
         (5, "x")],  # single token: no bigrams
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in textstats.bigram_logprob(df, "doc_id", "text", lam=0.7).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] == got[2] == got[3]
    assert got[1][0] == 5 and got[4][0] == 5
    assert got[4][1] < got[1][1]
    assert got[5] == (0, None)

    # hand-check one term of doc 1: bigram ('the','cat') has c=3,
    # context 'the' appears as v in 3*2=6 bigrams; unigram 'cat' c=4
    # of T=25 tokens (4 docs * 6 + 1)
    # full replay:
    docs = [pattern.split()] * 3 + ["mat the on cat the sat".split(), ["x"]]
    from collections import Counter
    bg = Counter()
    uni = Counter()
    for d in docs:
        uni.update(d)
        bg.update(zip(d, d[1:]))
    cv = Counter()
    for (v, _w), c in bg.items():
        cv[v] += c
    T = sum(uni.values())
    terms = [
        math.log(0.7 * (bg[(v, w)] / cv[v]) + 0.3 * (uni[w] / T))
        for v, w in zip(docs[0], docs[0][1:])
    ]
    assert got[1][1] == round(sum(terms) / len(terms), 4)


def test_reconcile_child_sums_flags_and_missing_children(spark):
    from pyspark.sql import functions as FF
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    parent = spark.createDataFrame(
        [(1, 30.0), (2, 10.0), (3, 5.0)], "k long, total double"
    )
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 9.0)], "k long, v double"
    )
    got = {
        r["k"]: (r["child_total"], r["diff"], r["reconciled"])
        for r in quality.reconcile_child_sums(
            parent, child, "k", "total", FF.sum("v"), tol=0.01
        ).collect()
    }
    assert got[1] == (30.0, 0.0, True)        # exact match
    assert got[2] == (9.0, 1.0, False)        # off by 1
    assert got[3] == (0.0, 5.0, False)        # no children -> vs 0, flagged


def test_sentence_chunks_respects_boundaries(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import packing

    # sentences of 3, 4, 2, 5 tokens; budget 6:
    # offsets 0, 3, 7, 9 -> chunks 0, 0, 1, 1
    text = "one two three. four five six seven! eight nine? ten eleven twelve thirteen fourteen"
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_sentences"], r["n_tokens"], r["chunk_text"])
        for r in packing.sentence_chunks(df, "doc_id", "text", budget=6).collect()
    }
    assert got == {
        (1, 0): (2, 7, "one two three. four five six seven!"),
        (1, 1): (2, 7, "eight nine? ten eleven twelve thirteen fourteen"),
    }
    # no mid-sentence cut: every chunk_text is whole sentences
    # empty doc produces no rows
    assert not any(k[0] == 2 for k in got)


def test_pack_documents_offset_rule(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import packing

    # single bucket -> pure offset packing, hand-checkable
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([600, 600, 600, 600, 100, 2500, 10])],
        "doc_id long, n_tokens long",
    )
    packed = packing.pack_documents(df, "doc_id", "n_tokens", budget=1000, num_buckets=1)
    got = {r["doc_id"]: r["chunk_id"] for r in packed.collect()}
    # priors: 0,600,1200,1800,2400,2500,5000 -> chunks 0,0,1,1,2,2,5
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 5}
    stats = {
        r["chunk_id"]: (r["n_docs"], r["chunk_tokens"])
        for r in packing.chunk_stats(packed, "n_tokens").collect()
    }
    assert stats == {0: (2, 1200), 1: (2, 1200), 2: (2, 2600), 5: (1, 10)}


def test_pack_documents_bucket_stability(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import packing

    df = spark.range(0, 500).selectExpr("id AS doc_id", "id % 7 * 100 AS n_tokens")
    a = packing.pack_documents(df, "doc_id", "n_tokens", 1000, num_buckets=8)
    b = packing.pack_documents(
        df.repartition(13), "doc_id", "n_tokens", 1000, num_buckets=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select("bucket").distinct().count() == 8


def test_strip_boilerplate_lines(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import dedup

    rows = [
        (1, "Welcome!\nreal content one\nCookie notice"),
        (2, "welcome\nreal content two\ncookie NOTICE."),
        (3, "unique doc\nCookie notice"),
        (4, "a\nb\nc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cleaned"], r["n_lines_kept"])
        for r in dedup.strip_boilerplate_lines(df, "doc_id", "text").collect()
    }
    # normalized 'welcome'/'cookie notice' hit 2 and 3 docs -> stripped;
    # line order inside each doc is preserved
    assert got[1] == ("real content one", 1)
    assert got[2] == ("real content two", 1)
    assert got[3] == ("unique doc", 1)
    assert got[4] == ("a\nb\nc", 3)


def test_violation_counts_and_fk_orphans(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 0.0)], "id long, v double"
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in quality.violation_counts(
            df,
            {
                "neg_v": F.col("v") < 0,
                "null_v": F.col("v").isNull(),
                "zero_v": F.col("v") == 0,
            },
        ).collect()
    }
    # NULL predicate results don't count as violations (count(when))
    assert got == {"neg_v": 1, "null_v": 1, "zero_v": 1}

    child = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, None)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk int")
    n = quality.fk_orphan_count(child, "fk", parent, "pk").first()["n_violations"]
    assert n == 1  # only fk=99; NULL fk is not an orphan


def test_sql_surface_over_registered_views(spark, sf_dir):
    """The full table set is queryable through plain spark.sql — the
    engine's SQL API.  SQL and DataFrame plans must agree exactly."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark import schemas

    schemas.register_temp_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).collect()
    want = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # events view exposes a real timestamp column (tz flavor depends on how
    # the driver generated the parquet)
    assert dict(spark.table("events").dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert spark.sql("SELECT max(ts) FROM events").first()[0] is not None


def test_transform_with_state_profiles_match_apply_in_pandas(spark, sf_dir, tmp_path):
    """The Spark 4 transformWithStateInPandas twin produces the same
    per-user profiles as the applyInPandasWithState operator."""
    pytest.importorskip("google.protobuf.descriptor")
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.streaming import (
        jobs,
        stateful,
    )

    src = tmp_path / "ev"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df.repartition(2).write.mode("overwrite").parquet(str(src))

    stream = jobs.read_event_stream(spark, str(src))
    got = jobs.run_available_now(
        stateful.user_profiles_tws(stream), str(tmp_path / "cp"), output_mode="update"
    )
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    latest = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in got}
    assert latest == want


def test_transform_with_state_clear_error_without_protobuf(spark):
    try:
        from google.protobuf import descriptor  # noqa: F401

        pytest.skip("protobuf present; gating path not reachable")
    except ImportError:
        pass
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.streaming import (
        stateful,
    )

    df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    with pytest.raises(ImportError, match="protobuf"):
        stateful.user_profiles_tws(df)


def test_bm25_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in textstats.bm25_scores(
            df, "doc_id", "text", ["apple", "cherry"], k1=1.2, b=0.75
        ).collect()
    }
    n, avgdl = 3, 8 / 3

    def bm25(tf, dfreq, dl):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert got[1] == (1, round(bm25(2, 1, 3), 4))
    assert got[2] == (1, round(bm25(1, 2, 2), 4))
    assert got[3] == (1, round(bm25(3, 2, 3), 4))
    # rarer term (apple, df=1) outweighs common term at equal tf/dl
    assert got[1][1] > got[3][1] * 0  # sanity: scores positive
    assert bm25(1, 1, 3) > bm25(1, 2, 3)


def test_quality_percentile_gate_counts(spark):
    """Dynamic percentile threshold: with scores 1..8 (distinct), the
    25th percentile keeps the top ~75%."""
    from pyspark.sql import functions as FF

    df = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(1, 9)], "id int, source string, q double"
    )
    thr = df.agg(FF.percentile(FF.col("q"), FF.lit(0.25)).alias("t"))
    out = (
        df.crossJoin(FF.broadcast(thr))
        .groupBy("source")
        .agg(FF.count(FF.when(FF.col("q") >= FF.col("t"), 1)).alias("n_kept"))
        .collect()[0]
    )
    # percentile(0.25) of 1..8 = 2.75 -> keeps 3..8 = 6 rows
    assert out["n_kept"] == 6


def test_k_anonymize_folds_rare_combos(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    rows = [("en", "web")] * 5 + [("en", "rare")] * 2 + [("fr", "web")] * 1 + [(None, "web")] * 1
    df = spark.createDataFrame(
        [(i, l, s) for i, (l, s) in enumerate(rows)], "id int, lang string, source string"
    )
    out = quality.k_anonymize(df, ["lang", "source"], k=3)
    by = {}
    for r in out.collect():
        by[(r["lang"], r["source"])] = by.get((r["lang"], r["source"]), 0) + 1
    # big group survives; rare combos INCLUDING the NULL-lang one fold
    # (null-safe membership join — a plain equi join would leak it)
    assert by == {("en", "web"): 5, ("OTHER", "OTHER"): 4}
    # non-quasi columns untouched
    assert sorted(r["id"] for r in out.collect()) == list(range(9))


def test_distribution_drift_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    # baseline 'a': values 0,0,10,10 -> bins {0:2, 1:2} (2 bins, width 5)
    # group 'b': values 0,10,10,10 -> bins {0:1, 1:3}
    rows = [("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 10.0),
            ("b", 0.0), ("b", 10.0), ("b", 10.0), ("b", 10.0),
            ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in quality.distribution_drift(
            df, "g", "v", baseline="a", n_bins=2, alpha=0.5
        ).collect()
    }
    # NULL excluded from n
    assert out["a"]["n"] == 4 and out["b"]["n"] == 4
    # baseline drifts from itself by exactly 0
    assert out["a"]["psi"] == 0.0 and out["a"]["jsd"] == 0.0
    # hand replay: smoothed p = (c + .5) / (4 + 1)
    q = [(2 + 0.5) / 5, (2 + 0.5) / 5]
    p = [(1 + 0.5) / 5, (3 + 0.5) / 5]
    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    jsd = 0.5 * sum(pi * math.log(pi / ((pi + qi) / 2)) for pi, qi in zip(p, q)) \
        + 0.5 * sum(qi * math.log(qi / ((pi + qi) / 2)) for pi, qi in zip(p, q))
    assert out["b"]["psi"] == round(psi, 4)
    assert out["b"]["jsd"] == round(jsd, 4)
    # jsd is bounded by ln 2
    assert 0.0 <= out["b"]["jsd"] <= math.log(2.0)


def test_distribution_drift_degenerate_and_empty_bins(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    # constant column: everything lands in bin 0.  Equal group sizes ->
    # identical smoothed proportions -> exactly zero drift (empty bins
    # are smoothed, not dropped; with unequal sizes the add-alpha
    # smoothing itself contributes a small positive psi by design)
    df = spark.createDataFrame(
        [("a", 7.0)] * 3 + [("b", 7.0)] * 3, "g string, v double"
    )
    out = {r["g"]: r for r in quality.distribution_drift(
        df, "g", "v", baseline="a", n_bins=4).collect()}
    assert out["a"]["psi"] == 0.0
    assert out["b"]["psi"] == 0.0 and out["b"]["jsd"] == 0.0


def test_bpe_merge_steps_sennrich_example(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    # the classic BPE paper vocabulary: low:5 lower:2 newest:6 widest:3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "id int, text string")
    out = [tuple(r) for r in textstats.bpe_merge_steps(df, "text", n_merges=3)
           .orderBy("step").collect()]
    # step1: 'e s' and 's t' tie at 9; lexicographic tiebreak -> 'e s'
    # step2: 'es t' = 9; step3: 'l o' and 'o w' tie at 7 -> 'l o'
    assert out == [
        (1, "e s", "es", 9),
        (2, "es t", "est", 9),
        (3, "l o", "lo", 7),
    ]
    spark.catalog.clearCache()


def test_bpe_merge_handles_repeated_symbols(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    # 'aaaa': pairs (a,a) x3 (overlapping counts, like reference BPE);
    # merge applies left-to-right non-overlapping: a a a a -> aa aa,
    # so step2's top pair is (aa, aa)
    df = spark.createDataFrame([(0, "aaaa bb")], "id int, text string")
    out = [tuple(r) for r in textstats.bpe_merge_steps(df, "text", n_merges=2)
           .orderBy("step").collect()]
    assert out[0] == (1, "a a", "aa", 3)
    assert out[1] == (2, "aa aa", "aaaa", 1)
    spark.catalog.clearCache()


def test_feature_scale_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import outliers

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0),
         ("h", 5.0), ("h", 5.0)],
        "k string, v double",
    )
    out = outliers.feature_scale(df, ["k"], "v", round_to=4)
    got = {(r["k"], r["v"]): (r["v_z"], r["v_robust"], r["v_pct"])
           for r in out.collect()}
    sd = math.sqrt(5.0 / 3.0)  # sample stddev of 1..4
    assert got[("g", 1.0)] == (round((1 - 2.5) / sd, 4), -1.0, 0.0)
    assert got[("g", 4.0)] == (round((4 - 2.5) / sd, 4), 1.0, 1.0)
    assert got[("g", 2.0)][2] == round(1 / 3, 4)
    # degenerate group: stddev 0 and IQR 0 -> NULL scores, pct defined
    assert got[("h", 5.0)] == (None, None, 0.0)


def test_validate_split_reasons_and_partition(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, -1.0, "x"), (3, 50.0, None), (4, -2.0, None)],
        "id long, v double, s string",
    )
    out = quality.validate_split(
        df,
        {
            "negative_v": F.col("v") < 0,
            "v_too_big": F.col("v") > 10,
            "null_s": F.col("s").isNull(),
        },
    )
    got = {r["id"]: list(r["failed_checks"]) for r in out.collect()}
    assert got == {
        1: [],
        2: ["negative_v"],
        3: ["v_too_big", "null_s"],
        4: ["negative_v", "null_s"],
    }
    # one frame partitions cleanly into the two sinks
    clean = out.filter(F.size("failed_checks") == 0)
    quarantine = out.filter(F.size("failed_checks") > 0)
    assert clean.count() + quarantine.count() == df.count()


def test_guarded_m1_join_passes_unique_and_raises_on_dup(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, x string")
    dim_ok = spark.createDataFrame([(1, "p"), (2, "q")], "k long, payload string")
    out = quality.guarded_m1_join(left, dim_ok, "k").orderBy("k").collect()
    assert [(r["k"], r["payload"]) for r in out] == [(1, "p"), (2, "q"), (3, None)]

    dim_dup = spark.createDataFrame(
        [(1, "p"), (1, "p2"), (2, "q")], "k long, payload string"
    )
    with pytest.raises(Exception) as ei:
        quality.guarded_m1_join(left, dim_dup, "k").collect()
    assert "not unique" in str(ei.value)


def test_distribution_drift_quantile_strategy(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    rows = [("a", float(i)) for i in range(1, 101)]
    rows += [("same", float(i)) for i in range(1, 101)]
    rows += [("shift", float(i)) for i in range(51, 151)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in quality.distribution_drift(
        df, "g", "v", baseline="a", n_bins=4, strategy="quantile"
    ).collect()}
    # identical distribution -> zero drift; baseline quartile-bins itself
    assert out["a"]["psi"] == 0.0 and out["same"]["psi"] == 0.0
    # a half-range shift must register clearly
    assert out["shift"]["psi"] > 0.5 and out["shift"]["jsd"] > 0.1
    assert out["shift"]["n"] == 100


def test_centroid_drift_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import similarity

    rows = [
        ("g1", "a", [1.0, 0.0]), ("g1", "a", [1.0, 0.0]), ("g1", "b", [0.0, 1.0]),
        ("g2", "a", [1.0, 1.0]), ("g2", "b", [2.0, 2.0]),
        ("g3", "a", [1.0, 0.0]),  # missing slice b -> dropped
    ]
    df = spark.createDataFrame(rows, "g string, s string, embedding array<double>")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["cosine"], r["l2"])
        for r in similarity.centroid_drift(
            df, "embedding", "g", "s", "a", "b"
        ).collect()
    }
    # g1: centroids (1,0) vs (0,1): orthogonal
    assert got["g1"] == (2, 1, 0.0, round(math.sqrt(2.0), 6))
    # g2: parallel centroids, distance sqrt(2)
    assert got["g2"] == (1, 1, 1.0, round(math.sqrt(2.0), 6))
    assert "g3" not in got


def test_random_projection_preserves_relative_distances(spark):
    """JL sanity: the projection is deterministic, linear, and keeps
    near pairs nearer than far pairs (statistically, checked on a
    crafted triple where the gap is large)."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import similarity

    import random as _r
    rng = _r.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + rng.uniform(-0.01, 0.01) for x in base]
    far = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: [r[f"rp_{i}"] for i in range(16)]
           for r in similarity.random_projection(
               df, "vec_id", "embedding", out_dim=16, dim=64).collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assert d2(out[0], out[1]) < d2(out[0], out[2]) / 10
    # deterministic across calls
    again = {r["vec_id"]: [r[f"rp_{i}"] for i in range(16)]
             for r in similarity.random_projection(
                 df, "vec_id", "embedding", out_dim=16, dim=64).collect()}
    assert again == out


def test_key_skew_report_flags_hot_key(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import skew

    rows = [("HOT",)] * 80 + [(k,) for k in "abcdefghij" for _ in range(2)]
    df = spark.createDataFrame(rows, "k string")
    got = skew.key_skew_report(df, "k", top_k=3).collect()
    assert got[0]["key"] == "HOT" and got[0]["n"] == 80
    assert got[0]["total_rows"] == 100 and got[0]["n_keys"] == 11
    assert abs(got[0]["share"] - 0.8) < 1e-12
    # 11 keys uniform would each hold 1/11 -> HOT is 8.8x uniform
    assert abs(got[0]["x_uniform"] - 8.8) < 1e-9
    # deterministic tie order among the 2-row keys
    assert [r["key"] for r in got[1:]] == ["a", "b"]


def test_categorical_drift_hand_computed(spark):
    import math

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    rows = [("a", "x")] * 3 + [("a", "y")] * 1 + \
           [("b", "x")] * 1 + [("b", "y")] * 3 + [("b", None)]
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in quality.categorical_drift(
        df, "g", "c", baseline="a").collect()}
    assert out["a"]["psi"] == 0.0 and out["a"]["n"] == 4
    # NULL categories excluded
    assert out["b"]["n"] == 4
    q = [(3 + 0.5) / 5, (1 + 0.5) / 5]
    p = [(1 + 0.5) / 5, (3 + 0.5) / 5]
    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    assert out["b"]["psi"] == round(psi, 4)


def test_feature_scale_keeps_null_group_rows(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import outliers

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0)],
        "k string, v double",
    )
    out = outliers.feature_scale(df, ["k"], "v", round_to=4)
    # row-preserving: the NULL group scales against its own stats
    assert out.count() == 4
    nulls = {r["v"]: r["v_pct"] for r in out.filter("k IS NULL").collect()}
    assert nulls == {5.0: 0.0, 7.0: 1.0}


def test_drift_raises_loudly_on_missing_baseline(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import quality

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, v double"
    )
    with pytest.raises(Exception) as ei:
        quality.distribution_drift(df, "g", "v", baseline="TYPO").collect()
    assert "baseline" in str(ei.value)
    with pytest.raises(Exception):
        quality.categorical_drift(df, "g", "g", baseline="TYPO").collect()


def test_bpe_merge_steps_pairless_corpus_returns_no_merges(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import textstats

    # single-char words only: no adjacent symbol pairs exist anywhere
    df = spark.createDataFrame([(0, "a b c a")], "id int, text string")
    out = textstats.bpe_merge_steps(df, "text", n_merges=2).collect()
    assert out == []
    spark.catalog.clearCache()
