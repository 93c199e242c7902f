"""Operator-level tests: fuzzy joins, range join, outliers, dedup,
similarity, text stats, multimodal plumbing, history maintenance."""

import pytest
from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
    analysis,
    dedup,
    fuzzy_join,
    history,
    multimodal,
    outliers,
    range_join,
    sessionize as sessionize_ops,
    similarity,
    textstats,
)


# ---------------------------------------------------------------------------
# fuzzy joins
# ---------------------------------------------------------------------------


def test_containment_first_priority(spark):
    fact = spark.createDataFrame(
        [(1, "KOMATSU BUCKET FOR HITACHI"), (2, "ONLY HITACHI"), (3, "NOTHING")],
        "id long, txt string",
    )
    dim = spark.createDataFrame(
        [(1, "KOMATSU"), (2, "HITACHI")], "prio int, needle string"
    )
    out = fuzzy_join.containment_lookup(
        fact, "id", ["txt"], dim, "needle", ["needle"], [F.col("prio")]
    )
    got = {r["id"]: r["needle"] for r in out.collect()}
    assert got == {1: "KOMATSU", 2: "HITACHI", 3: None}


def test_containment_token_strategy_equivalent(spark):
    fact = spark.createDataFrame(
        [(1, "KOMATSU BUCKET FOR HITACHI"), (2, "ONLY HITACHI X"), (3, "NOTHING")],
        "id long, txt string",
    )
    dim = spark.createDataFrame(
        [(1, "KOMATSU"), (2, "HITACHI")], "prio int, needle string"
    )
    a = fuzzy_join.containment_lookup(
        fact, "id", ["txt"], dim, "needle", ["needle"], [F.col("prio")]
    )
    b = fuzzy_join.containment_lookup(
        fact, "id", ["txt"], dim, "needle", ["needle"], [F.col("prio")],
        strategy="token",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_longest_regex_hit(spark):
    df = spark.createDataFrame([("PC200 AND PC2000X", r"PC\d+")], "txt string, pat string")
    got = df.select(
        fuzzy_join.longest_regex_hit(F.col("txt"), F.col("pat")).alias("r")
    ).first()["r"]
    assert got == "PC2000"


def test_starting_point_codes(spark):
    rows = [
        ("PC200", r"PC(\d+)", 0, 20.0),
        ("SY215", r"SY(\d+)", 1, 1.5),     # drop first digit, /10
        ("SK200", r"SK(\d+)", 2, None),    # TBD
        ("320D", r"3(\d{2})", 3, 20.0),    # as-is
        ("QUY550", r"QUY(\d+)", -2, 0.0),  # drop two digits
        ("GR700EX", r"GR(\d+)", -1, 0.0),  # drop one digit → '00'
    ]
    df = spark.createDataFrame(
        [(m, p, c) for m, p, c, _ in rows], "m string, p string, c int"
    )
    got = [
        r["r"]
        for r in df.select(
            fuzzy_join.starting_point_capacity(F.col("m"), F.col("p"), F.col("c")).alias("r")
        ).collect()
    ]
    assert got == [e for _, _, _, e in rows]


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def test_band_join_plain_vs_bucketed(spark):
    left = spark.createDataFrame(
        [(1, "A", 100.0), (2, "A", 200.0), (3, "B", 100.0)], "lid long, k string, lv double"
    )
    right = spark.createDataFrame(
        [(10, "A", 103.0), (11, "A", 210.0), (12, "B", 300.0)], "rid long, k string, rv double"
    )
    plain = range_join.band_join(left, right, ["k"], "lv", "rv", tol=0.05)
    assert sorted((r["lid"], r["rid"]) for r in plain.collect()) == [(1, 10), (2, 11)]
    bucketed = range_join.band_join(left, right, ["k"], "lv", "rv", tol=0.05, bucketed=True)
    assert sorted((r["lid"], r["rid"]) for r in bucketed.collect()) == [(1, 10), (2, 11)]


def test_band_join_bucketed_low_side_adjacency(spark):
    # regression: the band is asymmetric in log space (|ln(1-tol)| >
    # ln(1+tol)); with bucket width ln(1+tol) this in-band low-side pair
    # (ratio 0.9513, buckets 2 apart under the narrow width) was dropped
    left = spark.createDataFrame([(1, "A", 979.3)], "lid long, k string, lv double")
    right = spark.createDataFrame([(10, "A", 931.6)], "rid long, k string, rv double")
    for bucketed in (False, True):
        got = range_join.band_join(
            left, right, ["k"], "lv", "rv", tol=0.05, bucketed=bucketed
        ).count()
        assert got == 1, f"bucketed={bucketed}"


def test_band_join_bucketed_nonpositive_values_agree_with_plain(spark):
    # values <= 0 have no logarithm; the bucketed path routes them to a
    # sentinel bucket so pairs the plain join admits (lv = rv = 0) still
    # come out, and negatives/NULLs still match nothing on either path
    left = spark.createDataFrame(
        [(1, "A", 0.0), (2, "A", -5.0), (3, "A", None), (4, "A", 100.0)],
        "lid long, k string, lv double",
    )
    right = spark.createDataFrame(
        [(10, "A", 0.0), (11, "A", -5.0), (12, "A", None), (13, "A", 99.0)],
        "rid long, k string, rv double",
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in range_join.band_join(left, right, ["k"], "lv", "rv", tol=0.05).collect()
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join.band_join(
            left, right, ["k"], "lv", "rv", tol=0.05, bucketed=True
        ).collect()
    )
    assert want == got == [(1, 10), (4, 13)]


def test_band_join_max_per_group_caps_fanout(spark):
    # one dominant equi-group: the cap bounds right-side candidates per
    # (key, bucket), keeping the smallest right values deterministically
    left = spark.createDataFrame([(1, "A", 100.0)], "lid long, k string, lv double")
    right = spark.createDataFrame(
        [(10 + i, "A", 100.0 + i * 0.01) for i in range(50)],
        "rid long, k string, rv double",
    )
    full = range_join.band_join(
        left, right, ["k"], "lv", "rv", tol=0.05, bucketed=True
    )
    assert full.count() == 50
    capped = range_join.band_join(
        left, right, ["k"], "lv", "rv", tol=0.05, bucketed=True, max_per_group=5
    )
    rows = capped.collect()
    assert len(rows) == 5
    # deterministic: the 5 smallest rv values survive
    assert sorted(r["rid"] for r in rows) == [10, 11, 12, 13, 14]


def test_band_join_bucketed_rejects_outer_join(spark):
    # the exploded-replica bucketed path would null-extend each replica
    # independently; outer joins must be rejected, not silently wrong
    left = spark.createDataFrame([(1, "A", 100.0)], "lid long, k string, lv double")
    right = spark.createDataFrame([(10, "A", 99.0)], "rid long, k string, rv double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner"):
        range_join.band_join(
            left, right, ["k"], "lv", "rv", how="left", bucketed=True
        )


def test_infer_unknown_models_deterministic_winner(spark):
    df = spark.createDataFrame(
        [
            (1, "K", "EXC", "M1", 20.0),
            (2, "K", "EXC", "M2", 20.0),
            (3, "K", "EXC", None, 20.5),   # both M1/M2 in band, equal delta → M1
            (4, "K", "EXC", None, 50.0),   # out of band
            (5, "K", None, None, 20.0),    # type unknown → not inferable
        ],
        "shipment_id long, brand string, type string, model string, capacity double",
    )
    out = range_join.infer_unknown_models(df)
    got = {r["shipment_id"]: (r["model"], r["__model_inferred"]) for r in out.collect()}
    assert got[3] == ("M1", True)
    assert got[4] == (None, False)
    assert got[5] == (None, False)


# ---------------------------------------------------------------------------
# outliers
# ---------------------------------------------------------------------------


def test_mark_outliers(spark):
    df = spark.createDataFrame(
        [("A", 100.0), ("A", 102.0), ("A", 104.0), ("A", 200.0), ("B", None)],
        "g string, v double",
    )
    out = outliers.mark_outliers(df, ["g"], "v")
    got = sorted((r["g"], r["v"], r["outliers"]) for r in out.collect())
    # median(A) = 103 → 200 ≥ 123.6 flagged; NULL value → UNKNOWN
    assert got == [
        ("A", 100.0, "no"), ("A", 102.0, "no"), ("A", 104.0, "no"),
        ("A", 200.0, "yes"), ("B", None, "UNKNOWN"),
    ]


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------


def test_fold_others_cumulative(spark):
    df = spark.createDataFrame(
        [("A", 50.0), ("B", 30.0), ("C", 12.0), ("D", 5.0), ("E", 3.0)],
        "brand string, amount double",
    )
    shares = analysis.group_share_pre_agg(df, "brand")
    folded = analysis.fold_others(shares, "brand", threshold=20.0)
    got = {r["brand"]: r["amount"] for r in folded.collect()}
    # ascending cumulative: E(3)+D(5)+C(12) = 20 → only E,D fold (cum<20)
    assert got == {"A": 50.0, "B": 30.0, "C": 12.0, "OTHERS": 8.0}


def test_pivot_and_report_order(spark):
    df = spark.createDataFrame(
        [("X", "a", 1.0), ("X", "b", 2.0), ("Y", "a", 3.0)], "k string, p string, v double"
    )
    piv = analysis.pivot_sum(df, "k", "p", "v", values=["a", "b"])
    got = {r["k"]: (r["a"], r["b"]) for r in piv.collect()}
    assert got == {"X": (1.0, 2.0), "Y": (3.0, None)}

    rep = spark.createDataFrame(
        [("OTHERS", 99.0), ("UNKNOWN", 98.0), ("A", 10.0), ("B", 20.0)],
        "brand string, amount double",
    )
    ordered = [r["brand"] for r in analysis.report_order(rep, "brand").collect()]
    assert ordered == ["B", "A", "OTHERS", "UNKNOWN"]


# ---------------------------------------------------------------------------
# dedup / similarity / textstats
# ---------------------------------------------------------------------------


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "Hello,  World!"), (1, "hello world"), (2, "different")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(df, "doc_id", "text").collect())
    assert kept == [1, 2]


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "z y x w v u")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(df, "doc_id", "text").collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) not in pairs


def test_containment_pairs_catches_quoted_subset(spark):
    # doc 1 is reproduced verbatim inside the much longer doc 2:
    # Jaccard is small (|A|/|B|) but containment(A in B) is exactly 1.0
    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote), (3, "x y z q r s")],
        "doc_id long, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in
            dedup.containment_pairs(df, "doc_id", "text").collect()}
    r12 = rows[(1, 2)]
    assert r12["cont_a_in_b"] == pytest.approx(1.0)  # A fully inside B
    assert r12["cont_b_in_a"] < 0.2                  # B mostly NOT in A
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           dedup.ngram_jaccard_pairs(df, "doc_id", "text").collect()}
    assert jac[(1, 2)] < 0.1  # the pair Jaccard-based dedup would miss
    assert (1, 3) not in rows


def test_containment_pairs_min_containment_filters_either_direction(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f g h"), (3, "p q r s t u")],
        "doc_id long, text string",
    )
    got = dedup.containment_pairs(df, "doc_id", "text", min_containment=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}
    # threshold above both directions removes the pair
    assert dedup.containment_pairs(
        df, "doc_id", "text", min_containment=1.01
    ).count() == 0


def test_minhash_near_dup_detection(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different words here now ok")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=16)
    sim = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
           dedup.minhash_similarity(sigs, pairs, "doc_id", 16).collect()}
    assert sim.get((1, 2), 0) > 0.5
    assert sim.get((1, 3), 0) == 0


def test_containment_token_plan_is_hash_join(spark):
    # plan contract: the token strategy must compile to an equi hash
    # join on the exploded token key, never a BroadcastNestedLoopJoin
    # (which is the broadcast strategy's plan and caps dim size)
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        fuzzy_join,
    )

    fact = spark.createDataFrame(
        [(1, "cold plate x"), (2, "old plate"), (3, "hot bolt")],
        "fid long, name string",
    )
    dim = fact.select(F.col("name").alias("needle"), F.col("fid").alias("ref_idx"))

    def run(strategy):
        return fuzzy_join.containment_lookup(
            fact, "fid", ["name"], dim, "needle", ["needle"],
            [-F.length("needle"), F.col("ref_idx")],
            strategy=strategy, exclude_equal=True,
        )

    token_plan = run("token")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in token_plan
    assert "BroadcastHashJoin" in token_plan or "SortMergeJoin" in token_plan
    bc_plan = run("broadcast")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in bc_plan

    # token-anchored semantics: 'old plate' needle matches nothing
    # ('cold plate x' contains it only mid-token); 'plate'-anchored
    # needles would — containment is verified post-join
    got = {r["fid"]: r["needle"] for r in run("token").collect()}
    assert got == {1: None, 2: None, 3: None}


def test_ngram_jaccard_max_df_caps_boilerplate(spark):
    # every doc shares one boilerplate trigram ("click here now"); with
    # max_df the hot shingle is dropped from join AND sizes, so unrelated
    # docs produce NO pair rows instead of O(n^2) boilerplate pairs,
    # while the true near-dup pair keeps jaccard 1.0
    rows = [(i, f"unique{i} word{i} thing{i} click here now") for i in range(1, 9)]
    rows += [(9, "a b c d click here now"), (10, "a b c d click here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(df, "doc_id", "text", max_df=5).collect()}
    assert pairs[(9, 10)] == pytest.approx(1.0)
    # the boilerplate shingle alone no longer connects unrelated docs
    assert all(k == (9, 10) for k in pairs)
    # uncapped, the same corpus yields a pair for EVERY doc combination
    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text").count()
    assert uncapped == 45


def test_fast_minhash_path_matches_md5_on_true_dups(spark):
    # engine-internal equivalence: the xxhash64 scale path and the md5
    # oracle-parity path must produce the SAME verified near-dup set
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base), (3, base + " lambda"),
            (4, "one two three four five six seven eight nine ten"),
            (5, "totally different content in this document right here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def verified_pairs(hash_fn):
        sigs = dedup.minhash_signatures(
            df, "doc_id", "text", num_hashes=8, hash_fn=hash_fn
        )
        cand = dedup.lsh_similar_pairs(sigs, "doc_id", num_hashes=8, bands=8)
        exact = dedup.exact_jaccard_of_pairs(df, cand, "doc_id", "text")
        return {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
                for r in exact.filter("jaccard >= 0.8").collect()}

    fast, parity = verified_pairs("xxhash64"), verified_pairs("md5")
    assert fast == parity
    assert fast[(1, 2)] == pytest.approx(1.0)
    assert (1, 5) not in fast


def test_exact_jaccard_of_pairs_zero_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "v w x y z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           dedup.exact_jaccard_of_pairs(df, pairs, "doc_id", "text").collect()}
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(1, 3)] == pytest.approx(0.0)  # candidate with no shared shingle


def test_exact_jaccard_of_pairs_shingleless_doc(spark):
    # a doc with < n tokens yields ZERO shingles and no size row; pairs
    # touching it must still emit jaccard 0.0, not vanish (ADVICE r2)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "too short"), (3, "x")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           dedup.exact_jaccard_of_pairs(df, pairs, "doc_id", "text").collect()}
    assert got == {(1, 2): 0.0, (2, 3): 0.0}


def test_rolling_fingerprints_local_edit_robustness(spark):
    words = [f"w{i}" for i in range(30)]
    edited = list(words)
    edited[15] = "CHANGED"
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(edited))], "doc_id long, text string"
    )
    fps = dedup.rolling_fingerprints(df, "doc_id", "text", k=4, window=4)
    got = {1: set(), 2: set()}
    for r in fps.collect():
        got[r["doc_id"]].add((r["pos"], r["fp_hash"]))
    # selection rate ~1/window of the 27 grams, and never empty
    assert 3 <= len(got[1]) <= 15
    # a single-word edit at position 16 changes gram CONTENT for starts
    # in [16-k+1, 16] = [13, 16], and can flip window-min SELECTION for
    # positions whose trailing w-window touches one of those grams:
    # p in [13, 16+w-1] = [13, 19].  Fingerprints outside that band
    # must be IDENTICAL — the winnowing locality guarantee
    far1 = {(p, h) for p, h in got[1] if p < 13 or p > 19}
    far2 = {(p, h) for p, h in got[2] if p < 13 or p > 19}
    assert far1 == far2
    # the edit IS visible: the two docs' full fingerprint sets differ
    assert got[1] != got[2]


def test_duplicate_spans_hand_computed(spark):
    # pair A shares exactly ONE 8-gram (a..h); pair B shares a 9-token
    # run -> two overlapping duplicated 8-grams that must MERGE into a
    # single maximal span (interval merge, not integer islands)
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h q r s"),
            (3, "k l m n o p q r s t u v"),  # no 8-gram shared with any
            (4, "aa bb cc dd ee ff gg hh ii zz"),
            (5, "pp qq aa bb cc dd ee ff gg hh ii"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicate_spans(df, "doc_id", "text", k=8).collect()
    }
    assert got == {
        (1, 1, 8, 8),   # gram at pos 1 only
        (2, 3, 10, 8),  # same gram at pos 3
        (4, 1, 9, 9),   # grams at pos 1,2 merge -> 9-token span
        (5, 3, 11, 9),  # grams at pos 3,4 merge
    }


def test_duplicate_spans_gap_does_not_merge(spark):
    # two shared 8-grams separated by a gap > k-1 stay separate spans
    shared1 = "a b c d e f g h"
    shared2 = "q r s t u v w x"
    df = spark.createDataFrame(
        [
            (1, f"{shared1} one two three four five six seven eight {shared2}"),
            (2, f"{shared1} uno dos tres cuatro cinco seis siete ocho {shared2}"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, "doc_id", "text", k=8).collect()
    }
    # doc layout: shared1 at pos 1-8, 8 filler words at 9-16, shared2 at 17-24
    assert got == {(1, 1, 8), (1, 17, 24), (2, 1, 8), (2, 17, 24)}


def test_strip_duplicate_spans_keeps_lowest_id_copy(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h q r s"),
            (3, "short doc"),  # < k tokens: passes through untouched
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in dedup.strip_duplicate_spans(df, "doc_id", "text", k=8).collect()
    }
    # doc 1 is the keeper of the shared gram -> intact; doc 2 loses
    # positions 3..10; doc 3 has no grams at all
    assert got == {
        1: ("a b c d e f g h i j", 10),
        2: ("x y q r s", 5),
        3: ("short doc", 2),
    }


def test_simhash_similarity_order(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),
         (3, "one two three four five six")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text").collect()}
    d = df.sparkSession.createDataFrame(
        [(fp[1], fp[2]), (fp[1], fp[3])], "a long, b long"
    ).select(dedup.hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    assert d[0]["h"] < d[1]["h"]  # near-dup closer than unrelated


def test_brute_force_vs_lsh_knn(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    exact = similarity.brute_force_knn(emb, q, k=3)
    approx = similarity.lsh_knn(emb, q, k=3, num_planes=2)
    er = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ar = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(er) == 9
    # low plane count → big buckets → decent recall on 300 vectors
    assert len(er & ar) >= 3


def test_hard_negative_mining_matches_banded_brute_force(spark, sf_dir):
    import math

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.det_centroids(7, 4, 64)
    q = emb.filter("vec_id < 3")
    # nprobe == n_cells degenerates to exact search over every cell
    got = similarity.hard_negative_mining(
        emb, q, k=4, lo=0.1, hi=0.5, nprobe=4, centroids=cents
    ).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for qid in range(3):
        mine = sorted(
            (r["neighbor_id"], round(r["cosine_sim"], 9))
            for r in got if r["query_id"] == qid
        )
        band = [(cos(vecs[qid], v), nid) for nid, v in vecs.items() if nid != qid]
        band = [(c, nid) for c, nid in band if 0.1 <= c < 0.5]
        want = sorted(
            (nid, round(c, 9))
            for c, nid in sorted(band, key=lambda t: (-t[0], t[1]))[:4]
        )
        assert mine == want
        assert all(0.1 <= c < 0.5 for _, c in mine)


def test_semantic_dedup_keeps_lowest_id_per_neighborhood(spark):
    # cell 0 centroid (1,0); cell 1 centroid (0,1).  ids 1/2 are semantic
    # twins in cell 0 (cos≈0.99), id 3 shares the cell but sits below tau,
    # ids 4/5 are twins in cell 1.  Lowest id of each twin pair survives.
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.14]), (3, [0.6, -0.8]),
         (4, [0.1, 1.0]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in
           similarity.semantic_dedup(df, centroids=cents, tau=0.9).collect()}
    assert got == {1: (0, True), 2: (0, False), 3: (0, True),
                   4: (1, True), 5: (1, False)}
    # max_cell cap: every cell exceeds the cap → pairwise stage is skipped
    # entirely and all rows are kept (the documented giant-cell escape)
    capped = {r["vec_id"]: r["kept"] for r in
              similarity.semantic_dedup(
                  df, centroids=cents, tau=0.9, max_cell=1).collect()}
    assert all(capped.values())


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox is in the yard for a while")], "doc_id long, text string"
    )
    r = textstats.with_text_stats(df).first()
    assert r["n_tokens"] == 10
    assert r["stopword_ratio_en"] > 0.3
    assert r["lang_guess"] == "en"
    assert len(r["fingerprint"]) == 32
    assert 0.0 <= r["quality"] <= 1.0


def test_quality_logit_orders_prose_above_junk(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox is in the yard and it waits for a meal"),
         (2, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"),
         (3, "123456 789012 345678 901234 567890")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           textstats.with_quality_logit(df, threshold=0.0).collect()}
    assert out[1]["logit"] > out[2]["logit"]
    assert out[1]["logit"] > out[3]["logit"]
    assert out[1]["keep"] and not out[2]["keep"]
    # p_keep is a probability and monotone in the logit
    assert 0.0 <= out[2]["p_keep"] <= out[1]["p_keep"] <= 1.0


def test_lang_id_tie_and_unknown(spark):
    df = spark.createDataFrame(
        [(1, "xyzzy plugh"), (2, "el la de y que en un")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id", textstats.lang_id(F.col("text")).alias("r")).collect()}
    assert got[1] == "und"
    assert got[2] == "es"


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthetic_media(spark, 9)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r["features"]) == 8
        assert len(r["content_md5"]) == 32
        assert r["n_bytes"] > 0


def test_multimodal_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"x", "image/png")


def test_image_codec_roundtrip_real_bytes():
    # the one NON-stub codec path: encode real PPM/BMP bytes, decode the
    # actual headers back
    pixels = bytes(range(60))  # 3 * 5 * 4
    ppm = multimodal.encode_ppm(5, 4, pixels)
    assert multimodal.decode_image_header(ppm) == ("ppm", 5, 4)
    bmp = multimodal.encode_bmp(5, 4, pixels)
    assert multimodal.decode_image_header(bmp) == ("bmp", 5, 4)
    # width 5 rows need 1 pad byte: 14 + 40 + 4*(15+1)
    assert len(bmp) == 54 + 4 * 16
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_header(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        multimodal.decode_image_header(b"P6 garbage")
    # PPM comment lines between magic and dims are legal (netpbm spec)
    commented = b"P6\n# CREATOR: netpbm\n5 4\n# another\n255\n" + pixels
    assert multimodal.decode_image_header(commented) == ("ppm", 5, 4)
    with pytest.raises(ValueError):  # truncated BMP, not struct.error
        multimodal.decode_image_header(b"BM\x00\x00")


def test_image_dims_decodes_real_bytes(spark):
    media = multimodal.synthetic_images(spark, 10)
    got = {r["media_id"]: (r["fmt"], r["width"], r["height"], r["n_pixels"])
           for r in multimodal.image_dims(media).collect()}
    assert len(got) == 10
    for i in range(10):
        w, h = 4 + i % 13, 3 + i % 7
        fmt = "ppm" if i % 2 == 0 else "bmp"
        assert got[i] == (fmt, w, h, w * h)


def test_image_dhash_codec_invariant_and_perceptual(spark):
    import hashlib

    w, h = 16, 12
    seed = hashlib.md5(b"dhash-test").digest()
    pixels = (seed * (3 * w * h // 16 + 1))[: 3 * w * h]
    # one perturbed pixel block; one unrelated image
    near = bytearray(pixels)
    near[0:3] = b"\xff\xff\xff"
    other = hashlib.md5(b"other").digest() * (3 * w * h // 16 + 1)
    rows = [
        (0, "image", "image/x-portable-pixmap",
         bytearray(multimodal.encode_ppm(w, h, pixels)), {}),
        (1, "image", "image/bmp",
         bytearray(multimodal.encode_bmp(w, h, pixels)), {}),
        (2, "image", "image/x-portable-pixmap",
         bytearray(multimodal.encode_ppm(w, h, bytes(near))), {}),
        (3, "image", "image/x-portable-pixmap",
         bytearray(multimodal.encode_ppm(w, h, other[: 3 * w * h])), {}),
        (4, "audio", "audio/x-fake", bytearray(b"not an image"), {}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["dhash"] for r in
           multimodal.image_dhash(media).collect()}
    assert set(got) == {0, 1, 2, 3}  # audio row never reaches Python
    # the SAME pixels hash identically across encodings (PPM vs BMP
    # round-trips through bottom-up rows + padding)
    assert got[0] == got[1]

    def ham(a, b):
        return bin(a ^ b).count("1")

    # one-pixel edit: a few gradient bits; unrelated image: many
    assert 0 < ham(got[0], got[2]) <= 6
    assert ham(got[0], got[3]) > 10


def test_media_stats_jvm_only(spark):
    media = multimodal.synthetic_media(spark, 12)
    got = {r["kind"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert got == {"image": 4, "audio": 4, "video": 4}


# ---------------------------------------------------------------------------
# history
# ---------------------------------------------------------------------------


def test_merge_rollups_reconstructs_direct_aggregate(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import history

    rows = [("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 7.0), ("c", 1.0)]
    df = spark.createDataFrame(rows, "k string, v double")

    def partial(part):
        return part.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("*").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        )

    # three partials; key 'c' appears in only one of them
    parts = [
        partial(df.filter(F.col("v") < 6)),
        partial(df.filter((F.col("v") >= 6) & (F.col("v") < 15))),
        partial(df.filter(F.col("v") >= 15)),
    ]
    merged = {
        r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
        for r in history.merge_rollups(
            parts, ["k"], sum_cols=("s",), count_col="n",
            min_cols=("lo",), max_cols=("hi",),
        ).collect()
    }
    direct = {
        r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
        for r in partial(df).collect()
    }
    assert merged == direct


def test_history_union_and_schema_check(spark, tmp_path):
    a = spark.createDataFrame([(1, "x", 202401)], "id long, v string, month int")
    b = spark.createDataFrame([(2, "y", 202402)], "id long, v string, month int")
    u = history.append_history(a, b)
    assert u.count() == 2
    bad = spark.createDataFrame([(3, 202403)], "id long, month int")
    with pytest.raises(history.SchemaMismatch):
        history.append_history(a, bad)
    history.write_history(u, str(tmp_path / "hist"))
    back = spark.read.parquet(str(tmp_path / "hist"))
    assert back.count() == 2
    assert history.year_slice(
        spark.createDataFrame([("2024/01/05",), ("2023/01/05",)], "date string"),
        "date", 2024,
    ).count() == 1


def test_multimodal_resize_plumbing(spark):
    media = multimodal.synthetic_media(spark, 12)
    out = multimodal.resize_images(media, 32, 16).collect()
    # only image rows pass, dims are typed columns, payload sized to target
    assert len(out) == 4 and all(r["kind"] == "image" for r in out)
    assert all((r["width"], r["height"]) == (32, 16) for r in out)
    assert all(len(r["content"]) == 32 * 16 // 64 for r in out)
    # deterministic: same inputs -> same bytes
    again = multimodal.resize_images(media, 32, 16).collect()
    assert {r["media_id"]: bytes(r["content"]) for r in out} == {
        r["media_id"]: bytes(r["content"]) for r in again
    }


def test_multimodal_frame_sampling_jvm_only(spark):
    media = multimodal.synthetic_media(spark, 12).withColumn(
        "meta", F.create_map(F.lit("n_frames"), F.lit("25"))
    )
    out = multimodal.sample_frames(media, every_n=10)
    rows = out.collect()
    assert all(r["n_frames"] == 25 for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_no"])
    assert all(sorted(v) == [0, 10, 20] for v in per.values())
    # frame-index planning must not enter Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_assign_to_nearest_argmax_tiebreak_and_no_shuffle(spark):
    import re

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 2.0]),
            (2, [1.0, 1.0]),   # equidistant from both centroids -> tie
            (3, [-1.0, 0.0]),  # anti-parallel to centroid 0
        ],
        "id int, v array<double>",
    )
    cents = [(0, [2.0, 0.0]), (1, [0.0, 1.0])]
    out = {
        r["id"]: (r["cluster_id"], round(r["cosine_sim"], 6))
        for r in similarity.assign_to_nearest(df, "v", cents).collect()
    }
    assert out[0] == (0, 1.0)
    assert out[1] == (1, 1.0)
    assert out[2] == (0, 0.707107)  # tie -> smallest centroid id
    assert out[3] == (1, 0.0)       # cos -1 vs 0 -> centroid 1
    # shuffle-free: literal-expression argmax, no join, no exchange
    qe = similarity.assign_to_nearest(df, "v", cents)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = qe.explainString(mode)
    assert len(re.findall(r"(?<!Broadcast)Exchange \(", p)) == 0
    assert "Join" not in p


def test_quality_percentile_filter_per_lang_median(spark):
    rows = []
    # 4 english docs of increasing quality (distinct length scores,
    # below the 50-token saturation point so no percent_rank ties)
    for i, n in enumerate([1, 2, 3, 4]):
        rows.append((i, " ".join(["the cat is on a mat for it and"] * n)))
    # 3 'und' docs (no stopwords), increasing length
    for i, n in enumerate([1, 3, 9]):
        rows.append((10 + i, " ".join(["zzz qqq xxx"] * n)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = textstats.quality_percentile_filter(df, "text", min_rank=0.5).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang_guess"], set()).add(r["doc_id"])
    # percent_rank >= 0.5 keeps the top half of each language partition
    assert by_lang["en"] == {2, 3}
    assert by_lang["und"] == {11, 12}
    assert all(r["q_rank"] >= 0.5 for r in kept)


def test_observed_metrics_ride_along_write(spark, tmp_path):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        quality,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0), (4, 9.0)], "id int, v double"
    )
    out, obs = quality.with_observed_metrics(
        df,
        "write_audit",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.when(F.isnull("v"), 1)),
            "n_negative": F.count(F.when(F.col("v") < 0, 1)),
        },
    )
    # the metrics are produced BY the write itself — no second scan
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    assert obs.get == {"n_rows": 4, "n_null_v": 1, "n_negative": 1}


def test_fuzzy_name_pairs_blocking_and_distance(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgets"),   # dist 1 to 'red widget', same block
            (3, "red gizmo"),     # dist > 3 to both
            (4, "blue widget"),   # different block — never compared
            (5, "red widget"),    # duplicate name collapses first
        ],
        "id int, name string",
    )
    out = dedup.fuzzy_name_pairs(
        df, "name", lambda n: F.substring_index(n, " ", 1), max_dist=3
    ).collect()
    assert [(r["name_a"], r["name_b"], r["edit_dist"]) for r in out] == [
        ("red widget", "red widgets", 1)
    ]


# ---------------------------------------------------------------------------
# pareto frontier / winsorize / interval overlap / bigram PMI
# ---------------------------------------------------------------------------


def test_pareto_frontier_strict_domination(spark):
    # (price, size): survive unless strictly worse on both axes
    df = spark.createDataFrame(
        [
            (1, "A", 10.0, 50),   # frontier (cheapest)
            (2, "A", 20.0, 60),   # frontier (bigger than all cheaper)
            (3, "A", 30.0, 55),   # dominated by id=2 (cheaper AND bigger)
            (4, "A", 30.0, 60),   # tie on size with id=2 → not strict → survives
            (5, "A", 40.0, 70),   # frontier
            (6, "B", 99.0, 1),    # alone in partition → frontier
        ],
        "id long, brand string, price double, size int",
    )
    out = analysis.pareto_frontier_2d(
        df, minimize="price", maximize="size", partition_by=["brand"]
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 4, 5, 6]


def test_pareto_frontier_equal_minimize_ties(spark):
    # two rows at the same price: both compared only against strictly
    # cheaper rows, so the weaker one dies only if a cheaper row beats it
    df = spark.createDataFrame(
        [(1, 10.0, 5), (2, 20.0, 9), (3, 20.0, 3)],
        "id long, price double, size int",
    )
    out = analysis.pareto_frontier_2d(df, minimize="price", maximize="size")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_winsorize_clips_to_fences(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "k string, v double"
    )
    out = outliers.winsorize(df, ["k"], "v", lo=0.05, hi=0.95)
    rows = out.collect()
    # exact interpolated percentiles of 1..100: p05=5.95, p95=95.05
    assert all(abs(r["_w_lo"] - 5.95) < 1e-9 for r in rows)
    assert all(abs(r["_w_hi"] - 95.05) < 1e-9 for r in rows)
    clipped = {r["v"]: r["v_wins"] for r in rows}
    assert clipped[1.0] == 5.95 and clipped[100.0] == 95.05
    assert clipped[50.0] == 50.0  # interior untouched


def test_interval_overlap_join_halfopen_and_dedup(spark):
    # grain 10s; intervals as epoch-second timestamps
    def ts(s):
        return F.timestamp_seconds(F.col(s))

    left = spark.createDataFrame([(1, 5, 35), (2, 40, 50)], "lid long, s long, e long")
    left = left.select("lid", ts("s").alias("ls"), ts("e").alias("le"))
    right = spark.createDataFrame(
        [(10, 0, 100), (11, 35, 45), (12, 50, 60)], "rid long, s long, e long"
    )
    right = right.select("rid", ts("s").alias("rs"), ts("e").alias("re"))
    out = range_join.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", grain_seconds=10
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    # (1,10): overlap spans 4 shared buckets -> exactly ONE output row
    # (1,11): touch at 35 only -> half-open, NO overlap
    # (2,10): [40,50) inside [0,100)
    # (2,11): [40,50) x [35,45) overlap
    # (2,12): touch at 50 -> NO overlap
    assert pairs == [(1, 10), (2, 10), (2, 11)]


def test_interval_overlap_join_space_named_columns(spark):
    # the reference's own schema has space-bearing names ('price in usd');
    # interval bounds with spaces must pass through the backticked exprs
    def ts(s):
        return F.timestamp_seconds(F.col(s))

    left = spark.createDataFrame([(1, 5, 35)], "lid long, s long, e long").select(
        "lid", ts("s").alias("session start"), ts("e").alias("session end")
    )
    right = spark.createDataFrame([(10, 30, 45)], "rid long, s long, e long").select(
        "rid", ts("s").alias("window start"), ts("e").alias("window end")
    )
    out = range_join.interval_overlap_join(
        left, right, "session start", "session end",
        "window start", "window end", grain_seconds=10,
    )
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(1, 10)]


def test_interval_overlap_join_rejects_non_timestamp(spark):
    left = spark.createDataFrame([(1, 5, 35)], "lid long, s long, e long")
    right = spark.createDataFrame([(10, 30, 45)], "rid long, rs long, re long")
    import pytest as _pytest

    with _pytest.raises(TypeError, match="must be a timestamp"):
        range_join.interval_overlap_join(
            left, right, "s", "e", "rs", "re", grain_seconds=10
        )


def test_session_intervals_bounds(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 100), ("u", 5000), ("u", 5100)], "user_id string, s long"
    ).select("user_id", F.timestamp_seconds(F.col("s")).alias("ts"))
    out = sessionize_ops.session_intervals(df, "user_id", "ts", gap_seconds=1800)
    rows = sorted(out.collect(), key=lambda r: r["session_seq"])
    assert len(rows) == 2
    assert [r["n_events"] for r in rows] == [2, 2]
    spans = [
        (r["session_end"] - r["session_start"]).total_seconds() for r in rows
    ]
    assert spans == [100.0, 100.0]


def test_bigram_pmi_hand_computed(spark):
    import math

    # corpus: "a b" x3 and "a c" x1 → tokens: a:4 b:3 c:1, N_uni=8
    # bigrams: (a,b):3 (a,c):1, N_bi=4
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("a b",), ("a c",)], "text string"
    )
    out = textstats.bigram_pmi(df, "text", min_count=1)
    got = {(r["x"], r["y"]): (r["c_xy"], r["pmi"]) for r in out.collect()}
    exp_ab = round(math.log((3.0 * 8 * 8) / (4.0 * 4 * 3)), 6)
    exp_ac = round(math.log((1.0 * 8 * 8) / (4.0 * 4 * 1)), 6)
    assert got[("a", "b")] == (3, exp_ab)
    assert got[("a", "c")] == (1, exp_ac)


def test_contamination_attribution_max_df_caps_hot_grams(spark):
    """The hot-gram cap (VERDICT r4 nit #1): a boilerplate 5-gram
    shared by EVERY doc must not drive attribution — under max_df the
    gram is anti-joined out of both sides, so a benchmark doc sharing
    ONLY boilerplate gets no attribution row and a doc sharing a rare
    gram is attributed on the rare gram alone."""
    boiler = "all rights reserved legal footer"
    corpus_rows = [
        (i, f"u{i}a u{i}b u{i}c u{i}d {boiler}") for i in range(1, 7)
    ]
    # corpus doc 2 additionally carries a rare phrase
    corpus_rows[1] = (2, f"special secret phrase only here u2a u2b u2c u2d {boiler}")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [
            (100, f"b100a b100b b100c b100d {boiler}"),  # boilerplate only
            (200, f"special secret phrase only here {boiler}"),  # + rare gram
        ],
        "doc_id long, text string",
    )

    uncapped = {
        r["bench_id"]: (r["top_corpus_id"], r["shared_grams"])
        for r in dedup.contamination_attribution(
            corpus, bench, "doc_id", "text", n=5
        ).collect()
    }
    assert uncapped[100] == (1, 1)  # boilerplate attributed to smallest id
    assert uncapped[200] == (2, 2)  # rare gram + boilerplate

    capped = {
        r["bench_id"]: (r["top_corpus_id"], r["shared_grams"])
        for r in dedup.contamination_attribution(
            corpus, bench, "doc_id", "text", n=5, max_df=5
        ).collect()
    }
    assert 100 not in capped  # boilerplate-only doc: no meaningless attribution
    assert capped == {200: (2, 1)}  # attributed on the rare gram alone


def test_kmeans_lloyd_converges_and_keeps_empty_cluster(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        similarity,
    )

    # two tight groups around (0,0) and (10,10); a third seed far away
    # that captures nothing and must keep its initial centroid
    rows = [
        (0, [0.0, 0.1]),
        (1, [0.1, 0.0]),
        (2, [0.0, 0.0]),
        (3, [10.0, 10.1]),
        (4, [10.1, 10.0]),
        (5, [10.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    init = [(0, [0.0, 0.1]), (1, [10.0, 10.1]), (2, [-100.0, -100.0])]
    out, cents = similarity.kmeans_lloyd(
        df, "vec_id", "embedding", init, iters=2
    )
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    by_id = dict(cents)
    # group means, floor-rounded at 6dp
    assert by_id[0] == [
        pytest.approx(0.1 / 3, abs=1e-6),
        pytest.approx(0.1 / 3, abs=1e-6),
    ]
    assert by_id[1] == [
        pytest.approx(30.1 / 3, abs=1e-6),
        pytest.approx(30.1 / 3, abs=1e-6),
    ]
    # untouched empty-cluster seed survives verbatim
    assert by_id[2] == [-100.0, -100.0]


def test_kmeans_lloyd_rounded_argmin_tiebreak(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        similarity,
    )

    # point exactly equidistant from both centroids: lower cid wins
    df = spark.createDataFrame([(7, [1.0])], ["vec_id", "embedding"])
    init = [(3, [0.0]), (1, [2.0])]
    out, _ = similarity.kmeans_lloyd(df, "vec_id", "embedding", init, iters=0)
    r = out.collect()[0]
    assert r["cluster_id"] == 1 and r["dist2"] == pytest.approx(1.0)


def test_image_near_dup_catches_cross_codec_pairs_only(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        multimodal,
    )

    n = 12
    orig = multimodal.synthetic_images(spark, n)
    flipped = multimodal.synthetic_images(spark, n, id_offset=100, flip_codec=True)
    pairs = multimodal.image_near_dup_pairs(orig.unionByName(flipped)).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    # every picture matches its re-encoded twin at hamming 0...
    assert got == {(i, 100 + i): 0 for i in range(n)}
    # ...and the flipped corpus really is different bytes (not exact dups)
    a = {r["media_id"]: bytes(r["content"]) for r in orig.collect()}
    b = {r["media_id"] - 100: bytes(r["content"]) for r in flipped.collect()}
    assert all(a[i] != b[i] for i in range(n))


def test_margin_bitext_suppresses_hub(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        similarity,
    )

    # y100 is an exclusive match for x0; y102 is a hub near every x.
    x = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0]), (4, [0.6, 0.8])],
        ["vec_id", "embedding"],
    )
    y = spark.createDataFrame(
        [
            (100, [0.99, 0.14]),   # near x0 only
            (101, [0.1, 0.99]),    # near x2 only
            (102, [0.71, 0.71]),   # hub: decent cosine to everything
        ],
        ["vec_id", "embedding"],
    )
    out = similarity.margin_bitext_pairs(
        x, y, k=2, threshold=0.0
    ).collect()
    m = {(r["x_id"], r["y_id"]): r["margin"] for r in out}
    # exclusive matches out-margin the hub for their query...
    assert m[(0, 100)] > m[(0, 102)]
    assert m[(2, 101)] > m[(2, 102)]
    # ...and every exclusive pair clears 1.0 while being its side's best
    assert m[(0, 100)] > 1.0 and m[(2, 101)] > 1.0


def test_margin_bitext_ann_candidates_track_exact(spark):
    """The IVF candidate path (centroids given) must (a) never invent a
    pair the exact N×M form doesn't score, (b) agree bit-for-bit on
    cosine for every pair both forms emit, and (c) keep usable recall
    at full probing (nprobe = n_cells degenerates to the exact
    candidate set, so the outputs coincide exactly)."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        similarity,
    )

    from tests.conftest import SF_DIR

    spark.catalog.clearCache()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from pyspark.sql import functions as F

    x = emb.filter(F.col("vec_id") % 2 == 0)
    y = emb.filter(F.col("vec_id") % 2 == 1)
    cents = similarity.det_centroids(11, 4, 64)
    exact = similarity.margin_bitext_pairs(x, y, k=3, threshold=0.0)
    exact_rows = {(r["x_id"], r["y_id"]): r["cosine"] for r in exact.collect()}
    spark.catalog.clearCache()
    ann = similarity.margin_bitext_pairs(
        x, y, k=3, threshold=0.0, centroids=cents, nprobe=2
    )
    ann_rows = {(r["x_id"], r["y_id"]): r["cosine"] for r in ann.collect()}
    spark.catalog.clearCache()
    # (b): cosines agree on the intersection (same normalize + dot)
    inter = set(exact_rows) & set(ann_rows)
    assert inter, "candidate join produced no overlap with exact top-k"
    assert all(exact_rows[p] == ann_rows[p] for p in inter)
    # (c): full probing degenerates to the exact pair set
    full = similarity.margin_bitext_pairs(
        x, y, k=3, threshold=0.0, centroids=cents, nprobe=len(cents)
    )
    full_rows = {(r["x_id"], r["y_id"]): r["cosine"] for r in full.collect()}
    spark.catalog.clearCache()
    assert full_rows == exact_rows


def test_hll_intersection_estimate_tracks_true_overlap(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        sketches,
    )

    # A = 0..599, B = 300..899 -> |A|=|B|=600, |A∩B|=300, |A∪B|=900
    a = spark.createDataFrame([(i,) for i in range(600)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(300, 900)], ["k"])
    r = sketches.hll_intersection_estimate(a, b, "k").collect()[0]
    assert abs(r["est_a"] - 600) / 600 < 0.15
    assert abs(r["est_union"] - 900) / 900 < 0.15
    assert abs(r["est_intersection"] - 300) / 300 < 0.35
    assert 0 < r["jaccard_est"] < 1
    # union sketch dominates both sides (it is the merged registers)
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9


def test_blocklist_audit_suffix_semantics(spark):
    """DNS-suffix matching: a rule blocks its subdomains but never a
    string-superset host; the most specific (longest) rule wins; hosts
    with no scheme or a single label are kept."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import webfilter

    docs = spark.createDataFrame(
        [
            (1, "https://cdn.ads.example.com/x"),   # most specific rule wins
            (2, "https://notexample.com/y"),         # NOT a suffix match
            (3, "https://ads.example.com:8080/z"),   # port stripped, specific rule
            (4, "ftp://example.com/w"),              # scheme-agnostic
            (5, "no-scheme-here"),                   # no host -> kept
            (6, "https://localhost/q"),              # single label -> kept
            (7, "https://EXAMPLE.com/r"),            # case-folded
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("ads.example.com",)], "rule string"
    )
    out = {
        r["id"]: (r["blocked"], r["matched_rule"])
        for r in webfilter.blocklist_audit(docs, "url", bl).collect()
    }
    assert out[1] == (True, "ads.example.com")
    assert out[2] == (False, None)
    assert out[3] == (True, "ads.example.com")  # longest match wins
    assert out[4] == (True, "example.com")
    assert out[5] == (False, None)
    assert out[6] == (False, None)
    assert out[7] == (True, "example.com")


def test_blocklist_audit_plan_broadcasts_rules(spark):
    """The rule dim must reach the corpus as a broadcast hash join —
    the corpus never shuffles to discover matches."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import webfilter

    docs = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("https://h"), F.col("id") % 5, F.lit(".example.com/")).alias("url"),
    )
    bl = spark.createDataFrame([("example.com",)], "rule string")
    plan = webfilter.blocklist_audit(docs, "url", bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_canonical_url_rules_and_dedup(spark):
    """Tracking params, fragments, www, default ports, trailing slash,
    host case and param order all collapse; non-default ports, path
    case and real params survive; schemeless strings pass through."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import webfilter

    variants = [
        (1, "https://WWW.Example.com:443/Page/?utm_source=x&b=2&a=1#f"),
        (2, "https://example.com/Page?a=1&b=2"),
        (3, "https://example.com/Page/?b=2&a=1&gclid=z"),
    ]
    others = [
        (4, "https://example.com:8443/Page?a=1&b=2"),  # non-default port kept
        (5, "https://example.com/page?a=1&b=2"),       # path case differs
        (6, "plain-text-key"),                          # passthrough
    ]
    df = spark.createDataFrame(variants + others, "id long, url string")
    out = {r["canonical"]: r for r in webfilter.canonical_dedup(df, "id", "url").collect()}
    assert len(out) == 4
    trio = out["https://example.com/Page?a=1&b=2"]
    assert trio["keep_id"] == 1 and trio["n_fetches"] == 3 and trio["n_spellings"] == 3
    assert "https://example.com:8443/Page?a=1&b=2" in out
    assert "https://example.com/page?a=1&b=2" in out
    assert out["plain-text-key"]["n_fetches"] == 1


def test_quality_calibration_integer_grid(spark):
    """The reliability table is pure integer arithmetic: ppm means are
    exact, bins clamp to [0, n_bins), and a bad grid is rejected."""
    docs = spark.createDataFrame(
        [
            (1, "the is a of to and in it for on the is a of to", True),
            (2, "zzzz9 881#@!", False),
            (3, "the quick brown fox jumps over the lazy dog again", True),
        ],
        "id long, text string, label boolean",
    )
    out = textstats.quality_calibration(docs, "text", "label", n_bins=10)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 3
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["mean_pred_ppm"] <= 1_000_000
        # frac_pos_ppm is the exact integer ratio on the ppm grid
        import math
        assert r["frac_pos_ppm"] == math.floor(r["n_pos"] * 1e6 / r["n_docs"] + 0.5)
    with pytest.raises(ValueError, match="ppm"):
        textstats.quality_calibration(docs, "text", "label", n_bins=7)


def test_pca_power_iteration_matches_numpy(spark):
    """The matrix-free power iteration recovers a planted dominant
    component: loadings match numpy's eigendecomposition, the sign is
    fixed (first loading non-negative), and eigenvalue/explained agree
    with the exact covariance spectrum."""
    import math

    import numpy as np

    rng = np.random.RandomState(7)
    d = 8
    base = rng.randn(300, d) * 0.1
    base[:, 3] += rng.randn(300) * 3.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    out = sorted(
        similarity.pca_power_iteration(df, "embedding", dim=d, iters=8).collect(),
        key=lambda r: r["dim"],
    )
    X = base - base.mean(0)
    w, V = np.linalg.eigh(X.T @ X / len(X))
    top = V[:, -1]
    if top[0] < 0:
        top = -top
    got = np.array([r["loading"] for r in out])
    assert np.abs(got - top).max() < 1e-4
    assert got[0] >= 0  # sign convention
    assert math.isclose(out[0]["eigenvalue"], w[-1], rel_tol=1e-4)
    assert math.isclose(out[0]["explained"], w[-1] / w.sum(), rel_tol=1e-4)
    # outputs are floor-rounded at 6 dp by contract
    assert math.isclose(out[0]["total_var"], w.sum(), abs_tol=1e-6)


def test_ann_union_knn_recall_vs_brute_force(spark, sf_dir):
    """ann_union_knn is the registered kNN plan; brute_force_knn is the
    test-side recall oracle it's measured against (VERDICT r5 #1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    cents = similarity.det_centroids(11, 8, 64)
    exact = similarity.brute_force_knn(emb, q, k=5)
    approx = similarity.ann_union_knn(emb, q, k=5, centroids=cents, nprobe=3)
    er = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ar = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(ar) == 25  # SRP∪IVF candidate pool always covers k
    # two independent coarse retrievers compound recall (19/25 measured)
    assert len(er & ar) >= 15
    # scores on the overlap are EXACT (same cosine arithmetic)
    es = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in es:
            assert abs(r["cosine_sim"] - es[key]) < 1e-12


def test_near_dup_pairs_bucketed_recall_and_precision(spark, sf_dir):
    """Bucketed near-dup pairs: every reported pair is a TRUE pair with
    its exact cosine (precision 1 by construction — exact re-score);
    recall vs the all-pairs oracle is high because cosine-close vectors
    share probed cells."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.det_centroids(11, 8, 64)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.near_dup_pairs(emb, threshold=0.4).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.near_dup_pairs_bucketed(
            emb, threshold=0.4, centroids=cents, nprobe=2
        ).collect()
    }
    assert set(got) <= set(exact)  # no false positives, ever
    assert len(got) >= len(exact) * 0.5  # nprobe=2 recall on 8 cells
    for k, v in got.items():
        assert abs(v - exact[k]) < 1e-12


def test_near_dup_pairs_bucketed_nprobe_all_cells_is_exact(spark, sf_dir):
    """nprobe == n_cells degenerates to exact all-pairs semantics —
    the recall dial's upper stop."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 120")
    cents = similarity.det_centroids(11, 4, 64)
    exact = {
        (r["id_a"], r["id_b"]) for r in similarity.near_dup_pairs(emb, threshold=0.4).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs_bucketed(
            emb, threshold=0.4, centroids=cents, nprobe=4
        ).collect()
    }
    assert got == exact


def test_ann_int8_pruned_scores_match_standalone(spark, sf_dir):
    """The IVF-pruned int8 path must produce the SAME quantized cosine
    for every (query, neighbor) it emits as the standalone quadratic
    leg — pruning bounds the candidate set, never changes arithmetic."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id % 50 = 0")
    c = emb.filter("vec_id % 50 != 0")
    cents = similarity.det_centroids(11, 8, 64)
    full = {
        (r["query_id"], r["vec_id"]): r["qcos"]
        for r in similarity.ann_int8(c, q, "vec_id", "embedding", k=50).collect()
    }
    pruned = similarity.ann_int8_pruned(
        c, q, "vec_id", "embedding", k=5, centroids=cents, nprobe=2
    ).collect()
    assert len(pruned) > 0
    for r in pruned:
        assert full[(r["query_id"], r["vec_id"])] == r["qcos"]


def test_ann_int8_pruned_nprobe_all_cells_recovers_standalone(spark, sf_dir):
    """nprobe == n_cells degenerates the pruning to exact coverage: the
    top-k sets coincide with the quadratic leg's."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 200")
    q = emb.filter("vec_id % 50 = 0")
    c = emb.filter("vec_id % 50 != 0")
    cents = similarity.det_centroids(11, 4, 64)
    want = sorted(
        (r["query_id"], r["vec_id"], r["qcos"], r["rk"])
        for r in similarity.ann_int8(c, q, "vec_id", "embedding", k=3).collect()
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["qcos"], r["rk"])
        for r in similarity.ann_int8_pruned(
            c, q, "vec_id", "embedding", k=3, centroids=cents, nprobe=4
        ).collect()
    )
    assert got == want


def test_mmr_rerank_diversifies_near_duplicates(spark):
    """Candidates: two near-identical high-relevance vectors + one
    moderately relevant orthogonal one.  Pure top-2 keeps the twins;
    MMR must swap the second twin for the diverse candidate."""
    q = [1.0, 0.0, 0.0]
    cands = spark.createDataFrame(
        [
            (1, [0.99, 0.1, 0.0]),   # relevant
            (2, [0.98, 0.12, 0.0]),  # near-dup of 1
            (3, [0.6, 0.0, 0.8]),    # less relevant, diverse
        ],
        "vec_id long, embedding array<double>",
    )
    out = similarity.mmr_rerank(cands, q, k=2, lam=0.5)
    picked = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert picked == [1, 3]
    # rank-1 mmr is lam*relevance; rank-2 carries the dup penalty
    rows = {r["rank"]: r for r in out.collect()}
    assert rows[1]["mmr"] == rows[1]["relevance"] * 0.5
    assert rows[2]["mmr"] < rows[2]["relevance"] * 0.5


def test_morton_code_locality_and_bijectivity(spark):
    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        layout,
    )

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("int").alias("b")
    )
    rows = df.select(
        "a", "b", layout.morton_code(F.col("a"), F.col("b"), bits=4).alias("m")
    ).collect()
    codes = {(r["a"], r["b"]): r["m"] for r in rows}
    assert len(set(codes.values())) == 256  # bijective on the 16x16 grid
    assert codes[(0, 0)] == 0 and codes[(15, 15)] == 255
    # bit-interleave spot checks: a=1,b=0 -> 1; a=0,b=1 -> 2; a=3,b=5 -> ?
    assert codes[(1, 0)] == 1 and codes[(0, 1)] == 2
    # 3=0b011, 5=0b101 -> interleave -> b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 0b100111
    assert codes[(3, 5)] == 0b100111


def test_zorder_layout_prunes_on_either_dimension(spark, tmp_path):
    """The scan-pruning claim, measured on real files: a selective
    predicate on the SECOND key touches few z-ordered files but every
    single-key-sorted file."""
    import json

    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        layout,
    )

    n, files = 1 << 14, 16
    grid = spark.range(n).select(
        (F.col("id") % 128).alias("a"), (F.col("id") / 128).cast("long").alias("b")
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    layout.write_zordered(grid, zpath, "a", "b", n_files=files, bits=8)
    (grid.repartitionByRange(files, "a").sortWithinPartitions("a")
        .write.mode("overwrite").parquet(spath))

    def files_touched(path, col, lo, hi):
        import glob
        import pyarrow.parquet as pq
        touched = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= hi and st.max >= lo:
                    touched += 1
                    break
        return touched

    # predicate narrow in b: z-order prunes, a-sort cannot
    zb = files_touched(zpath, "b", 10, 17)
    sb = files_touched(spath, "b", 10, 17)
    assert zb <= files // 2 < sb == files
    # predicate narrow in a: BOTH layouts prune (z-order keeps a bounded too)
    za = files_touched(zpath, "a", 0, 7)
    assert za <= files // 2


def test_mutual_information_known_values(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        quality,
    )

    # perfectly dependent: b == a -> MI = H(A) = ln 2, NMI = 1
    dep = spark.createDataFrame([(0, 0), (1, 1)] * 8, "a int, b int")
    r = quality.mutual_information(dep, "a", "b").first()
    import math

    assert abs(r["mi"] - math.log(2)) < 1e-12 and abs(r["nmi"] - 1.0) < 1e-12
    # independent uniform 2x2 -> MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in (0, 1) for b in (0, 1)] * 4, "a int, b int"
    )
    r = quality.mutual_information(ind, "a", "b").first()
    assert abs(r["mi"]) < 1e-12 and abs(r["nmi"]) < 1e-12
    # constant column -> zero entropy -> nmi defined as 0
    const = spark.createDataFrame([(0, 1), (0, 2)] * 4, "a int, b int")
    r = quality.mutual_information(const, "a", "b").first()
    assert r["mi"] == 0.0 and r["nmi"] == 0.0


def test_negative_edges_are_nonedges_and_deterministic(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        graph,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")], "id_a string, id_b string"
    )
    neg1 = {(r["neg_a"], r["neg_b"]) for r in graph.negative_edges(edges, k=3).collect()}
    neg2 = {(r["neg_a"], r["neg_b"]) for r in graph.negative_edges(edges, k=3).collect()}
    assert neg1 == neg2  # deterministic across runs
    real = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}
    assert neg1 and not (neg1 & real)  # true non-edges only
    for a, b in neg1:
        assert a < b and a != b  # canonical, no self-pairs
    # yield bound: at most k draws per node, canonicalized + deduped
    assert len(neg1) <= 3 * 4


def test_fellegi_sunter_weights_and_decisions(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        linkage,
    )
    import math

    left = spark.createDataFrame(
        [(1, "acme corp", 10), (2, "zebra ltd", 10)],
        "lid long, name_a string, blk int",
    )
    right = spark.createDataFrame(
        [(7, "acme corporation", 10), (8, None, 10), (9, "other", 11)],
        "rid long, name_b string, blk int",
    )
    cand = linkage.blocked_candidates(left, right, ["blk"])
    assert cand.count() == 4  # rid 9 blocked out (different block)
    fields = {
        "name": (linkage.token_jaccard(F.col("name_a_l"), F.col("name_b_r")) >= 0.3,
                 0.9, 0.05),
    }
    scored = linkage.fs_score(cand, fields, upper=1.0, lower=-3.0)
    got = {(r["lid_l"], r["rid_r"]): (round(r["score"], 9), r["decision"])
           for r in scored.collect()}
    w_agree = round(math.log(0.9 / 0.05), 9)
    w_dis = round(math.log(0.1 / 0.95), 9)
    # acme corp vs acme corporation: tokens {acme,corp} vs
    # {acme,corporation} -> jaccard 1/3 >= 0.3 -> agree -> match
    assert got[(1, 7)] == (w_agree, "match")
    # NULL comparator -> weight 0 -> 'possible' (no information)
    assert got[(1, 8)][0] == 0.0 and got[(1, 8)][1] == "possible"
    assert got[(2, 8)][0] == 0.0
    # zebra vs acme corporation: jaccard 0 -> disagree -> w_dis in
    # (lower, upper] -> possible
    assert got[(2, 7)] == (w_dis, "possible")


def test_multi_blocked_candidates_union_dedup_and_recall(spark):
    """Multi-pass blocking: each pass is an equi join on its own key
    expressions; the union dedups on the id pair; a pair reachable
    through BOTH passes appears once; a pair reachable through NEITHER
    is absent (blocking recall loss is explicit, never silent)."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        linkage,
    )

    left = spark.createDataFrame(
        [(1, "x7", 100), (2, "y9", 200), (3, "z1", 300)],
        "lid long, lcode string, lval int",
    )
    right = spark.createDataFrame(
        [(7, "x7", 100), (8, "q2", 200), (9, "z1", 999)],
        "rid long, rcode string, rval int",
    )
    cand = linkage.multi_blocked_candidates(
        left,
        right,
        passes=[
            [(F.col("lval"), F.col("rval"))],       # value block
            [(F.col("lcode"), F.col("rcode"))],     # code block
        ],
        id_cols=("lid", "rid"),
    )
    pairs = {(r["lid_l"], r["rid_r"]) for r in cand.collect()}
    # (1,7) matches BOTH passes -> exactly once; (2,8) value-only;
    # (3,9) code-only; everything else blocked out
    assert pairs == {(1, 7), (2, 8), (3, 9)}
    assert cand.count() == 3  # dedup across passes
    # all columns of both sides ride out suffixed
    assert set(cand.columns) == {
        "lid_l", "lcode_l", "lval_l", "rid_r", "rcode_r", "rval_r"
    }


def test_multi_blocked_candidates_max_block_cap_and_census(spark):
    """The blocking skew cap (VERDICT r7 #1): a hot block is bounded to
    max_block rows PER SIDE, the keep-set is the max_block smallest
    ids (deterministic total order), pairs outside the keep-set are
    dropped, and blocking_census reports exactly the dropped mass."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        linkage,
    )

    # one hot block (val=100): 5 left x 6 right; one small block (200)
    left = spark.createDataFrame(
        [(i, 100) for i in range(1, 6)] + [(9, 200)], "lid long, lval int"
    )
    right = spark.createDataFrame(
        [(i, 100) for i in range(11, 17)] + [(19, 200)], "rid long, rval int"
    )
    passes = [[(F.col("lval"), F.col("rval"))]]
    uncapped = linkage.multi_blocked_candidates(
        left, right, passes=passes, id_cols=("lid", "rid")
    )
    assert uncapped.count() == 5 * 6 + 1
    capped = linkage.multi_blocked_candidates(
        left, right, passes=passes, id_cols=("lid", "rid"), max_block=3
    )
    pairs = {(r["lid_l"], r["rid_r"]) for r in capped.collect()}
    # keep-set = 3 smallest ids per side in the hot block
    assert pairs == {
        (l, r) for l in (1, 2, 3) for r in (11, 12, 13)
    } | {(9, 19)}
    # census: hot block over cap on both sides; dropped = 2 left, 3 right
    census = {
        (r["pass_idx"], r["side"]): (
            r["n_blocks"], r["over_cap_blocks"], r["dropped_rows"]
        )
        for r in linkage.blocking_census(
            left, right, passes=passes, id_cols=("lid", "rid"), max_block=3
        ).collect()
    }
    assert census == {(0, "left"): (2, 1, 2), (0, "right"): (2, 1, 3)}
    # determinism: same keep-set on a different partitioning
    pairs2 = {
        (r["lid_l"], r["rid_r"])
        for r in linkage.multi_blocked_candidates(
            left.repartition(7), right.repartition(5),
            passes=passes, id_cols=("lid", "rid"), max_block=3,
        ).collect()
    }
    assert pairs2 == pairs


def test_blocked_candidates_max_block_bounds_hot_block(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        linkage,
    )

    left = spark.createDataFrame(
        [(i, "hot") for i in range(20)], "lid long, blk string"
    )
    right = spark.createDataFrame(
        [(i, "hot") for i in range(20)], "rid long, blk string"
    )
    capped = linkage.blocked_candidates(left, right, ["blk"], max_block=4)
    assert capped.count() == 16  # 4 x 4, not 400
    # deterministic under re-partitioning (content-hash keep-set)
    a = {(r["lid_l"], r["rid_r"]) for r in capped.collect()}
    b = {
        (r["lid_l"], r["rid_r"])
        for r in linkage.blocked_candidates(
            left.repartition(3), right.repartition(9), ["blk"], max_block=4
        ).collect()
    }
    assert a == b


def test_clustering_coefficients_known_graph(spark):
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        graph,
    )

    # triangle a-b-c plus pendant c-d: cc(a)=cc(b)=1, cc(c)=1/3, cc(d)=0
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")], "id_a string, id_b string"
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], round(r["cc"], 9))
        for r in graph.clustering_coefficients(edges).collect()
    }
    assert got == {
        "a": (2, 1, 1.0),
        "b": (2, 1, 1.0),
        "c": (3, 1, round(1 / 3, 9)),
        "d": (1, 0, 0.0),
    }


def test_frequent_pairs_counts_and_lift(spark):
    baskets = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
         (4, "y"), (4, "y")],  # duplicate item in basket counts once
        "bk long, item string",
    )
    got = {
        (r["item_a"], r["item_b"]): r
        for r in analysis.frequent_pairs(baskets, "bk", "item", min_support=1).collect()
    }
    xy = got[("x", "y")]
    # x in baskets {1,2,3}, y in {1,2,4}, both in {1,2}; N=4
    assert (xy["support"], xy["n_a"], xy["n_b"]) == (2, 3, 3)
    assert abs(xy["conf_a_to_b"] - 2 / 3) < 1e-12
    assert abs(xy["lift"] - (2 * 4) / (3 * 3)) < 1e-12
    xz = got[("x", "z")]
    assert (xz["support"], xz["n_b"]) == (1, 1)
    assert abs(xz["lift"] - (1 * 4) / (3 * 1)) < 1e-12
    assert ("y", "z") not in got  # never co-occur


def test_linkage_default_max_block_caps_hot_block(spark):
    """VERDICT r8 #6: the skew cap is the DEFAULT — a hot block bigger
    than 1000/side is capped without the caller asking, and
    max_block=None is the explicit uncapped opt-out."""
    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        linkage,
    )

    left = spark.range(1200).select(
        F.col("id").alias("lid"), F.lit("HOT").alias("bk")
    )
    right = spark.range(1100).select(
        F.col("id").alias("rid"), F.lit("HOT").alias("bk")
    )
    capped = linkage.multi_blocked_candidates(
        left, right,
        passes=[[(F.col("bk"), F.col("bk"))]],
        id_cols=("lid", "rid"),
    )
    assert capped.count() == 1000 * 1000
    uncapped = linkage.multi_blocked_candidates(
        left, right,
        passes=[[(F.col("bk"), F.col("bk"))]],
        id_cols=("lid", "rid"),
        max_block=None,
    )
    assert uncapped.count() == 1200 * 1100
    bc = linkage.blocked_candidates(left, right, ["bk"])
    assert bc.count() == 1000 * 1000


def test_multi_grain_report_grouping_vs_null_and_single_expand(spark):
    """GROUPING() disambiguation: a rolled-up dim renders 'ALL', a
    genuinely NULL data value renders 'UNKNOWN', and the two are never
    conflated; the physical plan is ONE Expand + aggregate pass, not a
    union of per-grain scans."""
    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        analysis,
    )

    df = spark.createDataFrame(
        [("a", "2024", 1.0), (None, "2024", 2.0), ("a", "2025", 4.0)],
        ["brand", "yr", "amt"],
    )
    out = analysis.multi_grain_report(
        df,
        dims=["brand", "yr"],
        grouping_sets=[["brand", "yr"], ["brand"], []],
        aggs=[F.sum("amt").alias("amount")],
    )
    rows = {(r["brand"], r["yr"], r["grain"]): r["amount"] for r in out.collect()}
    # finest grain: the NULL data value is UNKNOWN, not ALL
    assert rows[("UNKNOWN", "2024", "00")] == 2.0
    assert rows[("a", "2024", "00")] == 1.0
    # brand-only grain: yr rolled up -> 'ALL' with grouping bit set
    assert rows[("a", "ALL", "01")] == 5.0
    assert rows[("UNKNOWN", "ALL", "01")] == 2.0
    # grand total: both bits set
    assert rows[("ALL", "ALL", "11")] == 7.0
    # and the UNKNOWN/ALL pair never collides on the same grain
    assert ("UNKNOWN", "ALL", "11") not in rows
    # AQE prints the plan twice (final + initial); count within the
    # final section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Expand") == 1
    assert "Union" not in plan


def test_multi_grain_report_agg_names_survive_collisions(spark):
    """ADVICE r11: aggregate output columns are captured positionally
    (groupingSets output is [dims…, aggs…, flags…]), so an aggregate
    aliased with the '__g_' prefix — which name-exclusion filtering
    would silently drop — survives to the output."""
    from pyspark.sql import functions as F

    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        analysis,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 4.0)], ["brand", "amt"]
    )
    out = analysis.multi_grain_report(
        df,
        dims=["brand"],
        grouping_sets=[["brand"], []],
        aggs=[
            F.sum("amt").alias("__g_weird"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    assert out.columns == ["brand", "grain", "__g_weird", "n"]
    rows = {(r["brand"], r["grain"]): (r["__g_weird"], r["n"]) for r in out.collect()}
    assert rows[("a", "0")] == (5.0, 2)
    assert rows[("ALL", "1")] == (7.0, 3)
