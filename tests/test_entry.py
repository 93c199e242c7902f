"""Smoke tests for the driver contract (full oracle comparison lives in
tools/check_oracle.py, driven at sf0.01)."""

import __spark_entry__ as entry


def test_entry_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns


def test_queries_and_oracles_aligned():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 30
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    # every registered query is oracle-checked (media_features via the
    # deterministic metadata projection; minhash_pairs_fast via the
    # candidates+exact-verify construction)
    assert set(qs) - set(oracles) == set()


def test_selected_queries_run(spark, sf_dir):
    qs = entry.queries()
    for name in ["pricing_summary", "containment_first", "minhash_signatures"]:
        assert qs[name](spark, sf_dir).count() > 0
