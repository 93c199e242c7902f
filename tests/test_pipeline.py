"""Golden test: the full cleaning pipeline on the hand-crafted fixture
batch, asserted row-by-row (FIXTURES.md §6 / SURVEY §5.2).

Expected values are hand-computed from the reference semantics:
tie-breaks (first brand in ref order, longest model, last regex in
table order), starting_point codes, F1/F2 drops, the ±5% band
inference, outlier medians, interval binning and month-keyed FX.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark import fixtures
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.plans import pipeline


@pytest.fixture(scope="module")
def result(spark):
    df = pipeline.run_pipeline(
        fixtures.shipments_df(spark),
        fixtures.model_ref_df(spark),
        fixtures.regex_kb_df(spark),
        fixtures.fx_rates_df(spark),
        datasource="fixture_batch",
    )
    rows = {r["shipment_id"]: r.asDict() for r in df.collect()}
    return rows


# shipment_id → (brand, model, type, capacity, remark, new_used, outliers)
EXPECTED = {
    1: ("KOMATSU", "PC200-8", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    2: ("KOMATSU", "PC200", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    3: ("HITACHI", "ZX200", "EXCAVATOR", 20.0, pipeline.R_RX_NB_UNIQUE, "used", "unknown"),
    4: ("CATERPILLAR", "320D", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    5: ("CATERPILLAR", None, None, None, pipeline.R_BRAND_ONLY, "new", "unknown"),
    6: (None, None, None, 20.0, pipeline.R_CAPACITY, "new", "unknown"),
    7: ("KOMATSU", None, None, None, pipeline.R_BRAND_ONLY, "new", "unknown"),
    9: ("SANY", "SY215C", "EXCAVATOR", 21.5, pipeline.R_PARTS, "new", "no"),
    10: ("KOMATSU", "PC200-8", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    11: ("KOMATSU", "PC200", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    12: ("HIDROMEK", "HMK102B", "WHEEL EXCAVATOR", 10.2, pipeline.R_FULL, "new", "no"),
    14: ("GROVE", "GMK5250L", "WHEELED CRANE", 250.0, pipeline.R_FULL, "new", "no"),
    15: ("XCMG", "XE215C", "EXCAVATOR", 21.5, pipeline.R_FULL, "new", "no"),
    16: ("VOLVO", "EC130C", "EXCAVATOR", 13.5, pipeline.R_FULL, "new", "no"),
    17: ("KOMATSU", "PC200", "EXCAVATOR", 20.0, pipeline.R_FULL, "used", "unknown"),
    18: ("KOMATSU", "PC200", "EXCAVATOR", 20.5, pipeline.R_INFERRED, "new", "no"),
    19: ("KOMATSU", "PC200-8", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
    20: ("KOMATSU", "PC200-8", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "yes"),
    # capacity unknown but model known + new → judged vs median (the
    # golden output ignores capacity in the outlier unknown-rule,
    # COMPAT.md #15); singleton group ⇒ price == own median ⇒ 'no'
    21: ("KOBELCO", "SK200", "EXCAVATOR", None, pipeline.R_RX_NB_UNIQUE, "new", "no"),
    22: ("ZOOMLION", "QUY550", "CRAWLER CRANE", 0.0, pipeline.R_RX_NB_UNIQUE, "new", "no"),
    23: ("KOMATSU", "PC30", "EXCAVATOR", 3.0, pipeline.R_RX_UNIQUE, "new", "no"),
    24: ("KOMATSU", "PC200", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "unknown"),
    25: ("KOMATSU", "PC200", "EXCAVATOR", 20.0, pipeline.R_FULL, "new", "no"),
}


def test_dropped_rows(result):
    # 8: F2 irrelevant keyword (TELEHANDLER); 13: F1 below both thresholds
    assert set(result) == set(EXPECTED)


@pytest.mark.parametrize("sid", sorted(EXPECTED))
def test_row_labels(result, sid):
    brand, model, typ, cap, remark, nu, out = EXPECTED[sid]
    r = result[sid]
    assert r["brand"] == brand, f"brand {r['brand']}"
    assert r["model"] == model, f"model {r['model']}"
    assert r["type"] == typ, f"type {r['type']}"
    assert r["capacity"] == cap, f"capacity {r['capacity']}"
    assert r["remark"] == remark, f"remark {r['remark']}"
    assert r["new_used"] == nu
    assert r["outliers"] == out


def test_intervals(result):
    assert result[1]["capacity_interval"] == "20-30T"
    assert result[12]["capacity_interval"] == "10-20T"
    assert result[14]["capacity_interval"] == "250-260T"
    assert result[14]["type_interval"] == "≥90T"
    assert result[22]["capacity_interval"] == "UNKNOWN"  # capacity 0
    assert result[23]["capacity_interval"] == "<5T"
    # weight fallback when capacity unknown (row 5: 21t unit weight)
    assert result[5]["capacity_interval"] == "20-30T"
    # sub-5t weight fallback (row 7: 0.9t)
    assert result[7]["capacity_interval"] == "<5T"


def test_fx_conversion(result):
    assert result[1]["price_in_cny"] == pytest.approx(100000 * 7.24)
    assert result[3]["price_in_cny"] == pytest.approx(60000 * 7.25)
    # July missing from fx dim → NULL (reference unmatched-month behavior)
    assert result[14]["price_in_cny"] is None


def test_coercion_nulls(result):
    # junk qty/weight strings coerce to NULL (pandas to_numeric semantics)
    assert result[24]["qty_n"] is None
    assert result[24]["price_in_usd"] is None


def test_remark_distribution(result):
    from collections import Counter

    c = Counter(r["remark"] for r in result.values())
    assert c == {
        pipeline.R_FULL: 14,
        pipeline.R_BRAND_ONLY: 2,
        pipeline.R_PARTS: 1,
        pipeline.R_RX_NB_UNIQUE: 3,
        pipeline.R_RX_UNIQUE: 1,
        pipeline.R_CAPACITY: 1,
        pipeline.R_INFERRED: 1,
    }


def test_export_rendering(spark, result):
    df = pipeline.run_pipeline(
        fixtures.shipments_df(spark),
        fixtures.model_ref_df(spark),
        fixtures.regex_kb_df(spark),
    )
    rendered = pipeline.render_export(df)
    rows = {r["shipment_id"]: r for r in rendered.collect()}
    assert rows[6]["brand"] == "UNKNOWN"
    assert rows[5]["model"] == "UNKNOWN"
    assert rows[21]["capacity"] == "UNKNOWN"


def test_analysis_reports(spark):
    """Key-players flow (SURVEY §7.4): shares + OTHERS folding + top-3."""
    from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
        analysis,
    )

    df = pipeline.run_pipeline(
        fixtures.shipments_df(spark),
        fixtures.model_ref_df(spark),
        fixtures.regex_kb_df(spark),
    )
    shares = analysis.group_share(
        pipeline.render_export(df), "brand", "amount_in_usd", qty_col="qty_n"
    )
    got = {r["brand"]: r for r in shares.collect()}
    assert sum(r["amount_prop"] for r in got.values()) == pytest.approx(100.0)
    folded = analysis.fold_others(shares.select("brand", "amount", "amount_prop"), "brand")
    fr = {r["brand"]: r for r in folded.collect()}
    assert "OTHERS" in fr
    top3 = analysis.top_k(shares, "amount", 3).collect()
    assert len(top3) == 3
    assert top3[0]["amount"] >= top3[1]["amount"] >= top3[2]["amount"]


def test_reference_golden_snapshot_shape():
    """The committed parity snapshot the driver hashes against: 832
    rows (the golden May-Jul slice), the exact projection
    __spark_entry__._REF_PARITY_COLS, UNKNOWN sentinels rendered."""
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    t = pq.read_table(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "golden", "reference_batch_golden.parquet")
    )
    assert t.num_rows == 832
    assert t.column_names == entry._REF_PARITY_COLS
    remarks = set(t.column("remark").to_pylist())
    assert "Fully match" in remarks and "Parts" in remarks
