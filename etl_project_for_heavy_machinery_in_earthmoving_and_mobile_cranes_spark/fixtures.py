"""Deterministic domain fixtures (FIXTURES.md): a hand-crafted shipments
batch + knowledge-base dims engineered so every pipeline path fires —
each tie-break, each starting_point code, sentinel/NULL edges, the band
join, and the outlier marking.  Expected labels are asserted row-by-row
in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import FX_RATES_SCHEMA, MODEL_REF_SCHEMA, REGEX_KB_SCHEMA

# (ref_idx, brand, model, capacity, type, hp)
MODEL_REF_ROWS = [
    (1, "KOMATSU", "PC200-8", 20.0, "EXCAVATOR", 148.0),
    (2, "KOMATSU", "PC200", 20.0, "EXCAVATOR", 145.0),
    (3, "CATERPILLAR", "320D", 20.0, "EXCAVATOR", 150.0),
    (4, "CATERPILLAR", "330", 30.0, "EXCAVATOR", 200.0),
    (5, "HITACHI", "ZX200", 20.0, "EXCAVATOR", 150.0),
    (6, "SANY", "SY215C", 21.5, "EXCAVATOR", 160.0),
    (7, "XCMG", "XE215C", 21.5, "EXCAVATOR", 163.0),
    (8, "GROVE", "GMK5250L", 250.0, "WHEELED CRANE", None),
    (9, "TAKEUCHI", "TB216", 1.8, "EXCAVATOR", 15.0),
    (10, "SDLG", "E6210F", 21.0, "EXCAVATOR", None),
    (11, "HIDROMEK", "HMK102B", 10.2, "WHEEL EXCAVATOR", None),
    (12, "VOLVO", "EC 130", 13.0, "EXCAVATOR", 100.0),
    (13, "VOLVO", "EC 130 C", 13.5, "EXCAVATOR", 105.0),
]

# (kb_order, brand, model_regex, capacity_regex, category, starting_point)
# kb_order = table order after the length-desc sort; LAST match wins (J3)
REGEX_KB_ROWS = [
    (1, "KOMATSU", r"PC ?\d{3}", r"PC ?(\d+)", "EXCAVATOR", 0),
    (2, "HITACHI", r"ZX\d{2,3}[A-Z]{0,3}", r"ZX(\d+)", "EXCAVATOR", 0),
    (3, "CATERPILLAR", r"3\d{2}[A-Z]{0,2}", r"3(\d{2})", "EXCAVATOR", 3),
    (4, "SANY", r"SY\d{3}[A-Z]{0,2}", r"SY(\d+)", "EXCAVATOR", 1),
    (5, "KOBELCO", r"SK\d{2,3}", r"SK(\d+)", "EXCAVATOR", 2),
    (6, "ZOOMLION", r"QUY\d{2,3}", r"QUY(\d+)", "CRAWLER CRANE", -2),
    (7, "TADANO", r"GR\d{3}EX?", r"GR(\d+)", "ROUGH-TERRAIN CRANE", -1),
    # same-brand second pattern: tests last-match-wins within a brand
    (8, "KOMATSU", r"PC\d{2}", r"PC(\d+)", "EXCAVATOR", 0),
]

FX_RATES = {2024: {5: 7.24, 6: 7.25}}  # July deliberately missing

_BASE = dict(
    hs_code="84295200",
    code_description="Excavators; self-propelled, w/360 deg revolving superstructure",
    importer="PT FIXTURE IMPORTER",
    original_country="JAPAN",
    original_state="TOKYO",
    unit="Number of international units",
    declaration_number=None,
    import_export="Import",
    destination_port="TANJUNG PRIOK",
    foreign_port="YOKOHAMA",
    importer_address="JAKARTA",
    exporter_address="TOKYO",
    currency="USD",
    amount_in_idr=None,
    price_in_idr=None,
    unit_price_in_usd_by_weight=None,
    amount_in_contract=None,
    price_in_contract=None,
)


def _row(sid, month, desc, supplier, qty, amount, date, weight_kg):
    # raw input price (the F1 filter reads it BEFORE the recompute);
    # customs extracts carry amount/qty as the declared unit price
    try:
        price = amount / float(qty)
    except (TypeError, ValueError):
        price = amount
    r = dict(_BASE)
    r.update(
        shipment_id=sid,
        month=month,
        product_description=desc,
        supplier=supplier,
        qty=qty,
        amount_in_usd=amount,
        price_in_usd=price,
        date=date,
        weight_in_kg=weight_kg,
    )
    return r


# Each row's expected outcome is asserted in tests/test_pipeline.py.
SHIPMENT_ROWS = [
    # 1: J1 first-brand + J2 longest model (PC200-8 beats PC200)
    _row(1, 202405, "KOMATSU PC200-8 CRAWLER EXCAVATOR", "TOKYO TRADING", "1", 100000.0, "2024/05/10", "20000"),
    # 2: brand via supplier alias (MARUBENI→KOMATSU), model in description
    _row(2, 202405, "HYDRAULIC EXCAVATOR PC200", "MARUBENI CORPORATION", "1", 95000.0, "2024/05/11", "19800"),
    # 3: no brand anywhere; global regex pass → HITACHI ZX200, used (year token)
    _row(3, 202406, "USED HYDRAULIC EXCAVATOR ZX200 YEAR 2015", "PT SECOND IMPORT", "1", 60000.0, "2024/06/02", "19500"),
    # 4: token-exact CAT alias → CATERPILLAR; model 320D
    _row(4, 202406, "CAT 320D EXCAVATOR", "GLOBAL MACHINERY", "1", 110000.0, "2024/06/05", "20500"),
    # 5: brand, no model, no regex hit → Brands existed but without models
    _row(5, 202406, "CATERPILLAR EXCAVATOR BRAND NEW", "GLOBAL MACHINERY", "1", 120000.0, "2024/06/06", "21000"),
    # 6: nothing matches; capacity from text (T7)
    _row(6, 202406, "EXCAVATOR 20 TONS CAPACITY GOOD CONDITION", "PT MISC", "1", 50000.0, "2024/06/07", "20000"),
    # 7: multi-brand string → first in ref order (KOMATSU) wins, no model
    _row(7, 202406, "KOMATSU BUCKET FOR HITACHI EXCAVATOR", "PT PARTS", "1", 15000.0, "2024/06/08", "900"),
    # 8: irrelevant keyword → dropped by F2
    _row(8, 202406, "TELEHANDLER 5 TON BOOM", "PT LIFT", "1", 40000.0, "2024/06/09", "5000"),
    # 9: parts overwrite (CKD) after full match
    _row(9, 202406, "EXCAVATOR CKD SHIPMENT SANY SY215C", "SANY GROUP", "1", 70000.0, "2024/06/10", "21500"),
    # 10: punctuation noise normalization
    _row(10, 202406, "KOMATSU, PC200-8 [CRAWLER]: EXCAVATOR*", "TOKYO TRADING", "1", 102000.0, "2024/06/11", "20100"),
    # 11: type from ref wins; AMPHIBIOUS guard (type already known)
    _row(11, 202406, "AMPHIBIOUS SWAMP KOMATSU PC200 EXCAVATOR", "TOKYO TRADING", "1", 99000.0, "2024/06/12", "20000"),
    # 12: Turkish dotted-İ supplier alias + unconditional TIRE overwrite
    _row(12, 202407, "WHEEL EXCAVATOR WITH TIRE HMK102B", "HİDROMEK MAKINA", "1", 80000.0, "2024/07/01", "10200"),
    # 13: below both amount+price thresholds → dropped by F1
    _row(13, 202407, "KOMATSU PC200 EXCAVATOR CHEAP", "TOKYO TRADING", "1", 5000.0, "2024/07/02", "20000"),
    # 14: crane row, type from ref
    _row(14, 202407, "GROVE GMK5250L ALL TERRAIN CRANE 250 TON", "MANITOWOC CRANE GROUP", "1", 900000.0, "2024/07/03", "60000"),
    # 15: supplier alias XUZHOU→XCMG, model XE215C
    _row(15, 202407, "XE215C EXCAVATOR", "XUZHOU CONSTRUCTION MACHINERY", "1", 88000.0, "2024/07/04", "21500"),
    # 16: longest-model tie-break with prefix pair (EC130 vs EC130C)
    _row(16, 202407, "VOLVO EC130C EXCAVATOR", "VOLVO CE", "1", 78000.0, "2024/07/05", "13500"),
    # 17: multi-word used phrase (documented-intent path)
    _row(17, 202407, "SECOND HAND KOMATSU PC200 EXCAVATOR", "TOKYO TRADING", "1", 55000.0, "2024/07/06", "20000"),
    # 18: J5 band inference: brand+type+capacity known, model unknown
    _row(18, 202407, "CRAWLER EXCAVATOR KOMATSU 20.5 TONS", "TOKYO TRADING", "1", 97000.0, "2024/07/07", "20500"),
    # 19/20: outlier group with row 1/10 (PC200-8): median 102000 → 200000 flagged
    _row(19, 202407, "KOMATSU PC200-8 EXCAVATOR", "TOKYO TRADING", "1", 104000.0, "2024/07/08", "20000"),
    _row(20, 202407, "KOMATSU PC200-8 EXCAVATOR GOLD EDITION", "TOKYO TRADING", "1", 200000.0, "2024/07/09", "20000"),
    # 21: starting_point 2 (TBD → NULL capacity), brand from kb
    _row(21, 202407, "KOBELCO SK200 EXCAVATOR", "PT KOBELCO IMPORT", "1", 85000.0, "2024/07/10", "20000"),
    # 22: starting_point -2, crane category from kb
    _row(22, 202407, "QUY550 CRAWLER CRANE TELESCOPIC", "ZOOMLION HEAVY INDUSTRY", "1", 400000.0, "2024/07/11", "55000"),
    # 23: brand-scoped regex, two same-brand patterns → last (kb_order 8) wins
    _row(23, 202407, "KOMATSU PC300 EXCAVATOR", "TOKYO TRADING", "1", 130000.0, "2024/07/12", "30000"),
    # 24: junk qty/weight → NULL coercion path; qty 0 → NULL unit price
    _row(24, 202407, "KOMATSU PC200 EXCAVATOR", "TOKYO TRADING", "abc", 91000.0, "2024/07/13", "junk"),
    # 25: new override (USED ... UNUSED → new)
    _row(25, 202407, "USED UNUSED KOMATSU PC200 EXCAVATOR", "TOKYO TRADING", "2", 180000.0, "2024/07/14", "40000"),
]

SHIPMENT_COLUMNS = [
    "shipment_id", "month", "hs_code", "product_description", "code_description",
    "importer", "supplier", "original_country", "original_state", "qty", "unit",
    "amount_in_usd", "price_in_usd", "amount_in_contract", "price_in_contract",
    "date", "declaration_number", "import_export", "destination_port",
    "foreign_port", "importer_address", "exporter_address", "currency",
    "amount_in_idr", "price_in_idr", "unit_price_in_usd_by_weight", "weight_in_kg",
]


def shipments_df(spark: SparkSession) -> DataFrame:
    from .schemas import SHIPMENTS_SCHEMA

    data = [tuple(r[c] for c in SHIPMENT_COLUMNS) for r in SHIPMENT_ROWS]
    return spark.createDataFrame(data, SHIPMENTS_SCHEMA)


def model_ref_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MODEL_REF_ROWS, MODEL_REF_SCHEMA)


def regex_kb_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(REGEX_KB_ROWS, REGEX_KB_SCHEMA)


def fx_rates_df(spark: SparkSession) -> DataFrame:
    rows = [(y, m, r) for y, ms in FX_RATES.items() for m, r in ms.items()]
    return spark.createDataFrame(rows, FX_RATES_SCHEMA)
