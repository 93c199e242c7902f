"""Reference-input harness: rebuild the engine's input frames from the
reference repo's OWN published artifacts (raw batch xlsx + golden
output xlsx), so the full cleaning pipeline can run end-to-end on the
reference's real data — both for the offline parity scorer
(tools/reference_parity.py) and for the driver-checked
``reference_batch_parity`` registry query.

The reference's knowledge-base xlsx files are unpublished; the model
catalog and regex table are reverse-engineered from the golden output's
remark provenance (see the function docstrings and PARITY.md for the
witness rules).  Everything here is deterministic: same xlsx bytes in,
bit-identical frames out.

Reference files (read-only): ``Input data/Indonesia_842952_May_July
.xlsx`` (1,294 rows) and ``Output/Indonesia_excavator_2022_2024.07
.xlsx`` (golden, the May–Jul slice is 832 rows) — cited against
prog.py's main() ingest (data_processing_program_20240520.py:21-44).
"""

from __future__ import annotations

import os as _os
import re as _re
from collections import Counter, defaultdict

from pyspark.sql import DataFrame, SparkSession

from .schemas import MODEL_REF_SCHEMA, REGEX_KB_SCHEMA, SHIPMENTS_SCHEMA
from .sources.xlsx_lite import read_xlsx_records

# reference-repo root is env-overridable (ADVICE r6): any checkout can
# point SPARK_GRAFT_REFERENCE_DIR at its local copy of the reference
_REFERENCE_DIR = _os.environ.get("SPARK_GRAFT_REFERENCE_DIR", "/root/reference")
INPUT_XLSX = _os.path.join(
    _REFERENCE_DIR, "Input data", "Indonesia_842952_May_July.xlsx"
)
GOLDEN_XLSX = _os.path.join(
    _REFERENCE_DIR, "Output", "Indonesia_excavator_2022_2024.07.xlsx"
)

# input xlsx header → engine column
COLMAP = {
    "month": "month",
    "hs code": "hs_code",
    "product description": "product_description",
    "code description": "code_description",
    "importer": "importer",
    "supplier": "supplier",
    "original country": "original_country",
    "original state": "original_state",
    "qty": "qty",
    "unit": "unit",
    "amount in usd": "amount_in_usd",
    "price in usd": "price_in_usd",
    "amount in contract": "amount_in_contract",
    "price in contract": "price_in_contract",
    "date": "date",
    "declaration number": "declaration_number",
    "import/export": "import_export",
    "destination port in indonesia": "destination_port",
    "foreign ports of loading": "foreign_port",
    "importer address": "importer_address",
    "exporter address": "exporter_address",
    "currency": "currency",
    "amount in IDR": "amount_in_idr",
    "price in IDR": "price_in_idr",
    "unit price in usd by weight": "unit_price_in_usd_by_weight",
    "weight in kg": "weight_in_kg",
}

# remark → provenance (the golden history slices carry the Chinese
# originals of the same vocabulary, prog.py remark strings)
RX_REMARKS = {
    "Unique model match with regex",
    "No brand in description, and unique model match with regex",
    "Keep the longest from the multiple matched",
    "No brand in description, and keep the longest from the multiple matched",
    "根据规律匹配，型号唯一",
    "描述中未找到对应品牌，根据规律匹配型号，型号唯一",
    "根据规律，有多个匹配结果，但只保留最长型号",
    "描述中未找到对应品牌，根据规律匹配型号，有多个匹配结果，但只保留最长型号",
}
CONTAINMENT_REMARKS = {"Fully match", "完全匹配"}


def _fnum(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def load_reference_records() -> tuple[list[dict], list[dict]]:
    """(raw input records, golden output records) from the xlsx files."""
    return read_xlsx_records(INPUT_XLSX), read_xlsx_records(GOLDEN_XLSX)


def build_shipments(spark: SparkSession, raw: list[dict]) -> DataFrame:
    """Shipments frame from the raw input batch, typed per
    SHIPMENTS_SCHEMA with a 1-based row id in xlsx order."""
    rows = []
    for i, r in enumerate(raw):
        d = {eng: r.get(src) for src, eng in COLMAP.items()}
        rows.append(
            tuple(
                [i + 1]
                + [
                    (
                        None
                        if d.get(f.name) is None
                        else (
                            float(d[f.name])
                            if f.dataType.typeName() == "double"
                            else int(d[f.name])
                            if f.dataType.typeName() == "integer"
                            else str(d[f.name])
                        )
                    )
                    for f in SHIPMENTS_SCHEMA.fields[1:]
                ]
            )
        )
    return spark.createDataFrame(rows, SHIPMENTS_SCHEMA)


def fit_capacity_rule(model: str, cap):
    """Pick (capacity_regex, starting_point) whose transform of the
    model's first digit-run yields the golden capacity."""
    hit = _re.search(r"[0-9]+", model)
    if cap is None or hit is None:
        return "([0-9]+)", 2  # undeterminable → sentinel
    num = hit.group(0)
    if num and _fnum(num) is not None:
        if float(num) / 10 == cap:
            return "([0-9]+)", 0
        if float(num) == cap:
            return "([0-9]+)", 3
        if len(num) > 1 and _fnum(num[1:]) is not None and float(num[1:]) / 10 == cap:
            return "([0-9]+)", 1
        if len(num) > 2 and _fnum(num[2:]) is not None and float(num[2:]) == cap:
            return "([0-9]+)", -2
    return "([0-9]+)", 2


def build_kbs(
    spark: SparkSession, golden: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """(model_ref, regex_kb) reverse-engineered from the golden output.

    Rows with containment remarks rebuild the model catalog; rows with
    regex remarks rebuild the regex table (escaped-literal patterns;
    starting_point fitted per entry so the capacity arithmetic lands on
    the golden capacity).  Unknown-provenance (history-export) pairs
    fold into the catalog unless a golden row WITNESSES the original
    catalog cannot have contained them (4 witness rules, see inline
    comments); catalog order is alphabetical (two golden tie outcomes
    witness it); regex order is the Kahn topological sort of the
    majority-weighted pairwise loser→winner constraints golden rows
    witness directly (last-match-wins).
    """
    cat_count: Counter = Counter()
    cat_seen: dict = {}
    unknown_prov: dict = {}  # (brand, model) seen only without a remark
    rx_count: Counter = Counter()
    rx_seen: dict = {}
    for r in golden:
        b, m = r.get("brand"), r.get("model")
        if not b or not m or b == "UNKNOWN" or m == "UNKNOWN":
            continue
        key = (str(b), str(m))
        cap, t = _fnum(r.get("capacity")), r.get("type")
        t = t if t and t != "UNKNOWN" else None
        remark = str(r.get("remark") or "")
        if remark in RX_REMARKS:
            rx_count[key] += 1
            rx_seen.setdefault(key, (cap, t))
        elif remark in CONTAINMENT_REMARKS:
            cat_count[key] += 1
            cat_seen.setdefault(key, (cap, t, None))
        else:
            # no remark (history exports) — provenance unknown
            unknown_prov.setdefault(key, (cap, t, None))
    # fold unknown-provenance pairs into the catalog unless a golden row
    # WITNESSES that the original catalog cannot have contained them:
    # 1. superstring of a witnessed same-brand model ('CLG952EHD' vs
    #    'Fully match'-labeled CLG952E) — J2 longest-match would have
    #    picked the superstring;
    # 2. the candidate matches the description of a brand-scoped
    #    regex-remark row of the same brand — the reference only reaches
    #    the regex stage when the catalog stage found NO model
    #    ('E635H' inside serial 'VLGE635H…' of an E6350H regex row);
    # 3. the candidate matches a 'Fully match' row's description of the
    #    same brand and is LONGER than that row's golden model — it
    #    would have beaten the recorded winner ('305.5E2' vs 305);
    # 4. the candidate's brand has zero witnessed rows and the brand
    #    string hits the description/supplier of a no-brand-witnessed
    #    row (phantom brand 'WORLD' vs golden 'No match' rows).
    cat_models_by_brand: dict = defaultdict(set)
    for (b, m) in list(cat_seen) + list(rx_seen):
        cat_models_by_brand[b].add(m)

    def _tok_anchored(needle, text):
        if needle in text:
            return True
        toks = text.split(" ")
        return any("".join(toks[i:]).startswith(needle) for i in range(len(toks)))

    nb_witness_remarks = {
        r for r in RX_REMARKS if "No brand" in r or "未找到对应品牌" in r
    } | {"No match", "无品牌匹配"}
    brand_scoped_rx = RX_REMARKS - nb_witness_remarks
    rx_row_witness = []  # (brand, d2) where catalog found no model
    full_row_witness = []  # (brand, d2, winning model)
    nobrand_witness = []  # (d2, supplier)
    # brand detection uses CATALOG brands only — a brand witnessed
    # solely in the regex table (BOMAC) must not enter the catalog via
    # unknown-provenance pairs when no-brand rows contradict it
    witnessed_brands = {b for b, _ in cat_seen}
    for r in golden:
        remark = str(r.get("remark") or "")
        d2 = str(r.get("description2") or "")
        if remark in brand_scoped_rx:
            rx_row_witness.append((str(r.get("brand")), d2))
        elif remark in CONTAINMENT_REMARKS:
            b, m = str(r.get("brand")), str(r.get("model"))
            if m and m != "UNKNOWN":
                full_row_witness.append((b, d2, m))
        elif remark in nb_witness_remarks:
            nobrand_witness.append((d2, str(r.get("supplier") or "")))

    for (b, m), payload in unknown_prov.items():
        if (b, m) in cat_seen or (b, m) in rx_seen:
            continue
        if any(m2 != m and m2 in m for m2 in cat_models_by_brand[b]):
            continue
        if any(wb == b and _tok_anchored(m, d2) for wb, d2 in rx_row_witness):
            continue
        if any(
            wb == b and len(m) > len(wm) and _tok_anchored(m, d2)
            for wb, d2, wm in full_row_witness
        ):
            continue
        if b not in witnessed_brands and any(
            b in d2 or b in sup for d2, sup in nobrand_witness
        ):
            continue
        cat_seen[(b, m)] = payload
    # J1 breaks ties by catalog order.  The golden outcomes identify the
    # original order as plain alphabetical (brand, model): supplier
    # 'DOOSAN BOBCAT KOREA' resolves to BOBCAT (B before D), and the
    # 915E/906C longest-match tie resolves to 906C (first in brand-model
    # order) — both contradict a frequency prior.
    cat_rows = [
        (i + 1, b, m, cap, t, hp)
        for i, ((b, m), (cap, t, hp)) in enumerate(sorted(cat_seen.items()))
    ]
    model_ref = spark.createDataFrame(cat_rows, MODEL_REF_SCHEMA)

    # last-match-wins: the original table order is hand-curated and
    # follows no single rule (golden ties resolve to the LONGER pattern
    # for XE60GA/E6350H but the SHORTER for R215-over-FR215F).  The
    # golden rows witness the pairwise order directly: on every
    # regex-labeled row, each pattern that ALSO matches but lost must
    # precede the winner.  Collect those majority-weighted constraints
    # and topologically sort (Kahn; freq-asc/len/name among free nodes;
    # cyclic leftovers keep the fallback key), so contested rows
    # reproduce the golden winner exactly.
    nb_remarks = {r for r in RX_REMARKS if "No brand" in r or "未找到对应品牌" in r}
    win_count: Counter = Counter()
    for r in golden:
        remark = str(r.get("remark") or "")
        if remark not in RX_REMARKS:
            continue
        b, m = str(r.get("brand")), str(r.get("model"))
        if (b, m) not in rx_seen:
            continue
        text = str(r.get("description2") or "")
        scope_all = remark in nb_remarks
        for key in rx_seen:
            if key == (b, m) or key[1] not in text:
                continue
            if not scope_all and key[0] != b:
                continue  # pass 1 is brand-scoped
            win_count[(key, (b, m))] += 1  # key lost to (b, m)
    edges = {
        (l, w) for (l, w), n in win_count.items() if n > win_count.get((w, l), 0)
    }
    fallback = {k: (rx_count[k], len(k[1]), k) for k in rx_seen}
    succ: dict = defaultdict(set)
    indeg: Counter = Counter({k: 0 for k in rx_seen})
    for l, w in edges:
        if w not in succ[l]:
            succ[l].add(w)
            indeg[w] += 1
    ordered, free = [], sorted([k for k in rx_seen if indeg[k] == 0], key=fallback.get)
    while free:
        n = free.pop(0)
        ordered.append(n)
        newly = []
        for w in succ[n]:
            indeg[w] -= 1
            if indeg[w] == 0:
                newly.append(w)
        if newly:
            free = sorted(free + newly, key=fallback.get)
    ordered += sorted((k for k in rx_seen if k not in set(ordered)), key=fallback.get)

    rx_rows = []
    for i, (b, m) in enumerate(ordered):
        cap, t = rx_seen[(b, m)]
        cap_rx, sp = fit_capacity_rule(m, cap)
        rx_rows.append((i + 1, b, _re.escape(m), cap_rx, t, sp))
    regex_kb = spark.createDataFrame(rx_rows, REGEX_KB_SCHEMA)
    return model_ref, regex_kb


def reference_frames(
    spark: SparkSession,
) -> tuple[DataFrame, DataFrame, DataFrame, list[dict], list[dict]]:
    """(shipments, model_ref, regex_kb, raw records, golden records)."""
    raw, golden = load_reference_records()
    shipments = build_shipments(spark, raw)
    model_ref, regex_kb = build_kbs(spark, golden)
    return shipments, model_ref, regex_kb, raw, golden
