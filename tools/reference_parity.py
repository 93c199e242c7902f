"""End-to-end parity check against the reference's OWN artifacts.

Reads the published raw input batch (1,294 rows, May–Jul 2024) with the
stdlib xlsx reader, reverse-engineers a model catalog from the golden
output (the reference's knowledge-base xlsx files are not published),
runs this engine's pipeline, aligns rows against the golden May–Jul
slice (832 rows), and scores label agreement per derived column.

The input reconstruction lives in
``etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.reference_harness`` (shared with the driver-checked
``reference_batch_parity`` registry query); this tool is the offline
scorer that compares against the golden xlsx column by column.

Caveats (unavoidable without the unpublished KBs):
- regex_kb entries are escaped literals fitted from golden rows;
- golden models are de-spaced, so multi-word catalog models can't
  containment-match; catalog order (the J1 first-brand tie-break) is
  witnessed alphabetical.

Prints one JSON line with per-column agreement rates.
"""

from __future__ import annotations

import json
import sys
from collections import Counter, defaultdict

sys.path.insert(0, ".")

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark import (  # noqa: E402
    reference_harness as rh,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.plans import (  # noqa: E402
    pipeline,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)


def _align_key(desc, supplier, amount, qty):
    a = round(float(amount), 2) if amount is not None else None
    return (str(desc or "").strip(), str(supplier or "").strip(), a, str(qty))


def main() -> None:
    spark = get_spark(app_name="reference-parity")
    spark.sparkContext.setLogLevel("ERROR")

    shipments, model_ref, regex_kb, raw, golden = rh.reference_frames(spark)
    batch = [r for r in golden if r.get("month") in (202405, 202406, 202407)]

    out = pipeline.run_pipeline(
        shipments, model_ref, regex_kb, None,
        datasource="Indonesia", strict_reference_compat=True,
    )
    mine = [r.asDict() for r in pipeline.render_export(out).collect()]

    # --- align by (description, supplier, amount, qty) occurrence order ---
    # the reference normalized `supplier` IN PLACE (data_preperation),
    # so the golden supplier aligns with this engine's supplier2
    gmap = defaultdict(list)
    for r in batch:
        gmap[_align_key(r["product description"], r["supplier"], r["amount in usd"], r["qty"])].append(r)
    pairs = []
    unaligned = 0
    for m in mine:
        k = _align_key(m["product_description"], m["supplier2"], m["amount_in_usd"], m["qty"])
        if gmap[k]:
            pairs.append((m, gmap[k].pop(0)))
        else:
            unaligned += 1

    def rate(fn):
        hits = sum(1 for m, g in pairs if fn(m, g))
        return round(hits / len(pairs), 4) if pairs else None

    def norm(v):
        return str(v).strip() if v is not None else "UNKNOWN"

    def capnorm(v):
        try:
            return round(float(v), 2)
        except (TypeError, ValueError):
            return "UNKNOWN"

    report = {
        "input_rows": len(raw),
        "golden_batch_rows": len(batch),
        "my_surviving_rows": len(mine),
        "aligned_pairs": len(pairs),
        "my_rows_unaligned": unaligned,
        # direct check of the T1/T2 normalization chain vs the golden
        # description2 column
        "description2_match": rate(
            lambda m, g: norm(m["description2"]) == norm(g["description2"])
        ),
        "brand_match": rate(lambda m, g: norm(m["brand"]) == norm(g["brand"])),
        "model_match": rate(lambda m, g: norm(m["model"]) == norm(g["model"])),
        "type_match": rate(lambda m, g: norm(m["type"]) == norm(g["type"])),
        "new_used_match": rate(lambda m, g: norm(m["new_used"]) == norm(g["new/used"])),
        "capacity_match": rate(lambda m, g: capnorm(m["capacity"]) == capnorm(g["capacity"])),
        "outliers_match": rate(lambda m, g: norm(m["outliers"]) == norm(g["outliers"])),
        "capacity_interval_match": rate(
            lambda m, g: norm(m["capacity_interval"]) == norm(g["capacity interval"])
        ),
        "my_remarks": dict(Counter(m["remark"] for m in mine)),
        "golden_remarks": dict(Counter(r["remark"] for r in batch)),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
