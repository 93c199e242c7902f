"""As-of join strategies and connected-components clustering."""

from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
    asof,
    dedup,
)


def _asof_data(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-02 00:30:00"), (4, "2023-12-31 01:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2024-01-01 12:00:00", 2.0),
         ("2024-01-02 00:00:00", 3.0)],
        "rts string, rate double",
    ).withColumn("rts", F.to_timestamp("rts"))
    # expected nearest-prior: id1→1.0, id2→2.0 (exact ts counts), id3→3.0,
    # id4→None (before all rates)
    return left, right, {1: 1.0, 2: 2.0, 3: 3.0, 4: None}


def test_asof_broadcast(spark):
    left, right, want = _asof_data(spark)
    out = asof.asof_join_broadcast(left, right, "ts", "rts", payload=["rate"])
    assert {r["id"]: r["rate"] for r in out.collect()} == want


def test_asof_union_matches_broadcast(spark):
    left, right, want = _asof_data(spark)
    out = asof.asof_join_union(left, right, "ts", "rts", payload=["rate"])
    assert {r["id"]: r["rate"] for r in out.collect()} == want


def test_connected_components(spark):
    # two chains and an isolated pair: {1,2,3,4} {10,11} {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    comps = dedup.connected_components(pairs)
    got = {r["node"]: r["label"] for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
