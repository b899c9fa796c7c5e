"""Entity resolution (operators/entity.py): normalizers, NULL-key
non-blocking, per-key blocking joins, OR-union transitivity."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.operators import entity


def test_normalizers(spark):
    df = spark.createDataFrame(
        [
            Row(name="  O'Brien, Pat ", phone="+1 303-555-0147"),
            Row(name="###", phone="1-30-35-55"),
            Row(name=None, phone=None),
            Row(name="obrienpat", phone="3035550147"),
        ]
    ).select(
        entity.normalize_name(F.col("name")).alias("n"),
        entity.normalize_phone(F.col("phone")).alias("p"),
    )
    rows = df.collect()
    assert rows[0]["n"] == "obrienpat"
    assert rows[0]["p"] == "3035550147"  # 11-digit leading 1 stripped
    assert rows[1]["n"] is None  # all-symbol name -> NULL, never blocks
    assert rows[1]["p"] == "1303555"  # not 11 digits: keep leading 1
    assert rows[2]["n"] is None and rows[2]["p"] is None
    assert rows[3]["n"] == rows[0]["n"] and rows[3]["p"] == rows[0]["p"]


def test_resolve_entities_transitive_or_union(spark):
    # A~B share phone, B~C share name, D isolated, E/F have NULL keys
    recs = spark.createDataFrame(
        [
            Row(record_id=1, phone_n="555", name_n="alpha"),
            Row(record_id=2, phone_n="555", name_n="beta"),
            Row(record_id=3, phone_n="777", name_n="beta"),
            Row(record_id=4, phone_n="888", name_n="delta"),
            Row(record_id=5, phone_n=None, name_n=None),
            Row(record_id=6, phone_n=None, name_n=None),
        ]
    )
    out = {
        r["record_id"]: r["entity_id"]
        for r in entity.resolve_entities(
            recs, keys=("phone_n", "name_n")
        ).collect()
    }
    # 1-2-3 chain collapses to min id 1 through the OR of both keys
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4
    # NULL keys never match — even two all-NULL records stay separate
    assert out[5] == 5 and out[6] == 6


def test_match_pairs_blocked_within_key_groups_only(spark):
    recs = spark.createDataFrame(
        [(i, str(i // 3), None) for i in range(9)],
        "record_id long, phone_n string, name_n string",
    )
    pairs = entity.match_pairs(recs, keys=("phone_n", "name_n")).collect()
    # 3 groups of 3 -> 3 pairs each; no cross-group pair
    assert len(pairs) == 9
    for r in pairs:
        assert r["record_a"] // 3 == r["record_b"] // 3
        assert r["record_a"] < r["record_b"]
