"""Custom Python DataSource for Prometheus text exposition
(sources/prom_source.py): grammar coverage, per-file partitions,
EqualTo('name') parse-time pushdown, malformed-line fail-soft."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from database_collector_spark.sources.prom_source import (
    PromTextDataSource,
    PromTextReader,
    _FilePartition,
)

FILE_A = """\
# HELP http_requests_total Total requests.
# TYPE http_requests_total counter
http_requests_total{method="get",code="200"} 1027 1712000000000
http_requests_total{method="post",code="200"} 3
up 1
this line is !! not exposition format
escaped{msg="say \\"hi\\"\\n",path="C:\\\\tmp"} 4.5
infinite{kind="pos"} +Inf
"""

FILE_B = """\
up 0
http_requests_total{method="get",code="500"} 7
"""


def _mkfiles(tmp):
    with open(f"{tmp}/a.prom", "w") as f:
        f.write(FILE_A)
    with open(f"{tmp}/b.prom", "w") as f:
        f.write(FILE_B)


def test_promtext_reads_grammar_and_partitions_per_file(spark):
    spark.dataSource.register(PromTextDataSource)
    with tempfile.TemporaryDirectory() as tmp:
        _mkfiles(tmp)
        df = spark.read.format("promtext").load(tmp)
        rows = {
            (r["name"], tuple(sorted(r["labels"].items())), r["source_file"]): r
            for r in df.collect()
        }
        # labels + timestamp
        r = rows[("http_requests_total", (("code", "200"), ("method", "get")), "a.prom")]
        assert (r["value"], r["ts_ms"]) == (1027.0, 1712000000000)
        # bare metric, no labels, no ts
        assert rows[("up", (), "a.prom")]["ts_ms"] is None
        # escapes
        esc = rows[("escaped", (("msg", 'say "hi"\n'), ("path", "C:\\tmp")), "a.prom")]
        assert esc["value"] == 4.5
        # +Inf
        assert math.isinf(rows[("infinite", (("kind", "pos"),), "a.prom")]["value"])
        # fail-soft: malformed line surfaced as a diagnostic row, not a crash
        assert rows[("_malformed", (("file", "a.prom"),), "a.prom")]["value"] == 1.0
        # one partition per file
        nparts = df.select(F.spark_partition_id()).distinct().count()
        assert nparts == 2


def test_promtext_name_pushdown_prunes_at_parse_time(spark):
    from pyspark.sql.datasource import EqualTo, GreaterThan

    rdr = PromTextReader({"path": "/nonexistent"})
    rest = list(
        rdr.pushFilters(
            [EqualTo(("name",), "up"), GreaterThan(("value",), 0)]
        )
    )
    # the name filter is consumed; the value filter is handed back
    assert rdr.name_eq == "up"
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)

    with tempfile.TemporaryDirectory() as tmp:
        _mkfiles(tmp)
        got = list(rdr.read(_FilePartition(f"{tmp}/a.prom")))
        assert [(r[0], r[2]) for r in got] == [("up", 1.0)]


def test_promtext_end_to_end_filter(spark):
    spark.dataSource.register(PromTextDataSource)
    with tempfile.TemporaryDirectory() as tmp:
        _mkfiles(tmp)
        df = (
            spark.read.format("promtext")
            .load(tmp)
            .where(F.col("name") == "http_requests_total")
        )
        assert df.count() == 3
        assert {r["source_file"] for r in df.collect()} == {"a.prom", "b.prom"}


def test_promtext_writer_round_trips_and_two_phase_overwrite(spark):
    spark.dataSource.register(PromTextDataSource)
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            ("up", {}, 1.0, None),
            ("http_requests_total", {"code": "200", "method": "get"}, 1027.5,
             1712000000000),
            ("weird", {"msg": 'say "hi"\n', "path": "C:\\tmp"}, -0.25, None),
            ("infinite", {"kind": "neg"}, float("-inf"), None),
        ]
        df = spark.createDataFrame(
            rows, "name string, labels map<string,string>, value double, ts_ms long"
        ).repartition(2)
        df.write.format("promtext").mode("append").save(tmp)

        back = spark.read.format("promtext").load(tmp)
        got = {
            (r["name"], tuple(sorted(r["labels"].items())), r["value"], r["ts_ms"])
            for r in back.collect()
        }
        want = {
            (n, tuple(sorted(lb.items())), v, ts) for n, lb, v, ts in rows
        }
        assert got == want
        # no _malformed diagnostics: everything we wrote parses cleanly
        assert not any(r["name"] == "_malformed" for r in back.collect())

        # overwrite is two-phase: old shards vanish only on commit
        df2 = spark.createDataFrame(
            [("solo", {}, 2.0, None)],
            "name string, labels map<string,string>, value double, ts_ms long",
        )
        df2.write.format("promtext").mode("overwrite").save(tmp)
        names = [r["name"] for r in spark.read.format("promtext").load(tmp).collect()]
        assert names == ["solo"]


def test_promtext_streaming_tails_new_dumps_with_checkpoint(spark):
    import os

    spark.dataSource.register(PromTextDataSource)
    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ck"
        os.makedirs(src)
        with open(f"{src}/20240601-100000.prom", "w") as f:
            f.write("up 1\nhttp_requests_total 5\n")

        def run_pass():
            q = (
                spark.readStream.format("promtext")
                .load(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            q.stop()

        run_pass()
        got = sorted(
            (r["name"], r["value"], r["source_file"])
            for r in spark.read.parquet(out).collect()
        )
        assert got == [
            ("http_requests_total", 5.0, "20240601-100000.prom"),
            ("up", 1.0, "20240601-100000.prom"),
        ]

        # a later-named dump arrives; only IT is read on the next pass
        with open(f"{src}/20240601-100015.prom", "w") as f:
            f.write("up 0\n")
        run_pass()
        got = sorted(
            (r["name"], r["value"], r["source_file"])
            for r in spark.read.parquet(out).collect()
        )
        assert got == [
            ("http_requests_total", 5.0, "20240601-100000.prom"),
            ("up", 0.0, "20240601-100015.prom"),
            ("up", 1.0, "20240601-100000.prom"),
        ]


def test_promtext_stream_offsets_replay_deterministically():
    import os

    from database_collector_spark.sources.prom_source import PromTextStreamReader

    with tempfile.TemporaryDirectory() as tmp:
        for n, body in (("a.prom", "up 1\n"), ("b.prom", "up 2\n"), ("c.prom", "up 3\n")):
            with open(os.path.join(tmp, n), "w") as f:
                f.write(body)
        rdr = PromTextStreamReader({"path": tmp})
        start = rdr.initialOffset()
        rows, mid = rdr.read(start)
        assert [r[2] for r in rows] == [1.0, 2.0, 3.0]
        assert mid == {"last": "c.prom"}
        # no new files -> empty batch, offset unchanged
        rows2, same = rdr.read(mid)
        assert list(rows2) == [] and same == mid
        # failure recovery re-reads exactly (start, mid]
        replay = list(rdr.readBetweenOffsets(start, mid))
        assert [r[2] for r in replay] == [1.0, 2.0, 3.0]
        replay_tail = list(rdr.readBetweenOffsets({"last": "a.prom"}, mid))
        assert [r[2] for r in replay_tail] == [2.0, 3.0]


def test_promtext_malformed_label_segment_counts_as_malformed():
    """A line whose labels group contains a segment the label grammar
    rejects must be SKIPPED AND COUNTED (pre-fix, findall silently
    dropped the bad segment and kept the line with partial labels)."""
    rdr = PromTextReader({"path": "/nonexistent"})
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/x.prom", "w") as f:
            f.write('m{garbage,l="v"} 1\n')       # junk segment: malformed
            f.write('m{l=v} 2\n')                 # unquoted value: malformed
            f.write('m{l="v",} 3\n')              # trailing comma: LEGAL
            f.write('m{l="v" , k="w"} 4\n')       # spaces around comma: LEGAL
            f.write('m{ l="v"} 6\n')              # space after '{': LEGAL
            f.write('ok{a="b"} 5\n')
        got = list(rdr.read(_FilePartition(f"{tmp}/x.prom")))
    by_name = {}
    for r in got:
        by_name.setdefault(r[0], []).append(r)
    assert [r[2] for r in by_name["m"]] == [3.0, 4.0, 6.0]
    assert by_name["m"][0][1] == {"l": "v"}
    assert by_name["m"][1][1] == {"l": "v", "k": "w"}
    assert by_name["m"][2][1] == {"l": "v"}
    assert by_name["ok"][0][1] == {"a": "b"}
    assert by_name["_malformed"][0][2] == 2.0


def test_promtext_losing_task_attempt_never_publishes(spark):
    """Task-retry/speculation safety: write() only produces hidden .tmp
    files; the tmp→final rename happens in driver-side commit() for the
    accepted messages only, and orphan .tmp files (losing attempts) are
    swept — append mode cannot yield duplicated rows."""
    import os

    from database_collector_spark.sources.prom_source import PromTextWriter

    with tempfile.TemporaryDirectory() as tmp:
        w = PromTextWriter({"path": tmp}, overwrite=False)
        rows = [{"name": "up", "labels": {}, "value": 1.0, "ts_ms": None}]
        winner = w.write(iter(rows))
        loser = w.write(iter(rows))  # duplicate attempt of the same task
        # nothing readable yet: both attempts are hidden tmp files
        assert [f for f in os.listdir(tmp) if f.endswith(".prom")] == []
        assert len([f for f in os.listdir(tmp) if f.endswith(".tmp")]) == 2
        w.commit([winner])  # driver accepted only the winner
        vis = [f for f in os.listdir(tmp) if f.endswith(".prom")]
        assert vis == [winner.path]
        assert loser.path not in vis
        # the losing attempt's tmp file was swept
        assert [f for f in os.listdir(tmp) if f.endswith(".tmp")] == []
        # and abort() likewise leaves no tmp debris
        m = w.write(iter(rows))
        w.abort([m])
        assert [f for f in os.listdir(tmp) if f.endswith(".tmp")] == []
        assert [f for f in os.listdir(tmp) if f.endswith(".prom")] == vis
