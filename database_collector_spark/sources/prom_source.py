"""Custom Python DataSource: Prometheus text-exposition files.

The reference's whole output universe is Prometheus exposition data
(its exporters serve /metrics; SURVEY §2.1) — this source closes the
loop by making that format directly queryable: register once, then
``spark.read.format("promtext").load(dir)`` yields the same canonical
long format the rest of this engine processes (name, labels map,
value, timestamp).

Built on Spark 4's Python DataSource API (`pyspark.sql.datasource`) —
a real pluggable source, not a driver-side file loop:

* one ``InputPartition`` per ``.prom`` file, so a directory of
  per-scrape dumps reads with file-level parallelism and scales with
  the file count exactly like the built-in text sources;
* ``pushFilters`` accepts ``EqualTo("name", ...)`` and prunes
  non-matching metric lines AT PARSE TIME inside each partition — the
  Python-source analogue of parquet predicate pushdown (a /metrics dump
  is dominated by metrics you are not asking for);
* parsing follows the public text-exposition grammar: ``# HELP``/
  ``# TYPE``/blank lines skipped; ``name{l1="v1",...} value [ts_ms]``;
  label values unescape ``\\\\``, ``\\"`` and ``\\n``; a bare name has
  an empty label map. Malformed lines are SKIPPED and counted into a
  ``_malformed`` diagnostic metric row per file (fail-soft, mirroring
  the engine's quarantine convention — a truncated scrape can't kill
  the read).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_LINE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"(?:\{(?P<labels>.*)\})?"
    r"\s+(?P<value>[^\s]+)"
    r"(?:\s+(?P<ts>-?\d+))?\s*$"
)
_LABEL = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"')
# full label-list grammar (items comma-separated, optional trailing
# comma, optional whitespace around commas — real exporters emit
# 'a="1", b="2"' and Prometheus's own text parser tolerates it): findall
# alone would silently SKIP malformed segments ('metric{garbage,l="v"} 1'
# would lose 'garbage' without counting as malformed), so the labels
# group must fullmatch this before the per-item findall is trusted
_LABEL_ITEM = r'[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*"'
_LABEL_LIST = re.compile(
    rf"\s*(?:{_LABEL_ITEM}(?:\s*,\s*{_LABEL_ITEM})*(?:\s*,)?\s*)?"
)

SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("labels", MapType(StringType(), StringType())),
        StructField("value", DoubleType()),
        StructField("ts_ms", LongType()),
        StructField("source_file", StringType()),
    ]
)


def _unescape(v: str) -> str:
    return v.replace("\\\\", "\x00").replace('\\"', '"').replace("\\n", "\n").replace(
        "\x00", "\\"
    )


def _parse_value(raw: str) -> float:
    low = raw.lower()
    if low in ("+inf", "inf"):
        return float("inf")
    if low == "-inf":
        return float("-inf")
    if low == "nan":
        return float("nan")
    return float(raw)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PromTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("promtext source requires a path")
        self.name_eq: str | None = None

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("name",)
                and isinstance(f.value, str)
                and self.name_eq is None
            ):
                self.name_eq = f.value
            else:
                yield f

    def partitions(self) -> list[_FilePartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".prom")
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no .prom files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        malformed = 0
        fname = os.path.basename(partition.path)
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                m = _LINE.match(line)
                if not m:
                    malformed += 1
                    continue
                name = m.group("name")
                raw_labels = m.group("labels")
                if raw_labels is not None and not _LABEL_LIST.fullmatch(raw_labels):
                    malformed += 1
                    continue
                if self.name_eq is not None and name != self.name_eq:
                    continue
                try:
                    value = _parse_value(m.group("value"))
                except ValueError:
                    malformed += 1
                    continue
                labels = {
                    k: _unescape(v) for k, v in _LABEL.findall(raw_labels or "")
                }
                ts = m.group("ts")
                yield (name, labels, value, int(ts) if ts else None, fname)
        if malformed and (self.name_eq is None or self.name_eq == "_malformed"):
            yield ("_malformed", {"file": fname}, float(malformed), None, fname)


class PromTextDataSource(DataSource):
    """``spark.dataSource.register(PromTextDataSource)`` then
    ``spark.read.format("promtext").load(path)`` — or call
    :func:`register`, which also enables Python-source filter pushdown
    (a reader implementing ``pushFilters`` ERRORS at read time when
    ``spark.sql.python.filterPushdown.enabled`` is false; the engine's
    own session factory sets it, this covers foreign sessions)."""

    @classmethod
    def name(cls) -> str:
        return "promtext"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> PromTextReader:
        return PromTextReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "PromTextWriter":
        return PromTextWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> "PromTextStreamReader":
        return PromTextStreamReader(self.options)


def register(spark) -> None:
    """Register the source on ``spark`` with pushdown enabled (the conf
    is runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PromTextDataSource)


def _escape(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _format_value(v: float) -> str:
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    return repr(v)


class _PromCommit(WriterCommitMessage):
    def __init__(self, tmp: str, path: str, n_rows: int):
        self.tmp = tmp
        self.path = path
        self.n_rows = n_rows


class PromTextWriter(DataSourceWriter):
    """Per-task exposition writer: each partition writes ONE
    ``part-<uuid>.prom`` shard. Tasks only produce hidden
    ``.part-<uuid>.prom.tmp`` files; the tmp→final renames happen in
    driver-side :meth:`commit`, AFTER the job succeeded — so a failed,
    retried, or speculatively-duplicated task attempt never becomes a
    readable shard (only the attempt whose commit message the driver
    accepted is published; orphan ``.tmp`` files from losing attempts
    are swept by both ``commit`` and ``abort``). Assumes ``path`` is
    storage the driver and executors share (local mode, NFS, or a FUSE
    mount) — the same contract the read side already requires. Labels
    are emitted in sorted key order — deterministic bytes for a
    deterministic input partitioning."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("promtext writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _PromCommit:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.prom"
        tmp = os.path.join(self.path, "." + name + ".tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                labels = row["labels"] or {}
                lab = (
                    "{"
                    + ",".join(
                        f'{k}="{_escape(v)}"' for k, v in sorted(labels.items())
                    )
                    + "}"
                    if labels
                    else ""
                )
                ts = f" {row['ts_ms']}" if row["ts_ms"] is not None else ""
                fh.write(
                    f"{row['name']}{lab} {_format_value(row['value'])}{ts}\n"
                )
                n += 1
        return _PromCommit(os.path.basename(tmp), name, n)

    def _sweep_tmp(self, keep: set[str] = frozenset()) -> None:
        for f in os.listdir(self.path):
            if f.startswith(".part-") and f.endswith(".prom.tmp") and f not in keep:
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass

    def commit(self, messages):
        # publish exactly the accepted attempts: tmp→final rename happens
        # HERE, driver-side, so a task attempt that wrote its tmp file but
        # lost the commit race never becomes readable
        new = set()
        for m in messages:
            if m is not None:
                os.replace(
                    os.path.join(self.path, m.tmp),
                    os.path.join(self.path, m.path),
                )
                new.add(m.path)
        # two-phase overwrite: only AFTER every task committed do the
        # pre-existing shards disappear — a failed job leaves the old
        # table intact (abort removes just the new tmp files)
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".prom") and f not in new:
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass
        # orphan tmp files = losing speculative/retried attempts
        self._sweep_tmp()
        return None

    def abort(self, messages):
        self._sweep_tmp()


class PromTextStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a directory of ``.prom`` scrape dumps: each
    micro-batch reads the files that appeared since the last offset.

    Offsets are the lexicographically LARGEST file name consumed
    (scrape dumps are conventionally timestamp-named, so lexicographic
    = chronological; a file sorting at-or-before the current offset is
    never read — name new dumps monotonically). That makes every batch
    replayable: ``readBetweenOffsets(start, end)`` re-parses exactly
    the files in (start, end] — deterministic failure recovery with no
    state beyond the two names. Parsing (grammar, escapes, fail-soft
    ``_malformed`` rows) is shared with the batch reader.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("promtext stream requires a path")

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files_between(self, start: str, end: str | None) -> list[str]:
        names = sorted(
            f for f in os.listdir(self.path)
            if f.endswith(".prom") and f > start
            and (end is None or f <= end)
        )
        return names

    def _parse_files(self, names: list[str]) -> list[tuple]:
        # a LIST, not a generator: Spark's simple-stream prefetch cache
        # copy.copy()s the batch iterator for replay, and generators are
        # not copyable. Simple stream readers are driver-prefetched by
        # design, so per-batch materialization is the API's contract —
        # batch size = the new scrape dumps since the last trigger.
        rdr = PromTextReader({"path": self.path})
        out: list[tuple] = []
        for n in names:
            out.extend(rdr.read(_FilePartition(os.path.join(self.path, n))))
        return out

    def read(self, start: dict):
        names = self._files_between(start.get("last", ""), None)
        if not names:
            return [], start
        return self._parse_files(names), {"last": names[-1]}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._parse_files(
            self._files_between(start.get("last", ""), end.get("last", ""))
        )

    def commit(self, end: dict) -> None:
        return None
