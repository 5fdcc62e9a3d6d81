"""Round-3 ADVICE/VERDICT fixes.

1. Watermark domain separation (ADVICE medium): a stream-domain merge
   must never advance the SHARED sink watermark the tailer plans from
   (file-source epochs carry no cross-epoch position ordering; a
   stream killed mid-run could leave it ahead of unmerged entries).
2. IcebergTarget writer-namespaced fence parity with
   KeyBucketedTarget (VERDICT #1) — same mixed tail/stream scenario
   drives both sinks and must produce the same skip/apply pattern.
3. changes_between null-safety + rewrite-mode 'd' (ADVICE low).
4. expire_versions lineage roll-forward (ADVICE low).
5. compact() bucket maintenance (VERDICT #7).
6. Tolerant ALTER replay on IcebergTarget (ADVICE low).
"""

from __future__ import annotations

import re

import pytest

from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget


def _batch(spark, rows, ddl="url string, receiver_idx int, seq long, op string, text string"):
    return spark.createDataFrame(rows, ddl)


# ---------------------------------------------------------------- 1. watermark domains


def test_stream_merge_does_not_advance_shared_watermark(spark, tmpdir_path):
    """Tailer at (0,5); a stream epoch merges entries up to (0,99).
    The shared watermark must stay (0,5) — a later tailer replans from
    it and replays 6..99 idempotently instead of skipping them if the
    stream died mid-run. The stream's own watermark is namespaced."""
    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=4)
    t.merge(_batch(spark, [("a", 0, 5, "c", "x")]), batch_id=0, watermark=(0, 5))
    assert t.watermark() == (0, 5)

    t.merge(
        _batch(spark, [("b", 0, 99, "c", "y")]),
        batch_id=0,
        watermark=(0, 99),
        writer_id="stream-q",
    )
    assert t.watermark() == (0, 5)  # tailer domain untouched
    assert t.watermark("stream-q") == (0, 99)

    # writer watermark is monotone within its own domain
    t.merge(
        _batch(spark, [("c", 0, 50, "c", "z")]),
        batch_id=1,
        watermark=(0, 50),
        writer_id="stream-q",
    )
    assert t.watermark("stream-q") == (0, 99)

    # a later tailer merge advances only the shared domain
    t.merge(
        _batch(spark, [("d", 0, 7, "c", "w")]),
        batch_id=t.last_batch_id() + 1,
        watermark=(0, 7),
    )
    assert t.watermark() == (0, 7)
    assert t.watermark("stream-q") == (0, 99)


def test_tailer_resume_replays_stream_gap(spark, tmpdir_path):
    """End-to-end shape of the data-loss scenario the fix closes: the
    tailer plans strictly from the shared watermark, so journal
    entries only a (possibly dead) stream saw are inside the tailer's
    next planned range, and re-merging them is idempotent."""
    from debezium_connector_ibmi_spark.plans.range_planner import (
        Position,
        plan_next_range,
    )

    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=4)
    t.merge(_batch(spark, [("a", 0, 2, "c", "a")]), batch_id=0, watermark=(0, 2))
    # stream applied up to seq 8, then died before merging seq 9
    t.merge(
        _batch(spark, [("b", 0, 8, "c", "b")]),
        batch_id=0,
        watermark=(0, 8),
        writer_id="stream-dead",
    )
    chain = [
        {"receiver_idx": 0, "min_seq": 0, "max_seq": 9},
    ]
    ridx, seq = t.watermark()
    rng = plan_next_range(chain, Position(ridx, seq, processed=True), 1000)
    # the tailer's next range starts after ITS OWN watermark (0,2),
    # covering 3..9 — including everything the stream touched
    assert (rng.start.receiver_idx, rng.start.seq) == (0, 2)
    assert (rng.end.receiver_idx, rng.end.seq) == (0, 9)


# ---------------------------------------------------------------- 3. changes_between


def test_changes_between_null_safe_compare(spark, tmpdir_path):
    """(a=null,b='x') -> (a='x',b=null) must be reported 'u' — the
    old xxhash64 comparison skipped null children, so both sides
    hashed the sequence ('x') and the update vanished."""
    ddl = "url string, receiver_idx int, seq long, op string, a string, b string"
    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=2)
    t.merge(_batch(spark, [("k", 0, 0, "c", None, "x")], ddl), batch_id=0)
    t.merge(_batch(spark, [("k", 0, 1, "u", "x", None)], ddl), batch_id=1)
    diff = t.changes_between(0, 1).collect()
    assert len(diff) == 1
    assert diff[0]["op"] == "u"
    assert (diff[0]["a"], diff[0]["b"]) == ("x", None)
    # and a genuinely unchanged all-null pair is NOT reported
    t.merge(_batch(spark, [("n", 0, 2, "c", None, None)], ddl), batch_id=2)
    t.merge(_batch(spark, [("n", 0, 3, "u", None, None)], ddl), batch_id=3)
    assert t.changes_between(2, 3).count() == 0


def test_changes_between_rewrite_mode_soft_delete_is_d(spark, tmpdir_path):
    """delete_mode='rewrite': a __deleted=true transition is op 'd'
    (null after-image), resurrection is 'c', and __deleted itself is
    not an output column."""
    t = KeyBucketedTarget(
        spark, f"{tmpdir_path}/t", num_buckets=2, delete_mode="rewrite"
    )
    t.merge(
        _batch(spark, [("a", 0, 0, "c", "a0"), ("b", 0, 1, "c", "b0")]),
        batch_id=0,
    )
    t.merge(_batch(spark, [("a", 0, 2, "d", None)]), batch_id=1)
    diff = t.changes_between(0, 1)
    assert "__deleted" not in diff.columns
    rows = {r["url"]: (r["op"], r["text"]) for r in diff.collect()}
    assert rows == {"a": ("d", None)}
    # resurrection: the soft-deleted key re-inserted -> 'c'
    t.merge(_batch(spark, [("a", 0, 3, "c", "a1")]), batch_id=2)
    rows2 = {r["url"]: (r["op"], r["text"]) for r in t.changes_between(1, 2).collect()}
    assert rows2 == {"a": ("c", "a1")}


# ---------------------------------------------------------------- 4. lineage roll-forward


def test_expire_versions_rolls_lineage_forward(spark, tmpdir_path):
    """After a vacuum, receivers whose last activity predates the
    retention window must still show their applied watermark in
    lineage() (ADVICE: lag was over-reported after expiry)."""
    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=2)
    # receiver 0 active only in the oldest commit
    t.merge(
        _batch(spark, [("a", 0, 7, "c", "a0")]),
        batch_id=0,
        partitions=[{"receiver_idx": 0, "seq": 7, "events_applied": 3, "processed": True}],
    )
    for i in range(1, 5):
        t.merge(
            _batch(spark, [("b", 1, i, "u", f"b{i}")]),
            batch_id=i,
            partitions=[
                {"receiver_idx": 1, "seq": i, "events_applied": 1, "processed": True}
            ],
        )
    t.expire_versions(keep_last=2)
    lin = t.lineage()
    by_recv: dict[int, int] = {}
    events: dict[int, int] = {}
    for p in lin:
        r = int(p["receiver_idx"])
        by_recv[r] = max(by_recv.get(r, -1), int(p["seq"]))
        events[r] = events.get(r, 0) + int(p["events_applied"])
    assert by_recv[0] == 7  # survived the vacuum via the summary
    assert by_recv[1] == 4
    assert events[0] == 3
    assert events[1] == 4  # 4 expired+retained commits, no double count

    # a second expiry is a no-op for the summary (commits are gone)
    t.expire_versions(keep_last=2)
    assert sum(
        int(p["events_applied"]) for p in t.lineage() if int(p["receiver_idx"]) == 0
    ) == 3


# ---------------------------------------------------------------- 5. compact()


def test_compact_rewrites_to_single_version(spark, tmpdir_path):
    import os

    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=4)
    for i in range(5):
        t.merge(
            _batch(spark, [(f"u{i}", 0, i, "c", f"v{i}")]),
            batch_id=i,
            watermark=(0, i),
        )
    before = {r["url"]: r["text"] for r in t.read().collect()}
    spread = len(set(t.last_commit()["buckets"].values()))
    assert spread > 1

    stats = t.compact()
    assert stats["skipped"] is False
    assert stats["spread_before"] == spread
    after = {r["url"]: r["text"] for r in t.read().collect()}
    assert after == before
    # maintenance must not move fences or watermarks
    assert t.last_batch_id() == 4
    assert t.watermark() == (0, 4)
    # merge after compact still works and a vacuum can now drop all
    # pre-compaction version dirs
    t.merge(_batch(spark, [("u0", 0, 9, "u", "v0b")]), batch_id=5, watermark=(0, 9))
    t.expire_versions(keep_last=2)
    live = {int(d.split("=")[1]) for d in os.listdir(f"{tmpdir_path}/t/data")}
    assert live == {stats["version"], stats["version"] + 1}
    assert {r["url"]: r["text"] for r in t.read().collect()}["u0"] == "v0b"
    # idempotent no-op when already compacted below the threshold
    assert t.compact(min_versions=3)["skipped"] is True


# ---------------------------------------------------------------- 2+6. Iceberg parity


class _FakeConf:
    def __init__(self):
        self.store = {}

    def get(self, key, default=None):
        if key.startswith("spark.sql.catalog."):
            return "org.apache.iceberg.spark.SparkCatalog"
        return self.store.get(key, default)

    def set(self, key, value):
        self.store[key] = value


class _FakeField:
    def __init__(self, name, dtype):
        self.name = name
        self._dtype = dtype
        self.dataType = self

    def simpleString(self):
        return self._dtype


class _FakeTable:
    def __init__(self, fields):
        self.schema = self

    # set in __init__ via trick below


class _FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeIcebergSession:
    """Executes the sink's SQL surface against an in-memory property
    store + schema, so the writer-fence LOGIC (not the Iceberg engine)
    is testable without jars. Every statement text still comes from
    the pinned pure builders."""

    def __init__(self, columns=(("url", "string"), ("text", "string"))):
        self.conf = _FakeConf()
        self.props: dict[str, str] = {}
        self.merges: list[str] = []
        self.statements: list[str] = []
        self.columns = [list(c) for c in columns]

    def sql(self, stmt: str):
        self.statements.append(stmt)
        if stmt.startswith("SHOW TBLPROPERTIES"):
            prop = re.search(r"\('([^']+)'\)", stmt).group(1)
            if prop in self.props:
                return _FakeResult([{"value": self.props[prop]}])
            return _FakeResult([])
        if "SET TBLPROPERTIES" in stmt:
            for k, v in re.findall(r"'([^']+)'='([^']*)'", stmt):
                self.props[k] = v
            return _FakeResult([])
        if stmt.startswith("MERGE INTO"):
            self.merges.append(stmt)
            return _FakeResult([])
        m = re.match(r"ALTER TABLE \S+ ADD COLUMN (\S+) (\S+)", stmt)
        if m:
            if any(c[0] == m.group(1) for c in self.columns):
                raise RuntimeError(f"column {m.group(1)} already exists")
            self.columns.append([m.group(1), m.group(2)])
            return _FakeResult([])
        m = re.match(r"ALTER TABLE \S+ DROP COLUMN (\S+)", stmt)
        if m:
            if not any(c[0] == m.group(1) for c in self.columns):
                raise RuntimeError(f"missing column {m.group(1)}")
            self.columns = [c for c in self.columns if c[0] != m.group(1)]
            return _FakeResult([])
        m = re.match(r"ALTER TABLE \S+ ALTER COLUMN (\S+) TYPE (\S+)", stmt)
        if m:
            for c in self.columns:
                if c[0] == m.group(1):
                    c[1] = m.group(2)
            return _FakeResult([])
        if stmt.startswith("CREATE TABLE"):
            return _FakeResult([])
        raise AssertionError(f"unexpected SQL: {stmt}")

    def table(self, name):
        t = _FakeTable.__new__(_FakeTable)
        t.schema = t
        t.fields = [_FakeField(n, d) for n, d in self.columns]
        return t


class _FakeBatch:
    def createOrReplaceTempView(self, name):
        pass


def _mixed_scenario(target):
    """The same mixed tail/stream sequence for both sinks; returns the
    observed (skipped, effective_batch_id) pattern."""
    out = []
    b = _FakeBatch() if isinstance(target, _IceWrap) else target._mk()
    for batch_id, writer in [
        (0, None),  # tailer 0
        (1, None),  # tailer 1
        (0, "stream-q"),  # stream epoch 0 — must APPLY (re-based)
        (0, "stream-q"),  # replayed epoch — must SKIP
        (1, "stream-q"),  # next epoch — applies
        (1, None),  # replayed tailer id — SKIP
        (None, None),  # tailer continues from last_batch_id()+1
        (0, "stream-new"),  # new checkpoint writer — applies
    ]:
        bid = target.t.last_batch_id() + 1 if batch_id is None else batch_id
        r = target.merge(b, bid, writer)
        out.append((r["skipped"], r.get("batch_id")))
    # watermark domain: stream watermark never leaks into shared
    target.merge_wm(b, target.t.last_writer_batch_id("stream-q") + 1,
                    "stream-q", (9, 999))
    return out


class _IceWrap:
    def __init__(self, t):
        self.t = t

    def merge(self, b, bid, writer):
        return self.t.merge(b, batch_id=bid, writer_id=writer)

    def merge_wm(self, b, bid, writer, wm):
        return self.t.merge(b, batch_id=bid, writer_id=writer, watermark=wm)


class _ParquetWrap:
    def __init__(self, t, spark):
        self.t = t
        self.spark = spark
        self._n = 0

    def _mk(self):
        self._n += 1
        return _batch(self.spark, [(f"u{self._n}", 0, self._n, "c", "v")])

    def merge(self, b, bid, writer):
        return self.t.merge(self._mk(), batch_id=bid, writer_id=writer)

    def merge_wm(self, b, bid, writer, wm):
        return self.t.merge(self._mk(), batch_id=bid, writer_id=writer, watermark=wm)


def test_iceberg_and_parquet_fence_parity(spark, tmpdir_path):
    """The SAME mixed tail/stream scenario produces the SAME
    skip/apply + effective-id pattern on both sinks, and neither lets
    a stream watermark leak into the shared (tailer) watermark."""
    from debezium_connector_ibmi_spark.sinks.iceberg import IcebergTarget

    fake = FakeIcebergSession()
    ice = IcebergTarget(fake, "lake.db.pages")
    pq = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=2)

    pat_ice = _mixed_scenario(_IceWrap(ice))
    pat_pq = _mixed_scenario(_ParquetWrap(pq, spark))
    assert pat_ice == pat_pq
    expected = [
        (False, 0),
        (False, 1),
        (False, 2),  # epoch 0 re-based to global 2
        (True, 0),
        (False, 3),
        (True, 1),
        (False, 4),
        (False, 5),
    ]
    assert pat_ice == expected

    # domain separation on BOTH sinks
    assert ice.watermark() == (-1, -1)
    assert ice.watermark("stream-q") == (9, 999)
    assert pq.watermark() == (-1, -1)
    assert pq.watermark("stream-q") == (9, 999)

    # record_writer_progress parity (data-less fence advance)
    assert ice.record_writer_progress("signals", 5) is True
    assert ice.record_writer_progress("signals", 5) is False
    assert ice.last_writer_batch_id("signals") == 5
    assert pq.record_writer_progress("signals", 5) is True
    assert pq.record_writer_progress("signals", 5) is False
    assert pq.last_writer_batch_id("signals") == 5


def test_iceberg_writer_fence_sql_pinned():
    from debezium_connector_ibmi_spark.sinks import iceberg as ice

    assert ice.set_fence_sql(
        "lake.db.pages", 7, (3, 12345), writer_id="stream-q", writer_batch_id=2
    ) == (
        "ALTER TABLE lake.db.pages SET TBLPROPERTIES "
        "('cdc.batch_id'='7', 'cdc.writer.stream-q.batch_id'='2', "
        "'cdc.writer.stream-q.watermark'='3:12345')"
    )
    # the SHARED watermark key must never appear in a writer stamp
    assert "'cdc.watermark'" not in ice.set_fence_sql(
        "t", 1, (0, 1), writer_id="w", writer_batch_id=0
    )


def test_iceberg_tolerant_alter_replay():
    """Crash between ALTER and version stamp: the replayed ALTER finds
    its effect already present and is skipped; the stamp catches up
    instead of the replay failing (ADVICE low)."""
    from collections import namedtuple

    from debezium_connector_ibmi_spark.sinks.iceberg import IcebergTarget

    Change = namedtuple("Change", "action name dtype")
    fake = FakeIcebergSession()
    ice = IcebergTarget(fake, "lake.db.pages")

    ice.apply_column_change(Change("add", "score", "double"), version=1)
    assert ice.schema_version() == 1
    # replay (fence was never stamped in the crashed run): must not raise
    fake.props.pop("cdc.schema_version")
    ice.apply_column_change(Change("add", "score", "double"), version=1)
    assert ice.schema_version() == 1
    assert sum("ADD COLUMN score" in s for s in fake.statements) == 1

    ice.apply_column_change(Change("widen", "score", "decimal(18,2)"), version=2)
    ice.apply_column_change(Change("widen", "score", "decimal(18,2)"), version=2)
    assert sum("ALTER COLUMN score" in s for s in fake.statements) == 1

    ice.apply_column_change(Change("drop", "score", None), version=3)
    fake.props.pop("cdc.schema_version")
    ice.apply_column_change(Change("drop", "score", None), version=3)
    assert ice.schema_version() == 3
    assert sum("DROP COLUMN score" in s for s in fake.statements) == 1


def test_footer_lineage_equals_scan_lineage(spark, tmpdir_path):
    """Metadata-only receiver-chain discovery (parquet footer stats,
    the Iceberg-manifest analogue) must equal the 2-column scan on
    both journal layouts, and fall back to None off-layout."""
    from debezium_connector_ibmi_spark.datagen.journal import (
        JournalGenConfig,
        write_journal,
    )
    from debezium_connector_ibmi_spark.plans.range_planner import (
        receiver_lineage,
        receiver_lineage_from_footers,
    )
    from debezium_connector_ibmi_spark.sources.journal_source import (
        read_binary_journal,
        read_journal,
        write_binary_journal,
    )

    gen = JournalGenConfig(n_urls=40, n_ops=500, txn_size=25, receiver_rotation=100)
    write_journal(spark, gen, f"{tmpdir_path}/j", num_files=4)
    write_binary_journal(
        read_journal(spark, f"{tmpdir_path}/j"), f"{tmpdir_path}/jb", num_files=4
    )
    for path, rd in [
        (f"{tmpdir_path}/j", read_journal),
        (f"{tmpdir_path}/jb", read_binary_journal),
    ]:
        assert receiver_lineage_from_footers(path) == receiver_lineage(
            rd(spark, path)
        ), path
    # not receiver-partitioned -> None (callers fall back to the scan)
    assert receiver_lineage_from_footers(tmpdir_path) is None


def test_signal_channel_errors_propagate(spark, tmpdir_path):
    """ADVICE low: only an absent channel means 'no signals'; a
    corrupt channel must raise, not silently stop signal processing."""
    from debezium_connector_ibmi_spark.config import EngineConfig
    from debezium_connector_ibmi_spark.streaming.signals import SignalProcessor

    cfg = EngineConfig(
        journal_path=f"{tmpdir_path}/j",
        target_path=f"{tmpdir_path}/t",
        table_include_list=("PAGES",),
    )
    sp = SignalProcessor(spark, cfg, lambda t: None)
    assert sp.pending() == []  # absent channel
    # corrupt channel: a non-parquet file where parquet is expected
    import os

    os.makedirs(sp.signal_path, exist_ok=True)
    with open(f"{sp.signal_path}/garbage.parquet", "w") as fh:
        fh.write("this is not parquet")
    with pytest.raises(Exception):
        sp.pending()
