"""Contract tests for the Iceberg branch of dedup.warehouse.Warehouse.

The sandbox has no Iceberg runtime jar (SURVEY §7.0), so the
`use_iceberg=True` code path — `writeTo(...).createOrReplace()/append()/
create()`, `spark.table`, `spark.catalog.tableExists`, `DROP TABLE` —
cannot run against a real catalog here (VERDICT r5 #6: it was dead-untested
code). These tests pin the branch against a stub of exactly the Spark
surface it touches, asserting the CONTRACT: which DataFrameWriterV2 verbs
fire for which modes, that manifest/lineage entries are recorded with the
catalog-qualified table name, and that resume semantics (is_complete,
config-hash refusal) are identical to the Parquet fallback. On a cluster
with `spark.sql.catalog.dedup` configured the same calls land on Iceberg
unchanged."""

from __future__ import annotations

import json
import os

import pytest

from dedup.warehouse import Warehouse


class FakeCatalogStore:
    """In-memory stand-in for an Iceberg catalog: table name -> list of
    (verb, rows) write events; `rows` is the fake row payload."""

    def __init__(self):
        self.tables: dict[str, list] = {}
        self.events: list[tuple[str, str]] = []

    def exists(self, name: str) -> bool:
        return name in self.tables


class FakeWriterV2:
    def __init__(self, store: FakeCatalogStore, table: str, rows: list):
        self._store, self._table, self._rows = store, table, rows

    def createOrReplace(self) -> None:
        self._store.tables[self._table] = list(self._rows)
        self._store.events.append(("createOrReplace", self._table))

    def create(self) -> None:
        if self._store.exists(self._table):
            raise RuntimeError(f"table {self._table} already exists")
        self._store.tables[self._table] = list(self._rows)
        self._store.events.append(("create", self._table))

    def append(self) -> None:
        if not self._store.exists(self._table):
            # real Iceberg raises AnalysisException for a missing table
            raise RuntimeError(f"table {self._table} not found")
        self._store.tables[self._table].extend(self._rows)
        self._store.events.append(("append", self._table))


class FakeDF:
    def __init__(self, store: FakeCatalogStore, rows: list):
        self._store, self._rows = store, rows

    def writeTo(self, table: str) -> FakeWriterV2:
        return FakeWriterV2(self._store, table, self._rows)

    def count(self) -> int:
        return len(self._rows)


class FakeCatalog:
    def __init__(self, store: FakeCatalogStore):
        self._store = store

    def tableExists(self, name: str) -> bool:
        return self._store.exists(name)


class FakeConf:
    def __init__(self, values: dict):
        self._values = values

    def get(self, key: str, default=None):
        return self._values.get(key, default)


class FakeSpark:
    def __init__(self, store: FakeCatalogStore, conf: dict | None = None):
        self._store = store
        self.catalog = FakeCatalog(store)
        self.conf = FakeConf(conf or {})
        self.sql_calls: list[str] = []

    def table(self, name: str) -> FakeDF:
        if not self._store.exists(name):
            raise RuntimeError(f"table {name} not found")
        return FakeDF(self._store, self._store.tables[name])

    def sql(self, stmt: str) -> None:
        self.sql_calls.append(stmt)
        if stmt.startswith("DROP TABLE IF EXISTS "):
            self._store.tables.pop(stmt.rsplit(" ", 1)[-1], None)


@pytest.fixture()
def wh(tmp_path):
    store = FakeCatalogStore()
    spark = FakeSpark(store)
    return Warehouse(spark, str(tmp_path), use_iceberg=True), store, spark


def test_autodetect_from_catalog_conf(tmp_path):
    store = FakeCatalogStore()
    on = FakeSpark(store, {"spark.sql.catalog.dedup":
                           "org.apache.iceberg.spark.SparkCatalog"})
    assert Warehouse(on, str(tmp_path)).use_iceberg is True
    off = FakeSpark(store, {})
    assert Warehouse(off, str(tmp_path)).use_iceberg is False


def test_write_overwrite_uses_create_or_replace(wh):
    w, store, spark = wh
    rows = w.write(FakeDF(store, [1, 2, 3]), "clusters", "cfgA")
    assert rows == 3
    assert store.events == [("createOrReplace", "dedup.db.clusters")]
    # second overwrite replaces, never appends
    w.write(FakeDF(store, [9]), "clusters", "cfgA")
    assert store.tables["dedup.db.clusters"] == [9]
    assert store.events[-1] == ("createOrReplace", "dedup.db.clusters")


def test_write_append_mode_appends(wh):
    w, store, _ = wh
    w.write(FakeDF(store, [1]), "metrics", "cfgA")
    w.write(FakeDF(store, [2]), "metrics", "cfgA", mode="append")
    assert store.tables["dedup.db.metrics"] == [1, 2]
    assert store.events[-1] == ("append", "dedup.db.metrics")


def test_append_creates_missing_table_then_appends(wh):
    # append() on a table that does not exist yet must fall back to create
    # (first streaming micro-batch) and append thereafter
    w, store, _ = wh
    w.append(FakeDF(store, [1, 2]), "metrics")
    assert store.events == [("create", "dedup.db.metrics")]
    w.append(FakeDF(store, [3]), "metrics")
    assert store.events[-1] == ("append", "dedup.db.metrics")
    assert store.tables["dedup.db.metrics"] == [1, 2, 3]


def test_read_exists_drop_roundtrip(wh):
    w, store, spark = wh
    assert not w.exists("clusters")
    w.write(FakeDF(store, [1, 2]), "clusters", "cfgA")
    assert w.exists("clusters")
    assert w.read("clusters").count() == 2
    w.drop("clusters")
    assert spark.sql_calls == ["DROP TABLE IF EXISTS dedup.db.clusters"]
    assert not w.exists("clusters")


def test_manifest_lineage_record_catalog_table(wh):
    w, store, _ = wh
    w.write(FakeDF(store, [1]), "clusters", "cfgA")
    m = json.load(open(os.path.join(w.root, "_manifest.json")))
    assert m["tables"]["clusters"]["status"] == "complete"
    assert m["tables"]["clusters"]["rows"] == 1
    assert m["tables"]["clusters"]["config_hash"] == "cfgA"
    assert m["lineage"][-1]["table"] == "dedup.db.clusters"
    assert m["lineage"][-1]["status"] == "written"


def test_is_complete_refuses_config_mismatch(wh):
    # resume contract, identical to the Parquet fallback: a different config
    # hash is refused, never silently reused (the warehouse analog of the
    # reference's heapify rejecting a mismatched family/ser-ver,
    # FrequentDirections.java:117-126)
    w, store, _ = wh
    w.write(FakeDF(store, [1]), "clusters", "cfgA")
    assert w.is_complete("clusters", "cfgA")
    assert not w.is_complete("clusters", "cfgB")
    # manifest says complete but the catalog lost the table -> not complete
    store.tables.pop("dedup.db.clusters")
    assert not w.is_complete("clusters", "cfgA")


def test_drop_clears_manifest_entry(wh):
    w, store, _ = wh
    w.write(FakeDF(store, [1]), "clusters", "cfgA")
    w.drop("clusters")
    assert not w.is_complete("clusters", "cfgA")
    m = json.load(open(os.path.join(w.root, "_manifest.json")))
    assert "clusters" not in m["tables"]


class FakeStreamReader:
    def __init__(self, events):
        self._events = events

    def table(self, name):
        self._events.append(("readStream.table", name))
        return f"stream:{name}"

    def schema(self, s):
        self._events.append(("readStream.schema", s))
        return self

    def option(self, k, v):
        self._events.append(("readStream.option", f"{k}={v}"))
        return self

    def parquet(self, path):
        self._events.append(("readStream.parquet", path))
        return f"stream:{path}"


class FakeStreamSpark:
    def __init__(self):
        self.events = []

    @property
    def readStream(self):
        return FakeStreamReader(self.events)


class TestIcebergStreamSource:
    """Contract for the streaming corpus-source dispatch (no runtime jar in
    the sandbox): input_format='iceberg' must read through readStream.table
    (incremental snapshot scan, table-provided schema), 'parquet' through the
    schema'd file source; anything else fails loudly."""

    def test_iceberg_uses_read_stream_table(self):
        from dedup.streaming import _corpus_stream

        fake = FakeStreamSpark()
        out = _corpus_stream(fake, "lake.db.corpus", "iceberg")
        assert out == "stream:lake.db.corpus"
        assert fake.events == [
            ("readStream.option", "streaming-max-files-per-micro-batch=64"),
            ("readStream.table", "lake.db.corpus"),
        ]

    def test_parquet_uses_file_source_with_schema(self):
        from dedup.streaming import CORPUS_SCHEMA, _corpus_stream

        fake = FakeStreamSpark()
        out = _corpus_stream(fake, "/data/in", "parquet")
        assert out == "stream:/data/in"
        assert ("readStream.schema", CORPUS_SCHEMA) in fake.events
        assert ("readStream.option", "maxFilesPerTrigger=64") in fake.events

    def test_unknown_format_raises(self):
        from dedup.streaming import _corpus_stream

        with pytest.raises(ValueError):
            _corpus_stream(FakeStreamSpark(), "x", "orc")
