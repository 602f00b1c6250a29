"""DSv2 OData catalog connector with real filter pushdown.

The reference's central optimization is server-side `$filter` pushdown
(`/root/reference/code/imagery_store.py:216-221`). sources.odata renders
those strings; THIS module is the connector that makes Catalyst emit
them: a Spark 4 Python DataSource whose reader implements
``pushFilters`` — the engine's selection predicates (platform /
productType / tileId equality, ContentDate range, cloudCover ceiling)
are claimed at planning time, rendered into the exact OData `$filter`
the reference builds, and removed from Spark's post-scan evaluation.
Residual predicates stay Spark-side.

No network in this environment: ``read()`` serves the embedded catalog
fixture, honoring the pushed `$filter` exactly as the live endpoint
would. A networked deployment swaps ``_serve`` for a paged HTTP GET of
``build_url`` output (one InputPartition per page).
"""

from __future__ import annotations

from typing import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from etl_sentinel_imagery_spark.sources.odata import _attr_eq, _attr_le

_SOURCE_NAME = "odata_catalog"


def _render_clause(f: Filter) -> str | None:
    """One Catalyst filter → one OData clause (None = not expressible)."""
    col = f.attribute[-1] if isinstance(f.attribute, tuple) else f.attribute
    if isinstance(f, EqualTo):
        if col == "platform":
            return f"Collection/Name eq '{f.value}'"
        if col in ("productType", "tileId"):
            return _attr_eq(col, f.value)
    if isinstance(f, (GreaterThan, LessThan)) and col == "ContentDate_Start":
        # date-only literals gain the midnight suffix; literals that
        # already carry a time component pass through unmangled
        v = str(f.value)
        lit = v if "T" in v else f"{v}T00:00:00.000Z"
        op = "gt" if isinstance(f, GreaterThan) else "lt"
        return f"ContentDate/Start {op} {lit}"
    if isinstance(f, LessThanOrEqual) and col == "cloudCover":
        return _attr_le("cloudCover", float(f.value))
    return None


def _matches(row: dict, f: Filter) -> bool:
    """The fixture 'server' honoring a pushed predicate."""
    col = f.attribute[-1] if isinstance(f.attribute, tuple) else f.attribute
    v = row[col]
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    raise AssertionError(f"unpushable filter reached the server: {f}")


class ODataCatalogReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.options = options
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # NB: planning runs in a separate Python worker — the observable
        # contract is the BatchScan's PushedFilters line in explain()
        # (asserted in tests/test_odata.py) plus rendered_filter() on a
        # pickled-back reader.
        residual = []
        for f in filters:
            if _render_clause(f) is not None:
                self.pushed.append(f)
            else:
                residual.append(f)
        return iter(residual)

    def rendered_filter(self) -> str:
        """The OData `$filter` string for the pushed predicate set —
        exactly what a live endpoint would receive via build_url."""
        return " and ".join(c for f in self.pushed if (c := _render_clause(f)))

    def partitions(self):
        # $top/$skip pagination: one InputPartition per page → pages
        # fetch in parallel across executors. page_size comes from the
        # 'page_size' option (default: the server's $top cap, 20 —
        # imagery_store.py:45). The fixture's page count is known
        # planning-side; a live endpoint would issue one $count=true
        # probe here instead.
        from etl_sentinel_imagery_spark.sources.catalog_fixture import (
            CATALOG_ROWS,
        )

        page = int(self.options.get("page_size", "20"))
        n_pages = max(1, -(-len(CATALOG_ROWS) // page))
        return [InputPartition((p * page, page)) for p in range(n_pages)]

    def read(self, partition) -> Iterator[tuple]:
        from etl_sentinel_imagery_spark.sources.catalog_fixture import (
            CATALOG_COLUMNS,
            CATALOG_ROWS,
            _row_tuple,
        )

        skip, top = partition.value
        # the "server" applies $filter BEFORE $skip/$top pagination,
        # exactly like the live OData endpoint
        i = 0
        for raw in CATALOG_ROWS:
            t = _row_tuple(raw)
            row = dict(zip(CATALOG_COLUMNS, t[: len(CATALOG_COLUMNS)]))
            if not all(_matches(row, f) for f in self.pushed):
                continue
            if i >= skip + top:
                break
            if i >= skip:
                yield t
            i += 1


class ODataCatalogDataSource(DataSource):
    """spark.read.format("odata_catalog").load() — the catalog as a scan
    with reference-parity `$filter` pushdown."""

    @classmethod
    def name(cls) -> str:
        return _SOURCE_NAME

    def schema(self) -> str:
        from etl_sentinel_imagery_spark.sources.catalog_fixture import (
            _CATALOG_SCHEMA,
        )

        return _CATALOG_SCHEMA

    def reader(self, schema) -> ODataCatalogReader:
        return ODataCatalogReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("catalog writes are append-only (POST semantics)")
        return ODataCatalogWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(ODataCatalogDataSource)


# --- write path: two-phase commit to a catalog staging area ---------------
@dataclass
class _PartFile(WriterCommitMessage):
    staged: str
    n_rows: int


class ODataCatalogWriter(DataSourceWriter):
    """Append new product records to the catalog — the POST side of the
    connector, with proper two-phase commit: executors stage JSON-lines
    part files under `_staging/`, and only the driver's commit() renames
    them into place and writes the manifest. A failed/speculative task's
    staging file is never visible; abort() removes all staged parts.
    (A live deployment swaps the rename for the batched POST call.)"""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _PartFile:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(recursive=True)) + "\n")
                n += 1
        return _PartFile(staged=part, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        final = []
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.staged))
            os.replace(m.staged, dest)
            final.append({"file": os.path.basename(dest), "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_manifest.json"), "w") as fh:
            json.dump({"parts": final, "n_rows": sum(p["n_rows"] for p in final)}, fh)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.staged)
            except FileNotFoundError:
                pass
