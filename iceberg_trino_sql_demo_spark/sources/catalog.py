"""Catalog: schema/table/view registry over a warehouse directory
(SURVEY.md §2.2 D1-D3, D7, D14-D16).

Maps the reference's 3-level namespace (``CREATE SCHEMA iceberg_glue.
victorc_iceberg WITH (location=...)``, :6) onto a JSON registry +
directories.  ``USE`` (:9) is session state on this object.

Views (D14) store SQL text re-executed on read; materialized views (D15)
store SQL text + a backing engine table, refreshed by re-running the CTAS
(new ``replace`` snapshot).  ``register_table`` (D16, :276-279) attaches a
pre-existing table directory by reading its newest metadata version.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO
from iceberg_trino_sql_demo_spark.sources.table import Table


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.path = os.path.join(warehouse, "catalog.json")
        os.makedirs(warehouse, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self.data = json.load(fh)
        else:
            self.data = {"schemas": {}, "tables": {}, "views": {}, "mviews": {}}
        self.current_schema: str | None = None

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.data, fh, indent=1)
        os.replace(tmp, self.path)

    # -- namespaces (D1-D3) ------------------------------------------------
    def create_schema(self, name: str, location: str | None = None, **properties) -> None:
        name = name.lower()
        if name in self.data["schemas"]:
            return
        loc = location or os.path.join(self.warehouse, name)
        os.makedirs(loc, exist_ok=True)
        self.data["schemas"][name] = {"location": loc, "properties": properties}
        self._save()

    def default_location(self, schema: str, table: str) -> str:
        """Warehouse-derived table path — what an omitted ``table_location``
        (optional in Iceberg's snapshot procedure) defaults to."""
        schema = (schema or "").lower()
        base = self.data["schemas"].get(schema, {}).get(
            "location", os.path.join(self.warehouse, schema or "default")
        )
        return os.path.join(base, table.lower())

    def drop_schema(self, name: str, if_exists: bool = False) -> None:
        """Drop an EMPTY schema's registry entry; refuse a non-empty one.
        Like Iceberg/Trino DROP SCHEMA (no CASCADE): tables, views and
        MVs must be dropped first — refusing beats silently orphaning
        their registry entries, and the table DATA is never touched
        here (drop_table(purge=True) is the destructive path)."""
        name = name.lower()
        if name not in self.data["schemas"]:
            if if_exists:
                return
            raise KeyError(f"schema {name} not found")
        held = [
            q for kind in ("tables", "views", "mviews")
            for q in self.data[kind]
            if q.split(".", 1)[0] == name
        ]
        if held:
            raise ValueError(
                f"schema {name} is not empty (holds {len(held)} object(s), "
                f"e.g. {held[0]}); drop them first"
            )
        del self.data["schemas"][name]
        if self.current_schema == name:
            self.current_schema = None
        self._save()

    def show_create_schema(self, name: str) -> str:
        s = self.data["schemas"][name]
        return f"CREATE SCHEMA {name}\nWITH (\n   location = '{s['location']}'\n)"

    def use(self, name: str) -> None:
        name = name.lower()
        if name not in self.data["schemas"]:
            raise KeyError(name)
        self.current_schema = name

    def _qualify(self, name: str) -> str:
        # SQL identifiers are case-insensitive: normalize, or an uppercase
        # reference would silently fall through to a same-named temp view
        name = name.lower()
        if "." in name:
            return name
        if not self.current_schema:
            raise ValueError(f"no current schema; qualify {name!r} or call use()")
        return f"{self.current_schema}.{name}"

    def _table_dir(self, qualified: str) -> str:
        schema, table = qualified.split(".", 1)
        return os.path.join(self.data["schemas"][schema]["location"], table)

    # -- tables ------------------------------------------------------------
    def ctas(
        self,
        name: str,
        df: DataFrame,
        partitioning=(),
        properties: dict | None = None,
        sort_order: list[str] | None = None,
    ) -> Table:
        """CREATE OR REPLACE TABLE ... AS SELECT (D4-D6)."""
        q = self._qualify(name)
        loc = self.data["tables"].get(q) or self._table_dir(q)
        t = Table.ctas(self.spark, loc, df, partitioning, properties, sort_order)
        self.data["tables"][q] = loc
        self._save()
        return t

    def create_table(self, name: str, columns, partitioning=(), properties=None) -> Table:
        q = self._qualify(name)
        loc = self._table_dir(q)
        t = Table.create(self.spark, loc, columns, partitioning, properties or {})
        self.data["tables"][q] = loc
        self._save()
        return t

    def table(self, name: str) -> Table:
        q = self._qualify(name)
        if q not in self.data["tables"]:
            raise KeyError(f"table {q} not found")
        return Table(self.spark, self.data["tables"][q])

    def drop_table(self, name: str, if_exists: bool = True, purge: bool = False) -> None:
        q = self._qualify(name)
        loc = self.data["tables"].pop(q, None)
        if loc is None:
            if if_exists:
                return
            raise KeyError(q)
        self._save()
        if purge and os.path.isdir(loc):
            shutil.rmtree(loc)

    def rename_table(self, old: str, new: str) -> None:
        """ALTER TABLE old RENAME TO new — a catalog-entry move, exactly
        like Iceberg: the table LOCATION (metadata, manifests, data files,
        full snapshot history) is untouched, only the name pointing at it
        changes.  At any table size this is one catalog write."""
        qo, qn = self._qualify(old), self._qualify(new)
        if qo not in self.data["tables"]:
            raise KeyError(f"table {qo} does not exist")
        if qn in self.data["tables"]:
            raise ValueError(f"table {qn} already exists")
        self.data["tables"][qn] = self.data["tables"].pop(qo)
        self._save()

    def register_table(self, schema: str, table: str, location: str) -> Table:
        """CALL system.register_table (D16, reference :276-279): adopt an
        existing table directory; its newest metadata version wins.

        Two metadata dialects are recognized:

        - **engine-own** (underscore-keyed ``v*.metadata.json``): the
          catalog simply points at the directory.
        - **genuine Apache Iceberg v1/v2** (hyphen-keyed spec metadata +
          Avro manifests — what another engine's
          ``register_table(table_location => 's3://...')`` adopts,
          reference :276-279): the current snapshot is parsed by
          ``iceberg_compat`` and committed as an engine table under the
          schema's own warehouse path, referencing the Iceberg parquet
          data files IN PLACE.  Engine metadata never lands inside the
          Iceberg table's directory (its ``metadata/v*.metadata.json``
          names would collide with ours)."""
        from iceberg_trino_sql_demo_spark.sources import iceberg_compat

        q = f"{schema}.{table}".lower()
        if iceberg_compat.is_iceberg_location(location):
            engine_loc = self.default_location(schema, table)
            if os.path.abspath(engine_loc) == os.path.abspath(location):
                raise ValueError(
                    f"register_table: adopted Iceberg table {location!r} "
                    "coincides with the engine's warehouse path for "
                    f"{q!r} — metadata files would collide")
            if MetadataIO(engine_loc).current_version() > 0:
                raise ValueError(
                    f"register_table: engine table already exists at "
                    f"{engine_loc!r}; DROP it before re-adopting")
            t = iceberg_compat.adopt_iceberg_table(
                self.spark, engine_loc, location)
            self.data["tables"][q] = engine_loc
            self._save()
            return t
        io = MetadataIO(location)
        if io.current_version() == 0:
            raise FileNotFoundError(f"no table metadata under {location}")
        self.data["tables"][q] = location
        self._save()
        return Table(self.spark, location)

    def tables(self) -> list[str]:
        return sorted(self.data["tables"])

    # -- views (D14) -------------------------------------------------------
    def create_view(self, name: str, sql: str) -> None:
        self.data["views"][self._qualify(name)] = sql
        self._save()

    def read_view(self, name: str) -> DataFrame:
        """Views re-execute their SQL at read time; engine tables referenced
        by the SQL must be registered first (register_table_view)."""
        return self.spark.sql(self.data["views"][self._qualify(name)])

    def register_table_view(self, name: str, view_name: str | None = None, **df_kwargs) -> None:
        """Expose an engine table snapshot to spark.sql as a temp view."""
        self.table(name).df(**df_kwargs).createOrReplaceTempView(
            view_name or name.split(".")[-1]
        )

    # -- materialized views (D15) -----------------------------------------
    def create_materialized_view(
        self,
        name: str,
        sql: str,
        refresh_schedule: str | None = None,
        base_table: str | None = None,
        aggregate_merge: dict | None = None,
        base_view: str | None = None,
    ) -> Table:
        """CREATE OR REPLACE MATERIALIZED VIEW ... WITH (refresh_schedule)
        (:57-59).  The cron string is stored AND evaluated
        (due_materialized_views); an external beat or the opt-in ticker
        drives the refresh calls.

        ``base_table`` opts into INCREMENTAL refresh: the MV records the
        base's snapshot id at each refresh, and a later refresh whose
        intervening base history is append-only processes ONLY the added
        rows (table_changes CDC) instead of rescanning the base —
        - per-row defining SQL (no aggregate/join/distinct/order/limit,
          detected conservatively): the delta's transformed rows are
          APPENDED to the MV;
        - with ``aggregate_merge={"keys": [...], "sums": [...],
          "counts": [...], "mins": [...], "maxs": [...]}`` covering
          every MV output column: the delta is aggregated alone and
          MERGED into the MV by key arithmetic (sum+sum, count+count,
          least/greatest of extremes) — the TimescaleDB
          continuous-aggregate / Materialize shape for distributive
          aggregates.
        Any non-append base history (delete/update/rewrite) or
        non-mergeable SQL falls back to the full re-run, so incremental
        mode can never change results.  ``last_refresh_mode`` in the MV
        catalog entry records which path the last refresh took."""
        q = self._qualify(name)
        props = {"mv": "true"}
        if refresh_schedule:
            props["refresh_schedule"] = refresh_schedule
        t = self.ctas(name, self.spark.sql(sql), properties=props)
        entry: dict = {"sql": sql}
        if base_table:
            bq = self._qualify(base_table)
            bt = self.table(bq)
            if aggregate_merge is not None:
                covered = (
                    set(aggregate_merge.get("keys", []))
                    | set(aggregate_merge.get("sums", []))
                    | set(aggregate_merge.get("counts", []))
                    | set(aggregate_merge.get("mins", []))
                    | set(aggregate_merge.get("maxs", []))
                )
                mv_cols = set(f.name for f in t.meta.schema.fields)
                if covered != mv_cols:
                    raise ValueError(
                        f"aggregate_merge must cover every MV column: "
                        f"spec {sorted(covered)} vs MV {sorted(mv_cols)}"
                    )
            entry.update(
                base_table=bq,
                base_snapshot_id=bt.meta.refs.get("main"),
                aggregate_merge=aggregate_merge,
                # the temp-view name the defining SQL reads the base under
                # (register_table_view's view_name); default = short name
                base_view=base_view or bq.split(".")[-1],
            )
        self.data["mviews"][q] = entry
        self._save()
        return t

    #: defining-SQL features that make blind append-incremental WRONG —
    #: matched conservatively (a false positive only costs a full re-run)
    _NON_PER_ROW = re.compile(
        r"\b(GROUP\s+BY|JOIN|DISTINCT|HAVING|UNION|INTERSECT|EXCEPT|"
        r"ORDER\s+BY|LIMIT|OVER)\b|\b(count|sum|avg|min|max)\s*\(",
        re.IGNORECASE,
    )

    def refresh_materialized_view(self, name: str) -> Table:
        """REFRESH MATERIALIZED VIEW (:60).  Incremental when the MV was
        created with ``base_table`` and the base history since the last
        refresh is append-only (see create_materialized_view); otherwise
        the stored SQL re-runs in full as a replace snapshot (history
        retained either way)."""
        q = self._qualify(name)
        entry = self.data["mviews"][q]
        sql = entry["sql"]
        t = self.table(name)
        if entry.get("base_table"):
            mode, t, done_sid = self._refresh_incremental(q, entry, t)
            # advance the watermark only AFTER the refresh committed — a
            # failed incremental refresh must re-process its delta on retry
            entry["base_snapshot_id"] = done_sid
        else:
            mode = "full"
            t = self.ctas(name, self.spark.sql(sql), properties=t.meta.properties)
        entry["last_refresh_mode"] = mode
        from iceberg_trino_sql_demo_spark.sources.metadata import now_ms

        entry["last_refresh_ms"] = now_ms()
        self._save()
        return t

    def _refresh_incremental(self, q: str, entry: dict, t: Table):
        """(mode, refreshed table, processed base snapshot id) for a
        base-tracked MV — see create_materialized_view for the decision
        table."""
        from pyspark.sql import functions as F

        sql = entry["sql"]
        bt = self.table(entry["base_table"])
        cur_sid = bt.meta.refs.get("main")
        prev_sid = entry.get("base_snapshot_id")
        short = entry.get("base_view") or entry["base_table"].split(".")[-1]

        def full() -> Table:
            self.register_table_view(entry["base_table"], short)
            return self.ctas(q, self.spark.sql(sql), properties=t.meta.properties)

        if cur_sid == prev_sid:
            return "noop", t, cur_sid
        # append-only history check: walk the parent chain (cur, prev]
        ops = []
        s = bt.meta.snapshot_by_id(cur_sid)
        while s is not None and s.snapshot_id != prev_sid:
            ops.append(s.operation)
            s = (
                None
                if s.parent_id is None
                else bt.meta.snapshot_by_id(s.parent_id)
            )
        history_linear = s is not None  # prev reached => linear append chain
        if not history_linear or any(op != "append" for op in ops):
            return "full", full(), cur_sid

        delta = (
            bt.table_changes(prev_sid, cur_sid)
            .where(F.col("_change_type") == "insert")
            .drop("_change_type", "_change_ordinal", "_commit_snapshot_id")
        )
        # evaluate the defining SQL over the DELTA ONLY: swap the base's
        # temp view for the delta frame, analyze, then restore the full
        # view (analysis captures the delta plan; later re-registration
        # does not disturb it)
        delta.createOrReplaceTempView(short)
        try:
            delta_out = self.spark.sql(sql)
            delta_out.schema  # force analysis while the delta view is bound
        finally:
            self.register_table_view(entry["base_table"], short)

        spec = entry.get("aggregate_merge")
        if spec:
            keys = spec.get("keys", [])
            addable = spec.get("sums", []) + spec.get("counts", [])
            # min/max are also append-only-mergeable: the combined extreme
            # is the extreme of the two sides (coalesce covers a key seen
            # on only one side)
            mins = spec.get("mins", [])
            maxs = spec.get("maxs", [])
            old = t.df()
            types = {f.name: f.dataType for f in old.schema.fields}
            merged = old.alias("o").join(delta_out.alias("d"), keys, "full_outer").select(
                *[F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
                *[
                    (
                        F.coalesce(F.col(f"o.{c}"), F.lit(0).cast(types[c]))
                        + F.coalesce(F.col(f"d.{c}"), F.lit(0).cast(types[c]))
                    ).cast(types[c]).alias(c)
                    for c in addable
                ],
                *[
                    F.least(
                        F.coalesce(F.col(f"o.{c}"), F.col(f"d.{c}")),
                        F.coalesce(F.col(f"d.{c}"), F.col(f"o.{c}")),
                    ).alias(c)
                    for c in mins
                ],
                *[
                    F.greatest(
                        F.coalesce(F.col(f"o.{c}"), F.col(f"d.{c}")),
                        F.coalesce(F.col(f"d.{c}"), F.col(f"o.{c}")),
                    ).alias(c)
                    for c in maxs
                ],
            )
            return "incremental-merge", self.ctas(
                q, merged, properties=t.meta.properties
            ), cur_sid
        if not self._NON_PER_ROW.search(sql):
            t.append(delta_out)
            return "incremental-append", t.refresh(), cur_sid
        return "full", full(), cur_sid

    def due_materialized_views(self, now=None) -> list[str]:
        """MVs whose ``refresh_schedule`` cron has fired since their last
        refresh commit (the newest snapshot's timestamp).  The engine still
        runs no daemon — an external ticker polls this and calls
        refresh_materialized_view for each returned name; evaluation is
        pure metadata (cron parse + one snapshot-log lookup per MV)."""
        from datetime import datetime, timezone

        from iceberg_trino_sql_demo_spark.plans.cron import is_due

        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        due = []
        for q in self.data["mviews"]:
            t = self.table(q)
            sched = t.meta.properties.get("refresh_schedule")
            if not sched or not t.meta.snapshots:
                continue
            last_ms = max(s.timestamp_ms for s in t.meta.snapshots)
            # an incremental refresh that found no new base data commits
            # nothing — its recorded beat still counts, or the MV would
            # re-fire every tick until data arrives
            last_ms = max(last_ms, self.data["mviews"][q].get("last_refresh_ms", 0))
            last = datetime.utcfromtimestamp(last_ms / 1000.0)
            if is_due(sched, last, now):
                due.append(q)
        return due

    def run_due_refreshes(self, now=None) -> list[str]:
        """One ticker beat: refresh every MV whose cron has fired since its
        last refresh commit, returning the refreshed names.  This is the
        in-process convenience over due_materialized_views — call it from
        any external clock (cron, Airflow, the streaming ticker below) to
        get the reference's refresh_schedule semantics (:57-60) without
        re-implementing the due-ness logic."""
        done = []
        # snapshot the due list up front: a refresh commits snapshots and
        # re-saves catalog state, and the ticker thread may run this while
        # the owning thread registers new MVs — iterate a copy, never the
        # live dict
        for q in list(self.due_materialized_views(now=now)):
            self.refresh_materialized_view(q)
            done.append(q)
        return done

    def start_refresh_ticker(self, interval_s: float = 60.0):
        """Opt-in in-process MV refresh daemon: a daemon thread polling
        run_due_refreshes every ``interval_s``.  Returns an object with
        ``.stop()``.  Deliberately a plain thread, not a Structured
        Streaming query: the work is driver-side metadata + a CTAS, and a
        do-nothing micro-batch stream would occupy an executor slot for a
        pure clock.  At scale the same beat runs in the orchestrator."""
        import threading

        stop_ev = threading.Event()

        def beat() -> None:
            import sys
            import traceback

            while not stop_ev.wait(interval_s):
                try:
                    self.run_due_refreshes()
                except Exception:  # noqa: BLE001 — ticker must outlive a bad MV
                    # never die silently: an MV that stops refreshing must
                    # be distinguishable from one that is up to date
                    print(
                        "mv-refresh-ticker beat failed:\n"
                        + traceback.format_exc(),
                        file=sys.stderr,
                    )

        th = threading.Thread(target=beat, daemon=True, name="mv-refresh-ticker")
        th.start()

        class _Ticker:
            def stop(self, timeout: float = 5.0) -> None:
                stop_ev.set()
                th.join(timeout)

        return _Ticker()
