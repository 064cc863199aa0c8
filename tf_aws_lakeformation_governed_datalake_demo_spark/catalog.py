"""GovernedCatalog — databases, external tables, views, governance enforcement.

The Spark-native equivalent of the reference's Glue catalog + Lake Formation
declarations (``/root/reference/main.tf:286-490``):

- database / external table registration (main.tf:291-372) — a table is a
  (schema, parquet location) pair, schema-on-read, never inferred;
- views as stored SQL (outputs.tf:44-53);
- LF-tags and column tag assignments (main.tf:382-429);
- data-cells filters (main.tf:432-457);
- grants with implicit deny (main.tf:460-490) and admin bypass
  (main.tf:82-91);
- the governance feature flag (variables.tf:10-14).

Enforcement strategy (SURVEY.md §4.2 option 1): every read goes through
:meth:`GovernedCatalog.table`, which returns the base DataFrame with the
principal's data-cells filter injected as ``.filter(expr).select(cols)``.
Catalyst pushes both into the Parquet scan (``PushedFilters`` +
``ReadSchema``), so governed scans read *less* than ungoverned ones —
the right behavior at 100 TB. ``SELECT *`` then expands against the
rewritten relation, so star projection naturally shows only the allowlist.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .governance import (
    ALL,
    SELECT,
    AuditLog,
    DataCellsFilter,
    Grant,
    LFTag,
    PermissionDeniedError,
    Principal,
)


@dataclass
class TableDef:
    """An external (unmanaged) table: catalog schema + storage location.

    Mirrors ``aws_glue_catalog_table`` (main.tf:303-372): schema lives in
    the catalog, data is written out-of-band, visible immediately
    (schema-on-read). ``column_comments`` and ``column_tags`` land in
    ``StructField.metadata`` like Glue column comments / LF column tags.
    """

    database: str
    name: str
    location: str
    schema: T.StructType | None = None
    format: str = "parquet"
    column_comments: dict[str, str] = field(default_factory=dict)
    column_tags: dict[str, dict[str, str]] = field(default_factory=dict)
    partition_keys: tuple[str, ...] = ()
    # Columns appended by evolve_table_schema and not yet released by
    # approve_evolved_columns: invisible to every CONDITIONED grant path
    # (fail-closed schema evolution).
    pending_columns: set[str] = field(default_factory=set)
    # ANALYZE TABLE output (Engine.analyze_table): {"row_count", "computed_at",
    # "snapshot_version" (manifest tables), "columns": {col: {"null_count",
    # "ndv_approx", "min", "max"}}}. Planner HINTS only — never consulted by
    # enforcement, excluded from the governance fingerprint (refreshing stats
    # must not invalidate reused results).
    stats: dict | None = None
    # MSCK REPAIR TABLE output (catalog.repair_table): the declared
    # location's hive-layout index {"files": {rel: [size, rows]},
    # "partitions": {rel_dir: rows}, "rows": total}. Like ``stats``, a
    # metadata HINT: the engine re-lists and compares names+sizes
    # before serving a count from it (any drift falls open to the
    # scan), so it is deliberately NOT serialized — after a catalog
    # reload, re-run MSCK (it is incremental: unchanged files skip
    # their footer reads).
    discovered: dict | None = None

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.name}"

    def spark_schema(self) -> T.StructType | None:
        """Schema with comments/tags folded into field metadata."""
        if self.schema is None:
            return None
        fields = []
        for f_ in self.schema.fields:
            meta = dict(f_.metadata or {})
            if f_.name in self.column_comments:
                meta["comment"] = self.column_comments[f_.name]
            for tag_key, tag_value in self.column_tags.get(f_.name, {}).items():
                meta[tag_key] = tag_value
            fields.append(T.StructField(f_.name, f_.dataType, f_.nullable, meta))
        return T.StructType(fields)


@dataclass
class ViewDef:
    """A logical SQL view (outputs.tf:44-53). ``sql`` is the SELECT body."""

    database: str
    name: str
    sql: str

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.name}"


@dataclass
class MaterializedViewDef:
    """An incrementally-maintained aggregate over ONE manifest-committed
    source table (Engine.create_materialized_view / refresh). Measures
    are ADDITIVE only (count / sum) — the invariant that makes a
    signed change-feed merge equal a full recompute under deletes;
    min/max are refused at creation (a delete can strand them).

    The source-version WATERMARK the stored state reflects is NOT here:
    it rides the MV manifest's own ``app_versions`` ledger
    (``{"mv_source": N}``), committed atomically with the state in the
    same pointer replace — a catalog def can never go stale against
    the files (round-9 review: a stale in-memory watermark double-
    applied the change feed), and refreshes don't churn the
    governance fingerprint."""

    database: str
    name: str
    source: str  # qualified source table
    group_by: tuple
    # PHYSICAL stored measures: out_col -> [agg, src_col|None]; agg in
    # {count, sum, nncount} (nncount = non-null count, the denominator
    # an avg measure stores — still additive under the signed feed)
    measures: dict
    location: str
    # Derived (read-time) measures: out_col -> (sum_col, n_col) for
    # AVG, computed as CAST(sum AS DOUBLE)/n by the catalog VIEW that
    # fronts the state table. Storing sum+count is what keeps avg
    # refreshable from the signed feed (avg itself is not additive).
    derived: dict = field(default_factory=dict)
    # Qualified name of the registered state table when the MV is
    # fronted by a view (derived measures present); None = the MV's
    # own name IS the state table (plain count/sum MVs, the v1 shape).
    state_table: str | None = None
    # Optional source row filter (SQL predicate string): the MV
    # aggregates only matching rows, and refresh applies the SAME
    # predicate to the signed change feed — a deleted matching row
    # subtracts, a non-matching row never contributed, so filtered
    # refresh == filtered recompute exactly (NULL predicate rows are
    # excluded on both paths — standard WHERE semantics).
    where: str | None = None
    # Optional enrich-join definition: {"table": qualified dim, "on":
    # {fact_col: dim_col}, "select": [dim cols]} — the fact LEFT-joins
    # this dimension PINNED at its creation-time snapshot (the pin
    # rides the MV manifest's app_versions as "mv_dim"); a drifted
    # dimension fail-closes refresh (mixing join eras would corrupt
    # already-aggregated groups).
    enrich: dict | None = None

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.name}"


class ConcurrentCatalogModificationError(RuntimeError):
    """Another session saved the catalog since this one loaded it."""


class GovernedCatalog:
    """Registry of databases/tables/views + governance state + enforcement."""

    def __init__(
        self,
        spark: SparkSession,
        governance_enabled: bool = True,
        lake_root: str | None = None,
    ):
        self.spark = spark
        self.governance_enabled = governance_enabled
        # When set, destructive operations (drop_table(delete_data=True))
        # may only touch paths under this directory — the S3-lake-bucket
        # boundary analog.
        self.lake_root = lake_root
        self.databases: dict[str, str] = {}  # name -> description
        self.tables: dict[str, TableDef] = {}  # "db.table" -> def
        self.views: dict[str, ViewDef] = {}  # "db.view" -> def
        self.tags: dict[str, LFTag] = {}
        self.filters: dict[str, DataCellsFilter] = {}
        self.grants: list[Grant] = []
        self.admins: set[str] = set()
        self.mvs: dict[str, MaterializedViewDef] = {}  # "db.mv" -> def
        self.audit = AuditLog()
        # Monotonic save counter for optimistic concurrency (see save()).
        self.revision = 0
        # Cost-based broadcast: a governed query wraps a referenced TABLE
        # in a broadcast hint when its known row count — manifest footer
        # counts (always current) or ANALYZE stats for non-manifest
        # tables — is at or under this. Catalyst's byte-based estimate
        # is blind to row counts (a wide-but-short dim can exceed
        # autoBroadcastJoinThreshold bytes) and the governance rewrite
        # stacks filters/CASE projections whose selectivity it guesses
        # conservatively; exact footer row counts are the better signal
        # and cost one JSON read. A broadcast hint never changes
        # semantics — worst case Spark ignores it. Session tuning, not
        # persisted policy; None disables.
        self.broadcast_row_threshold: int | None = 100_000

    # ------------------------------------------------------- persistence
    CATALOG_SUBDIR = "_catalog"  # '_' prefix: invisible to parquet scans

    def to_dict(self) -> dict:
        """Serialize every governance-relevant structure to plain JSON
        types. The reference's catalog + policies are durable cloud
        state that survives any client restart (Glue database/table
        main.tf:291-372; LF tags/filters/grants main.tf:374-490) — this
        is the engine's equivalent record, written under the lake root
        so the metadata travels with the data it governs."""
        return {
            "version": 1,  # serialization format version
            "revision": self.revision,  # optimistic-concurrency counter
            "governance_enabled": self.governance_enabled,
            "lake_root": self.lake_root,
            "databases": dict(sorted(self.databases.items())),
            "tables": {
                q: {
                    "database": t.database,
                    "name": t.name,
                    "location": t.location,
                    "schema": t.schema.json() if t.schema is not None else None,
                    "format": t.format,
                    "column_comments": dict(sorted(t.column_comments.items())),
                    "column_tags": {
                        c: dict(sorted(ts.items()))
                        for c, ts in sorted(t.column_tags.items())
                    },
                    "partition_keys": list(t.partition_keys),
                    "pending_columns": sorted(t.pending_columns),
                }
                for q, t in sorted(self.tables.items())
            },
            "views": {
                q: {"database": v.database, "name": v.name, "sql": v.sql}
                for q, v in sorted(self.views.items())
            },
            "tags": {
                k: list(tag.values) for k, tag in sorted(self.tags.items())
            },
            "filters": {
                n: {
                    "database": f.database,
                    "table": f.table,
                    "columns": list(f.columns) if f.columns is not None else None,
                    "row_filter": f.row_filter,
                }
                for n, f in sorted(self.filters.items())
            },
            "grants": [
                {
                    "principal": g.principal,
                    "permission": g.permission,
                    "database": g.database,
                    "resource": g.resource,
                    "via_filter": g.via_filter,
                    "via_tag_exclude": (
                        list(g.via_tag_exclude)
                        if g.via_tag_exclude is not None
                        else None
                    ),
                }
                for g in self.grants  # grant order is semantic state
            ],
            "admins": sorted(self.admins),
            # emitted only when present so pre-ANALYZE catalogs serialize
            # identically (and governance_fingerprint pops the key anyway:
            # stats are planner hints, not policy)
            **(
                {
                    "table_stats": {
                        q: t.stats
                        for q, t in sorted(self.tables.items())
                        if t.stats is not None
                    }
                }
                if any(t.stats is not None for t in self.tables.values())
                else {}
            ),
            # emitted only when present so pre-MV catalogs (and their
            # persisted governance fingerprints) serialize identically
            **(
                {
                    "materialized_views": {
                        q: {
                            "database": m.database,
                            "name": m.name,
                            "source": m.source,
                            "group_by": list(m.group_by),
                            "measures": {
                                k: list(v)
                                for k, v in sorted(m.measures.items())
                            },
                            "location": m.location,
                            "derived": {
                                k: list(v)
                                for k, v in sorted(m.derived.items())
                            },
                            "state_table": m.state_table,
                            "where": m.where,
                            "enrich": m.enrich,
                        }
                        for q, m in sorted(self.mvs.items())
                    }
                }
                if self.mvs
                else {}
            ),
        }

    @classmethod
    def from_dict(cls, spark: SparkSession, state: dict) -> "GovernedCatalog":
        """Rebuild a catalog from :meth:`to_dict` output. Enforcement is
        identity-preserving: the reloaded catalog's
        :meth:`governance_fingerprint` equals the saved one's (pinned in
        tests/test_catalog_persistence.py), so L7 result reuse survives
        a restart too."""
        cat = cls(
            spark,
            governance_enabled=state["governance_enabled"],
            lake_root=state.get("lake_root"),
        )
        cat.databases = dict(state["databases"])
        for q, t in state["tables"].items():
            import json as _json

            cat.tables[q] = TableDef(
                database=t["database"],
                name=t["name"],
                location=t["location"],
                schema=(
                    T.StructType.fromJson(_json.loads(t["schema"]))
                    if t["schema"] is not None
                    else None
                ),
                format=t["format"],
                column_comments=dict(t["column_comments"]),
                column_tags={c: dict(ts) for c, ts in t["column_tags"].items()},
                partition_keys=tuple(t["partition_keys"]),
                pending_columns=set(t["pending_columns"]),
            )
        for q, v in state["views"].items():
            cat.views[q] = ViewDef(v["database"], v["name"], v["sql"])
        for k, values in state["tags"].items():
            cat.tags[k] = LFTag(k, tuple(values))
        for n, f in state["filters"].items():
            cat.filters[n] = DataCellsFilter(
                name=n,
                database=f["database"],
                table=f["table"],
                columns=tuple(f["columns"]) if f["columns"] is not None else None,
                row_filter=f["row_filter"],
            )
        for g in state["grants"]:
            cat.grants.append(
                Grant(
                    g["principal"],
                    g["permission"],
                    g["database"],
                    g["resource"],
                    g["via_filter"],
                    (
                        tuple(g["via_tag_exclude"])
                        if g["via_tag_exclude"] is not None
                        else None
                    ),
                )
            )
        cat.admins = set(state["admins"])
        for q, s in state.get("table_stats", {}).items():
            if q in cat.tables:
                cat.tables[q].stats = dict(s)
        for q, m in state.get("materialized_views", {}).items():
            cat.mvs[q] = MaterializedViewDef(
                database=m["database"],
                name=m["name"],
                source=m["source"],
                group_by=tuple(m["group_by"]),
                measures={k: tuple(v) for k, v in m["measures"].items()},
                location=m["location"],
                derived={
                    k: tuple(v) for k, v in m.get("derived", {}).items()
                },
                state_table=m.get("state_table"),
                where=m.get("where"),
                enrich=m.get("enrich"),
            )
        cat.revision = state.get("revision", 0)
        return cat

    def _catalog_file(self, root: str | None = None):
        from pathlib import Path

        base = root if root is not None else self.lake_root
        if base is None:
            raise ValueError(
                "catalog persistence needs a lake_root (or explicit root)"
            )
        return Path(base) / self.CATALOG_SUBDIR / "catalog.json"

    def save(self, root: str | None = None) -> str:
        """Persist the catalog under ``<root>/_catalog/`` (defaults to
        ``lake_root``). The JSON is written to a temp file then
        atomically renamed — a crash mid-save can never leave a torn
        catalog for the next process to load. The audit log is switched
        to (or kept on) ``<root>/_catalog/audit.jsonl`` in APPEND mode:
        in-memory events not yet on disk are flushed once, and every
        later :meth:`AuditLog.record` appends — a reload never truncates
        history (the reference's audit story is an append-only log,
        README.md:12)."""
        import json as _json
        import os as _os

        path = self._catalog_file(root)
        path.parent.mkdir(parents=True, exist_ok=True)
        # Optimistic concurrency: a save is valid only against the
        # revision this catalog loaded (or last saved). Two sessions
        # that both load revision N and both mutate cannot silently
        # clobber each other — the second save fails with the
        # reload-and-reapply instruction instead of discarding the
        # first session's grants. (Best-effort single-host CAS: the
        # check-then-rename window is microseconds; a cloud catalog
        # service does this server-side, Glue UpdateTable-style.)
        if path.exists():
            on_disk = _json.loads(path.read_text(encoding="utf-8")).get(
                "revision", 0
            )
            if on_disk != self.revision:
                raise ConcurrentCatalogModificationError(
                    f"catalog at {path} is at revision {on_disk}, this "
                    f"session loaded revision {self.revision}: reload "
                    "and reapply your changes"
                )
        self.revision += 1
        tmp = path.with_name(f".catalog.{uuid.uuid4().hex}.tmp")
        try:
            tmp.write_text(
                _json.dumps(self.to_dict(), indent=1), encoding="utf-8"
            )
            _os.replace(tmp, path)  # atomic on POSIX
        except BaseException:
            self.revision -= 1  # failed save consumes no revision
            raise
        audit_path = path.parent / "audit.jsonl"
        if self.audit.path is None:
            # flush events recorded before durability was enabled
            if self.audit.events:
                with audit_path.open("a", encoding="utf-8") as fh:
                    for ev in self.audit.events:
                        fh.write(_json.dumps(ev) + "\n")
            self.audit.path = audit_path
        return str(path)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "GovernedCatalog":
        """Load a previously-saved catalog from ``<root>/_catalog/``.
        Raises FileNotFoundError when none exists (bootstrap's
        load-or-create branches on that). The audit log resumes on the
        persisted JSONL: prior events are visible in memory and new
        events append after them."""
        import json as _json
        from pathlib import Path

        file = Path(root) / cls.CATALOG_SUBDIR / "catalog.json"
        state = _json.loads(file.read_text(encoding="utf-8"))
        cat = cls.from_dict(spark, state)
        # The directory we loaded from is the authoritative lake root —
        # a relocated lake must not keep enforcing (or deleting!) against
        # its old absolute path.
        cat.lake_root = root
        audit_path = file.parent / "audit.jsonl"
        if audit_path.exists():
            with audit_path.open(encoding="utf-8") as fh:
                cat.audit.events = [
                    _json.loads(line) for line in fh if line.strip()
                ]
        cat.audit.path = audit_path
        return cat

    @classmethod
    def exists(cls, root: str) -> bool:
        from pathlib import Path

        return (Path(root) / cls.CATALOG_SUBDIR / "catalog.json").exists()

    # ------------------------------------------------------------- DDL
    def create_database(self, name: str, description: str = "") -> None:
        """S7 — ``aws_glue_catalog_database`` (main.tf:291-300)."""
        self.databases[name] = description

    def register_table(self, table: TableDef) -> None:
        """S8 — declare an external table (main.tf:303-372)."""
        if table.database not in self.databases:
            self.create_database(table.database)
        self.tables[table.qualified] = table

    def create_view(self, database: str, name: str, sql: str) -> None:
        """V1 — ``CREATE OR REPLACE VIEW`` (outputs.tf:44-53)."""
        self.views[f"{database}.{name}"] = ViewDef(database, name, sql)

    def evolve_table_schema(
        self,
        qualified: str,
        new_fields: "T.StructType | list[T.StructField]",
        comments: dict[str, str] | None = None,
        tags: dict[str, dict[str, str]] | None = None,
    ) -> None:
        """Glue ``UpdateTable`` analog: append columns to a registered
        table's schema. Schema-on-read means no data rewrite — files
        written before the evolution return NULL for the new columns via
        the declared-schema scan (the reference holds schemas in the
        catalog for exactly this, main.tf:330-371).

        Fail-closed governance (round-5 VERDICT #3): evolved columns are
        recorded as PENDING and stay invisible to every conditioned
        grant path — data-cells-filter allowlists, row-only filters, and
        tag-exclude complements — until :meth:`approve_evolved_columns`
        records the explicit decision. Without the quarantine, a
        tag-based grant ("every column NOT tagged pii") would leak a new
        column the moment it lands, before anyone classified it — the
        week-one evolving-lake hole. Unconditioned ALL/SELECT grants and
        admins (main.tf:82-91) see new columns immediately: they are
        granted the whole table, not a column set. Columns evolved WITH
        a tag assignment (``tags=``) are classified at birth, but STILL
        stay pending — invisible to every conditioned path, tag-based
        ones included — until :meth:`approve_evolved_columns` (one
        quarantine rule, no exceptions; the at-birth tag just means
        approval releases the column into the right complement).

        Validation is all-or-nothing BEFORE any state mutates: a
        ``comments``/``tags`` key that is not one of the new columns,
        or a tag name that does not exist, raises ValueError with the
        schema untouched — a typo'd key must not silently leave the
        real evolved column unclassified (fail-open) or half-apply.
        """
        table = self.tables[qualified]
        if table.schema is None:
            raise ValueError(f"{qualified} has no declared schema to evolve")
        fields = (
            list(new_fields.fields)
            if isinstance(new_fields, T.StructType)
            else list(new_fields)
        )
        if not fields:
            raise ValueError("no columns to add")
        existing = {f_.name for f_ in table.schema.fields}
        dupes = [f_.name for f_ in fields if f_.name in existing]
        if dupes:
            raise ValueError(f"columns already exist on {qualified}: {dupes}")
        new_names = {f_.name for f_ in fields}
        stray = sorted(
            (set(comments or {}) | set(tags or {})) - new_names
        )
        if stray:
            raise ValueError(
                f"comments/tags reference non-evolved columns on "
                f"{qualified}: {stray} (new columns: {sorted(new_names)})"
            )
        for col, ts in (tags or {}).items():
            for k, v in ts.items():
                if k not in self.tags:
                    raise ValueError(f"unknown LF-tag {k!r} for column {col!r}")
                self.tags[k].validate(v)
        table.schema = T.StructType(list(table.schema.fields) + fields)
        for f_ in fields:
            table.pending_columns.add(f_.name)
        for col, comment in (comments or {}).items():
            table.column_comments[col] = comment
        for col, ts in (tags or {}).items():
            for k, v in ts.items():
                table.column_tags.setdefault(col, {})[k] = v
        added = ", ".join(
            f"{f_.name} {f_.dataType.simpleString()}" for f_ in fields
        )
        self.audit.record(
            principal="<catalog>",
            query=f"ALTER TABLE {qualified} ADD COLUMNS ({added})",
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )

    def approve_evolved_columns(self, qualified: str, columns: list[str]) -> None:
        """The explicit governance decision that releases evolved columns
        to conditioned grant evaluation. Approval alone does not grant
        anything: an approved column still needs a filter allowlist or
        untagged-complement path that actually includes it."""
        table = self.tables[qualified]
        known = (
            {f_.name for f_ in table.schema.fields}
            if table.schema is not None
            else set()
        )
        unknown = [c for c in columns if c not in known]
        if unknown:
            raise ValueError(f"no such columns on {qualified}: {unknown}")
        for c in columns:
            table.pending_columns.discard(c)
        self.audit.record(
            principal="<catalog>",
            query=f"APPROVE EVOLVED COLUMNS {qualified} ({', '.join(sorted(columns))})",
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )

    def rename_column(self, qualified: str, old: str, new: str) -> None:
        """ALTER TABLE ... RENAME COLUMN with POLICY MIGRATION — the
        piece Glue/LF lacks (a Glue rename is drop+add: tags, comments,
        and data-cells filters silently stop matching). A rename is
        identity-preserving, so every catalog object that names the
        column follows it atomically with the storage commit:

        - the declared schema field, its comment, its LF column tags,
          and its pending-approval status (a pending column stays
          pending under its new name — rename is not an approval);
        - data-cells filter column ALLOWLISTS (the security-critical
          one: an allowlist left pointing at the old name would stop
          matching and silently widen or narrow access) and row
          predicates (token-rewritten, word-boundary exact);
        - views are FAIL-CLOSED: a view body that mentions both the
          table and the column refuses the rename (SQL rewrite inside
          arbitrary view text is not identity-preserving — recreate
          the view first).

        Storage-side the rename is :func:`..sources.lake.rename_column`
        (manifest tables only — on a plain directory table a declared-
        schema read under the new name would NULL-fill every old file),
        which commits FIRST; if it refuses, the catalog is untouched."""
        import dataclasses
        import re as _re

        from .sources.lake import rename_column as _lake_rename

        table = self.tables[qualified]  # KeyError: fail closed
        if table.schema is None:
            raise ValueError(f"{qualified} has no declared schema")
        names = [f_.name for f_ in table.schema.fields]
        if old not in names:
            raise ValueError(f"no column {old!r} on {qualified} ({names})")
        if new in names:
            raise ValueError(f"column {new!r} already exists on {qualified}")
        if old in table.partition_keys:
            raise ValueError(
                f"column {old!r} is a partition key of {qualified} — "
                "evolve partitioning away from it first"
            )
        # case-insensitive scan (SQL identifiers are): "SELECT AMOUNT"
        # must block a rename of amount exactly like "SELECT amount"
        token = _re.compile(rf"\b{_re.escape(old)}\b", _re.I)
        _name_token = _re.compile(rf"\b{_re.escape(table.name)}\b", _re.I)
        for vq, v in sorted(self.views.items()):
            if token.search(v.sql) and _name_token.search(v.sql):
                raise ValueError(
                    f"view {vq} references {qualified}.{old} — recreate "
                    "the view under the new name first (fail-closed: "
                    "rewriting arbitrary view SQL is not "
                    "identity-preserving)"
                )
        # materialized views are FAIL-CLOSED the same way: a def whose
        # group_by/measures name the old column would brick at the next
        # refresh (table_changes refuses across a rename boundary
        # anyway) — refuse now, at the rename, with the cure named
        for mq, m in sorted(self.mvs.items()):
            if m.source == qualified and (
                old in m.group_by
                or any(col == old for _, col in m.measures.values())
                or (m.where is not None and token.search(m.where))
            ):
                raise ValueError(
                    f"materialized view {mq} aggregates {qualified}.{old} "
                    "— drop and re-create it under the new name first"
                )
            if m.enrich is not None and m.enrich["table"] == qualified and (
                old in m.enrich["on"].values()
                or old in (m.enrich["select"] or [])
                or old in m.group_by
            ):
                raise ValueError(
                    f"materialized view {mq} enriches through "
                    f"{qualified}.{old} — drop and re-create it under "
                    "the new name first"
                )
        # storage first: the manifest commit has its own refusals
        # (tombstones, constraints, partition columns) and the catalog
        # must stay untouched when it raises
        _lake_rename(table.location, old, new)
        table.schema = T.StructType(
            [
                T.StructField(new, f_.dataType, f_.nullable, f_.metadata)
                if f_.name == old
                else f_
                for f_ in table.schema.fields
            ]
        )
        if old in table.column_comments:
            table.column_comments[new] = table.column_comments.pop(old)
        if old in table.column_tags:
            table.column_tags[new] = table.column_tags.pop(old)
        if old in table.pending_columns:
            table.pending_columns.discard(old)
            table.pending_columns.add(new)
        for fname, flt in sorted(self.filters.items()):
            if (flt.database, flt.table) != (table.database, table.name):
                continue
            cols = flt.columns
            if cols and old in cols:
                cols = tuple(new if c == old else c for c in cols)
            rf = flt.row_filter
            if rf:
                # literal-safe: the old column NAME appearing inside a
                # string VALUE ("note = 'n_chars'") must not be
                # rewritten — that would silently change which rows the
                # filter admits (same rule as _rewrite_sql, round-1
                # ADVICE)
                rf, n_sub = self._sub_outside_literals(token, new, rf)
                if n_sub == 0:
                    rf = flt.row_filter
            if (cols, rf) != (flt.columns, flt.row_filter):
                self.filters[fname] = dataclasses.replace(
                    flt, columns=cols, row_filter=rf
                )
        self.audit.record(
            principal="<catalog>",
            query=f"ALTER TABLE {qualified} RENAME COLUMN {old} TO {new}",
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )

    def drop_column(self, qualified: str, col: str) -> None:
        """ALTER TABLE ... DROP COLUMN (round-13) — metadata-only on a
        schema-on-read lake: the column leaves the DECLARED schema (and
        its comment, LF tags, and pending status with it); data files
        are untouched and the declared-schema scan simply stops
        projecting it. Dropping a PENDING column cancels the evolution.

        Fail-closed (the rename rule, hardened — a drop is NOT
        identity-preserving, so nothing that references the column may
        be auto-migrated):

        - partition keys refuse (evolve partitioning first);
        - views whose body mentions both the table and the column
          refuse (recreate the view first);
        - materialized views grouping by / measuring / filtering on
          the column refuse (drop the MV first);
        - data-cells filters whose allowlist or row predicate
          references the column refuse — silently shrinking an
          allowlist or breaking a row filter is a security-semantics
          change only the governance owner may make;
        - manifest CHECK constraints referencing the column refuse
          (the next append would validate against a ghost).
        """
        import re as _re

        table = self.tables[qualified]  # KeyError: fail closed
        if table.schema is None:
            raise ValueError(f"{qualified} has no declared schema")
        names = [f_.name for f_ in table.schema.fields]
        if col not in names:
            raise ValueError(f"no column {col!r} on {qualified} ({names})")
        if len(names) == 1:
            raise ValueError(
                f"{col!r} is the only column on {qualified} — drop the "
                "table instead"
            )
        if col in table.partition_keys:
            raise ValueError(
                f"column {col!r} is a partition key of {qualified} — "
                "evolve partitioning away from it first"
            )
        # case-insensitive throughout: SQL identifiers are — a view
        # written "SELECT LANG FROM db.DOCS" is a working view and must
        # still block the drop
        token = _re.compile(rf"\b{_re.escape(col)}\b", _re.I)
        name_token = _re.compile(rf"\b{_re.escape(table.name)}\b", _re.I)
        for vq, v in sorted(self.views.items()):
            if token.search(v.sql) and name_token.search(v.sql):
                raise ValueError(
                    f"view {vq} references {qualified}.{col} — drop or "
                    "recreate the view first"
                )
        for mq, m in sorted(self.mvs.items()):
            if m.source == qualified and (
                col.lower() in {g.lower() for g in m.group_by}
                or any(
                    c is not None and c.lower() == col.lower()
                    for _, c in m.measures.values()
                )
                or (m.where is not None and token.search(m.where))
            ):
                raise ValueError(
                    f"materialized view {mq} references {qualified}."
                    f"{col} — drop the MV first"
                )
            if m.enrich is not None and m.enrich["table"] == qualified and (
                col.lower()
                in {c.lower() for c in m.enrich["on"].values()}
                or col.lower()
                in {c.lower() for c in (m.enrich["select"] or [])}
            ):
                raise ValueError(
                    f"materialized view {mq} enriches through "
                    f"{qualified}.{col} — drop the MV first"
                )
        for fname, flt in sorted(self.filters.items()):
            if (flt.database, flt.table) != (table.database, table.name):
                continue
            if (
                flt.columns
                and col.lower() in {c.lower() for c in flt.columns}
            ) or (flt.row_filter and token.search(flt.row_filter)):
                raise ValueError(
                    f"data-cells filter {fname!r} references "
                    f"{qualified}.{col} — edit or drop the filter "
                    "first (dropping a secured column must be an "
                    "explicit governance decision)"
                )
        from .sources.lake import read_manifest

        m_ = read_manifest(table.location) if table.format == "parquet" else None
        if m_ is not None:
            hit = sorted(
                n
                for n, expr in (m_.get("constraints") or {}).items()
                if token.search(expr)
            )
            if hit:
                raise ValueError(
                    f"CHECK constraint(s) {hit} on {qualified} reference "
                    f"{col!r} — drop the constraint(s) first"
                )
        table.schema = T.StructType(
            [f_ for f_ in table.schema.fields if f_.name != col]
        )
        table.column_comments.pop(col, None)
        table.column_tags.pop(col, None)
        table.pending_columns.discard(col)
        self.audit.record(
            principal="<catalog>",
            query=f"ALTER TABLE {qualified} DROP COLUMN {col}",
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )

    def widen_column(self, qualified: str, col: str, ddl_type: str) -> None:
        """ALTER TABLE ... ALTER COLUMN <c> TYPE <wider> (round-14; the
        single most common schema change on a long-lived fact table —
        Iceberg/Delta both support exactly this safe direction). A
        metadata-only commit: the DECLARED type widens and the
        declared-schema scan reads old narrow footers through Spark's
        parquet type promotion (int32 files come back as bigint) — no
        data rewrite, no new data surface, so no pending-column
        quarantine (the column's grant envelope is unchanged).

        Safe directions only (everything else refuses — fail closed,
        Iceberg's matrix):

        - integral up-chain: tinyint -> smallint -> int -> bigint;
        - float -> double;
        - decimal(p,s) -> decimal(p',s') with s' >= s and
          p' - s' >= p - s (integer headroom never shrinks).

        Narrowing, cross-family changes (int -> string, string ->
        int), and identical types refuse with the reason. Partition
        keys refuse: their values decode from hive dir names with the
        declared type, and the engine's partition-count / pruning
        paths must never see a type the dir encoding didn't write."""
        table = self.tables[qualified]  # KeyError: fail closed
        if table.schema is None:
            raise ValueError(f"{qualified} has no declared schema")
        by_name = {f_.name: f_ for f_ in table.schema.fields}
        if col not in by_name:
            raise ValueError(
                f"no column {col!r} on {qualified} ({list(by_name)})"
            )
        if col in table.partition_keys:
            raise ValueError(
                f"column {col!r} is a partition key of {qualified} — "
                "partition value types are fixed by the directory "
                "encoding; evolve partitioning instead"
            )
        try:
            parsed = T.StructType.fromDDL(f"x {ddl_type}")
        except Exception as exc:
            raise ValueError(
                f"cannot parse type {ddl_type!r}: {exc}"
            ) from exc
        # fail closed on trailing DDL text: "bigint, junk string" parses
        # as TWO fields and "bigint COMMENT x" attaches metadata — both
        # must refuse, not silently widen to fields[0] (round-14 review)
        if len(parsed.fields) != 1 or dict(parsed.fields[0].metadata or {}):
            raise ValueError(
                f"ALTER COLUMN TYPE takes exactly one plain type, got "
                f"{ddl_type!r}"
            )
        new_t = parsed.fields[0].dataType
        old_t = by_name[col].dataType
        _chain = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

        def _ok() -> bool:
            if isinstance(old_t, _chain) and isinstance(new_t, _chain):
                return _chain.index(type(new_t)) > _chain.index(type(old_t))
            if isinstance(old_t, T.FloatType):
                return isinstance(new_t, T.DoubleType)
            if isinstance(old_t, T.DecimalType) and isinstance(
                new_t, T.DecimalType
            ):
                return (
                    new_t.scale >= old_t.scale
                    and new_t.precision - new_t.scale
                    >= old_t.precision - old_t.scale
                    and (new_t.precision, new_t.scale)
                    != (old_t.precision, old_t.scale)
                )
            return False

        if not _ok():
            raise ValueError(
                f"ALTER COLUMN TYPE on {qualified}.{col}: "
                f"{old_t.simpleString()} -> {new_t.simpleString()} is not "
                "a safe widening (allowed: tinyint->smallint->int->"
                "bigint, float->double, decimal scale/precision-up); "
                "narrowing or cross-family changes need a rewrite the "
                "engine will not do implicitly"
            )
        # storage first (the rename_column rule): manifest tables
        # record the writer schema and append_rows fail-fasts on
        # retyped columns, so the snapshot's recorded type must widen
        # in the same change — and the catalog must stay untouched if
        # that commit raises. Non-manifest (declared-location) tables
        # are schema-on-read: the catalog IS the schema.
        from .sources.lake import read_manifest as _read_manifest
        from .sources.lake import widen_column_type as _lake_widen

        if (
            table.format == "parquet"
            and _read_manifest(table.location) is not None
        ):
            _lake_widen(table.location, col, new_t.jsonValue())
        table.schema = T.StructType(
            [
                T.StructField(f_.name, new_t, f_.nullable, f_.metadata)
                if f_.name == col
                else f_
                for f_ in table.schema.fields
            ]
        )
        self.audit.record(
            principal="<catalog>",
            query=(
                f"ALTER TABLE {qualified} ALTER COLUMN {col} TYPE "
                f"{new_t.simpleString()}"
            ),
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )

    def drop_view(self, database: str, name: str) -> None:
        """V2 — ``DROP VIEW`` (README.md:320)."""
        self.views.pop(f"{database}.{name}", None)

    def drop_table(self, qualified: str, delete_data: bool = False) -> None:
        """Drop an external table; optionally delete its data directory.

        The destroy-provisioner analog (main.tf:100-111 force-destroys the
        data bucket, main.tf:518-530 the results bucket). Grants referencing
        the dropped table become inert — any later access fails closed with
        "unknown table" because enforcement resolves tables by name.

        ``delete_data`` is guarded and fails CLOSED (round-3/round-4
        ADVICE: a table registered with a mistaken/hostile location must
        not silently delete unrelated data, and path depth is a weak
        proxy for safety): destructive drops require ``lake_root`` to be
        configured on the catalog, and the location must resolve under
        it. Deletion errors surface (no ``ignore_errors``).
        """
        from pathlib import Path

        table = self.tables[qualified]  # KeyError for unknown tables
        sourcing = sorted(
            q
            for q, m in self.mvs.items()
            if m.source == qualified
            or (m.enrich is not None and m.enrich["table"] == qualified)
        )
        if sourcing:
            raise ValueError(
                f"{qualified} is the source or enrich dimension of "
                f"materialized view(s) {sourcing} — drop them first (a "
                "dangling MV would refresh against whatever table reuses "
                "the name)"
            )
        if delete_data:
            import shutil

            loc = Path(table.location).resolve()
            if self.lake_root is None:
                raise ValueError(
                    f"refusing to delete {loc}: configure lake_root on the "
                    "catalog to enable destructive drops (fail-closed guard)"
                )
            root = Path(self.lake_root).resolve()
            if not loc.is_relative_to(root):
                raise ValueError(
                    f"refusing to delete {loc}: outside lake root {root}"
                )
            if loc.exists():
                shutil.rmtree(loc)
        self.tables.pop(qualified)
        self.mvs.pop(qualified, None)  # an MV's own table drops its def

    def drop_database(self, name: str, cascade: bool = False) -> None:
        """Drop a database. Without ``cascade`` it must be empty (Glue
        behavior); with it, contained tables and views are dropped too
        (metadata only — data stays unless drop_table(delete_data=True))."""
        members = [q for q, t in self.tables.items() if t.database == name]
        views = [q for q, v in self.views.items() if v.database == name]
        if (members or views) and not cascade:
            raise ValueError(
                f"database {name!r} is not empty: {sorted(members + views)}"
            )
        for q in [q for q, m in self.mvs.items() if m.database == name]:
            self.mvs.pop(q)
        for q in members:
            if any(m.source == q for m in self.mvs.values()):
                raise ValueError(
                    f"{q} is the source of a materialized view outside "
                    f"{name!r} — drop it first"
                )
            self.tables.pop(q)
        for q in views:
            self.views.pop(q)
        self.databases.pop(name)

    # ------------------------------------------------------ introspection
    def list_databases(self) -> list[dict]:
        """Glue ``get-databases`` analog: one dict per database."""
        return [
            {"Name": name, "Description": desc}
            for name, desc in sorted(self.databases.items())
        ]

    def list_tables(self, database: str) -> list[str]:
        """Sorted table names in a database (the Glue ``list-tables``
        name listing; see ``describe_table`` for per-table detail)."""
        return sorted(
            t.name for t in self.tables.values() if t.database == database
        )

    def list_views(self, database: str) -> list[str]:
        return sorted(
            v.name for v in self.views.values() if v.database == database
        )

    def describe_table(self, qualified: str) -> dict:
        """Glue ``get-table`` analog: schema + comments + LF column tags
        in the AWS response shape (main.tf:303-372 declares the same
        fields), so governance metadata is introspectable without reading
        any data."""
        t = self.tables[qualified]
        columns = []
        for f_ in t.schema.fields if t.schema is not None else []:
            col: dict = {"Name": f_.name, "Type": f_.dataType.simpleString()}
            if f_.name in t.column_comments:
                col["Comment"] = t.column_comments[f_.name]
            if f_.name in t.column_tags:
                col["Parameters"] = dict(t.column_tags[f_.name])
            columns.append(col)
        return {
            "Name": t.name,
            "DatabaseName": t.database,
            "TableType": "EXTERNAL_TABLE",
            "Parameters": {"classification": t.format},
            "StorageDescriptor": {"Location": t.location, "Columns": columns},
            "PartitionKeys": [{"Name": k} for k in t.partition_keys],
        }

    def partitions(self, qualified: str) -> list[str]:
        """S9 — ``SHOW PARTITIONS`` analog: hive-style ``key=value``
        partition directories under the table location (the reference
        scaffolds partition APIs in IAM, main.tf:177-178, but ships an
        unpartitioned table — this serves tables written with
        sources.write_partitioned)."""
        from pathlib import Path

        table = self.tables[qualified]
        loc = Path(table.location)
        # single-file or missing locations are unpartitioned by definition
        if not loc.is_dir():
            return []
        if len(table.partition_keys) > 1:
            # nested hive layouts (round-14, with MSCK REPAIR): walk the
            # declared key depth and list "k1=v1/k2=v2" paths — a LIVE
            # listing, never the MSCK index (SHOW PARTITIONS must see a
            # directory the moment it lands)
            out: set[str] = set()

            def walk(d: Path, depth: int, prefix: str):
                for p in d.iterdir():
                    if p.is_dir() and "=" in p.name:
                        rel = f"{prefix}/{p.name}" if prefix else p.name
                        if depth + 1 == len(table.partition_keys):
                            out.add(rel)
                        else:
                            walk(p, depth + 1, rel)

            walk(loc, 0, "")
            return sorted(out)
        return sorted(
            p.name for p in loc.iterdir() if p.is_dir() and "=" in p.name
        )

    def repair_table(self, qualified: str) -> dict:
        """``MSCK REPAIR TABLE`` (round-14) — index a DECLARED-location
        table's hive layout: discover every ``k=v`` partition directory
        (validated against the declared partition keys) and record each
        file's (size, exact footer row count) on the table entry, so
        SHOW PARTITIONS serves nested layouts and the metadata-only
        COUNT can serve schema-on-read tables (the engine re-verifies
        the live listing before trusting the index — out-of-band files
        landed after the repair fall open to the scan, never a stale
        count). Incremental: unchanged files (same path + size) skip
        their footer reads, so a re-run after a bulk landing costs
        O(new files).

        Manifest-committed tables refuse — their commits already record
        exact counts and an MSCK index would be a second source of
        truth (use ADD FILES to import landed data there instead)."""
        from .sources.lake import discover_partition_stats, read_manifest

        table = self.tables[qualified]  # KeyError: fail closed
        if table.format != "parquet":
            raise ValueError(
                f"MSCK REPAIR supports parquet tables; {qualified} is "
                f"{table.format}"
            )
        if read_manifest(table.location) is not None:
            raise ValueError(
                f"{qualified} is manifest-committed — its snapshots "
                "already record exact per-file counts; import landed "
                "data with ALTER TABLE ADD FILES instead"
            )
        prior = (table.discovered or {}).get("files", {})
        found = discover_partition_stats(
            table.location, table.partition_keys, known=prior
        )
        table.discovered = found
        new_files = sorted(set(found["files"]) - set(prior))
        self.audit.record(
            principal="<catalog>",
            query=f"MSCK REPAIR TABLE {qualified}",
            tables=[qualified],
            filters_applied=[],
            status="ok",
        )
        return {
            "partitions": len(found["partitions"]),
            "files_indexed": len(found["files"]),
            "new_files": len(new_files),
            "rows_indexed": int(found["rows"]),
        }

    def create_tag_masked_view(
        self, qualified: str, view_name: str, tag_key: str, tag_value: str
    ) -> str:
        """Auto-generate a masked view from column tags.

        The reference hand-writes its masked-view DDL (outputs.tf:44-53);
        this derives the same shape from governance metadata: every column
        carrying ``tag_key=tag_value`` is wrapped in the appropriate mask
        (functions.masking.mask_for_column), others pass through. Returns
        the generated SQL.
        """
        from .functions.masking import (
            EMAIL_MASK_PATTERN,
            EMAIL_MASK_REPLACEMENT,
            SSN_MASK_PATTERN,
            SSN_MASK_REPLACEMENT,
        )

        table = self.tables[qualified]
        if table.schema is None:
            raise ValueError(f"{qualified} has no declared schema to mask")
        parts = []
        for f_ in table.schema.fields:
            tags = table.column_tags.get(f_.name, {})
            if tags.get(tag_key) == tag_value:
                if "email" in f_.name.lower() or "mail" in f_.name.lower():
                    pat, repl = EMAIL_MASK_PATTERN, EMAIL_MASK_REPLACEMENT
                else:
                    pat, repl = SSN_MASK_PATTERN, SSN_MASK_REPLACEMENT
                pat_sql = pat.replace("\\", "\\\\")
                parts.append(
                    f"REGEXP_REPLACE({f_.name}, '{pat_sql}', '{repl}') AS {f_.name}"
                )
            else:
                parts.append(f_.name)
        sql = f"SELECT\n  " + ",\n  ".join(parts) + f"\nFROM {qualified}"
        self.create_view(table.database, view_name, sql)
        return sql

    # ------------------------------------------------------- governance
    def create_tag(self, key: str, values: list[str]) -> LFTag:
        """G1 — LF-tag definition (main.tf:382-390)."""
        tag = LFTag(key, tuple(values))
        self.tags[key] = tag
        return tag

    def tag_columns(self, qualified: str, columns: list[str], key: str, value: str) -> None:
        """G2 — attach tag to columns (main.tf:393-429)."""
        self.tags[key].validate(value)
        table = self.tables[qualified]
        for col in columns:
            table.column_tags.setdefault(col, {})[key] = value

    def create_data_cells_filter(self, f: DataCellsFilter) -> None:
        """G3 — named row+column filter (main.tf:432-457)."""
        self.filters[f.name] = f

    def grant(
        self,
        principal: Principal | str,
        permission: str,
        database: str,
        resource: str,
        via_filter: str | None = None,
        via_tag_exclude: tuple[str, str] | None = None,
    ) -> None:
        """G4/G5/G7 — record a grant (main.tf:460-487, 538-549).

        ``via_tag_exclude=(key, value)`` grants the columns NOT carrying
        that tag (tag-based access control — see governance.Grant).
        """
        name = principal.name if isinstance(principal, Principal) else principal
        self.grants.append(
            Grant(name, permission, database, resource, via_filter, via_tag_exclude)
        )

    def revoke(
        self,
        principal: Principal | str,
        permission: str | None = None,
        database: str | None = None,
        resource: str | None = None,
    ) -> int:
        """RevokePermissions (the Lake Formation API the reference's
        ``terraform destroy`` calls) — remove every grant matching the
        given fields; ``None`` fields match anything, so
        ``revoke("analyst")`` strips a departing principal entirely
        while ``revoke("analyst", "SELECT", "db", "t")`` removes one
        permission. Conditions (via_filter / via_tag_exclude) ride the
        grant they condition — revoking the grant revokes the
        conditioned access with it. Returns the number of grants
        removed.

        Enforcement is immediate: the next access check walks the
        live grant list. Result-reuse safety is structural: grants are
        governance state, so a revoke changes
        :meth:`governance_fingerprint` and every cached result keyed
        on the old digest stops serving — a revoked principal can
        never ride a cache into data they just lost."""
        name = (
            principal.name if isinstance(principal, Principal) else principal
        )
        before = len(self.grants)
        self.grants = [
            g
            for g in self.grants
            if not (
                g.principal == name
                and (permission is None or g.permission == permission)
                and (database is None or g.database == database)
                and (resource is None or g.resource == resource)
            )
        ]
        return before - len(self.grants)

    def set_admins(self, principals: list[str]) -> None:
        """G9 — data-lake admins bypass grant checks (main.tf:82-91)."""
        self.admins.update(principals)

    def governance_fingerprint(self) -> str:
        """Digest of every governance-relevant structure (tables, views,
        tags, filters, grants, admins, flag). Any metadata mutation —
        a new grant, an edited row filter, a re-tagged column, a schema
        evolution — changes the digest. Consumers (Engine L7 result
        reuse) treat it as the Glue/LF metadata-version analog: cached
        work is valid only while the digest matches, so no policy change
        can be ridden by a stale cache.

        Hashes the CANONICAL serialized form (:meth:`to_dict` with sorted
        keys), not Python reprs — so a catalog and its save/load
        round-trip fingerprint identically (dict insertion order is not
        governance state), and a persisted fingerprint stays comparable
        across processes."""
        import hashlib
        import json as _json

        state = dict(self.to_dict())
        # location of the lake is storage identity, not policy identity —
        # Engine L7 tracks storage with a separate fingerprint; the
        # revision counter is save bookkeeping, not policy; ANALYZE stats
        # are planner hints that never change what a principal may see
        state.pop("lake_root", None)
        state.pop("revision", None)
        state.pop("table_stats", None)
        return hashlib.md5(
            _json.dumps(state, sort_keys=True).encode()
        ).hexdigest()

    def grants_for(self, principal: str, database: str, resource: str) -> list[Grant]:
        return [
            g
            for g in self.grants
            if g.principal == principal
            and g.database == database
            and g.resource == resource
        ]

    # ------------------------------------------------------ enforcement
    def _raw(
        self,
        table: TableDef,
        version: int | None = None,
        prune: dict | None = None,
    ) -> DataFrame:
        """S1 — ungoverned scan with the declared (never inferred) schema.

        ``version`` selects a retained manifest snapshot (time travel);
        manifest-committed parquet tables also route their CURRENT read
        through the manifest so a governed scan sees one committed
        snapshot (sources.lake.read_table's isolation contract).
        ``prune`` is manifest-stats file skipping (read_table's
        contract: I/O elimination only, fail-open, the caller still
        filters; ignored on non-manifest tables)."""
        reader = self.spark.read
        schema = table.spark_schema()
        if schema is not None:
            reader = reader.schema(schema)
        if table.format == "parquet":
            from .sources.lake import read_manifest, read_table

            if (
                version is not None
                or prune
                or read_manifest(table.location) is not None
            ):
                return read_table(
                    self.spark,
                    table.location,
                    schema,
                    version=version,
                    prune=prune,
                )
            return reader.parquet(table.location)
        if version is not None:
            raise ValueError(
                f"time travel requires a manifest-committed parquet table; "
                f"{table.qualified} is {table.format}"
            )
        if table.format == "csv":
            return reader.option("header", "true").csv(table.location)
        if table.format == "json":
            return reader.json(table.location)
        if table.format == "orc":
            return reader.orc(table.location)
        raise ValueError(f"unsupported table format {table.format!r}")

    def table(
        self,
        qualified: str,
        principal: Principal | str | None = None,
        *,
        row_only: bool = False,
        version: int | None = None,
        prune: dict | None = None,
        _filters_out: list[str] | None = None,
    ) -> DataFrame:
        """Read a table as a principal, with governance applied at the scan.

        ``row_only=True`` applies only the row predicate of the principal's
        data-cells filter, not the column allowlist — used for view
        expansion, where the view's own projection (e.g. the masking
        expressions of ``sales_masked``) governs column visibility while
        row-level security still applies (golden behavior: Analyst on the
        masked view sees APAC rows *with* masked PII columns,
        README.md:251, validate.sh:223-225).

        ``version`` is governed time travel (round-7 VERDICT #8): the
        scan reads manifest snapshot N, and every governance transform
        (row predicate, column allowlist, cell masking, pending-column
        strike) applies to the historical rows EXACTLY as to current
        ones — history is not a governance bypass. Note the erasure
        tension: GDPR delete_rows truncates manifest history for this
        reason (see sources.lake.vacuum_manifests), so erased rows are
        unreachable at any version.

        ``prune={"col": (lo, hi)}`` is manifest-stats file skipping
        applied BELOW every governance transform — pure I/O
        elimination (read_table's fail-open contract), so the governed
        result is identical with or without it; the caller still
        applies the real predicate.
        """
        if qualified not in self.tables:
            raise KeyError(f"unknown table {qualified!r}")
        table = self.tables[qualified]
        name = (
            principal.name
            if isinstance(principal, Principal)
            else principal
        )
        if not self.governance_enabled or name is None or name in self.admins:
            return self._raw(table, version, prune)

        resolved = self._resolve_cells(name, table, qualified)
        if resolved is None:  # unconditioned ALL/SELECT wins over filtered
            return self._raw(table, version, prune)
        cells, applied = resolved
        if _filters_out is not None:
            _filters_out.extend(applied)
        df = self._raw(table, version, prune)
        return self._apply_cells(table, cells, df, row_only)

    def _resolve_cells(self, name: str, table: "TableDef", qualified: str):
        """Conditioned-grant analysis shared by the batch
        (:meth:`table`) and streaming (:meth:`stream_table`) read
        paths: None when an unconditioned ALL/SELECT grant gives the
        raw table; else ``(cells, applied_filter_names)``. Raises on
        no grant / no SELECT path (implicit deny)."""
        grants = self.grants_for(name, table.database, table.name)
        if not grants:
            raise PermissionDeniedError(
                f"principal {name!r} is not authorized to access {qualified}"
            )
        # An unconditioned ALL/SELECT grant wins over filtered ones.
        if any(
            g.via_filter is None
            and g.via_tag_exclude is None
            and g.permission in (ALL, SELECT)
            for g in grants
        ):
            return None
        # Conditioned grants are ADDITIVE (LF semantics: several cell
        # filters may attach to one (principal, table); effective access is
        # the union of their CELLS — main.tf:432-457 defines one filter but
        # nothing stops a second filtered grant). A cell (row, column) is
        # visible iff SOME single filter grants both that row and that
        # column; cells outside every filter's rectangle are NULL-masked
        # (round-3 ADVICE: the enclosing-rectangle approximation let a
        # column granted only by filter A leak on rows granted only by
        # filter B — a fail-open governance hole).
        #
        # Each entry: (row_pred | None for unrestricted rows,
        #              column tuple | None for all columns).
        cells: list[tuple[str | None, tuple[str, ...] | None]] = []
        applied: list[str] = []
        for g in grants:
            if g.via_filter is not None:
                f = self.filters[g.via_filter]
                applied.append(f.name)
                cells.append(
                    (f.row_filter or None, tuple(f.columns) if f.columns else None)
                )
            elif g.via_tag_exclude is not None:
                # tag-based access control: allowlist = untagged columns,
                # resolved from the schema at read time
                key, value = g.via_tag_exclude
                if table.schema is None:
                    raise PermissionDeniedError(
                        f"tag-based grant on {qualified} requires a declared schema"
                    )
                applied.append(f"tag-exclude:{key}={value}")
                cells.append(
                    (
                        None,
                        tuple(
                            f_.name
                            for f_ in table.schema.fields
                            if table.column_tags.get(f_.name, {}).get(key) != value
                        ),
                    )
                )
        if not applied:
            raise PermissionDeniedError(
                f"principal {name!r} has no SELECT path to {qualified}"
            )
        # Fail-closed schema evolution: pending (evolved, not-yet-approved)
        # columns are struck from every conditioned allowlist — including
        # the all-columns (None) case and the tag-exclude complement, which
        # would otherwise leak a new column before it was classified.
        pending = table.pending_columns
        if pending and table.schema is not None:
            full = tuple(
                f_.name for f_ in table.schema.fields if f_.name not in pending
            )
            cells = [
                (
                    pred,
                    full
                    if cols is None
                    else tuple(c for c in cols if c not in pending),
                )
                for pred, cols in cells
            ]
        return cells, applied

    def _apply_cells(
        self,
        table: "TableDef",
        cells: list,
        df: DataFrame,
        row_only: bool = False,
    ) -> DataFrame:
        """Apply resolved cell grants to a scan — batch OR streaming
        DataFrame (every transform here is a stateless filter/project,
        legal on streams)."""
        # Rows: visible iff any filter's row predicate matches. One OR
        # chain of pushable comparisons — Catalyst still pushes the whole
        # disjunction into the parquet scan.
        row_preds = [p for p, _ in cells]
        if all(p is not None for p in row_preds):
            df = df.filter(F.expr(" OR ".join(f"({p})" for p in row_preds)))
        if row_only:
            # view expansion: the view's own projection (e.g. masking
            # expressions) governs column visibility
            return df
        if len(cells) == 1:
            pred, cols = cells[0]
            # the reference's single-filter shape: plain filter + select in
            # the filter's declared column order (no per-cell masking
            # needed — every visible row is granted by that one filter)
            return df.select(*cols) if cols is not None else df
        # Columns: union of the allowlists, in declared schema order (a
        # None allowlist grants every column).
        order = (
            [f_.name for f_ in table.schema.fields]
            if table.schema is not None
            else df.columns
        )
        if all(cs is not None for _, cs in cells):
            allowed = {c for _, cs in cells for c in cs}
            visible = [c for c in order if c in allowed]
        else:
            visible = list(order)
        # Per-cell enforcement: column c is real on a row iff some filter
        # granting c also grants the row; otherwise NULL. When c's
        # grantors impose the same row condition as the visible-row
        # predicate itself (e.g. c is in every filter), the mask is an
        # always-true CASE and is skipped.
        all_pred_set = {p for p, _ in cells}
        projection = []
        for c in visible:
            grantor_preds = {p for p, cs in cells if cs is None or c in cs}
            if None in grantor_preds or grantor_preds == all_pred_set:
                projection.append(F.col(c))
            else:
                cond = F.expr(" OR ".join(f"({p})" for p in sorted(grantor_preds)))
                projection.append(
                    F.when(cond, F.col(c))
                    .otherwise(F.lit(None).cast(df.schema[c].dataType))
                    .alias(c)
                )
        return df.select(*projection)

    def stream_table(
        self,
        qualified: str,
        principal: Principal | str | None = None,
        *,
        row_only: bool = False,
        options: dict | None = None,
    ) -> DataFrame:
        """Governed STREAMING read of a manifest-committed lake table —
        subscribe to the table (the ``lake_manifest`` source: offsets
        are snapshot versions) with EXACTLY the enforcement a batch
        read gets: implicit deny, row predicates, column allowlists,
        per-cell NULL masking, tag-based exclusion, and the
        pending-column strike all apply to every micro-batch, because
        they are stateless filter/projects applied above the streaming
        scan. Streaming is not a governance bypass — the streaming
        twin of the time-travel rule (history isn't either).

        ``options`` passes source options through (e.g.
        ``{"ignoreChanges": "true"}``). Note the composition caveat:
        a GDPR ``delete_rows`` is a rewrite, so by default a governed
        stream STOPS at an erasure instead of replaying erased rows —
        the fail-closed direction."""
        if qualified not in self.tables:
            raise KeyError(f"unknown table {qualified!r}")
        table = self.tables[qualified]
        if table.format != "parquet":
            raise ValueError(
                f"stream_table requires a manifest-committed parquet "
                f"table; {qualified} is {table.format}"
            )
        from .sources.manifest_stream import register_lake_manifest_source

        register_lake_manifest_source(self.spark)
        reader = self.spark.readStream.format("lake_manifest")
        schema = table.spark_schema()
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        df = reader.load(table.location)
        name = (
            principal.name
            if isinstance(principal, Principal)
            else principal
        )
        if not self.governance_enabled or name is None or name in self.admins:
            return df
        resolved = self._resolve_cells(name, table, qualified)
        if resolved is None:
            return df
        cells, _applied = resolved
        return self._apply_cells(table, cells, df, row_only)

    def view(
        self,
        qualified: str,
        principal: Principal | str | None = None,
        _filters_out: list[str] | None = None,
    ) -> DataFrame:
        """Read a view as a principal (V3 — view + row security compose)."""
        vdef = self.views[qualified]
        name = principal.name if isinstance(principal, Principal) else principal
        if self.governance_enabled and name is not None and name not in self.admins:
            if not self.grants_for(name, vdef.database, vdef.name):
                raise PermissionDeniedError(
                    f"principal {name!r} is not authorized to access {qualified}"
                )
        created: list[str] = []
        sql, _ = self._rewrite_sql(
            vdef.sql,
            principal,
            row_only=True,
            _filters_out=_filters_out,
            _views_out=created,
        )
        try:
            # spark.sql analyzes eagerly, so the returned DataFrame keeps the
            # resolved plan after the temp views are dropped in finally.
            return self.spark.sql(sql)
        finally:
            for v in created:
                self.spark.catalog.dropTempView(v)

    def _broadcast_small(self, table: TableDef) -> bool:
        """Should a governed query wrap this table's scan in a broadcast
        hint? True when its row count is known and at or under
        ``broadcast_row_threshold``. The count comes from the manifest's
        footer row counts (zero-I/O-fresh — the same arithmetic as
        count_rows; None under MoR tombstones) and falls back to ANALYZE
        stats (Engine.analyze_table) for non-manifest tables, with
        Spark's own documented staleness caveat: CBO stats describe the
        table as of the last ANALYZE. A wrong answer here only changes
        the join strategy, never the rows."""
        thr = self.broadcast_row_threshold
        if not thr:
            return False
        n = None
        if table.format == "parquet":
            from .sources.lake import count_rows

            info = count_rows(table.location)
            if info is not None:
                n = info["rows"]
        if n is None and table.stats is not None:
            n = table.stats.get("row_count")
        return n is not None and n <= thr

    def histogram_skewed_values(
        self, qualified: str, column: str, min_bins: int = 2
    ) -> "list[tuple[float, float]]":
        """Join-key skew evidence from ANALYZE's equi-height histogram
        (round-16; r15 What's missing #2 consumer): each of the
        HISTOGRAM_BINS bins holds ~1/bins of the non-null rows, so a
        value appearing as ``k >= min_bins`` consecutive EQUAL bounds
        holds at least ``(k-1)/bins`` of the rows — the heavy key a
        plain hash join hot-spots on. Returns ``[(value,
        est_fraction), ...]`` heaviest first; empty when no histogram
        was computed (run ANALYZE ... FOR COLUMNS) or no value spans
        the threshold. Metadata-only — the decision consumer
        (operators.skew.stats_salted_join) salts exactly these keys,
        the CBO pattern of flipping join STRATEGY on stats evidence
        without touching results."""
        table = self.tables[qualified]  # KeyError: fail closed
        hist = (
            ((table.stats or {}).get("columns") or {}).get(column) or {}
        ).get("histogram")
        if not hist:
            return []
        n_bins = len(hist) - 1
        out: dict[float, int] = {}
        run_start = 0
        for i in range(1, len(hist)):
            if hist[i] != hist[run_start]:
                run = i - run_start  # bounds in the run
                if run >= min_bins:
                    out[hist[run_start]] = run - 1
                run_start = i
        run = len(hist) - run_start
        if run >= min_bins:
            out[hist[run_start]] = run - 1
        return sorted(
            ((v, k / n_bins) for v, k in out.items()),
            key=lambda t: -t[1],
        )

    # ----------------------------------------------------- SQL rewriting
    _IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
    # Spans a table reference must NOT be rewritten inside: single-quoted
    # string literals (with '' and backslash escapes), double-quoted string
    # literals, line comments, block comments.
    _SKIP_SPANS = re.compile(
        r"'(?:[^'\\]|\\.|'')*'" r'|"(?:[^"\\]|\\.)*"' r"|--[^\n]*" r"|/\*.*?\*/",
        re.S,
    )

    @classmethod
    def _sub_outside_literals(
        cls, pattern: "re.Pattern[str]", repl: str, sql: str
    ) -> tuple[str, int]:
        """re.sub that leaves string literals / comments untouched.

        Returns (rewritten sql, number of substitutions made). E.g.
        ``SELECT 'sales_db.sales' AS src FROM sales_db.sales`` rewrites only
        the FROM reference, never the literal (ADVICE round 1).
        """
        parts: list[str] = []
        pos = 0
        n = 0
        for m in cls._SKIP_SPANS.finditer(sql):
            seg, k = pattern.subn(repl, sql[pos : m.start()])
            parts.append(seg)
            parts.append(m.group(0))
            pos = m.end()
            n += k
        seg, k = pattern.subn(repl, sql[pos:])
        parts.append(seg)
        n += k
        return "".join(parts), n

    def _rewrite_sql(
        self,
        sql: str,
        principal: Principal | str | None,
        *,
        row_only: bool = False,
        versions: dict[str, int] | None = None,
        _filters_out: list[str] | None = None,
        _views_out: list[str] | None = None,
    ) -> tuple[str, list[str]]:
        """Replace known ``db.table``/``db.view`` references with governed
        temp views for this principal, so ``spark.sql`` executes the
        already-rewritten plan. Returns (rewritten sql, touched objects).

        Safety properties (round-1 ADVICE hardening):

        - submitted SQL may not reference the reserved ``__gov_`` prefix —
          internal aliases are never addressable by callers;
        - aliases are unique per rewrite (uuid), so a concurrent or prior
          query's alias can never be resolved by another principal;
        - every alias created is appended to ``_views_out`` so the caller
          can drop it in a ``finally`` — no governed view outlives its
          query (the round-1 cross-principal leak);
        - references inside string literals / comments are not rewritten.

        Governed SQL must use db-qualified names (``sales_db.sales``);
        unqualified names are not rewritten and fail closed because base
        tables are never registered in Spark's catalog by this engine.
        """
        if re.search(r"__gov_", sql, re.IGNORECASE):
            raise PermissionDeniedError(
                "query references reserved internal identifier prefix '__gov_'"
            )
        name = principal.name if isinstance(principal, Principal) else principal
        touched: list[str] = []
        out = sql
        # Longest-first so "db.sales_masked" matches before "db.sales".
        known = sorted(
            list(self.views.keys()) + list(self.tables.keys()),
            key=len,
            reverse=True,
        )
        for qualified in known:
            pattern = re.compile(
                r"(?<![A-Za-z0-9_.])" + re.escape(qualified) + r"(?![A-Za-z0-9_])"
            )
            alias = "__gov_" + uuid.uuid4().hex
            rewritten, n = self._sub_outside_literals(pattern, alias, out)
            if n == 0:
                continue
            touched.append(qualified)
            if qualified in self.views:
                if versions and qualified in versions:
                    raise ValueError(
                        f"AS OF applies to tables, not views: {qualified} "
                        "(version the view's base tables instead)"
                    )
                df = self.view(qualified, principal, _filters_out=_filters_out)
            else:
                df = self.table(
                    qualified,
                    principal,
                    row_only=row_only,
                    version=(versions or {}).get(qualified),
                    _filters_out=_filters_out,
                )
                if self._broadcast_small(self.tables[qualified]):
                    # row-count-based CBO broadcast (see _broadcast_small);
                    # the hint rides the subtree into the outer spark.sql
                    # plan, so it applies inside subqueries and CTEs and
                    # never touches the SQL text
                    df = df.hint("broadcast")
            df.createOrReplaceTempView(alias)
            if _views_out is not None:
                _views_out.append(alias)
            out = rewritten
        return out, touched
