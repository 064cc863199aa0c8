"""Governance model: principals, tags, data-cells filters, grants, audit.

Reproduces the Lake Formation semantics declared by the reference
(``/root/reference/main.tf:374-490``) as plain engine objects:

- **LF-Tag** (main.tf:382-390): a key with an allowed value set, attachable
  to columns (main.tf:393-429 attaches ``pii=sensitive`` to
  ``customer_email``/``ssn``).
- **Data cells filter** (main.tf:432-457): a named (row-predicate,
  column-allowlist) pair bound to one table.
- **Grant** (main.tf:460-490): principal -> permission -> resource, where
  the resource may be a table, a view, or a data-cells filter. Any access
  without a matching grant is implicitly denied (main.tf:489-490).
- **Audit** (README.md:12): one JSON event per query.

Enforcement happens at scan time (catalog.py) — the injected
``filter``/``select`` are pushed into the Parquet reader by Catalyst, so
row/column security costs nothing extra at scale (the scan reads fewer
pages than an ungoverned one).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable

# Permission kinds (subset the reference uses: ALL for DataAdmin
# main.tf:460-470, SELECT for Analyst main.tf:473-487).
ALL = "ALL"
SELECT = "SELECT"
DESCRIBE = "DESCRIBE"


class PermissionDeniedError(PermissionError):
    """Raised when no grant matches (implicit deny, main.tf:489-490).

    Mirrors Athena's "not authorized" error surface (validate.sh:180).
    """


@dataclass(frozen=True)
class Principal:
    """An identity queries run as (reference: IAM roles main.tf:115-221)."""

    name: str

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.name


@dataclass
class LFTag:
    """A governance tag: key + allowed values (main.tf:382-390)."""

    key: str
    values: tuple[str, ...]

    def validate(self, value: str) -> None:
        if value not in self.values:
            raise ValueError(
                f"tag {self.key!r} does not allow value {value!r}; "
                f"allowed: {list(self.values)}"
            )


@dataclass(frozen=True)
class DataCellsFilter:
    """Named (row predicate, column allowlist) bound to a table
    (main.tf:432-457: ``analyst-apac-filter``).

    ``row_filter`` is a SQL boolean expression evaluated against the base
    table (``sales_region = 'APAC'`` in the reference); ``None`` means all
    rows. ``columns`` is the visible-column allowlist; ``None`` means all
    columns.
    """

    name: str
    database: str
    table: str
    columns: tuple[str, ...] | None = None
    row_filter: str | None = None


@dataclass(frozen=True)
class Grant:
    """principal -> permission -> resource (main.tf:460-487).

    ``resource`` is ``"db.table"`` / ``"db.view"`` for direct grants, or a
    :class:`DataCellsFilter` name for filtered grants (main.tf:473-487
    grants SELECT on the *filter*, not the table).

    ``via_tag_exclude`` is the tag-based access-control analog (the LF
    feature the reference's tag declarations exist to serve): the grant
    covers every column NOT carrying that (key, value) tag, resolved
    dynamically from the schema at read time — tagging a new column later
    revokes it from such principals without touching any grant.
    """

    principal: str
    permission: str
    database: str
    resource: str  # table/view name
    via_filter: str | None = None  # DataCellsFilter name, if filtered
    via_tag_exclude: tuple[str, str] | None = None  # (tag_key, tag_value)


@dataclass
class AuditLog:
    """JSONL audit sink — one event per query (README.md:12 analog)."""

    path: Path | None = None
    events: list[dict] = field(default_factory=list)

    def record(
        self,
        principal: str,
        query: str,
        tables: Iterable[str],
        filters_applied: Iterable[str],
        status: str,
        error: str | None = None,
    ) -> dict:
        event = {
            "event_id": uuid.uuid4().hex,
            "ts": time.time(),
            "principal": principal,
            "query": query,
            "tables": sorted(set(tables)),
            "filters_applied": sorted(set(filters_applied)),
            "status": status,
            "error": error,
        }
        self.events.append(event)
        if self.path is not None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            with self.path.open("a", encoding="utf-8") as f:
                f.write(json.dumps(event) + "\n")
        return event
