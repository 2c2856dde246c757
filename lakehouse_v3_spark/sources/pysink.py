"""Custom Python Data Source SINK (DataSourceWriter): a JSONL directory
sink with a two-phase commit protocol — the write-path counterpart of
sources/pydatasource.py.

Why this matters at 100 TB: a distributed sink is only correct if
partially-failed jobs leave nothing visible. The DataSourceWriter
contract is exactly the two-phase pattern the built-in FileFormatWriter
uses: executors write to invisible temp files and return commit
messages; the driver's ``commit`` atomically publishes them (rename +
``_SUCCESS``) only after every task succeeded, and ``abort`` removes
the temps on any failure. Readers therefore never observe a torn write
from a *failed job*.

Atomicity limitation (vs Delta's single-commit-file protocol): publish
is one rename per part file, atomic per file but not across files — a
driver crash mid-``commit`` can leave some parts published and some
not, a window Delta's one-file commit does not have. Readers that need
all-or-nothing visibility should gate on ``_SUCCESS`` (written last,
after every rename; its ``files`` list names exactly the committed
parts). This sink also assumes driver and executors share a
filesystem (local mode / NFS); on a real cluster use an HDFS/S3
committer or the Delta path in ``tables.py``.

Reference parity: the reference relies on Delta's transactional commit
for the same guarantee (alphavantage/bronze2_to_silver.py MERGE path);
this gives plain-directory sinks the same visibility semantics.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import Row, StructType


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.overwrite = overwrite

    # -- executor side ------------------------------------------------
    def write(self, iterator: Iterator[Row]) -> _FileCommit:
        """Write one partition to an invisible temp file (dot-prefixed:
        ignored by Spark/Hadoop directory readers) and report it."""
        os.makedirs(self.path, exist_ok=True)
        tmp = f".tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp_name=tmp, n_rows=n)

    # -- driver side --------------------------------------------------
    def commit(self, messages: list[_FileCommit]) -> None:
        """All tasks succeeded: publish temps as part files (rename is
        atomic per file; see module docstring for the cross-file window)
        and drop a _SUCCESS manifest with cumulative row counts.

        A zero-partition DataFrame runs no write task, so the directory
        may not exist yet — create it here rather than assuming write()
        ran. In append mode prior jobs' totals are merged, not clobbered:
        _SUCCESS carries running {n_files, n_rows} plus this job's parts.
        """
        os.makedirs(self.path, exist_ok=True)
        success_path = os.path.join(self.path, "_SUCCESS")
        prior_files = prior_rows = 0
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        elif os.path.exists(success_path):
            with open(success_path) as f:
                prior = json.load(f)
            prior_files = prior.get("n_files", 0)
            prior_rows = prior.get("n_rows", 0)
        total = 0
        published = []
        for i, m in enumerate(sorted(messages, key=lambda m: m.tmp_name)):
            part = f"part-{i:05d}-{m.tmp_name[5:]}"
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, part),
            )
            published.append(part)
            total += m.n_rows
        with open(success_path, "w") as f:
            json.dump(
                {
                    "n_files": prior_files + len(messages),
                    "n_rows": prior_rows + total,
                    "files": published,
                },
                f,
            )

    def abort(self, messages: list[_FileCommit]) -> None:
        """Any task failed: remove every temp this job created; nothing
        was ever visible to readers."""
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    """df.write.format("jsonl_sink").option("path", d).mode(...).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    from ..session import ensure_package_shipped

    ensure_package_shipped(spark)
    spark.dataSource.register(JsonlSinkDataSource)
