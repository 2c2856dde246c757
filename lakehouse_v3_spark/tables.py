"""Lakehouse table manager: read/write/append/overwrite/MERGE/register,
partitioned writes, schema merge, compaction, vacuum.

The reference manages Delta tables on object storage registered in a
Hive metastore (SURVEY.md §2.1 S6-S15). This manager exposes the same
surface and picks the best available backend:

  - **delta** when the Delta Lake package is importable (real cluster):
    ACID appends/overwrites, DeltaTable.merge, OPTIMIZE-style compaction,
    VACUUM.
  - **parquet** fallback (this harness): path-addressed tables with an
    atomic-by-rename overwrite, MERGE rewritten as full-outer
    source-wins join (operators/joins.merge_upsert), compaction as a
    repartition rewrite — plus (r7) a Delta-style OPTIMISTIC-
    CONCURRENCY commit log (txn_append/txn_overwrite/txn_read):
    versioned commits with atomic claims, append retry, loud
    overwrite conflicts, torn-read-free readers. See the commit-log
    section below; DELTA_ATTEMPT.md documents why the real Delta jars
    are unobtainable in this container.

Scale notes: appends are partitioned writes (partition pruning on read);
compaction targets the small-file problem (reference: VACUUM RETAIN 0
after overwrite, uber/drop_dup.py:96-101) — here sized by
``target_file_rows`` so file counts stay bounded as data grows.
"""

from __future__ import annotations

import abc
import contextlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """A transactional write lost an un-retryable conflict: its read
    snapshot went stale under it (Delta's ConcurrentModificationException
    analogue — see the commit-log section of TableManager)."""


class ClaimUnsupportedError(RuntimeError):
    """The warehouse filesystem cannot provide an atomic
    create-if-absent claim — the commit log would be unsafe there."""


class ClaimBackend(abc.ABC):
    """Atomic create-if-absent of a fully-written commit record — the
    ONE primitive the optimistic commit log needs from its storage
    (r7 verdict item #5: abstract the claim so the ACID story ports
    off local FS).

    Contract: ``put_if_absent(payload, final_path)`` must atomically
    either (a) create ``final_path`` containing exactly ``payload`` and
    return True, or (b) leave an existing ``final_path`` untouched and
    return False — and a concurrent reader must NEVER observe a
    half-written file. Implementations:

    - :class:`PosixLinkClaim` (here): write a temp file, ``os.link``
      it to the final name — hard-link creation is create-if-absent
      with full content on POSIX filesystems.
    - object stores (documented port, not implementable in this
      container): S3 conditional PUT with ``If-None-Match: *`` (or a
      DynamoDB-style coordinator for stores without it — the same
      choice Delta's S3 LogStore makes); GCS ``ifGenerationMatch=0``;
      Azure Blob ``If-None-Match: *``. All give the identical
      atomically-claim-a-version semantics this class specifies.

    ``probe(directory)`` verifies the primitive actually works on the
    warehouse filesystem and raises :class:`ClaimUnsupportedError`
    loudly otherwise — never degrade to a racy create.
    """

    @abc.abstractmethod
    def put_if_absent(self, payload: bytes, final_path: str) -> bool:
        ...

    @abc.abstractmethod
    def probe(self, directory: str) -> None:
        ...


def _claim_tmp_name(directory: str) -> str:
    """Uuid-unique staging name for a claim payload (r9 review): the
    claim dir is SHARED across hosts — that is the whole point of the
    backends — and a pid-based tmp name can collide between two hosts'
    writers (equal pids in separate namespaces), letting writer B's
    staging truncate writer A's bytes before A publishes: a silently
    corrupt commit record, worse than a lost claim."""
    import uuid

    return f"{directory}/.tmp-claim-{uuid.uuid4().hex}"


class PosixLinkClaim(ClaimBackend):
    """Hard-link claim: POSIX local / NFSv4 filesystems."""

    def put_if_absent(self, payload: bytes, final_path: str) -> bool:
        tmp = _claim_tmp_name(os.path.dirname(final_path))
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final_path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def probe(self, directory: str) -> None:
        """Fail loudly if hard links don't work here (e.g. an
        object-store FUSE mount): the claim would silently lose its
        atomicity and the commit log its safety. The probe name is
        uuid-unique so concurrent probes (two threads' first commits,
        two processes sharing a pid namespace) cannot collide and
        misreport a working filesystem as broken (r8 review)."""
        import uuid

        os.makedirs(directory, exist_ok=True)
        final = f"{directory}/.probe-claim-{os.getpid()}-{uuid.uuid4().hex}"
        try:
            try:
                if not self.put_if_absent(b"probe", final):
                    raise OSError("claim of a unique fresh name lost")
                with open(final, "rb") as f:
                    if f.read() != b"probe":
                        raise OSError("claim content mismatch")
            finally:
                try:
                    os.unlink(final)
                except FileNotFoundError:
                    pass
        except OSError as exc:
            raise ClaimUnsupportedError(
                f"atomic hard-link claim unavailable under {directory!r} "
                f"({exc}); the optimistic commit log needs a "
                "create-if-absent primitive — on an object store use a "
                "conditional-put ClaimBackend (see ClaimBackend docs)"
            ) from exc


class RenameNoReplaceClaim(ClaimBackend):
    """Conditional-put-shaped claim over a DIFFERENT local primitive
    (r8 verdict item #1: a second implementation exercising the
    ClaimBackend seam, so "ports off local FS" is a tested property of
    the protocol, not a docstring). Shape-wise this is exactly an
    object store's ``If-None-Match: *`` PUT: stage the full payload
    out-of-band, then publish it under the final key atomically
    IF AND ONLY IF the key does not exist — here via Linux
    ``renameat2(..., RENAME_NOREPLACE)`` (one syscall: atomic,
    full-content, create-if-absent; no half-written observable state
    and no crash window between claim and publish)."""

    _AT_FDCWD = -100
    _RENAME_NOREPLACE = 1
    _libc = None  # loaded once per process (class attribute)

    @classmethod
    def _renameat2(cls):
        """Resolve libc's renameat2 once; a libc WITHOUT the symbol
        (glibc < 2.28) must surface as OSError(ENOSYS) — not a raw
        AttributeError — so probe()'s except-OSError converts it into
        the contractual ClaimUnsupportedError (r9 review)."""
        import ctypes
        import errno as _errno

        if cls._libc is None:
            cls._libc = ctypes.CDLL("libc.so.6", use_errno=True)
        try:
            return cls._libc.renameat2
        except AttributeError as exc:
            raise OSError(
                _errno.ENOSYS, "libc has no renameat2 symbol"
            ) from exc

    def _renameat2_noreplace(self, src: str, dst: str) -> None:
        """Raises FileExistsError when dst exists, OSError when the
        kernel/filesystem lacks renameat2 support."""
        import ctypes
        import errno as _errno

        fn = self._renameat2()
        r = fn(
            self._AT_FDCWD,
            os.fsencode(src),
            self._AT_FDCWD,
            os.fsencode(dst),
            self._RENAME_NOREPLACE,
        )
        if r != 0:
            e = ctypes.get_errno()
            if e == _errno.EEXIST:
                raise FileExistsError(dst)
            raise OSError(e, os.strerror(e), src)

    def put_if_absent(self, payload: bytes, final_path: str) -> bool:
        tmp = _claim_tmp_name(os.path.dirname(final_path))
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            self._renameat2_noreplace(tmp, final_path)
            return True
        except FileExistsError:
            os.unlink(tmp)
            return False
        except OSError:
            os.unlink(tmp)
            raise

    def probe(self, directory: str) -> None:
        """Loud capability probe, same contract as PosixLinkClaim's:
        a filesystem without renameat2(RENAME_NOREPLACE) (non-Linux,
        pre-3.15 kernels, some FUSE mounts) must fail here, never
        degrade to a clobbering rename."""
        import uuid

        os.makedirs(directory, exist_ok=True)
        final = f"{directory}/.probe-claim-{os.getpid()}-{uuid.uuid4().hex}"
        try:
            try:
                if not self.put_if_absent(b"probe", final):
                    raise OSError("claim of a unique fresh name lost")
                with open(final, "rb") as f:
                    if f.read() != b"probe":
                        raise OSError("claim content mismatch")
                # the no-replace half: a second claim of the SAME name
                # must lose, not clobber
                if self.put_if_absent(b"clobber", final):
                    raise OSError("RENAME_NOREPLACE clobbered an existing claim")
            finally:
                try:
                    os.unlink(final)
                except FileNotFoundError:
                    pass
        except OSError as exc:
            raise ClaimUnsupportedError(
                f"atomic renameat2(RENAME_NOREPLACE) claim unavailable "
                f"under {directory!r} ({exc}); on an object store use a "
                "conditional-put ClaimBackend (see ClaimBackend docs)"
            ) from exc


class ConditionalPutClaim(ClaimBackend):
    """Mock OBJECT-STORE conditional-PUT backend (r9 verdict item #5):
    the S3 ``PUT If-None-Match: *`` shape emulated semantics-accurately
    over a third, genuinely different local primitive, so the commit
    protocol's claimed object-store portability is TESTED behavior —
    including the store-side failure mode the other two backends cannot
    express (claim decided, object not yet visible).

    Two phases, mirroring how an object store behaves from a client's
    point of view:

    1. **claim** — atomic create-if-absent of the key's claim marker via
       ``os.mkdir(final_path + ".claim")`` (mkdir is POSIX-atomic
       create-if-absent; cross-process and cross-host on shared FS,
       like the other backends). This is the If-None-Match decision:
       exactly one writer per key ever proceeds, losers get False —
       never a clobber.
    2. **publish** — the payload lands under the final key via
       write + fsync + rename, so readers never observe a torn record.

    Fault-injection seams (the point of the mock):

    - ``visibility_delay_s`` sleeps BETWEEN claim and publish —
      emulating a store that acknowledged the conditional PUT while the
      object lags out of listings (the read-after-write visibility gap).
      The protocol must stay SAFE under it: competing appenders keep
      targeting the invisible version, lose the claim, and after
      ``max_retries`` raise ConcurrentWriteError LOUDLY — no version is
      ever double-claimed and no reader ever sees a torn log (pinned in
      tests/test_txn_log.py).
    - ``on_claimed`` runs between claim and publish — arbitrary race
      injection (e.g. a competing commit, a crash leaving the claim
      marker without its object; real S3 has no such crash window
      because both phases are ONE conditional PUT — the marker-based
      emulation is the mock's disclosed artifact, not the port's).

    The claim markers stay behind as the claim audit trail; every log
    reader in TableManager filters on ``*.json``, so markers are never
    parsed as records."""

    def __init__(self, visibility_delay_s: float = 0.0, on_claimed=None):
        self.visibility_delay_s = visibility_delay_s
        self.on_claimed = on_claimed

    def put_if_absent(self, payload: bytes, final_path: str) -> bool:
        try:
            os.mkdir(final_path + ".claim")
        except FileExistsError:
            return False
        if self.on_claimed is not None:
            self.on_claimed(final_path)
        if self.visibility_delay_s:
            import time

            time.sleep(self.visibility_delay_s)
        tmp = _claim_tmp_name(os.path.dirname(final_path))
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final_path)  # only the claim winner writes this key
        return True

    def probe(self, directory: str) -> None:
        """Same loud-capability contract as the other backends: verify
        atomic mkdir claim, full-content round-trip, and that a second
        claim of the same key LOSES."""
        import uuid

        os.makedirs(directory, exist_ok=True)
        final = f"{directory}/.probe-claim-{os.getpid()}-{uuid.uuid4().hex}"
        try:
            try:
                if not self.put_if_absent(b"probe", final):
                    raise OSError("claim of a unique fresh name lost")
                with open(final, "rb") as f:
                    if f.read() != b"probe":
                        raise OSError("claim content mismatch")
                if self.put_if_absent(b"clobber", final):
                    raise OSError("conditional put clobbered an existing claim")
            finally:
                for p in (final, final + ".claim"):
                    try:
                        os.unlink(p) if not p.endswith(".claim") else os.rmdir(p)
                    except FileNotFoundError:
                        pass
        except OSError as exc:
            raise ClaimUnsupportedError(
                f"atomic mkdir-claim conditional put unavailable under "
                f"{directory!r} ({exc}); on an object store use a "
                "conditional-put ClaimBackend (see ClaimBackend docs)"
            ) from exc


def _delta_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class TableManager:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        backend: str | None = None,
        claim_backend: ClaimBackend | None = None,
    ):
        self.spark = spark
        self.warehouse_dir = warehouse_dir.rstrip("/")
        self.backend = backend or ("delta" if _delta_available() else "parquet")
        self.claim_backend = claim_backend or PosixLinkClaim()
        # Probed state is keyed by DIRECTORY, not a single flag (r9
        # ADVICE, low): the snapshot head-log dir and the txn-log dir —
        # and different tables — can live on different mounts (e.g. one
        # table on a FUSE object-store mount); each claim directory must
        # pass its own capability probe before its first claim.
        self._claim_probed: set[str] = set()
        os.makedirs(self.warehouse_dir, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def path(self, table: str) -> str:
        return f"{self.warehouse_dir}/{table.replace('.', '/')}"

    def exists(self, table: str) -> bool:
        """One shallow listing of the table root, not a recursive walk:
        on object storage a full-tree walk is a listing storm per call
        (millions of keys at 100 TB). Data at the root shows up as a
        part-/.parquet file or a _SUCCESS marker; a partitioned table
        shows up as first-level `key=value` dirs."""
        p = self.path(table)
        if self.backend == "delta":
            return os.path.exists(f"{p}/_delta_log")
        if not os.path.isdir(p):
            return False
        with os.scandir(p) as it:
            return any(
                e.name == "_SUCCESS"
                or e.name.endswith(".parquet")
                or e.name.startswith("part-")
                or ("=" in e.name and e.is_dir())
                for e in it
            )

    # -- reads -----------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        """S6 Delta/parquet scan by path, with schema merge across
        appended files (reference mergeSchema convention, §1.3)."""
        reader = self.spark.read.format(self.backend)
        if self.backend == "parquet":
            reader = reader.option("mergeSchema", "true")
        return reader.load(self.path(table))

    # -- writes ----------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        merge_schema: bool = True,
    ) -> None:
        """S8 append sink with schema merge + optional partitionBy
        (reference: uber/csv_to_delta.py:91-102)."""
        w = df.write.format(self.backend).mode("append")
        if merge_schema:
            w = w.option("mergeSchema", "true")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(table))
        self._invalidate(table)

    def overwrite(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        overwrite_schema: bool = True,
    ) -> None:
        """S9 overwrite sink (reference: uber/drop_dup.py:77-89). For the
        parquet backend the write goes to a temp dir then swaps in —
        readers never see a half-written table."""
        if self.backend == "delta":
            w = df.write.format("delta").mode("overwrite")
            if overwrite_schema:
                w = w.option("overwriteSchema", "true")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(self.path(table))
            # delta overwrite is a logical delete: old parquet files
            # REMAIN on disk, so a pre-overwrite stats manifest would
            # pass the on-disk staleness guard while pruning with dead
            # ranges — invalidate here too (r8 review finding)
            self._invalidate(table)
            return
        target = self.path(table)
        tmp = target + "__tmp_overwrite"
        w = df.write.format("parquet").mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)
        self._invalidate(table)

    def _invalidate(self, table: str) -> None:
        """Invalidate Spark's plan/file caches for the table path after
        a write. Spark's CacheManager matches cached plans by source
        PATH, so a `.persist()` anywhere upstream (e.g. ids.py's
        range-partition cache) plus an overwrite-by-swap would
        otherwise serve STALE data to every later read of the table —
        exactly the cache-invalidate Delta performs on commit
        (delta-io OSS `DeltaLog.update`). The file-skipping stats
        sidecar is dropped too: a manifest from before this write
        would prune against a file list that no longer exists
        (cluster_by re-writes it AFTER its own overwrite)."""
        try:
            self.spark.catalog.refreshByPath(self.path(table))
        except Exception:  # pragma: no cover - defensive: cache-only op
            pass
        try:
            os.unlink(self._stats_path(table))
        except FileNotFoundError:
            pass

    def merge(self, source: DataFrame, table: str, key: list[str]) -> None:
        """S10 MERGE upsert: whenMatchedUpdateAll/whenNotMatchedInsertAll
        (reference: alphavantage/bronze2_to_silver.py:141-152). Delta uses
        the native MERGE; parquet rewrites via full-outer join with
        identical row semantics."""
        if self.backend == "delta":  # pragma: no cover - needs delta jars
            from delta.tables import DeltaTable

            cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key)
            (
                DeltaTable.forPath(self.spark, self.path(table))
                .alias("t")
                .merge(source.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        from .operators.joins import merge_upsert

        if not self.exists(table):
            self.overwrite(source, table)
            return
        target = self.read(table)
        merged = merge_upsert(target, source, key)
        self.overwrite(merged, table)

    # -- table properties ------------------------------------------------
    def _props_path(self, table: str) -> str:
        # sidecar lives NEXT TO the table root (not inside it) so the
        # atomic overwrite swap / compaction never destroys properties
        return self.path(table) + "__properties.json"

    def set_properties(self, table: str, props: dict[str, str]) -> None:
        """S14 TBLPROPERTIES (reference: coin_to_delta_w_cp.py:124,
        finance_bronze2_to_silver.py:102). Delta: native ALTER TABLE SET
        TBLPROPERTIES. Parquet: merged into a sidecar JSON so properties
        round-trip across sessions instead of being a silent no-op."""
        if self.backend == "delta":  # pragma: no cover - needs delta jars
            kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
            self.spark.sql(
                f"ALTER TABLE delta.`{self.path(table)}` SET TBLPROPERTIES ({kv})"
            )
            return
        merged = {**self.properties(table), **{str(k): str(v) for k, v in props.items()}}
        tmp = self._props_path(table) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(merged, f, sort_keys=True, indent=0)
        os.replace(tmp, self._props_path(table))

    def properties(self, table: str) -> dict[str, str]:
        """Read back TBLPROPERTIES ({} when none were ever set)."""
        if self.backend == "delta":  # pragma: no cover - needs delta jars
            rows = self.spark.sql(
                f"SHOW TBLPROPERTIES delta.`{self.path(table)}`"
            ).collect()
            return {r[0]: r[1] for r in rows}
        try:
            with open(self._props_path(table), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    # -- maintenance -----------------------------------------------------
    def compact(self, table: str, target_file_rows: int = 1_000_000) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the table into
        ⌈rows / target_file_rows⌉ files (BASELINE.json 'read/write/
        compact'). Returns the new file count."""
        df = self.read(table)
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_file_rows))
        self.overwrite(df.repartition(n_files), table)
        return n_files

    def drop(self, table: str) -> None:
        """DROP TABLE: remove the table directory and invalidate plan/
        stats caches. No-op when the table doesn't exist — the state
        reset in incremental pipelines (pipelines/curation.py rebuild
        mode) drops a fixed list without probing first."""
        p = self.path(table)
        if os.path.isdir(p):
            shutil.rmtree(p)
        self._invalidate(table)

    def vacuum(self, table: str) -> None:
        """S15 VACUUM: drop unreferenced files (reference:
        uber/drop_dup.py:96-101 RETAIN 0 HOURS). Parquet overwrites
        already swap atomically, so only stray temp dirs need removal."""
        if self.backend == "delta":  # pragma: no cover
            self.spark.sql(f"VACUUM delta.`{self.path(table)}` RETAIN 0 HOURS")
            return
        tmp = self.path(table) + "__tmp_overwrite"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)

    # -- Z-order clustering + file skipping (round 8) -------------------
    # The physical half of Delta's OPTIMIZE ZORDER BY + data skipping
    # (public semantics; the catalog query zorder_cluster_keys covers
    # the z-value math, this covers the LAYOUT and the pruned scan).
    # At 100 TB the scan-cost story is: cluster the table so every
    # file covers a tight hyper-rectangle of the predicate space, keep
    # per-file min/max in a manifest, and let point/range predicates
    # on ANY clustered column touch a small fraction of files.

    def _zvalue(self, df: DataFrame, cols: list[str], bits: int = 8):
        """Morton z-value column: each col is rank-binned into 2^bits
        quantile buckets (edges via distributed approxQuantile — no
        global sort, no single-partition window), then the bin bits of
        all cols are interleaved. Quantile binning (not min/max
        scaling) keeps buckets balanced under skew; NULL sorts to bin
        0. Everything after the edge computation is JVM-side
        expressions inside codegen."""
        n_bins = 1 << bits
        probs = [i / n_bins for i in range(1, n_bins)]
        # ONE distributed pass computes every column's edge set
        # (per-column calls would scan the table len(cols) times)
        all_edges = df.stat.approxQuantile(cols, probs, 0.001)
        z = F.lit(0).cast("long")
        for d, c in enumerate(cols):
            edges = all_edges[d]
            # strictly increasing edge list (duplicates collapse under
            # heavy repetition; fewer distinct edges = coarser bins,
            # still correct)
            uniq: list[float] = []
            for e in edges:
                if not uniq or e > uniq[-1]:
                    uniq.append(e)
            edges_lit = F.array(*[F.lit(float(e)) for e in uniq])
            bin_c = F.aggregate(
                edges_lit,
                F.lit(0),
                lambda acc, e: acc
                + F.when(F.col(c).cast("double") >= e, 1).otherwise(0),
            )
            bin_c = F.least(bin_c, F.lit(n_bins - 1))
            for b in range(bits):
                z = z + F.shiftleft(
                    F.shiftright(bin_c, b).bitwiseAND(F.lit(1)).cast("long"),
                    b * len(cols) + d,
                )
        return z

    def cluster_by(
        self,
        table: str,
        cols: list[str],
        target_file_rows: int = 1_000_000,
        bits: int = 8,
    ) -> int:
        """OPTIMIZE ZORDER BY analogue: rewrite ``table`` range-
        partitioned + sorted by the Morton z-value of ``cols`` into
        ⌈rows / target_file_rows⌉ files, then persist a per-file
        min/max stats manifest (sidecar JSON — the role of Delta's
        per-AddFile stats in its log). Returns the file count.

        Scale shape: one approxQuantile pass per clustered column
        (distributed, driver holds 2^bits edges), one z-keyed range
        shuffle, per-partition sort — no global window, no driver data
        path. 100 TB tables re-cluster incrementally per partition in
        production; the semantics per file are identical."""
        self._require_parquet_backend("cluster_by")
        df = self.read(table)
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_file_rows))
        z = self._zvalue(df, cols, bits=bits)
        clustered = (
            df.withColumn("_zv", z)
            .repartitionByRange(n_files, F.col("_zv"))
            .sortWithinPartitions("_zv")
            .drop("_zv")
        )
        self.overwrite(clustered, table)
        self._write_stats(table, cols)
        return n_files

    def _require_parquet_backend(self, op: str) -> None:
        """Z-order clustering + manifest skipping are PARQUET-backend
        only (r8 advisory, medium): a delta overwrite is a logical
        delete that leaves dead parquet files on disk, so the os.walk
        manifest would index dead data + _delta_log checkpoint
        parquets, and read_skipping cannot hand the delta source a
        pruned file list anyway. Under delta, use the engine's own
        OPTIMIZE ZORDER BY + data skipping; fail loudly here rather
        than prune with dead ranges."""
        if self.backend != "parquet":
            raise NotImplementedError(
                f"{op} supports only the parquet backend (current: "
                f"{self.backend!r}) — on Delta use native OPTIMIZE "
                "ZORDER BY / data skipping, which this emulates"
            )

    @staticmethod
    def _data_files(root: str):
        """Yield table DATA parquet files relative to ``root``,
        excluding every reserved/metadata subtree (``_txn_data``,
        ``_txn_log``, ``_snapshots``, ``_delta_log``, dot-temps…) —
        Spark's own rule that `_`/`.`-prefixed paths are invisible to
        a table scan (r8 advisory: the stats walk must never index a
        txn uuid dir's superseded rows as table files)."""
        for dirpath, dirs, files in os.walk(root):
            dirs[:] = [
                d for d in dirs if not d.startswith(("_", "."))
            ]
            for fn in files:
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    yield os.path.relpath(os.path.join(dirpath, fn), root)

    def _stats_path(self, table: str) -> str:
        # sidecar next to the table root (same convention as
        # __properties.json): survives the atomic overwrite swap
        return self.path(table) + "__stats.json"

    def _write_stats(self, table: str, cols: list[str]) -> None:
        """Per-file min/max manifest for ``cols`` from the parquet
        footers — read once at write time (a footer per file, no data
        pages), served to every later pruned scan."""
        import pyarrow.parquet as papq

        stats: dict[str, dict] = {}
        root = self.path(table)
        for rel in self._data_files(root):
            fp = os.path.join(root, rel)
            md = papq.ParquetFile(fp).metadata
            file_stats: dict[str, list] = {}
            for c in cols:
                lo = hi = None
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for ci in range(rgm.num_columns):
                        col = rgm.column(ci)
                        if col.path_in_schema != c:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            lo = hi = None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    else:
                        continue
                    break
                if lo is not None:
                    file_stats[c] = [lo, hi]
            stats[rel] = file_stats
        tmp = self._stats_path(table) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"columns": cols, "files": stats}, f, default=str)
        os.replace(tmp, self._stats_path(table))

    def prune_files(
        self, table: str, predicates: dict[str, tuple]
    ) -> tuple[list[str], int]:
        """(files overlapping every [lo, hi] predicate, total files).
        A file with no stats for a predicate column is kept
        (conservative — correctness never depends on pruning). ``lo``
        or ``hi`` may be None for one-sided ranges."""
        self._require_parquet_backend("prune_files")
        with open(self._stats_path(table), encoding="utf-8") as f:
            manifest = json.load(f)
        root = self.path(table)
        kept = []
        # defense in depth against a stale manifest (writes already
        # drop the sidecar via _invalidate): any on-disk parquet DATA
        # file the manifest doesn't know about is UNPRUNABLE and always
        # read — skipping is an optimization, never allowed to lose
        # rows. Reserved subtrees (_txn_data, _snapshots, _delta_log…)
        # are NOT table files and stay out of both the manifest and the
        # on-disk set (r8 advisory).
        on_disk = set(self._data_files(root))
        unknown = sorted(on_disk - set(manifest["files"]))
        kept.extend(f"{root}/{rel}" for rel in unknown)
        def disjoint(fmin, fmax, lo, hi) -> bool:
            """True ONLY when the predicate provably misses [fmin,
            fmax]. Stats pass through JSON (default=str), so Decimal/
            bytes/date stats arrive as strings while the predicate may
            be numeric — compare numerically when both sides coerce to
            float, same-type otherwise, and on ANY doubt (mixed
            incomparable types, coercion failure) return False: a file
            is never pruned on an unsound comparison."""
            try:
                try:
                    fmin_c, fmax_c = float(fmin), float(fmax)
                    lo_c = None if lo is None else float(lo)
                    hi_c = None if hi is None else float(hi)
                except (TypeError, ValueError):
                    if not all(
                        isinstance(v, type(fmin))
                        for v in (fmax, lo, hi)
                        if v is not None
                    ):
                        return False
                    fmin_c, fmax_c, lo_c, hi_c = fmin, fmax, lo, hi
                return (hi_c is not None and hi_c < fmin_c) or (
                    lo_c is not None and lo_c > fmax_c
                )
            except TypeError:
                return False

        for rel, file_stats in manifest["files"].items():
            if rel not in on_disk:
                continue  # vanished file: nothing to read
            keep = True
            for c, (lo, hi) in predicates.items():
                if c not in file_stats:
                    continue  # no stats → cannot prune
                fmin, fmax = file_stats[c]
                if disjoint(fmin, fmax, lo, hi):
                    keep = False
                    break
            if keep:
                kept.append(f"{root}/{rel}")
        return kept, len(on_disk)

    def read_skipping(
        self, table: str, predicates: dict[str, tuple]
    ) -> tuple[DataFrame, int, int]:
        """Data-skipping scan: manifest-prune the file list, read only
        the survivors, and re-apply the predicates exactly (pruning is
        an optimization, never the filter). Returns
        ``(df, files_read, files_total)``."""
        files, total = self.prune_files(table, predicates)
        if not files:
            df = self.read(table).limit(0)
        else:
            df = self.spark.read.format(self.backend).load(files)
        for c, (lo, hi) in predicates.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df, len(files), total

    # -- snapshots / time travel ----------------------------------------
    # A minimal transaction-log protocol on plain parquet, standing in
    # for Delta's log where delta-spark isn't available (TESTDATA.md):
    # each snapshot is an immutable version directory; commit is ONE
    # atomic claim of the next HEAD-log record through the SAME
    # pluggable ClaimBackend as the txn log (one commit protocol; a
    # conditional-put of the next HEAD-log key on object storage).
    # Readers resolve HEAD once (max-seq record) and
    # then only touch immutable paths, so concurrent writers can never
    # show them a torn table; rollback is an O(1) pointer move, not a
    # data rewrite.

    def _snap_dir(self, table: str) -> str:
        return f"{self.path(table)}/_snapshots"

    def _head_log_dir(self, table: str) -> str:
        return f"{self._snap_dir(table)}/_head_log"

    def _head_record(self, table: str) -> dict | None:
        """Latest HEAD-log record (max sequence number), or None before
        the first snapshot commit. HEAD moves are an append-only log of
        tiny ``{seq, version}`` records, each created atomically via
        :class:`ClaimBackend` — the SAME commit primitive as the txn
        log (r8 verdict item #1: one commit protocol, not two), so the
        snapshot story ports to object storage with the same
        conditional-put and nothing else."""
        d = self._head_log_dir(table)
        if os.path.isdir(d):
            # Readers hold NO lock (that is the protocol's point), so the
            # max-seq record listed here can be unlinked between scandir
            # and open by a concurrent commit + vacuum_snapshots head-log
            # compaction (r9 ADVICE, medium). Retry the list-and-open: a
            # vanished max means a NEWER record exists (compaction only
            # removes superseded records), so the re-scan converges.
            for _ in range(64):
                names = [
                    e.name for e in os.scandir(d) if e.name.endswith(".json")
                ]
                if not names:
                    break
                try:
                    with open(f"{d}/{max(names)}", encoding="utf-8") as f:
                        return json.load(f)
                except FileNotFoundError:
                    continue
        # back-compat (r9 review): tables committed before the claimed
        # head log used a single _HEAD pointer file — honor it when the
        # log is empty so pre-migration warehouses keep their HEAD; the
        # next _commit_head seeds the log at seq 0 and supersedes it
        try:
            with open(
                f"{self._snap_dir(table)}/_HEAD", encoding="utf-8"
            ) as f:
                return {"seq": -1, "version": int(json.load(f)["version"])}
        except FileNotFoundError:
            return None

    def _commit_head(self, table: str, version: int) -> None:
        """Move HEAD to ``version`` by claiming the next head-log seq
        through the pluggable ClaimBackend. Writers are serialized by
        ``_snapshot_lock`` on one host; a cross-host racer that steals
        the seq makes this fail LOUDLY instead of silently clobbering
        (the flock can't see other hosts — the claim can)."""
        d = self._head_log_dir(table)
        os.makedirs(d, exist_ok=True)
        if d not in self._claim_probed:
            self.claim_backend.probe(d)
            self._claim_probed.add(d)
        head = self._head_record(table)
        seq = (head["seq"] + 1) if head else 0
        payload = json.dumps({"seq": seq, "version": version}).encode("utf-8")
        if not self.claim_backend.put_if_absent(
            payload, f"{d}/{seq:020d}.json"
        ):
            raise ConcurrentWriteError(
                f"snapshot HEAD move for {table!r} lost the claim at "
                f"seq {seq} — a writer outside this host's snapshot "
                "lock committed concurrently"
            )

    @contextlib.contextmanager
    def _snapshot_lock(self, table: str):
        """Exclusive advisory lock serializing snapshot WRITERS on one
        host. Version allocation is read-then-write (max retained + 1),
        so two unserialized writers can allocate the same version and
        race on the vdir rename + HEAD swap. Readers need no lock (they
        only follow _HEAD, which is swapped atomically). Advisory flock
        covers local/NFSv4 filesystems; on an object store (no rename,
        no flock) snapshot commits need an external coordinator — the
        same single-committer constraint Delta solves with its log."""
        snap = self._snap_dir(table)
        os.makedirs(snap, exist_ok=True)
        import fcntl

        with open(f"{snap}/.lock", "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock_f, fcntl.LOCK_UN)

    def write_snapshot(self, df: DataFrame, table: str) -> int:
        """Write a new immutable version and atomically move HEAD to it.
        Returns the committed version number. Concurrent writers are
        serialized by ``_snapshot_lock`` (held across allocate → write →
        HEAD swap, so the allocated version can't be stolen mid-write)."""
        snap = self._snap_dir(table)
        with self._snapshot_lock(table):
            # next version = max RETAINED version + 1 (not HEAD + 1: after a
            # restore_snapshot HEAD points backwards but newer version dirs
            # still exist and must not be clobbered)
            history = self.snapshot_history(table)
            version = (history[-1] + 1) if history else 0
            vdir = f"{snap}/v{version}"
            tmp = f"{snap}/.tmp-v{version}"
            df.write.format("parquet").mode("overwrite").save(tmp)
            os.replace(tmp, vdir)  # data visible only under its final name
            try:
                self._commit_head(table, version)  # THE commit point (claimed)
            except ConcurrentWriteError:
                # The vdir was renamed into place but its commit lost the
                # claim (cross-host racer the flock can't see). It was
                # never published via HEAD — remove it so time travel
                # can't serve an uncommitted version and vacuum never
                # retains it as one of keep_last (r9 ADVICE, low).
                shutil.rmtree(vdir, ignore_errors=True)
                raise
        return version

    def snapshot_version(self, table: str) -> int | None:
        """Current HEAD version (None before the first commit)."""
        head = self._head_record(table)
        return None if head is None else int(head["version"])

    def read_snapshot(self, table: str, version: int | None = None) -> DataFrame:
        """Time-travel read: HEAD by default, or any retained version."""
        if version is None:
            version = self.snapshot_version(table)
            if version is None:
                raise FileNotFoundError(f"no snapshots for table {table}")
        return self.spark.read.parquet(f"{self._snap_dir(table)}/v{version}")

    def snapshot_history(self, table: str) -> list[int]:
        """Retained versions, oldest first (DESCRIBE HISTORY analogue)."""
        snap = self._snap_dir(table)
        if not os.path.isdir(snap):
            return []
        return sorted(
            int(e.name[1:])
            for e in os.scandir(snap)
            if e.is_dir() and e.name.startswith("v")
        )

    def restore_snapshot(self, table: str, version: int) -> None:
        """Rollback = move HEAD to an older retained version. O(1): no
        data is copied; the newer versions stay readable until vacuumed."""
        with self._snapshot_lock(table):
            if version not in self.snapshot_history(table):
                raise FileNotFoundError(f"version {version} not retained for {table}")
            self._commit_head(table, version)

    def snapshot_diff(
        self, table: str, v_old: int, v_new: int, key: list[str]
    ) -> DataFrame:
        """Change Data Feed analogue: per-key insert/update/delete rows
        between two retained versions. Each side is fingerprinted in its
        scan projection (xxhash64 over the shared non-key columns), so
        the diff is ONE key-partitioned full-outer join of (key, 64-bit
        fp) pairs — no row payloads cross the shuffle, which is what
        keeps a 100 TB version diff shuffle-light. Assumes key-compatible
        schemas; columns present on only one side are ignored."""
        old = self.read_snapshot(table, v_old)
        new = self.read_snapshot(table, v_new)
        shared = [c for c in new.columns if c in old.columns and c not in key]

        def fingerprint(df: DataFrame):
            cols = [
                F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in shared
            ]
            return df.select(
                *key, F.xxhash64(*cols).alias("_fp") if cols else F.lit(0).alias("_fp")
            )

        o = fingerprint(old).alias("o")
        n = fingerprint(new).alias("n")
        cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key]
        change = (
            F.when(F.col("o._fp").isNull(), "insert")
            .when(F.col("n._fp").isNull(), "delete")
            .when(F.col("o._fp") != F.col("n._fp"), "update")
        )
        return (
            o.join(n, cond, "full_outer")
            .select(
                *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key],
                change.alias("change_type"),
            )
            .filter(F.col("change_type").isNotNull())
        )

    def vacuum_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Drop old versions beyond ``keep_last``, never dropping HEAD.
        Returns the versions removed (Delta VACUUM analogue — bounded
        storage growth while time travel stays available for the
        retained window)."""
        with self._snapshot_lock(table):
            head = self.snapshot_version(table)
            versions = self.snapshot_history(table)
            keep = set(versions[-keep_last:]) | ({head} if head is not None else set())
            removed = []
            for v in versions:
                if v not in keep:
                    shutil.rmtree(f"{self._snap_dir(table)}/v{v}")
                    removed.append(v)
            # compact the HEAD log to its max-seq record (the only one
            # _head_record ever reads) — the append-only log of HEAD
            # moves must not grow without bound on a long-lived table
            # (r9 review); safe under the writer lock because the next
            # _commit_head allocates max+1 regardless of holes below it
            d = self._head_log_dir(table)
            if os.path.isdir(d):
                names = sorted(
                    e.name for e in os.scandir(d) if e.name.endswith(".json")
                )
                # keep the top TWO records, not one (r10, ADVICE): a
                # lockless reader that listed the old max right before a
                # commit landed would otherwise find its record unlinked;
                # keeping max-1 widens the race window the reader-side
                # retry (above, _head_record) has to cover.
                for name in names[:-2]:
                    os.unlink(f"{d}/{name}")
                    # claim-marker hygiene: a marker-based backend
                    # (ConditionalPutClaim) leaves a sibling .claim dir
                    # per record — drop it with its record so the
                    # compacted log stays bounded
                    with contextlib.suppress(OSError):
                        os.rmdir(f"{d}/{name}.claim")
        return removed

    # -- optimistic-concurrency commit log (r6 verdict item #3) ----------
    # The one Delta ACID behavior the parquet emulation lacked:
    # OPTIMISTIC conflict detection between concurrent writers, with no
    # writer lock. Protocol (Delta's, from the public spec/paper):
    #
    #   1. writer snapshots the latest committed version V (one log
    #      listing);
    #   2. writes its data files under a unique uuid dir — INVISIBLE to
    #      readers (only the log defines table state);
    #   3. claims version V+1 by ATOMICALLY creating
    #      _txn_log/<V+1>.json. The claim is os.link(tmp, commit) — a
    #      hard link is create-if-absent WITH full content, so a commit
    #      file can never be observed half-written (the object-store
    #      equivalent is a conditional PUT of the version key);
    #   4. if the claim loses (EEXIST), the writer re-reads the log:
    #      an APPEND whose intervening commits are all appends retries
    #      the claim at the new tip (its data files are already
    #      written — only the tiny commit record is retried); an
    #      OVERWRITE, or an append that raced an overwrite, raises
    #      ConcurrentWriteError loudly (its remove-set / base snapshot
    #      is stale — Delta's same conflict matrix).
    #
    # Readers replay the log's contiguous prefix and read only the
    # referenced immutable uuid dirs — a concurrent reader can never
    # see a torn table, only version N or N+1. Reference contract:
    # Delta MERGE/append ACID (alphavantage/bronze2_to_silver.py:
    # 141-152); DELTA_ATTEMPT.md documents why the real jars are
    # unobtainable here.

    def _txn_log_dir(self, table: str) -> str:
        return f"{self.path(table)}/_txn_log"

    def _txn_commit_path(self, table: str, version: int) -> str:
        return f"{self._txn_log_dir(table)}/{version:020d}.json"

    def txn_version(self, table: str) -> int | None:
        """Latest committed version (None before the first commit)."""
        log = self._txn_log_dir(table)
        if not os.path.isdir(log):
            return None
        versions = [
            int(e.name[:-5])
            for e in os.scandir(log)
            if e.name.endswith(".json")
        ]
        return max(versions) if versions else None

    def _txn_read_log(self, table: str) -> list[dict]:
        """All commit records, version order. Commit files are created
        atomically with full content (hard link), so every listed file
        parses."""
        log = self._txn_log_dir(table)
        if not os.path.isdir(log):
            return []
        out = []
        for e in sorted(os.scandir(log), key=lambda e: e.name):
            if e.name.endswith(".json"):
                with open(e.path, encoding="utf-8") as f:
                    out.append(json.load(f))
        return out

    def _txn_state(self, table: str) -> tuple[int | None, list[str]]:
        """(latest version, live data dirs) by replaying the log."""
        live: list[str] = []
        version = None
        for rec in self._txn_read_log(table):
            version = rec["version"]
            if rec["op"] == "overwrite":
                live = list(rec["add"])
            else:
                live.extend(rec["add"])
        return version, live

    def _txn_try_commit(self, table: str, record: dict) -> bool:
        """Atomically claim ``record['version']`` via the pluggable
        :class:`ClaimBackend` (POSIX hard link here; conditional PUT on
        an object store). True on success, False if another writer
        claimed the version first. The backend is capability-probed
        once per manager — an FS that can't claim atomically fails
        LOUDLY (ClaimUnsupportedError), never racily."""
        log = self._txn_log_dir(table)
        os.makedirs(log, exist_ok=True)
        if log not in self._claim_probed:
            self.claim_backend.probe(log)
            self._claim_probed.add(log)
        payload = json.dumps(record).encode("utf-8")
        return self.claim_backend.put_if_absent(
            payload, self._txn_commit_path(table, record["version"])
        )

    def _txn_write_data(self, df: DataFrame, table: str) -> str:
        """Write df under a fresh uuid dir; returns the dir name
        (relative to the table root). Invisible until committed."""
        import uuid

        rel = f"_txn_data/{uuid.uuid4().hex}"
        df.write.format("parquet").mode("errorifexists").save(
            f"{self.path(table)}/{rel}"
        )
        return rel

    def txn_append(
        self, df: DataFrame, table: str, max_retries: int = 20
    ) -> int:
        """ACID append: returns the committed version. Lost claim races
        against other APPENDS are retried (only the commit record is
        re-attempted — the data files are already on disk); racing an
        OVERWRITE raises ConcurrentWriteError (the overwrite invalidated
        the base snapshot this append was planned against)."""
        rel = self._txn_write_data(df, table)
        read_version = self.txn_version(table)
        for _ in range(max_retries):
            # Order matters (r7 advisory): compute the claim target
            # FIRST, then scan the full log for an intervening
            # overwrite, then claim. Versions are dense (every claim
            # targets current-max+1), so when our claim at next_v
            # SUCCEEDS every commit < next_v already existed at this
            # iteration's scan — an overwrite can no longer slip into
            # the scan→claim window: it would have to take next_v
            # itself, which makes our claim FAIL and the next
            # iteration's scan catch it. The old order (scan only
            # after a failed claim, then recompute next_v) left a
            # window where append silently landed ABOVE an overwrite.
            latest = self.txn_version(table)
            next_v = (latest if latest is not None else -1) + 1
            for other in self._txn_read_log(table):
                if (
                    read_version is None or other["version"] > read_version
                ) and other["op"] == "overwrite":
                    raise ConcurrentWriteError(
                        f"append to {table!r} conflicts with overwrite "
                        f"v{other['version']} committed after read "
                        f"snapshot v{read_version}"
                    )
            rec = {
                "version": next_v,
                "op": "append",
                "add": [rel],
                "readVersion": read_version,
            }
            if self._txn_try_commit(table, rec):
                return next_v
        raise ConcurrentWriteError(
            f"append to {table!r} lost the commit race {max_retries} times"
        )

    def txn_overwrite(
        self, df: DataFrame, table: str, read_version: "int | None" = ...
    ) -> int:
        """ACID overwrite: replaces the table's live set in one commit.
        NO retry on a lost race — an overwrite's remove-set is computed
        from its read snapshot, so ANY intervening commit (append or
        overwrite) makes it stale and it must fail loudly (Delta's
        conflict rule for non-blind writes).

        ``read_version`` pins the snapshot the caller's ``df`` was
        DERIVED from (txn_compact): if anything committed after it,
        the claim at read_version+1 loses and raises — closing the
        read→overwrite window for read-modify-write callers. Default:
        snapshot at entry (blind replace semantics)."""
        if read_version is ...:
            read_version = self.txn_version(table)
        rel = self._txn_write_data(df, table)
        # remove-set = the live set AT the snapshot (replay commits
        # ≤ read_version), never at write time
        live: list[str] = []
        for r in self._txn_read_log(table):
            if read_version is None or r["version"] > read_version:
                continue
            live = (
                list(r["add"]) if r["op"] == "overwrite" else live + list(r["add"])
            )
        rec = {
            "version": (read_version if read_version is not None else -1) + 1,
            "op": "overwrite",
            "add": [rel],
            "remove": live,
            "readVersion": read_version,
        }
        if not self._txn_try_commit(table, rec):
            raise ConcurrentWriteError(
                f"overwrite of {table!r} conflicts: version "
                f"{rec['version']} was committed by another writer after "
                f"read snapshot v{read_version}"
            )
        return rec["version"]

    def txn_read(self, table: str, version: int | None = None) -> DataFrame:
        """Consistent read of the committed state: replays the log once,
        then touches only immutable uuid dirs — a concurrent writer can
        never tear this view. ``version`` time-travels to an older
        commit."""
        records = self._txn_read_log(table)
        if version is not None:
            records = [r for r in records if r["version"] <= version]
        if not records:
            raise FileNotFoundError(f"no commits for table {table}")
        live: list[str] = []
        for rec in records:
            live = list(rec["add"]) if rec["op"] == "overwrite" else live + list(rec["add"])
        root = self.path(table)
        # mergeSchema: commits may append columns over time (the S8
        # mergeSchema contract extends to the txn path — Delta appends
        # evolve schema the same way)
        return self.spark.read.option("mergeSchema", "true").parquet(
            *[f"{root}/{rel}" for rel in live]
        )

    def txn_compact(
        self, table: str, target_file_rows: int = 1_000_000
    ) -> int:
        """OPTIMIZE on the commit log: rewrite the current live set
        into ⌈rows / target_file_rows⌉ files and commit the result as a
        NEW overwrite version — content-identical, fewer files.
        Readers are never torn (it's an ordinary commit); time travel
        to pre-compaction versions keeps working until txn_vacuum;
        and a concurrent writer landing first makes the compaction
        fail LOUDLY instead of discarding that writer's rows (the
        overwrite conflict rule — Delta's OPTIMIZE behaves the same:
        it re-runs rather than clobbers). Returns the new version.

        The overwrite is PINNED to the version the compaction read: a
        commit landing anywhere in the read→rewrite window (including
        during the count/rewrite jobs) makes the claim lose and raise
        instead of silently discarding that commit's rows."""
        read_version = self.txn_version(table)
        df = self.txn_read(table, version=read_version)
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_file_rows))
        return self.txn_overwrite(
            df.repartition(n_files), table, read_version=read_version
        )

    # Default retention for never-committed dirs: 7 days (Delta VACUUM's
    # own default). r8 advisory: 10 minutes was shorter than a plausible
    # large distributed write — a writer whose _txn_write_data outlives
    # the window could have its uncommitted dir reclaimed and then
    # commit a version whose files are gone. Retention MUST exceed the
    # longest possible write duration; callers overriding it downward
    # own that bound.
    TXN_VACUUM_RETENTION_S = 7 * 24 * 3600.0

    def txn_vacuum(
        self, table: str, retention_seconds: float = TXN_VACUUM_RETENTION_S
    ) -> list[str]:
        """Drop uuid data dirs no longer needed by the LATEST version
        (time travel to vacuumed versions stops working, like Delta
        VACUUM). Returns the removed dirs.

        Two classes of dead dir, removed under different rules (r7
        advisory — the old no-retention version could rmtree an
        IN-FLIGHT writer's data between its ``_txn_write_data`` and its
        claim, yielding a committed version whose files are gone):

        - **superseded**: referenced by some commit record but not by
          the latest state (an overwritten add-set). Committed history
          — safe to drop at any age; only time travel loses them.
        - **never-committed**: present on disk, referenced by NO commit
          record. Either in-flight (a writer between data-write and
          claim) or orphaned by a crashed/conflicted writer. Dropped
          only when older than ``retention_seconds`` — the same
          retention window (and the same 7-day default) Delta VACUUM
          keeps for exactly this reason: it must exceed the longest
          write that could still be in flight.
        """
        import time

        records = self._txn_read_log(table)
        _, live = self._txn_state(table)
        data_root = f"{self.path(table)}/_txn_data"
        if not os.path.isdir(data_root):
            return []
        live_names = {rel.split("/", 1)[1] for rel in live}
        committed_names = {
            rel.split("/", 1)[1] for r in records for rel in r["add"]
        }
        cutoff = time.time() - retention_seconds
        removed = []
        for e in os.scandir(data_root):
            if not e.is_dir() or e.name in live_names:
                continue
            if e.name in committed_names or e.stat().st_mtime < cutoff:
                shutil.rmtree(e.path)
                removed.append(e.name)
        return sorted(removed)

    # -- catalog ---------------------------------------------------------
    def register(
        self, table: str, view_name: str | None = None, persistent: bool = False
    ) -> None:
        """S12/S13 idempotent registration (reference:
        coin/convert_to_delta.py:167-173 — CREATE TABLE ... USING DELTA
        LOCATION into a Hive Metastore).

        ``persistent=False``: session temp view (dies with the session).
        ``persistent=True``: external-table registration in the session
        catalog — ``CREATE TABLE ... USING <backend> LOCATION <path>``.
        With a metastore-backed session (``session.get_spark(
        metastore_dir=...)`` — Spark's built-in derby HMS, no external
        Hive needed) the entry survives the session: a NEW SparkSession
        pointed at the same metastore_dir sees the table
        (tests/test_tables_incremental.py cross-process test). On a
        default in-memory-catalog session it degrades to
        session-lifetime, same as a temp view.
        """
        name = view_name or table.replace(".", "_")
        if persistent:
            # idempotent like createOrReplaceTempView: drop a stale entry
            # (location may have moved) then re-create. External table:
            # DROP removes metadata only, never data files.
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            self.spark.sql(
                f"CREATE TABLE `{name}` USING {self.backend} "
                f"LOCATION '{self.path(table)}'"
            )
            return
        self.read(table).createOrReplaceTempView(name)
