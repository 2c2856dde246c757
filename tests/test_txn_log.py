"""Optimistic-concurrency commit log (r6 verdict item #3): the one
Delta ACID behavior reproducible without the unobtainable jars —
versioned commits with atomic claims, append-retry, loud
overwrite-conflict, and torn-read-free concurrent reads.

Acceptance (per the verdict): a two-OS-process test where concurrent
appends BOTH land (retry), a concurrent overwrite+append conflicts
LOUDLY, and a concurrent reader never sees a torn table.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

import pytest

from lakehouse_v3_spark.tables import ConcurrentWriteError, TableManager

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(
    autouse=True,
    params=["posix_link", "rename_noreplace", "conditional_put"],
)
def claim_impl(request, monkeypatch):
    """Run the ENTIRE commit-log suite over ALL THREE ClaimBackends
    (r8 verdict item #1 + r9 item #5: every implementation must
    exercise the seam — every conflict/retry/vacuum/compact scenario,
    not a bespoke smoke test; conditional_put is the mock object-store
    If-None-Match backend). TableManager's default claim constructor is
    swapped per-param, so each test body runs unchanged three times."""
    import lakehouse_v3_spark.tables as T

    impl = {
        "posix_link": T.PosixLinkClaim,
        "rename_noreplace": T.RenameNoReplaceClaim,
        "conditional_put": T.ConditionalPutClaim,
    }[request.param]
    monkeypatch.setattr(T, "PosixLinkClaim", impl)
    return request.param


# -- single-process protocol basics --------------------------------------


def test_txn_append_overwrite_timetravel_vacuum(spark, tmp_path):
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    v0 = mgr.txn_append(spark.range(5).withColumnRenamed("id", "x"), "t")
    v1 = mgr.txn_append(spark.range(5, 8).withColumnRenamed("id", "x"), "t")
    assert (v0, v1) == (0, 1)
    assert mgr.txn_read("t").count() == 8
    v2 = mgr.txn_overwrite(spark.range(2).withColumnRenamed("id", "x"), "t")
    assert v2 == 2
    assert mgr.txn_read("t").count() == 2
    # time travel to the pre-overwrite state
    assert mgr.txn_read("t", version=1).count() == 8
    # vacuum drops the two dirs the overwrite removed
    removed = mgr.txn_vacuum("t")
    assert len(removed) == 2
    assert mgr.txn_read("t").count() == 2
    with pytest.raises(Exception):
        mgr.txn_read("t", version=1).count()  # vacuumed away


def test_txn_claim_is_exclusive(spark, tmp_path):
    """The hard-link claim admits exactly one writer per version."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(1), "t")
    rec = {"version": 1, "op": "append", "add": ["_txn_data/x"],
           "readVersion": 0}
    assert mgr._txn_try_commit("t", rec) is True
    assert mgr._txn_try_commit("t", dict(rec, add=["_txn_data/y"])) is False
    # and the surviving record is the winner's, fully formed
    _, live = mgr._txn_state("t")
    assert "_txn_data/x" in live and "_txn_data/y" not in live


def test_append_racing_append_retries(spark, tmp_path):
    """A lost append claim retries at the new tip — both land."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")
    # simulate a racer stealing version 1 between snapshot and claim
    real_try = mgr._txn_try_commit
    stolen = {"done": False}

    def steal_once(table, record):
        if not stolen["done"]:
            stolen["done"] = True
            racer = {"version": record["version"], "op": "append",
                     "add": [mgr._txn_write_data(spark.range(100, 102), "t")],
                     "readVersion": 0}
            assert real_try(table, racer)
        return real_try(table, record)

    mgr._txn_try_commit = steal_once
    try:
        v = mgr.txn_append(spark.range(10, 14), "t")
    finally:
        mgr._txn_try_commit = real_try
    assert v == 2  # retried past the stolen version
    assert mgr.txn_read("t").count() == 3 + 2 + 4


def test_append_racing_overwrite_conflicts_loudly(spark, tmp_path):
    """An append whose snapshot predates a committed OVERWRITE must
    raise ConcurrentWriteError, not silently resurrect removed data."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")
    real_try = mgr._txn_try_commit
    stolen = {"done": False}

    def steal_with_overwrite(table, record):
        if not stolen["done"]:
            stolen["done"] = True
            racer = {"version": record["version"], "op": "overwrite",
                     "add": [mgr._txn_write_data(spark.range(1), "t")],
                     "remove": [], "readVersion": 0}
            assert real_try(table, racer)
        return real_try(table, record)

    mgr._txn_try_commit = steal_with_overwrite
    try:
        with pytest.raises(ConcurrentWriteError, match="overwrite"):
            mgr.txn_append(spark.range(10, 14), "t")
    finally:
        mgr._txn_try_commit = real_try


def test_overwrite_racing_anything_conflicts_loudly(spark, tmp_path):
    """An overwrite NEVER retries: any commit after its snapshot makes
    its remove-set stale."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")
    real_try = mgr._txn_try_commit
    stolen = {"done": False}

    def steal_once(table, record):
        if not stolen["done"]:
            stolen["done"] = True
            racer = {"version": record["version"], "op": "append",
                     "add": [mgr._txn_write_data(spark.range(5), "t")],
                     "readVersion": 0}
            assert real_try(table, racer)
        return real_try(table, record)

    mgr._txn_try_commit = steal_once
    try:
        with pytest.raises(ConcurrentWriteError, match="conflicts"):
            mgr.txn_overwrite(spark.range(9), "t")
    finally:
        mgr._txn_try_commit = real_try


def test_append_never_lands_above_overwrite_committed_mid_retry(
    spark, tmp_path
):
    """r7 advisory (medium): the exact lost-append window — append
    loses v_N to another APPEND, an OVERWRITE then takes v_{N+1}
    before the retry's claim. The old code's post-failure scan ran
    before the overwrite landed and its retry claimed v_{N+2}
    silently, resurrecting removed data; the reordered
    scan-after-version-compute must raise instead."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")  # v0
    real_try = mgr._txn_try_commit
    state = {"injected": False}

    def inject(table, record):
        if record["op"] == "append" and not state["injected"]:
            state["injected"] = True
            racer = {"version": record["version"], "op": "append",
                     "add": [mgr._txn_write_data(spark.range(5), "t")],
                     "readVersion": 0}
            assert real_try(table, racer)
            res = real_try(table, record)  # our claim loses
            assert res is False
            ow = {"version": record["version"] + 1, "op": "overwrite",
                  "add": [mgr._txn_write_data(spark.range(1), "t")],
                  "remove": [], "readVersion": record["version"]}
            assert real_try(table, ow)  # overwrite lands pre-retry
            return res
        return real_try(table, record)

    mgr._txn_try_commit = inject
    try:
        with pytest.raises(ConcurrentWriteError, match="overwrite"):
            mgr.txn_append(spark.range(10, 14), "t")
    finally:
        mgr._txn_try_commit = real_try
    # the overwrite's state is intact: only its single row is live
    assert mgr.txn_read("t").count() == 1


def test_vacuum_retention_spares_inflight_writer(spark, tmp_path):
    """r7 advisory (medium): a writer that has written its data dir
    but not yet claimed a version must survive txn_vacuum — only
    never-committed dirs OLDER than the retention window are treated
    as orphans. Superseded committed dirs drop at any age."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3).withColumnRenamed("id", "x"), "t")  # v0
    mgr.txn_overwrite(spark.range(2).withColumnRenamed("id", "x"), "t")  # v1

    # an in-flight writer: data written, claim not yet made
    inflight_rel = mgr._txn_write_data(
        spark.range(7, 9).withColumnRenamed("id", "x"), "t"
    )
    removed = mgr.txn_vacuum("t")  # default retention: 7 days (Delta's)
    # the superseded v0 dir is gone; the fresh in-flight dir is spared
    assert len(removed) == 1
    inflight_name = inflight_rel.split("/", 1)[1]
    assert inflight_name not in removed
    # ... so the in-flight writer can still commit, and its rows exist
    rec = {"version": 2, "op": "append", "add": [inflight_rel],
           "readVersion": 1}
    assert mgr._txn_try_commit("t", rec)
    assert mgr.txn_read("t").count() == 2 + 2

    # an ANCIENT never-committed dir (crashed writer) is reclaimed —
    # older than the 7-day default window (r8 advisory raised it from
    # 10 min: retention must exceed the longest possible write)
    orphan_rel = mgr._txn_write_data(spark.range(1), "t")
    orphan_path = f"{mgr.path('t')}/{orphan_rel}"
    old = time.time() - 8 * 24 * 3600
    os.utime(orphan_path, (old, old))
    removed2 = mgr.txn_vacuum("t")
    assert removed2 == [orphan_rel.split("/", 1)[1]]
    assert mgr.txn_read("t").count() == 4  # committed state untouched


def test_claim_backend_probe_fails_loudly_without_primitive(
    spark, tmp_path, monkeypatch, claim_impl
):
    """r7 verdict item #5: the claim primitive is a pluggable
    ClaimBackend with a capability probe — a filesystem where the
    backend's primitive doesn't work (hard links on object-store FUSE
    mounts; renameat2 on non-Linux/old kernels) must raise
    ClaimUnsupportedError, never degrade to a racy create."""
    from lakehouse_v3_spark.tables import (
        ClaimUnsupportedError,
        RenameNoReplaceClaim,
    )

    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")

    if claim_impl == "posix_link":
        def no_link(src, dst):
            raise OSError(38, "Function not implemented (hard links)")

        monkeypatch.setattr(os, "link", no_link)
    elif claim_impl == "rename_noreplace":
        def no_renameat2(self, src, dst):
            raise OSError(38, "Function not implemented (renameat2)")

        monkeypatch.setattr(
            RenameNoReplaceClaim, "_renameat2_noreplace", no_renameat2
        )
    else:
        import lakehouse_v3_spark.tables as T

        real_mkdir = os.mkdir

        def no_mkdir(path, *a, **kw):
            # only the CLAIM mkdir is "unsupported" — makedirs of the
            # log dir itself must keep working so the probe reaches the
            # primitive under test
            if str(path).endswith(".claim"):
                raise OSError(38, "Function not implemented (mkdir)")
            return real_mkdir(path, *a, **kw)

        monkeypatch.setattr(T.os, "mkdir", no_mkdir)
    with pytest.raises(ClaimUnsupportedError, match="conditional-put"):
        mgr.txn_append(spark.range(1), "t")


def test_claim_backend_is_injectable(spark, tmp_path):
    """A custom backend (the conditional-put seam) is used for every
    claim; the POSIX default stays untouched."""
    from lakehouse_v3_spark.tables import PosixLinkClaim

    calls = []

    class Recording(PosixLinkClaim):
        def put_if_absent(self, payload, final_path):
            calls.append(final_path)
            return super().put_if_absent(payload, final_path)

    mgr = TableManager(
        spark, str(tmp_path / "wh"), backend="parquet",
        claim_backend=Recording(),
    )
    mgr.txn_append(spark.range(2), "t")
    mgr.txn_overwrite(spark.range(1), "t")
    # both commits (+1 probe file) went through the injected backend
    assert sum(c.endswith(".json") for c in calls) == 2


def test_txn_read_merges_evolving_schema(spark, tmp_path):
    """S8's mergeSchema contract extends to the commit log: an append
    that adds a column evolves the table schema; earlier rows read the
    new column as NULL (Delta append semantics)."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3).selectExpr("id AS x"), "t")
    mgr.txn_append(
        spark.range(3, 5).selectExpr("id AS x", "id * 10 AS y"), "t"
    )
    df = mgr.txn_read("t")
    assert set(df.columns) == {"x", "y"}
    rows = {r.x: r.y for r in df.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: 30, 4: 40}


def test_txn_compact_loses_race_loudly_not_rows(spark, tmp_path):
    """r8 review finding: an append committed between compaction's
    read snapshot and its overwrite claim must make the compaction
    RAISE — never silently drop the append's committed rows. The
    overwrite is pinned to the read version, so the interloper taking
    read_version+1 defeats the claim."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(10), "t")  # v0
    real_write = mgr._txn_write_data
    injected = {"done": False}

    def write_then_interlope(df, table):
        rel = real_write(df, table)
        if not injected["done"]:
            injected["done"] = True
            # a concurrent append lands AFTER compact's snapshot but
            # BEFORE its claim (mid-rewrite)
            mgr._txn_write_data = real_write
            try:
                mgr.txn_append(spark.range(100, 105), "t")  # v1
            finally:
                mgr._txn_write_data = write_then_interlope
        return rel

    mgr._txn_write_data = write_then_interlope
    try:
        with pytest.raises(ConcurrentWriteError):
            mgr.txn_compact("t")
    finally:
        mgr._txn_write_data = real_write
    # nothing lost: both commits' rows remain live
    assert mgr.txn_read("t").count() == 15


def test_txn_compact_preserves_rows_and_history(spark, tmp_path):
    """OPTIMIZE on the commit log: fewer files, identical content, a
    real commit (pre-compaction versions stay time-travelable until
    vacuumed; version number advances)."""
    import os as _os

    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    for i in range(4):  # 4 appends → ≥4 data dirs, many small files
        mgr.txn_append(
            spark.range(i * 10, i * 10 + 10).repartition(4), "t"
        )
    assert mgr.txn_version("t") == 3

    def live_files():
        _, live = mgr._txn_state("t")
        return sum(
            1
            for rel in live
            for f in _os.listdir(f"{mgr.path('t')}/{rel}")
            if f.endswith(".parquet")
        )

    before = live_files()
    v = mgr.txn_compact("t")
    assert v == 4
    assert live_files() < before
    assert sorted(r.id for r in mgr.txn_read("t").collect()) == list(range(40))
    # pre-compaction state still readable (time travel)
    assert mgr.txn_read("t", version=3).count() == 40
    # and vacuum now reclaims the superseded small-file dirs
    removed = mgr.txn_vacuum("t")
    assert len(removed) == 4


def test_snapshot_head_commits_through_claim_backend(spark, tmp_path):
    """r8 verdict item #1 (second half): the snapshot HEAD move is a
    claimed head-log record through the SAME pluggable ClaimBackend as
    the txn log — ONE commit protocol, no os.replace side door. A
    recording backend must see every HEAD move (2 commits + 1
    restore), and the snapshot surface must behave identically."""
    from lakehouse_v3_spark.tables import PosixLinkClaim

    calls = []

    class Recording(PosixLinkClaim):
        def put_if_absent(self, payload, final_path):
            calls.append(final_path)
            return super().put_if_absent(payload, final_path)

    mgr = TableManager(
        spark, str(tmp_path / "wh"), backend="parquet",
        claim_backend=Recording(),
    )
    v0 = mgr.write_snapshot(spark.range(3), "t")
    v1 = mgr.write_snapshot(spark.range(5), "t")
    assert (v0, v1) == (0, 1)
    assert mgr.snapshot_version("t") == 1
    assert mgr.read_snapshot("t").count() == 5
    mgr.restore_snapshot("t", 0)
    assert mgr.snapshot_version("t") == 0
    assert mgr.read_snapshot("t").count() == 3
    # a post-restore write allocates ABOVE the retained max, as before
    v2 = mgr.write_snapshot(spark.range(7), "t")
    assert v2 == 2 and mgr.read_snapshot("t").count() == 7
    head_moves = [
        c for c in calls if "_head_log" in c and c.endswith(".json")
    ]
    assert len(head_moves) == 4  # 3 commits + 1 restore


def test_snapshot_head_lost_claim_raises(spark, tmp_path):
    """A HEAD-log seq stolen by a writer outside this host's snapshot
    flock (cross-host racer) defeats the claim and raises
    ConcurrentWriteError — never a silent clobber of the racer's HEAD
    move (the flock can't see other hosts; the claim can)."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.write_snapshot(spark.range(3), "t")  # seq 0
    real_put = mgr.claim_backend.put_if_absent
    stolen = {"done": False}

    def steal_seq(payload, final_path):
        # racer claims the SAME head-log seq in the head-read → claim
        # window (a cross-host writer the flock cannot serialize)
        if "_head_log" in final_path and not stolen["done"]:
            stolen["done"] = True
            assert real_put(b'{"seq": 1, "version": 0}', final_path)
        return real_put(payload, final_path)

    mgr.claim_backend.put_if_absent = steal_seq
    try:
        with pytest.raises(ConcurrentWriteError, match="HEAD"):
            mgr.write_snapshot(spark.range(5), "t")
    finally:
        mgr.claim_backend.put_if_absent = real_put
    # the racer's HEAD move survives untouched
    assert mgr.snapshot_version("t") == 0


# -- the two-OS-process acceptance test ----------------------------------

_WRITER_SCRIPT = textwrap.dedent(
    """
    import sys, time
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F
    from lakehouse_v3_spark.tables import (
        TableManager, ConcurrentWriteError, PosixLinkClaim,
        RenameNoReplaceClaim, ConditionalPutClaim,
    )

    wh, marker, mode, claim_name = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    )
    claim = {{"posix_link": PosixLinkClaim,
              "rename_noreplace": RenameNoReplaceClaim,
              "conditional_put": ConditionalPutClaim}}[claim_name]()
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    mgr = TableManager(spark, wh, backend="parquet", claim_backend=claim)

    if mode == "append":
        # 4 batches of 50 rows each, marker-tagged
        for b in range(4):
            df = (spark.range(50)
                  .select(F.lit(marker + "-" + str(b)).alias("batch"),
                          F.col("id")))
            v = mgr.txn_append(df, "t")
            print("committed", marker, b, "as v", v, flush=True)
        print("APPENDER_OK", flush=True)
    else:  # conflicted overwrite: snapshot, wait for an append, commit
        real = mgr._txn_write_data
        def slow_write(df, table):
            rel = real(df, table)
            # wait until the other process has committed something
            # beyond our read snapshot
            base = mgr.txn_version("t")
            for _ in range(600):
                if mgr.txn_version("t") != base:
                    break
                time.sleep(0.1)
            return rel
        mgr._txn_write_data = slow_write
        try:
            mgr.txn_overwrite(spark.range(1).select(
                F.lit("ow").alias("batch"), F.col("id")), "t")
            print("OVERWRITE_LANDED", flush=True)
        except ConcurrentWriteError as e:
            print("CONFLICT_RAISED:", type(e).__name__, flush=True)
    spark.stop()
    """
)


def test_two_process_appends_conflict_and_reads(spark, tmp_path, claim_impl):
    """THE acceptance test: two separate OS processes append
    concurrently (all 8 batches land exactly-once via claim retries), a
    third process's overwrite whose snapshot went stale raises
    ConcurrentWriteError, and this process reads concurrently
    throughout without ever observing a torn batch (every visible
    batch has all 50 rows). Runs once per ClaimBackend (the
    cross-process races are exactly what the claim primitive exists
    for — both implementations must survive them)."""
    wh = str(tmp_path / "wh")
    mgr = TableManager(spark, wh, backend="parquet")
    mgr.txn_append(
        spark.range(50).selectExpr("'seed-0' AS batch", "id"), "t"
    )

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _WRITER_SCRIPT.format(repo=REPO_DIR), wh, m, "append",
             claim_impl],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for m in ("alpha", "beta")
    ]
    conflicted = subprocess.Popen(
        [sys.executable, "-c",
         _WRITER_SCRIPT.format(repo=REPO_DIR), wh, "gamma", "overwrite",
         claim_impl],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )

    # concurrent reader: no torn batches, version never goes backwards
    deadline = time.time() + 240
    last_version = -1
    try:
        while any(p.poll() is None for p in procs) and time.time() < deadline:
            v = mgr.txn_version("t")
            assert v >= last_version, "committed version went backwards"
            last_version = v
            counts = {
                r["batch"]: r["n"]
                for r in mgr.txn_read("t")
                .groupBy("batch").agg(F_count())
                .collect()
            }
            assert all(n == 50 for n in counts.values()), (
                f"torn read: {counts}"
            )
            time.sleep(0.3)
    finally:
        outs = [p.communicate(timeout=240) for p in procs]
        c_out, c_err = conflicted.communicate(timeout=240)

    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, err[-2000:]
        assert "APPENDER_OK" in out
    assert "CONFLICT_RAISED: ConcurrentWriteError" in c_out, (
        c_out + c_err[-2000:]
    )

    # all 9 batches (1 seed + 2×4) landed exactly once, 50 rows each
    final = {
        r["batch"]: r["n"]
        for r in mgr.txn_read("t").groupBy("batch").agg(F_count()).collect()
    }
    assert len(final) == 9, sorted(final)
    assert all(n == 50 for n in final.values())
    # versions are contiguous 0..8 (every claim resolved)
    assert mgr.txn_version("t") == 8


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1)).alias("n")


_SNAPSHOT_WRITER_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F
    from lakehouse_v3_spark.tables import (
        TableManager, PosixLinkClaim, RenameNoReplaceClaim,
        ConditionalPutClaim,
    )

    wh, marker, claim_name = sys.argv[1], sys.argv[2], sys.argv[3]
    claim = {{"posix_link": PosixLinkClaim,
              "rename_noreplace": RenameNoReplaceClaim,
              "conditional_put": ConditionalPutClaim}}[claim_name]()
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    mgr = TableManager(spark, wh, backend="parquet", claim_backend=claim)
    for b in range(3):
        df = spark.range(10).select(
            F.lit(marker + "-" + str(b)).alias("batch"), F.col("id"))
        v = mgr.write_snapshot(df, "t")
        print("snap", marker, b, "as v", v, flush=True)
    print("SNAPSHOTTER_OK", flush=True)
    spark.stop()
    """
)


def test_two_process_snapshot_writers_serialize(spark, tmp_path, claim_impl):
    """The claimed HEAD-log protocol under REAL cross-process
    concurrency (both ClaimBackends): two OS processes each commit 3
    snapshots of the same table. Versions must come out dense (0..5,
    no clobbers, no holes), the HEAD log's seq records dense, HEAD
    must point at a retained version, and every retained version must
    be a complete readable table."""
    wh = str(tmp_path / "wh")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _SNAPSHOT_WRITER_SCRIPT.format(repo=REPO_DIR), wh, m,
             claim_impl],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=dict(os.environ),
        )
        for m in ("alpha", "beta")
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, err[-2000:]
        assert "SNAPSHOTTER_OK" in out

    mgr = TableManager(spark, wh, backend="parquet")
    assert mgr.snapshot_history("t") == [0, 1, 2, 3, 4, 5]
    head = mgr.snapshot_version("t")
    assert head in mgr.snapshot_history("t")
    # head-log seq records are dense (every HEAD move was a clean claim)
    log_dir = mgr._head_log_dir("t")
    seqs = sorted(
        int(e.name[:-5]) for e in os.scandir(log_dir)
        if e.name.endswith(".json")
    )
    assert seqs == list(range(6)), seqs
    # every retained version reads back complete (10 rows, one batch)
    for v in mgr.snapshot_history("t"):
        df = mgr.read_snapshot("t", v)
        assert df.count() == 10
        assert df.select("batch").distinct().count() == 1


def test_legacy_head_pointer_still_resolves(spark, tmp_path):
    """Back-compat (r9 review): a warehouse written before the claimed
    head log used a single _HEAD pointer file — it must keep resolving,
    and the next commit must supersede it through the log."""
    import json as _json

    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    # forge the pre-migration layout: version dirs + _HEAD, no head log
    snap = mgr._snap_dir("t")
    for v, n in ((0, 3), (1, 5)):
        spark.range(n).write.parquet(f"{snap}/v{v}")
    with open(f"{snap}/_HEAD", "w", encoding="utf-8") as f:
        _json.dump({"version": 1}, f)
    assert mgr.snapshot_version("t") == 1
    assert mgr.read_snapshot("t").count() == 5
    mgr.restore_snapshot("t", 0)  # first claimed HEAD move (seq 0)
    assert mgr.snapshot_version("t") == 0
    v2 = mgr.write_snapshot(spark.range(7), "t")
    assert v2 == 2 and mgr.read_snapshot("t").count() == 7


def test_vacuum_snapshots_compacts_head_log(spark, tmp_path):
    """The append-only HEAD log must not grow without bound:
    vacuum_snapshots keeps only the top-TWO records (max-seq is the one
    _head_record reads; max-1 widens the lockless-reader race window —
    r9 ADVICE), and subsequent commits continue above them."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    for i in range(4):
        mgr.write_snapshot(spark.range(i + 1), "t")
    d = mgr._head_log_dir("t")
    assert sum(n.endswith(".json") for n in os.listdir(d)) == 4
    mgr.vacuum_snapshots("t", keep_last=2)
    logs = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    assert logs == [f"{2:020d}.json", f"{3:020d}.json"]
    # marker-based backends: compacted records take their claim markers
    # with them (bounded log, any backend)
    assert sum(n.endswith(".claim") for n in os.listdir(d)) <= 2
    assert mgr.snapshot_version("t") == 3
    assert mgr.write_snapshot(spark.range(9), "t") == 4  # seq continues
    assert mgr.snapshot_version("t") == 4


def test_head_record_retries_on_compacted_max(spark, tmp_path, monkeypatch):
    """r9 ADVICE (medium): a lockless reader's listed max-seq record can
    be unlinked between scandir and open by a concurrent commit +
    head-log compaction. _head_record must re-scan (a vanished max
    implies a NEWER record exists), never crash with FileNotFoundError."""
    import lakehouse_v3_spark.tables as T

    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.write_snapshot(spark.range(3), "t")  # seq 0
    mgr.write_snapshot(spark.range(5), "t")  # seq 1
    d = mgr._head_log_dir("t")

    real_scandir = os.scandir
    state = {"raced": False}

    class FakeEntry:
        name = f"{99:020d}.json"  # listed, then "compacted away"

    def racing_scandir(path, *a, **kw):
        entries = list(real_scandir(path, *a, **kw))
        if os.path.abspath(str(path)) == os.path.abspath(d) and not state["raced"]:
            state["raced"] = True
            entries.append(FakeEntry())  # stale listing: max vanishes
        return iter(entries)

    monkeypatch.setattr(T.os, "scandir", racing_scandir)
    head = mgr._head_record("t")
    assert state["raced"] and head == {"seq": 1, "version": 1}


def test_claim_probe_is_per_directory(spark, tmp_path):
    """r9 ADVICE (low): the capability probe must run once per claim
    DIRECTORY, not once per TableManager — tables (and the snapshot
    head-log vs txn-log dirs) can span mounts with different claim
    support."""
    from lakehouse_v3_spark.tables import PosixLinkClaim

    probed = []

    class Recording(PosixLinkClaim):
        def probe(self, directory):
            probed.append(directory)
            return super().probe(directory)

    mgr = TableManager(
        spark, str(tmp_path / "wh"), backend="parquet",
        claim_backend=Recording(),
    )
    mgr.txn_append(spark.range(1), "t1")        # txn-log dir of t1
    mgr.txn_append(spark.range(1), "t1")        # same dir: no new probe
    mgr.txn_append(spark.range(1), "t2")        # txn-log dir of t2
    mgr.write_snapshot(spark.range(1), "t1")    # head-log dir of t1
    assert len(probed) == 3 and len(set(probed)) == 3
    assert mgr._txn_log_dir("t1") in probed
    assert mgr._txn_log_dir("t2") in probed
    assert mgr._head_log_dir("t1") in probed


def test_lost_head_claim_removes_uncommitted_vdir(spark, tmp_path):
    """r9 ADVICE (low): when write_snapshot's HEAD commit loses the
    claim, the just-renamed version dir was never published — it must
    not linger in snapshot_history (time travel serving uncommitted
    data) nor count toward vacuum's keep_last."""
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.write_snapshot(spark.range(3), "t")  # v0, seq 0
    real_put = mgr.claim_backend.put_if_absent
    stolen = {"done": False}

    def steal_seq(payload, final_path):
        if "_head_log" in final_path and not stolen["done"]:
            stolen["done"] = True
            assert real_put(b'{"seq": 1, "version": 0}', final_path)
        return real_put(payload, final_path)

    mgr.claim_backend.put_if_absent = steal_seq
    try:
        with pytest.raises(ConcurrentWriteError, match="HEAD"):
            mgr.write_snapshot(spark.range(5), "t")
    finally:
        mgr.claim_backend.put_if_absent = real_put
    # the never-committed v1 is gone: not readable, not in history
    assert mgr.snapshot_history("t") == [0]
    with pytest.raises(Exception):
        mgr.read_snapshot("t", version=1).count()
    # and the next write re-allocates version 1 cleanly
    assert mgr.write_snapshot(spark.range(7), "t") == 1
    assert mgr.read_snapshot("t").count() == 7


# -- conditional-put (mock object store) fault injection ------------------


def test_conditional_put_visibility_lag_is_safe(spark, tmp_path, claim_impl):
    """r9 verdict item #5: the object-store failure mode the POSIX
    backends cannot express — the conditional PUT is ACKNOWLEDGED
    (claim decided) while the object lags out of listings. A competing
    appender keeps targeting the invisible version and losing its
    claim; once the object publishes, it lands exactly-once ABOVE it.
    No version is ever double-claimed, no reader sees a torn record."""
    import threading

    from lakehouse_v3_spark.tables import ConditionalPutClaim

    if claim_impl != "conditional_put":
        pytest.skip("backend-specific fault injection")
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")  # v0

    # racer: claims v1 through a LAGGY backend (ack now, publish late)
    laggy = ConditionalPutClaim(visibility_delay_s=0.6)
    racer_rel = mgr._txn_write_data(spark.range(100, 105), "t")
    rec = {"version": 1, "op": "append", "add": [racer_rel],
           "readVersion": 0}
    payload = __import__("json").dumps(rec).encode()
    racer = threading.Thread(
        target=lambda: laggy.put_if_absent(
            payload, mgr._txn_commit_path("t", 1)
        )
    )
    racer.start()
    time.sleep(0.1)  # claim marker is down, object not yet visible
    # competing append: loses the claim on invisible v1 until it
    # publishes, then retries onto v2 — exactly-once
    v = mgr.txn_append(spark.range(10, 14), "t", max_retries=200_000)
    racer.join()
    assert v == 2
    assert mgr.txn_version("t") == 2
    assert mgr.txn_read("t").count() == 3 + 5 + 4  # racer's rows landed too


def test_conditional_put_crash_window_fails_loudly(
    spark, tmp_path, claim_impl
):
    """The mock's disclosed crash window (claim marker down, object
    never published — real S3 makes both one conditional PUT): the
    orphaned claim must make competing appends fail LOUDLY after their
    retry budget, never double-claim or corrupt the log."""
    from lakehouse_v3_spark.tables import ConditionalPutClaim

    if claim_impl != "conditional_put":
        pytest.skip("backend-specific fault injection")
    mgr = TableManager(spark, str(tmp_path / "wh"), backend="parquet")
    mgr.txn_append(spark.range(3), "t")  # v0

    class Crash(RuntimeError):
        pass

    crasher = ConditionalPutClaim(
        on_claimed=lambda path: (_ for _ in ()).throw(Crash("died"))
    )
    with pytest.raises(Crash):
        crasher.put_if_absent(b"{}", mgr._txn_commit_path("t", 1))
    # v1 is claimed forever but never published: appends stall, then
    # raise — the log itself stays clean (v0 only, every record parses)
    with pytest.raises(ConcurrentWriteError, match="lost the commit race"):
        mgr.txn_append(spark.range(5), "t", max_retries=10)
    assert mgr.txn_version("t") == 0
    assert mgr.txn_read("t").count() == 3
