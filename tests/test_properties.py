"""Property-based tests (hypothesis): operator laws that must hold for
ANY input, not just the fixture shapes — merge-upsert algebra and as-of
join vs a brute-force per-row reference. Small example counts because
every example is a real Spark job; the properties, not the volume, are
the point."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

kv_dicts = st.dictionaries(
    st.integers(min_value=0, max_value=30), st.integers(min_value=-5, max_value=5),
    max_size=12,
)


@given(target=kv_dicts, source=kv_dicts)
@settings(**_SETTINGS)
def test_merge_upsert_laws(spark, target, source):
    """MERGE laws: keys(result) = keys(target) ∪ keys(source); source
    wins on conflict; applying the same source twice is idempotent."""
    from lakehouse_v3_spark.operators.joins import merge_upsert

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [(None, None)], "k int, v int"
        ).filter(F.col("k").isNotNull())

    merged = merge_upsert(df_of(target), df_of(source), ["k"])
    got = {r.k: r.v for r in merged.collect()}
    assert got == {**target, **source}

    again = merge_upsert(merged.select("k", "v"), df_of(source), ["k"])
    assert {r.k: r.v for r in again.collect()} == got


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=99),  # payload
    ),
    max_size=16,
)


@given(left=events, right=events)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """As-of join ≡ per-row brute force: for every left row, the right
    row with the greatest ts ≤ left.ts within the same key (ties broken
    by the operator's documented tie_break ordering)."""
    from lakehouse_v3_spark.operators.joins import asof_join

    def df_of(rows, pre):
        return spark.createDataFrame(
            [(k, t, p) for k, t, p in rows] or [(None, None, None)],
            f"k int, ts int, {pre}p int",
        ).filter(F.col("k").isNotNull())

    out = asof_join(
        df_of(left, ""),
        df_of(right, "r"),
        by=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "rp"],
        tie_break="rp",
        prefix="m_",
    )
    got = {
        (r.k, r.ts, r.p): (r.m_ts, r.m_rp)
        for r in out.collect()
    }
    # brute force in plain python
    for k, t, p in left:
        cands = [(rt, rp) for rk, rt, rp in right if rk == k and rt <= t]
        expect = max(cands, key=lambda c: (c[0], c[1])) if cands else (None, None)
        assert got[(k, t, p)] == expect, (k, t, p, cands)
    assert len(got) == len({(k, t, p) for k, t, p in left})


@given(left=events, right=events)
@settings(**_SETTINGS)
def test_range_join_matches_bruteforce(spark, left, right):
    """Bucketized range join ≡ brute-force theta join: all (l, r) pairs
    in the same key with l.ts <= r.ts < l.ts + W, regardless of how the
    rows fall across bucket boundaries (the 2-bucket probe must never
    miss a pair)."""
    from lakehouse_v3_spark.operators.joins import range_join

    W = 7  # seconds — deliberately not aligned with the generated ts grid

    def df_of(rows, pre):
        return spark.createDataFrame(
            [(k, t, p) for k, t, p in rows] or [(None, None, None)],
            f"k int, {pre}ti int, {pre}p int",
        ).filter(F.col("k").isNotNull()).select(
            "k",
            F.timestamp_micros(F.col(f"{pre}ti").cast("long") * 1_000_000).alias(f"{pre}ts"),
            f"{pre}ti",
            f"{pre}p",
        )

    out = range_join(
        df_of(left, ""),
        df_of(right, "r"),
        by=["k"],
        left_ts="ts",
        right_ts="rts",
        window_micros=W * 1_000_000,
    )
    got = sorted((r.k, r.ti, r.p, r.rti, r.rp) for r in out.collect())
    expect = sorted(
        (lk, lt, lp, rt, rp)
        for lk, lt, lp in left
        for rk, rt, rp in right
        if lk == rk and lt <= rt < lt + W
    )
    assert got == expect


versions = st.dictionaries(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=3),
    max_size=10,
)


@given(old=versions, new=versions)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_snapshot_diff_classifies_any_version_pair(spark, tmp_path_factory, old, new):
    """CDC law: for ANY two versions, snapshot_diff emits exactly the
    inserts (new-only keys), deletes (old-only keys), and updates
    (changed values) — and nothing for unchanged keys."""
    from lakehouse_v3_spark.tables import TableManager

    tm = TableManager(spark, str(tmp_path_factory.mktemp("wh")))

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [(None, None)], "k int, v int"
        ).filter(F.col("k").isNotNull())

    tm.write_snapshot(df_of(old), "p.t")
    tm.write_snapshot(df_of(new), "p.t")
    got = {r.k: r.change_type for r in tm.snapshot_diff("p.t", 0, 1, ["k"]).collect()}
    expect = {}
    for k in old.keys() | new.keys():
        if k not in new:
            expect[k] = "delete"
        elif k not in old:
            expect[k] = "insert"
        elif old[k] != new[k]:
            expect[k] = "update"
    assert got == expect
