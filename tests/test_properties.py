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


# ---------------------------------------------------------------------------
# Audit engine properties (round-3 verdict item 7): arbitrary rule strings,
# dirty tables, unicode PKs, empty / all-violating tables — status encoding,
# cap-999 semantics, one-scan-per-table behavior.
# ---------------------------------------------------------------------------

_pk_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=8
)
_cell = st.one_of(st.none(), st.sampled_from(["", " ", "  ", "\t", "x", "é", "ok"]), _pk_text)
_dirty_rows = st.lists(st.tuples(_pk_text, _cell, _cell), max_size=15)


def _expected_completeness_violations(rows):
    """Model of completeness_violation_predicate: NULL or blank after
    trimming SPACES (Spark trim strips ' ' only, not all whitespace)."""
    return [
        pk
        for pk, a, b in rows
        if a is None or a.strip(" ") == "" or b is None or b.strip(" ") == ""
    ]


@given(rows=_dirty_rows)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_audit_completeness_matches_model(spark, rows):
    """For ANY dirty table (nulls, blanks, unicode pks): status encodes
    exactly (1 iff zero violations), the violation count matches a plain
    Python model, and pk_result is the sorted violated-pk sample."""
    import json

    from lakehouse_v3_spark.audit.config import CompletenessRule
    from lakehouse_v3_spark.audit.engine import run_completeness_rules

    df = spark.createDataFrame(rows or [("", "x", "x")][:0], "pk string, a string, b string")
    res = run_completeness_rules(
        spark,
        {"t": df},
        [CompletenessRule(rule_id=1, table="t", mandatory_columns=("a", "b"), pk_columns=("pk",))],
    ).collect()
    assert len(res) == 1
    checked = json.loads(res[0].ds_checked_value)
    expected = sorted(_expected_completeness_violations(rows))
    assert checked["number_of_violated_rows"] == len(expected)
    assert checked["pk_result"] == expected[:999]
    assert res[0].nr_status == (1 if not expected else 0)


@given(vals=st.lists(st.integers(min_value=-50, max_value=50), max_size=20),
       garbage=st.text(max_size=25))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_audit_validity_arbitrary_rule_strings(spark, vals, garbage):
    """ANY rule string must produce a result row with status in {1,0,-1}
    and never abort the run; a known-good rule evaluated alongside the
    arbitrary one keeps its exact count (rule isolation)."""
    import json

    from lakehouse_v3_spark.audit.config import ValidityRule
    from lakehouse_v3_spark.audit.engine import run_validity_rules

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)] or [(0, 0)][:0],
                               "pk long, v long")
    res = {
        json.loads(r.ds_configuration)["rule_id"]: r
        for r in run_validity_rules(
            spark,
            {"t": df},
            [
                ValidityRule(rule_id=1, table="t", validation_rule="v < 0", pk_columns=("pk",)),
                ValidityRule(rule_id=2, table="t", validation_rule=garbage, pk_columns=("pk",)),
            ],
        ).collect()
    }
    assert set(res) == {1, 2}
    assert all(r.nr_status in (1, 0, -1) for r in res.values())
    neg = sorted(str(i) for i, v in enumerate(vals) if v < 0)
    good = json.loads(res[1].ds_checked_value)
    assert good["number_of_violated_rows"] == len(neg)
    assert good["pk_result"] == neg[:999]
    bad = json.loads(res[2].ds_checked_value)
    if res[2].nr_status == -1:
        assert bad["number_of_violated_rows"] == -1 and bad["note"]


def test_audit_empty_all_violating_and_cap(spark):
    """Empty table → PASS with empty sample; 1200/1200 violating → FAIL
    with EXACTLY the 999 lexicographically-smallest pks; unevaluable rule
    on the same table → ERROR without disturbing the good rule."""
    import json

    from lakehouse_v3_spark.audit.config import ValidityRule
    from lakehouse_v3_spark.audit.engine import run_validity_rules

    empty = spark.createDataFrame([], "pk string, v long")
    big = spark.range(1200).selectExpr("format_string('pk%04d', CAST(id AS INT)) AS pk",
                                       "id AS v")
    res = run_validity_rules(
        spark,
        {"empty": empty, "big": big},
        [
            ValidityRule(rule_id=10, table="empty", validation_rule="v IS NOT NULL",
                         pk_columns=("pk",)),
            ValidityRule(rule_id=11, table="big", validation_rule="v >= 0",
                         pk_columns=("pk",)),
            ValidityRule(rule_id=12, table="big", validation_rule="NOT A ;;; RULE",
                         pk_columns=("pk",)),
        ],
    ).collect()
    by_id = {json.loads(r.ds_configuration)["rule_id"]: r for r in res}
    assert by_id[10].nr_status == 1
    assert json.loads(by_id[10].ds_checked_value)["pk_result"] == []
    c11 = json.loads(by_id[11].ds_checked_value)
    assert by_id[11].nr_status == 0 and c11["number_of_violated_rows"] == 1200
    assert c11["pk_result"] == [f"pk{i:04d}" for i in range(999)]
    assert by_id[12].nr_status == -1


def test_audit_one_scan_per_table(spark):
    """N rules on one table read each input row exactly ONCE (the
    reference loops one spark.sql job per rule; this engine folds all of
    a table's rules into a single conditional-aggregation scan).
    Measured with an accumulator-instrumented source, not job counts
    (AQE splits one query into several jobs)."""
    import json

    from lakehouse_v3_spark.audit.config import ValidityRule
    from lakehouse_v3_spark.audit.engine import run_validity_rules

    acc = spark.sparkContext.accumulator(0)

    def count_rows(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    n = 500
    df = spark.range(n).selectExpr("CAST(id AS STRING) AS pk", "id AS v") \
        .mapInPandas(count_rows, "pk string, v long")
    rules = [
        ValidityRule(rule_id=i, table="t", validation_rule=f"v % 7 = {i}", pk_columns=("pk",))
        for i in range(5)
    ]
    res = run_validity_rules(spark, {"t": df}, rules).collect()
    assert acc.value == n, f"expected one scan ({n} rows), saw {acc.value}"
    for r in res:
        rid = json.loads(r.ds_configuration)["rule_id"]
        expect = sorted(str(i) for i in range(n) if i % 7 == rid)
        got = json.loads(r.ds_checked_value)
        assert got["number_of_violated_rows"] == len(expect)
        assert got["pk_result"] == expect[:999]


# ---------------------------------------------------------------------------
# operators/quantiles.exact_percentiles ≡ builtin percentile, bit-exact
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-10_000, max_value=10_000).map(lambda c: c / 100),
            st.sampled_from([0.0, 1.5, 1.5, 1.5, -3.25]),  # duplicate mass
        ),
        min_size=1,
        max_size=120,
    ),
    ps=st.lists(
        st.integers(min_value=0, max_value=100).map(lambda i: i / 100),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_percentiles_bitexact_vs_builtin(spark, vals, ps):
    """The distributed histogram-refinement selection returns the SAME
    doubles as Spark's single-reducer percentile aggregate — including
    interpolated positions (weighted-sum formula) and duplicate-heavy
    inputs — with tiny refinement knobs so multi-level narrowing
    actually executes on these small inputs."""
    from lakehouse_v3_spark.operators.quantiles import exact_percentiles

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_percentiles(
        df, "x", ps, n_buckets=4, collect_threshold=3, max_levels=12
    )
    want = list(
        df.agg(
            F.expr(
                f"percentile(x, array({','.join(str(p) for p in ps)}))"
            ).alias("b")
        ).collect()[0]["b"]
    )
    assert got == want, (got, want, sorted(vals), ps)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.integers(min_value=-10_000, max_value=10_000).map(
                    lambda c: c / 100
                ),
                st.sampled_from([0.0, 1.5, 1.5, -3.25]),  # duplicate mass
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    ps=st.lists(
        st.integers(min_value=0, max_value=100).map(lambda i: i / 100),
        min_size=1,
        max_size=3,
    ),
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_group_percentiles_bitexact_vs_builtin(spark, rows, ps):
    """The grouped refinement engine (one shared histogram job per
    level for ALL groups — r10 verdict item #6) returns the SAME
    doubles as the per-group builtin percentile aggregate, even when
    group value ranges overlap (the per-range final segmentation the
    single-column path never exercised)."""
    from lakehouse_v3_spark.operators.quantiles import exact_group_percentiles

    df = spark.createDataFrame(rows, "g string, x double")
    got = exact_group_percentiles(
        df, "g", "x", ps, n_buckets=4, collect_threshold=3, max_levels=12
    )
    want_rows = (
        df.groupBy("g")
        .agg(
            F.expr(
                f"percentile(x, array({','.join(str(p) for p in ps)}))"
            ).alias("b"),
            F.count("x").alias("n"),
        )
        .collect()
    )
    want = {r["g"]: (list(r["b"]), r["n"]) for r in want_rows}
    assert got == want, (got, want, sorted(rows), ps)


def test_exact_percentiles_empty_and_constant(spark):
    from lakehouse_v3_spark.operators.quantiles import exact_percentiles

    empty = spark.createDataFrame([], "x double")
    assert exact_percentiles(empty, "x", [0.5]) == [None]
    const = spark.createDataFrame([(7.25,)] * 50, "x double")
    assert exact_percentiles(const, "x", [0.1, 0.9], n_buckets=4) == [7.25, 7.25]


def test_exact_percentiles_ulp_adjacent_underflow(spark):
    """Width-underflow ranges spanning several ADJACENT doubles must
    resolve each rank to its true value, not collapse to the range's
    lower bound (ADVICE r3: the old path assumed one value per
    underflowed range). Values a few ulps apart with heavy duplication
    force (vhi-vlo)/n_buckets to underflow while >collect_threshold
    rows survive, exercising _resolve_underflowed."""
    import math as _math

    from lakehouse_v3_spark.operators.quantiles import exact_percentiles

    v0 = 1.0e9
    vs = [v0]
    for _ in range(4):
        vs.append(_math.nextafter(vs[-1], _math.inf))
    # 40 rows per distinct adjacent double, plus outliers so the first
    # level has a wide range that narrows onto the dense cluster.
    vals = [v for v in vs for _ in range(40)] + [-1.0e9, 3.0e9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = exact_percentiles(df, "x", ps, n_buckets=4, collect_threshold=3, max_levels=60)
    want = list(
        df.agg(
            F.expr(f"percentile(x, array({','.join(str(p) for p in ps)}))").alias("b")
        ).collect()[0]["b"]
    )
    assert got == want, (got, want)


def test_exact_percentiles_clamped_child_membership(spark):
    """Rank bookkeeping survives values that floor one bucket outside
    their recomputed child bounds (ADVICE r3: missing lower clamp made
    sub-bucket -1 alias into the previous range's top bucket). Dense
    irrational-spaced values around many bucket boundaries over several
    refinement levels make off-by-one-ulp floors likely; the result
    must stay bit-identical to the builtin."""
    from lakehouse_v3_spark.operators.quantiles import exact_percentiles

    vals = [(-1) ** i * (i * 0.1 + i * i * 1e-7) for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.01, 0.125, 0.5, 0.875, 0.99]
    got = exact_percentiles(df, "x", ps, n_buckets=3, collect_threshold=5, max_levels=40)
    want = list(
        df.agg(
            F.expr(f"percentile(x, array({','.join(str(p) for p in ps)}))").alias("b")
        ).collect()[0]["b"]
    )
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# connected_components ≡ driver-side union-find on arbitrary graphs
# ---------------------------------------------------------------------------


@given(
    n=st.integers(min_value=1, max_value=40),
    edge_picks=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=60
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, n, edge_picks):
    """Pointer-jumping CC must assign every node the MIN reachable id,
    exactly like a sequential union-find — on arbitrary random graphs
    including self-loops, duplicate edges, and isolated nodes. (The
    same check validated the sf1 run where the recursive-CTE oracle is
    intractable; here it's a permanent property.)"""
    from lakehouse_v3_spark.plans.scale_extras import connected_components

    edges_py = [(a % n, b % n) for a, b in edge_picks]
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges_py:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    expect = {v: find(v) for v in range(n)}

    nodes = spark.range(n).select(F.col("id").cast("long").alias("id"))
    if edges_py:
        edges = spark.createDataFrame(edges_py, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges, "id").collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# oracle_harness.compare_frames — nullable-dtype robustness
# ---------------------------------------------------------------------------


def test_compare_frames_nullable_float64_na():
    """The float fast path must tolerate pandas nullable Float64 with
    pd.NA (ADVICE r3: to_numpy(dtype=float) raised there, failing the
    compare with an exception instead of comparing): NA↔None matches,
    and real value mismatches are still reported."""
    import pandas as pd

    from lakehouse_v3_spark.oracle_harness import compare_frames

    a = pd.DataFrame({"x": pd.array([1.0, pd.NA, 3.0], dtype="Float64")})
    b = pd.DataFrame({"x": [1.0, None, 3.0]})
    assert compare_frames(a, b) == []
    b2 = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    assert compare_frames(a, b2) != []


def test_compare_frames_key_separator_no_digit_collision():
    """Regression (r6, found at sf1 on connected components): the row
    sort key joined columns with "\\x00", which numpy's fixed-width
    unicode scalar conversion strips — ("23","9239") and ("239","239")
    collided to the same key, misaligning rows into FALSE mismatches.
    Equal multisets in different input orders must always compare []."""
    import pandas as pd

    from lakehouse_v3_spark.oracle_harness import compare_frames

    a = pd.DataFrame(
        {"vec_id": [2392, 9239, 239, 9304], "component": [2392, 23, 239, 23]}
    )
    b = a.iloc[[2, 0, 3, 1]].reset_index(drop=True)
    assert compare_frames(a, b) == []
    # and genuinely different values must still fail
    c = b.copy()
    c.loc[0, "component"] = 999
    assert compare_frames(a, c) != []
