"""Dedup queries on the documents table: exact content dedup, MinHash+LSH
near-dup (bucketed candidates + exact jaccard verify), direct n-gram
jaccard, SimHash signatures.

The DuckDB oracle SQL is partially GENERATED from the same constants as
the Spark operators (operators/dedup.py MINHASH_SEEDS etc.) so both
engines compute identical md5-derived hashes — the oracle is a true
independent re-execution, not a stub.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import functions as F

from ..functions.text import tokens
from ..io_utils import load
from ..partitioning import fan_out_scan
from ..operators.dedup import (
    BAND_SIZE,
    MINHASH_PRIME,
    MINHASH_SEEDS,
    doc_shingle_sets,
    exact_dedup_groups,
    jaccard_verify,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash16,
    word_shingles,
)
from . import register

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"
_MD5_8 = "(('0x' || substr(md5(shingle), 1, 8))::BIGINT % {p})".format(p=MINHASH_PRIME)


# ---------------------------------------------------------------------------
# Exact dedup by normalized-content hash
# ---------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                  ' +', ' ', 'g'))) AS content_key,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*)    AS n_dups
FROM documents
GROUP BY 1
"""


@register("dedup_exact_content", oracle=_EXACT_ORACLE)
def dedup_exact_content(spark, sf_dir):
    """Exact dedup via hash-groupBy on normalized content — the
    deterministic form of the reference's dropDuplicates (A14,
    uber/drop_dup.py:58-65): one keeper (min id) per content hash.
    Scales as a single shuffle on the 32-byte hash key."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " ")
    )
    return exact_dedup_groups(d, "doc_id", F.sha2(norm, 256))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (unigram shingles → signatures → bands →
# candidate pairs → exact jaccard verify → top pairs)
# ---------------------------------------------------------------------------

def _minhash_oracle() -> str:
    sig_lines = ",\n    ".join(
        f"MIN(({a} * {_MD5_8} + {b}) % {MINHASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_SEEDS)
    )
    n_bands = len(MINHASH_SEEDS) // BAND_SIZE
    band_items = ",\n     ".join(
        "concat_ws('|', '%d', %s)"
        % (b, ", ".join(f"mh{b * BAND_SIZE + r}::VARCHAR" for r in range(BAND_SIZE)))
        for b in range(n_bands)
    )
    # 2-gram shingles: with unigram shingles this corpus's shared vocab
    # makes every signature identical → one giant LSH bucket → the n²
    # candidate blow-up LSH exists to avoid (bench: 157 s). Bigrams keep
    # buckets small and candidates sparse.
    shingles = (
        f"list_transform(range(1, greatest(len({_TOKS}) - 1, 0) + 1), "
        f"i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1]))"
    )
    return f"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
),
sets AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({shingles})) AS shingle
  FROM reps
),
sigs AS (
  SELECT doc_id,
    {sig_lines}
  FROM sets GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([
     {band_items}]) AS band_key
  FROM sigs
),
cands AS (
  SELECT DISTINCT h.id_a, b.doc_id AS id_b
  FROM bands b
  JOIN (SELECT band_key, MIN(doc_id) AS id_a FROM bands GROUP BY band_key) h
    ON b.band_key = h.band_key AND h.id_a < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / (za.sz + zb.sz - COALESCE(i.n_inter, 0)) AS jaccard
FROM cands c
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes za ON za.doc_id = c.id_a
JOIN sizes zb ON zb.doc_id = c.id_b
ORDER BY jaccard DESC, c.id_a, c.id_b
LIMIT 200
"""


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup: collapse exact duplicates → shingle → 8
    minhashes → 2 bands of 4 → STAR candidate pairs (bucket-min hub ↔
    member) → exact jaccard verify → top-200 pairs. All md5-based
    hashing is recomputed identically by the oracle.

    Two scale levers, both measured this round at sf10:
    - exact-dup collapse first (min doc_id per distinct text, both
      engines): identical texts share identical signatures, so exact
      dup groups would flood buckets with jaccard-1.0 pairs — the
      standard pipeline order is exact dedup (dedup_exact_content)
      BEFORE fuzzy.
    - star candidates (operators/dedup.py lsh_candidate_pairs
      star=True): all-pairs within buckets is Σ C(|bucket|,2), and
      template-cluster bucket sizes GROW with corpus size (measured:
      top bucket 210 → 464 docs for sf5 → sf10, all-pairs candidates
      exactly 4× for 2× data — quadratic). Pairing members with the
      bucket-min hub keeps every cluster connected (what downstream
      connected-components dedup consumes) at Σ(|bucket|-1) linear
      cost."""
    docs = load(spark, sf_dir, "documents")
    # pin the exact-dedup exchange at full parallelism (fan_out_scan on
    # the groupBy key → the groupBy REUSES the repartition, one exchange
    # either way): the shingle+md5 stage below it otherwise inherits
    # AQE's byte-coalesced width — 1-2 tasks on a small corpus (r13)
    d = fan_out_scan(docs, "text").groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    )
    # cache: the shingle explosion feeds both the signature branch and
    # the jaccard-verify branch of the DAG — without it the md5 hashing
    # of every (doc, shingle) runs twice
    # localCheckpoint, not cache(): the shingle explosion feeds three DAG
    # branches (signatures, intersection, sizes). A lazy cache makes the
    # branches race and recompute it; a cache-manager entry is also only
    # reused when canonicalized-plan lookup succeeds, which proved
    # bimodal across repeated invocations (3.7s hit / ~25s miss at
    # sf0.1). Checkpointing pins the materialized rows to this plan
    # unconditionally.
    sets = doc_shingle_sets(
        d, "doc_id", word_shingles(tokens(F.col("text")), k=2)
    ).localCheckpoint()
    sigs = minhash_signatures(sets, "doc_id")
    cands = lsh_candidate_pairs(sigs, "doc_id", star=True)
    verified = jaccard_verify(cands, sets, "doc_id")
    return (
        verified.orderBy(F.col("jaccard").desc(), F.col("id_a"), F.col("id_b"))
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Direct n-gram jaccard (3-word shingles, language-blocked)
# ---------------------------------------------------------------------------

_NGRAM_ORACLE = f"""
WITH sets AS (
  SELECT DISTINCT doc_id, lang,
         ('0x' || substr(md5(unnest(list_distinct(list_transform(
           range(1, greatest(len({_TOKS}) - 2, 0) + 1),
           i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2]))))), 1, 15))::BIGINT
           AS shingle
  FROM documents WHERE lang = 'de'
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sets sa
  JOIN sets sb ON sa.lang = sb.lang AND sa.shingle = sb.shingle
              AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
ORDER BY jaccard DESC, i.id_a, i.id_b
LIMIT 50
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Direct 3-gram jaccard near-dup — the EXACT truth baseline the
    scalable variants (dedup_minhash_lsh star candidates,
    setsim_prefix_filter_join) are value-checked against. All-pairs
    jaccard is inherently Σ df² (quadratic on template-heavy corpora),
    so the operator REFUSES to run without an explicit
    ``allow_quadratic=True`` opt-in (operators/dedup.py
    ngram_jaccard_pairs; guard pinned by
    test_ngram_jaccard_refuses_without_opt_in). This catalog entry opts
    in deliberately AND bounds the work to one lang block ('de') — it
    exists as the baseline for the gates, never as a scale path.

    Shingles are replaced by a 60-bit md5 prefix BEFORE the distinct
    and the self-join, so every shuffle moves 8-byte keys instead of
    ~25-byte strings (the same trick dup_ngram_doc_fraction uses). Both
    engines hash the identical shingle string, so intersection counts
    agree bit-exactly even in the (≈2^-60-per-pair) collision case."""
    # NO scan fan-out here (r13, measured): the lang filter keeps only
    # a small slice of the corpus, and the interleaved A/B put fan at
    # 1.53 s vs off 1.28 s min — too little surviving hash work to pay
    # for the exchange
    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    sh = word_shingles(tokens(F.col("text")), k=3)
    sh_h = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    sets = (
        d.select("doc_id", "lang", F.explode(F.array_distinct(sh_h)).alias("shingle"))
        .distinct()
    )
    pairs = ngram_jaccard_pairs(
        sets, "doc_id", block_cols=["lang"],
        # explicit opt-in: this is the documented exact baseline, run on
        # a single lang block; the scalable counterparts are the
        # catalog's production paths
        allow_quadratic=True,
    )
    return (
        pairs.orderBy(F.col("jaccard").desc(), F.col("id_a"), F.col("id_b"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# SimHash signatures (16-bit, generated bit expressions on both engines)
# ---------------------------------------------------------------------------

def _simhash_oracle() -> str:
    t16 = f"list_transform({_TOKS}, x -> ('0x' || substr(md5(x), 1, 4))::BIGINT)"
    bit_terms = []
    for bit in range(16):
        contrib = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({t16}, x -> CASE WHEN (x >> {bit}) & 1 = 1 THEN 1 ELSE -1 END)), "
            f"(acc, v) -> acc + v)"
        )
        bit_terms.append(f"(CASE WHEN {contrib} > 0 THEN {2**bit} ELSE 0 END)")
    simhash = " + ".join(bit_terms)
    return f"""
SELECT doc_id,
       CAST({simhash} AS BIGINT) AS simhash,
       CAST(({simhash}) // 256 AS BIGINT) AS band_hi,
       CAST(({simhash}) % 256 AS BIGINT)  AS band_lo
FROM documents
"""


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash signatures + the two 8-bit bands used for
    hamming-≤-k candidate pairing (pigeonhole: distance ≤1 ⇒ one band
    equal). Bit expressions are generated from one loop on both engines
    (operators/dedup.py simhash16)."""
    # pure scan-side map (16 md5-bit folds per token) — fan out so a
    # one-split layout doesn't run the whole corpus on one core (r13)
    d = fan_out_scan(load(spark, sf_dir, "documents"), "doc_id")
    sig = d.select("doc_id", simhash16(tokens(F.col("text"))).alias("simhash"))
    return sig.select(
        "doc_id",
        "simhash",
        F.expr("simhash div 256").alias("band_hi"),
        (F.col("simhash") % 256).alias("band_lo"),
    )


# ---------------------------------------------------------------------------
# Fuzzy dedup via edit distance (blocked pairwise levenshtein)
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH keyed AS (
  SELECT doc_id, lang,
         substr(text, 1, 16)  AS blk1,
         substr(text, 17, 16) AS blk2,
         substr(text, 1, 40)  AS probe
  FROM documents
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.probe AS pa, b.probe AS pb
  FROM keyed a JOIN keyed b
    ON a.lang = b.lang AND a.blk1 = b.blk1 AND a.doc_id < b.doc_id
  UNION
  SELECT a.doc_id, b.doc_id, a.probe, b.probe
  FROM keyed a JOIN keyed b
    ON a.lang = b.lang AND a.blk2 = b.blk2 AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(levenshtein(pa, pb) AS INT) AS edit_dist
FROM cand
WHERE levenshtein(pa, pb) <= 6
"""


@register("dedup_fuzzy_levenshtein", oracle=_FUZZY_ORACLE)
def dedup_fuzzy_levenshtein(spark, sf_dir):
    """Edit-distance near-dup (the fuzzy-match family MinHash can't
    express: transpositions/typos at small distances). All-pairs
    levenshtein is O(n²·L²), so pairs are BLOCKED first: two passes
    over (lang, 16-char block) keys — chars 1-16 and chars 17-32 — and
    only within-bucket pairs are verified on a fixed 40-char probe.
    Two passes mean a pair survives blocking if EITHER half is
    untouched by the edits, so typos confined to one half never lose
    the pair (multi-pass blocking, the standard record-linkage recall
    lever). At scale the block key is the shuffle key: candidates =
    Σ|bucket|² per pass, throttled by key length. The previous 4-char
    single-pass key collapsed to ~300 buckets on this corpus and went
    quadratic (19.6M candidates at sf1, 69× the sf0.1 wall-clock);
    16-char two-pass blocking is ~125k candidates for the same planted
    duplicates — and candidate volume now grows with duplicate-cluster
    size, not corpus size."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        F.substring("text", 1, 16).alias("blk1"),
        F.substring("text", 17, 16).alias("blk2"),
        F.substring("text", 1, 40).alias("probe"),
    )

    def pass_pairs(blk):
        a, b = keyed.alias("a"), keyed.alias("b")
        return a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col(f"a.{blk}") == F.col(f"b.{blk}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.probe").alias("pa"),
            F.col("b.probe").alias("pb"),
        )

    cand = pass_pairs("blk1").union(pass_pairs("blk2")).distinct()
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return cand.select(
        "doc_a",
        "doc_b",
        dist.cast("int").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 6)


# ---------------------------------------------------------------------------
# Full-corpus EXACT set-similarity join via prefix filtering (PPJoin family)
# ---------------------------------------------------------------------------

_SETSIM_TAU = 0.5


def _setsim_oracle(where: str = "") -> str:
    return f"""
WITH sets AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(unnest(list_distinct(list_transform(
           range(1, greatest(len({_TOKS}) - 4, 0) + 1),
           i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2],
                          {_TOKS}[i+3], {_TOKS}[i+4]))))), 1, 15))::BIGINT
           AS shingle
  FROM documents {where}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sets sa JOIN sets sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {_SETSIM_TAU}
ORDER BY jaccard DESC, i.id_a, i.id_b
"""


def _setsim_prefix_sf_oracle() -> str:
    """Big-SF gate formulation (r4 verdict item #3): the primary naive
    all-shingle oracle pays Σ df² probe pairs and times out above sf1;
    this one re-implements the SAME prefix-filter algorithm the Spark
    side runs — independently, in SQL, in a different engine — and
    verifies candidates exactly, so outputs are identical wherever both
    run. The prefix filter's no-false-negative guarantee itself stays
    value-checked against the NAIVE oracle at sf0.001–sf1 (pytest
    parity + test_sf_oracle_equivalent_to_primary + the committed sf1
    gate rows); above that, the block variant
    (setsim_prefix_filter_join_block) keeps naive-oracle evidence
    alive at full scale on a bounded block."""
    return f"""
WITH sets AS MATERIALIZED (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(unnest(list_distinct(list_transform(
           range(1, greatest(len({_TOKS}) - 4, 0) + 1),
           i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2],
                          {_TOKS}[i+3], {_TOKS}[i+4]))))), 1, 15))::BIGINT
           AS shingle
  FROM documents
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY doc_id),
dfreq AS MATERIALIZED (SELECT shingle, COUNT(*) AS df FROM sets GROUP BY shingle),
ranked AS MATERIALIZED (
  SELECT s.doc_id, s.shingle, z.sz,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS rn
  FROM sets s JOIN dfreq d USING (shingle) JOIN sizes z USING (doc_id)
),
prefix AS MATERIALIZED (
  SELECT doc_id, shingle, sz FROM ranked
  WHERE rn <= sz - CAST(ceil({_SETSIM_TAU} * sz) AS BIGINT) + 1
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
    AND b.sz >= CAST(ceil({_SETSIM_TAU} * a.sz) AS BIGINT)
    AND b.sz <= CAST(floor(a.sz / {_SETSIM_TAU}) AS BIGINT)
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {_SETSIM_TAU}
ORDER BY jaccard DESC, i.id_a, i.id_b
"""


@register(
    "setsim_prefix_filter_join",
    oracle=_setsim_oracle(),
    sf_oracle=_setsim_prefix_sf_oracle(),
)
def setsim_prefix_filter_join(spark, sf_dir):
    """Full-corpus EXACT jaccard similarity join at threshold τ=0.5 —
    made tractable by PREFIX FILTERING (Bayardo et al. "Scaling Up All
    Pairs", Xiao et al. PPJoin): order each document's shingles by
    global rarity; a pair with J(A,B) ≥ τ MUST share a shingle within
    the first |x| − ⌈τ·|x|⌉ + 1 shingles of each side, so only the
    rarity-ordered prefixes self-join. The naive inverted-index join
    (dedup_ngram_jaccard, deliberately restricted to one lang block)
    pays Σ df² over ALL shingles — ~1B probe pairs at sf5 because hot
    shingles dominate; the prefix join probes rare shingles only, plus
    a length filter (τ·|A| ≤ |B| ≤ |A|/τ) on candidates, then verifies
    candidates EXACTLY against the full shingle sets. Candidate volume
    tracks duplicate structure, not corpus size — this is the published
    exact counterpart to MinHash-LSH, and the oracle is the naive
    all-shingle join, so the filter's no-false-negative guarantee is
    value-checked, not assumed.

    Shuffles: shingle-df agg, per-doc rarity window (per-key), prefix
    self-join on 8-byte hashed shingles, candidate-bounded verify join.
    No window over an unpartitioned frame, no crossJoin anywhere."""
    return _setsim_join(load(spark, sf_dir, "documents"))


@register("setsim_prefix_filter_join_block", oracle=_setsim_oracle("WHERE lang = 'de'"))
def setsim_prefix_filter_join_block(spark, sf_dir):
    """The SAME prefix-filter similarity join restricted to one lang
    block (lang='de'). Exists purely as scale-parity evidence: the full
    query's naive all-shingle oracle times out in DuckDB above sf1
    (GATE_sf5 records oracle_timeout), so the no-false-negative
    guarantee there was value-checked only up to sf1. Restricting both
    engines to one block keeps the oracle's Σ df² tractable at sf5+
    while the Spark side still runs the identical prefix-filter plan —
    giving value evidence for the operator above sf1 (ADVICE r3)."""
    # r14: NO fan-out and NO checkpoint here — the lang filter leaves
    # ~1/|langs| of the corpus, too little work to pay an exchange or a
    # materialization (interleaved A/B at sf0.1: plain 1.51 s vs ckpt
    # 1.85 s vs r13-fan 2.23 s at 32 cores; 1.73/1.69/1.84 at 8 — the
    # same verdict as the reverted ngram-jaccard fan-out).
    return _setsim_join(
        load(spark, sf_dir, "documents").filter(F.col("lang") == "de"),
        checkpoint=False,
        fan=False,
    )


def _setsim_join(d, checkpoint: bool = True, fan: bool = True):
    from pyspark.sql import Window

    # fan out once so the ONE explode run below happens at full width on
    # a one-split layout (no-op on a production multi-file layout)
    if fan:
        d = fan_out_scan(d, "doc_id")
    sh = word_shingles(tokens(F.col("text")), k=5)
    sh_h = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    sets = d.select(
        "doc_id", F.explode(F.array_distinct(sh_h)).alias("shingle")
    ).distinct()
    # checkpointed ONCE per invocation (within the timed region): five
    # downstream branches (sizes, df, ranked, sa, sb) consume `sets`, and
    # without the boundary each branch re-runs the scan+shingle+md5
    # explode THROUGH the fan-out's full-width exchange — four extra
    # 32-wide REPARTITION_BY_NUM exchanges feeding a memory-hungry
    # prefix self-join (driver r13: 32.5 s at 32 cores vs 2.6 s at 8).
    # The checkpointed rows are 16 bytes/shingle (two longs), far
    # smaller than the documents they derive from.
    if checkpoint:
        sets = sets.localCheckpoint()
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    df_ = sets.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))

    tau = F.lit(_SETSIM_TAU)
    rarity = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sets.join(df_, "shingle")
        .withColumn("rn", F.row_number().over(rarity))
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(tau * F.col("sz")) + 1
    ).select("doc_id", "shingle", "sz")

    pa = prefix.select(
        F.col("doc_id").alias("id_a"), "shingle", F.col("sz").alias("sz_a")
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("sz").alias("sz_b")
    )
    cand = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.ceil(tau * F.col("sz_a")))
            & (F.col("sz_b") <= F.floor(F.col("sz_a") / tau))
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )

    # exact verification: count true intersection over the FULL sets
    sa = sets.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sets.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    )
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: arriving batch probes the existing LSH index
# ---------------------------------------------------------------------------

_INC_TAU = 0.5


def _minhash_incremental_oracle() -> str:
    sig_lines = ",\n    ".join(
        f"MIN(({a} * {_MD5_8} + {b}) % {MINHASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_SEEDS)
    )
    n_bands = len(MINHASH_SEEDS) // BAND_SIZE
    band_items = ",\n     ".join(
        "concat_ws('|', '%d', %s)"
        % (b, ", ".join(f"mh{b * BAND_SIZE + r}::VARCHAR" for r in range(BAND_SIZE)))
        for b in range(n_bands)
    )
    shingles = (
        f"list_transform(range(1, greatest(len({_TOKS}) - 1, 0) + 1), "
        f"i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1]))"
    )
    return f"""
WITH sets AS (
  SELECT DISTINCT doc_id, doc_id % 10 = 7 AS is_new,
         unnest(list_distinct({shingles})) AS shingle
  FROM documents
),
sigs AS (
  SELECT doc_id, ANY_VALUE(is_new) AS is_new,
    {sig_lines}
  FROM sets GROUP BY doc_id
),
bands AS (
  SELECT doc_id, is_new, unnest([
     {band_items}]) AS band_key
  FROM sigs
),
cands AS (
  SELECT DISTINCT LEAST(n.doc_id, o.doc_id) AS id_a,
                  GREATEST(n.doc_id, o.doc_id) AS id_b
  FROM bands n JOIN bands o
    ON n.band_key = o.band_key AND n.doc_id <> o.doc_id
  WHERE n.is_new
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {_INC_TAU}
ORDER BY jaccard DESC, i.id_a, i.id_b
"""


def _lsh_index_manager(spark, sf_dir):
    """Per-fixture warehouse for the persisted LSH index, SHARED across
    processes (r5 advisory: the previous per-pid path rebuilt the
    "persisted" index in every new pytest/gate/driver process and
    leaked the per-pid dirs). The dir name is
    ``lsh_index_<path-hash>_<content-hash>``:

    - path-hash identifies the fixture dir, so different SFs keep
      separate indexes;
    - content-hash covers (size, st_mtime_ns) of documents.parquet —
      nanosecond mtime, so a same-second fixture regeneration (possible
      with tools/gen_sf.py on a fast disk) cannot serve a stale index;
    - superseded dirs (same path-hash, different content-hash) are
      deleted under the lock, so regenerating a fixture reclaims the
      old index's disk.

    Cross-process build/append races are serialized by
    ``_lsh_index_lock`` (flock on a sibling lock file — see the query
    body); overwrite's atomic rename remains the last line of defense.
    Returns (TableManager, lock_path)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..tables import TableManager

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    ph = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    ch = hashlib.md5(f"{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    lock_path = os.path.join(tmp, f"lsh_index_{ph}.lock")
    wh = os.path.join(tmp, f"lsh_index_{ph}_{ch}")
    with _lsh_index_lock(lock_path):
        for old in os.listdir(tmp):
            if old.startswith(f"lsh_index_{ph}_") and old != os.path.basename(wh):
                shutil.rmtree(os.path.join(tmp, old), ignore_errors=True)
    return TableManager(spark, wh, backend="parquet"), lock_path


@_contextmanager
def _lsh_index_lock(lock_path):
    """Exclusive advisory flock serializing index builders/appenders
    across processes. POSIX-only (fcntl); on platforms without fcntl
    the lock degrades to a no-op and overwrite's write-to-temp +
    atomic-rename keeps builds from corrupting each other."""
    import os

    try:
        import fcntl
    except ImportError:  # pragma: no cover - non-POSIX
        yield
        return
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


@register("dedup_minhash_incremental", oracle=_minhash_incremental_oracle())
def dedup_minhash_incremental(spark, sf_dir):
    """INCREMENTAL near-dup: a deterministic ~10% of documents
    (doc_id % 10 = 7) plays the arriving batch; only ITS bands probe
    a PERSISTED band index, so candidate volume is ∝ |new batch| × avg
    bucket size — not corpus². This is the production shape for a
    continuously-ingesting 100 TB corpus, and since r5 the index is
    REAL, not recomputed per run (r4 verdict item #2):

    - ``lsh_bands`` (doc_id, band_key) and ``lsh_shingles`` (doc_id,
      shingle) for the existing corpus (doc_id % 10 != 7) are
      MATERIALIZED via TableManager into a per-fixture warehouse,
      repartitioned on their join keys at write time (band_key /
      shingle) so probe joins hit co-located files — the path-table
      stand-in for a bucketed or Delta table on a real deployment.
      Built once per fixture fingerprint; every later run probes the
      stored tables.
    - the arriving batch shingles/bands ONLY ITSELF, equi-joins the
      stored index (∪ its own bands, so new-new pairs surface),
      exact-verifies candidates at τ=0.5 against stored shingle sets
      ∪ its own, and APPENDS its bands back (left-anti on doc_id makes
      the append idempotent across re-runs).
    - the returned plan therefore contains NO full-corpus shingle scan:
      documents.parquet appears nowhere in it (the batch's own shingle
      set is an eager localCheckpoint) — pinned by
      test_explain_plans.py::test_minhash_incremental_probes_stored_index.

    The full-corpus re-scan (dedup_minhash_lsh) never needs to re-run.
    The oracle recomputes the same new-side-probe semantics exactly
    (pairs where at least one side is new, jaccard ≥ τ); bands are a
    pure per-doc function, so old-corpus bands from the stored table
    are bit-identical to an in-query recompute."""
    tm, lock_path = _lsh_index_manager(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    new_filter = F.col("doc_id") % 10 == 7

    with _lsh_index_lock(lock_path):
        if not (tm.exists("lsh_bands") and tm.exists("lsh_shingles")):
            old_sets = doc_shingle_sets(
                d.filter(~new_filter).select("doc_id", "text"), "doc_id",
                word_shingles(tokens(F.col("text")), k=2),
            )
            tm.overwrite(old_sets.repartition(32, "shingle"), "lsh_shingles")
            old_sigs = minhash_signatures(tm.read("lsh_shingles"), "doc_id")
            tm.overwrite(
                lsh_bands(old_sigs, "doc_id").repartition(32, "band_key"),
                "lsh_bands",
            )

        # stored index snapshots (file listing happens here, under the
        # lock and BEFORE the append below, so the probe never sees the
        # batch's appended bands twice and never races a concurrent
        # process's append)
        index_bands = tm.read("lsh_bands")
        index_sets = tm.read("lsh_shingles")

    batch_sets = doc_shingle_sets(
        fan_out_scan(  # scan-side shingle+md5, one split locally (r13)
            d.filter(new_filter).select("doc_id", "text"), "doc_id"
        ),
        "doc_id",
        word_shingles(tokens(F.col("text")), k=2),
    ).localCheckpoint()
    batch_bands = lsh_bands(
        minhash_signatures(batch_sets, "doc_id"), "doc_id"
    ).localCheckpoint()

    # append the batch's bands back into the stored index — idempotent
    # (left-anti on already-indexed doc_ids), so re-runs are no-ops;
    # the flock serializes concurrent appenders so two processes can't
    # both pass the left-anti check and double-append the same batch
    with _lsh_index_lock(lock_path):
        # fresh snapshot for the idempotence check — another process
        # may have appended since our probe snapshot above
        already = tm.read("lsh_bands").select("doc_id").distinct()
        tm.append(
            batch_bands.join(already, on="doc_id", how="left_anti")
            .repartition(8, "band_key"),
            "lsh_bands",
        )

    new_bands = batch_bands.select(F.col("doc_id").alias("_nid"), "band_key")
    probe_target = index_bands.unionByName(batch_bands)
    cands = (
        new_bands.join(probe_target, on="band_key")
        .filter(F.col("doc_id") != F.col("_nid"))
        .select(
            F.least("_nid", "doc_id").alias("id_a"),
            F.greatest("_nid", "doc_id").alias("id_b"),
        )
        .distinct()
    )
    all_sets = index_sets.unionByName(batch_sets)
    verified = jaccard_verify(cands, all_sets, "doc_id")
    return (
        verified.filter(F.col("jaccard") >= _INC_TAU)
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
    )
