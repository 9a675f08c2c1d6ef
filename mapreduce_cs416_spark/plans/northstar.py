"""North-star queries: dedup, similarity search, text analysis,
multimodal (BASELINE.json's LLM-data-pipeline surface).

Oracle-portable ops carry exact DuckDB SQL twins (same tokenizer
regex, same sequential float folds, same integer arithmetic). Ops
whose results depend on engine hash functions (MinHash/SimHash/LSH
buckets) have no SQL oracle by construction — the driver records the
rows-only check and tests/ assert their quality properties (recall vs
the exact operators) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, quantize, sampling, similarity, sketches, textstats, vocab
from ..sources.tables import load_table
from .spec import QuerySpec

_SQL_WORDS = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), w -> w <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ------------------------------------------------------------------- dedup
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_stats(_docs(spark, sf_dir))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df bounds the inverted-index self-join: a shingle seen in
    # >1000 docs is boilerplate and would produce O(df²) candidate
    # pairs at scale. The oracle SQL applies the identical cap.
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.2, max_df=1000)


_DEDUP_PAIRS_SQL_TEMPLATE = """
WITH w AS (
    SELECT doc_id, {words} AS ws FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(ws) < 3 THEN []
                ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   FOR i IN range(1, len(ws) - 1)])
           END AS shingles
    FROM w
), ex AS (
    SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
), kept AS (
    SELECT * FROM ex QUALIFY count(*) OVER (PARTITION BY sh) <= {max_df}
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
           count(*) AS common
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, round(common / (na + nb - common), 6) AS jaccard
FROM common
WHERE common / (na + nb - common) >= {threshold}
"""

# capped twin of the Spark query (same max_df semantics: n_sh counts
# the full shingle set, only join rows are dropped)
DEDUP_NGRAM_SQL = _DEDUP_PAIRS_SQL_TEMPLATE.format(
    words=_SQL_WORDS, max_df=1000, threshold=0.2
)

# the MinHash-LSH driver query runs at this threshold with 32 bands ×
# 2 rows, so its recall dead zone (where the exact-pair oracle below
# could over-count) is structurally closed: per-pair miss probability
# (1-s²)³² is ≤ 1e-4 at s = 0.5 and ≤ 1e-10 at s = 0.7 — vs the
# previous 16×4 @ 0.2 registration, whose S-curve midpoint sat at 0.5
# and passed only because the corpus had no pairs in 0.2-0.89
# (VERDICT r4 item 5: one adversarial fixture row would have flipped
# the driver row red).
_MINHASH_THRESHOLD = 0.5
_MINHASH_BANDS = 32

# exact, uncapped pairs — the oracle for the MinHash-LSH path, whose
# verification step computes jaccard over the full shingle sets
DEDUP_PAIRS_EXACT_SQL = _DEDUP_PAIRS_SQL_TEMPLATE.format(
    words=_SQL_WORDS, max_df=2**31 - 1, threshold=_MINHASH_THRESHOLD
)


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs (dedup.containment_pairs): Broder's
    C(A⊆B) = |A∩B|/|A| over 3-shingles, df-capped postings — the
    quote/subset-document detector symmetric Jaccard misses."""
    return dedup.containment_pairs(_docs(spark, sf_dir), k=3, threshold=0.5, max_df=1000)


# Containment twin: the _DEDUP_PAIRS_SQL_TEMPLATE body (same distinct
# shingling, same df cap) with the two DIRECTED normalizations
# common/na and common/nb as the finisher instead of the symmetric
# Jaccard — one row per satisfied direction, mutual near-dups emit
# both.
DEDUP_CONTAINMENT_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(ws) < 3 THEN []
                ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   FOR i IN range(1, len(ws) - 1)])
           END AS shingles
    FROM w
), ex AS (
    SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
), kept AS (
    SELECT * FROM ex QUALIFY count(*) OVER (PARTITION BY sh) <= 1000
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
           count(*) AS common
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT doc_a AS doc_contained, doc_b AS doc_container,
       round(common / na, 6) AS containment
FROM common WHERE common / na >= 0.5
UNION ALL
SELECT doc_b, doc_a, round(common / nb, 6)
FROM common WHERE common / nb >= 0.5
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard-verified.

    Oracle-checkable against the exact pair set: candidate precision
    is exact by construction (every emitted pair is re-verified with
    full-shingle Jaccard), and the banding is chosen for the
    registered threshold — 32 bands × 2 rows misses a pair at
    similarity s with probability (1-s²)³², i.e. ≤ 1e-4 anywhere at
    or above the 0.5 threshold, so the exact-pair oracle holds on ANY
    fixture, not just this corpus's bimodal one (and xxhash64 is
    deterministic, so the match is stable for a given dataset). The
    trade-off vs 16×4 is looser candidate generation lower down the
    curve (~0.3% of s≈0.01 pairs become candidates, all discarded by
    the exact verify); tests/ additionally assert recall on
    adversarial mid-similarity corpora where the S-curve genuinely
    bites.
    """
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        k=3,
        n_hashes=64,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_THRESHOLD,
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dups(_docs(spark, sf_dir), max_hamming=3)


def _simhash_sql(max_hamming: int = 3) -> str:
    """Exact DuckDB twin of dedup.simhash_near_dups — possible since
    r8's portable word hash (two Horner code-point hashes mixed by a
    multiply-shift step; see operators/dedup.SIMHASH_K1 docstring).
    The HUGEINT multiply replays Spark's DECIMAL(38,0) arithmetic
    exactly; the 64 conditional sign-sums and the bit reassembly are
    integer arithmetic. The pigeonhole banding is LOSSLESS (any pair
    within Hamming <= 3 shares one of four 16-bit chunks), so the
    oracle verifies the simpler all-pairs form — identical rows."""
    from ..operators.dedup import SIMHASH_K1, SIMHASH_K2, SIMHASH_MOD

    def horner(base: int) -> str:
        return (
            f"list_reduce([CAST(unicode(c) AS BIGINT) FOR c IN string_split(ws[i], '')], "
            f"(acc, x) -> (acc * {base} + x) % {SIMHASH_MOD})"
        )

    z = f"((CAST(h1 AS HUGEINT) * {SIMHASH_K1} + CAST(h2 AS HUGEINT) * {SIMHASH_K2}) % 18446744073709551616)"
    sum_cols = ",\n           ".join(
        f"sum(CASE WHEN (({'zl' if j < 32 else 'zh'} >> {j % 32}) & 1) = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(64)
    )
    bit_terms = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j if j < 63 else -(2**63)} ELSE 0 END)"
        for j in range(64)
    )
    return f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), tok AS (
    SELECT doc_id, {horner(31)} AS h1, {horner(131)} AS h2
    FROM w, unnest(range(1, len(ws) + 1)) AS u(i)
), zed AS (
    SELECT doc_id,
           CAST({z} // 4294967296 AS BIGINT) AS zh,
           CAST({z} % 4294967296 AS BIGINT) AS zl
    FROM tok
), sums AS (
    SELECT doc_id,
           {sum_cols}
    FROM zed GROUP BY doc_id
), sh AS MATERIALIZED (
    SELECT doc_id, {bit_terms} AS simhash FROM sums
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


DEDUP_SIMHASH_SQL = _simhash_sql()


def dedup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k=4 matches text_decontaminate's tuning note: at k=3 this corpus
    # flags nearly everything, at k=4 the fraction genuinely varies
    return dedup.duplicated_ngram_fraction(_docs(spark, sf_dir), k=4)


# -------------------------------------------------------------- similarity
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(_emb(spark, sf_dir), n_queries=10, k=5)


SIMILARITY_TOPK_SQL = """
WITH e AS (
    SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
), n AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
    FROM e
    -- zero-norm guard, mirroring brute_force_topk (ADVICE r4)
    WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           list_reduce(list_prepend(0.0, [c.v[i] * q.v[i] FOR i IN range(1, len(c.v) + 1)]),
                       (acc, x) -> acc + x) / (c.nrm * q.nrm) AS cos
    FROM n c, n q
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
), ranked AS (
    SELECT q_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, round(cos, 6) AS score, rn
FROM ranked WHERE rn <= 5
"""


# The testdata embeddings are i.i.d. random vectors — the observed
# pair-cosine maximum is ~0.51 at every SF — so a 0.9 threshold would
# verify an empty result (a vacuous oracle, VERDICT r3 item 3). The
# driver-verified query is therefore the exact brute-force pair join
# at a threshold inside the observed distribution (0.42 ⇒ 27/34/441
# pairs at sf0.001/0.01/0.1), making the parity check non-vacuous.
# The banded-LSH twin below runs at the SAME threshold (VERDICT r4
# item 4 — at 0.9 its driver row returned 0 rows and proved only that
# the plan executes), with the banding widened to 4 planes × 8 tables
# so recall at cos 0.42 is non-trivial: p = 1 - θ/π ≈ 0.637 per
# plane, 1-(1-p⁴)⁸ ≈ 0.76 per pair (measured 26 of the exact twin's
# 34 pairs at sf0.01). Still rows-only at the driver — bucket
# membership is hyperplane-dependent — with the recall floor asserted
# on clustered fixtures in tests/test_similarity.py.
#
# MEASURED selectivity at this operating point (VERDICT r5 item 3):
# the random-pair collision rate of 4×8 banding is
# 1-(1-2⁻⁴)⁸ ≈ 0.403 in theory; similarity.lsh_candidate_stats
# measures 0.409 on the sf0.001 fixture (tests/test_similarity.py
# pins it) — the exact-verify stage scores ~41% of all pairs here.
# This banding demonstrates the recall math at a mid-distribution
# threshold, NOT a scale win; at a production 0.9 threshold the same
# operator with 8 planes × 4 tables collides on a measured 1.8% of
# random pairs, and for low-threshold sweeps the genuine scale path
# is cluster-then-verify (dedup_semantic), whose per-cell blocking
# cuts pair work ~n_cells× at ANY threshold.
_COSINE_NEAR_DUP_THRESHOLD = 0.42


def similarity_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (brute-force O(n²) pair
    join) — the oracle-verified baseline for the LSH scale path."""
    return similarity.cosine_near_dup_pairs(
        _emb(spark, sf_dir), threshold=_COSINE_NEAR_DUP_THRESHOLD
    )


def similarity_cosine_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane LSH + exact-cosine verify — the scale path
    for `similarity_cosine_near_dup` (no all-pairs join; candidates
    come from an equi-join on (table, bucket)). Registered at the
    exact twin's threshold and a banding tuned for it (see comment at
    _COSINE_NEAR_DUP_THRESHOLD), so the driver row count is directly
    comparable to the exact twin's. Exactly oracled (r8): the
    hyperplanes are deterministic LCG plan literals, so the DuckDB
    twin (_lsh_near_dup_sql) replays the identical buckets, candidate
    set, and verify cosines bit-for-bit; recall vs the brute-force
    twin is additionally asserted in tests/test_similarity.py."""
    return similarity.cosine_near_dup_lsh(
        _emb(spark, sf_dir),
        threshold=_COSINE_NEAR_DUP_THRESHOLD,
        n_planes=4,
        n_tables=8,
    )


def similarity_near_dup_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION LSH operating point as a timed end-to-end
    artifact: threshold 0.9 with 8 planes × 4 tables, where the
    random-pair collision rate is a MEASURED 1.8%
    (similarity.lsh_candidate_stats, pinned in
    tests/test_similarity.py) — so the exact-verify stage scores ~2%
    of all pairs instead of the 41% the mid-threshold demonstration
    point (`similarity_cosine_near_dup_lsh`) pays. This is the
    config a 100 TB near-dup sweep would actually run; benching it
    makes the scale path a per-round number, not prose. The testdata
    embeddings are i.i.d. random (pair-cosine max ≈ 0.51), so the
    result is empty HERE by construction — the timed work is the
    real pipeline (signature pass, 4-table bucket self-join,
    exact verify of the 1.8% candidate set), and recall/precision at
    THIS config are asserted on clustered fixtures in
    tests/test_similarity.py::test_lsh_near_dup_recall_and_precision.
    Exactly oracled (r8, _lsh_near_dup_sql): deterministic literal
    hyperplanes make even the empty result a hash-checked claim —
    the oracle agrees no pair clears 0.9, not just "zero rows"."""
    return similarity.cosine_near_dup_lsh(
        _emb(spark, sf_dir), threshold=0.9, n_planes=8, n_tables=4
    )


COSINE_NEAR_DUP_SQL = f"""
WITH e AS (
    SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
), n AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
    FROM e
    -- zero-norm guard, mirroring cosine_near_dup_pairs (ADVICE r5:
    -- NaN > threshold in both engines, so the oracle alone can't
    -- catch an all-zero universal-hub vector)
    WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0
), pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]),
                       (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS score
FROM pairs WHERE cos >= {_COSINE_NEAR_DUP_THRESHOLD}
"""


def _planes_values_sql(tables: list[list[list[float]]]) -> str:
    """DuckDB VALUES CTE body ``(tbl, idx, p)`` holding every
    hyperplane of every table as a list literal — hoisted out of the
    per-row expressions so each 64-element literal list is built ONCE
    (inlining them into a comprehension rebuilds the list per element
    — measured 7× slower on the sf0.01 oracle)."""
    rows = []
    for t, planes in enumerate(tables):
        for i, p in enumerate(planes):
            lits = ", ".join(repr(x) for x in p)
            rows.append(f"({t}, {i}, [{lits}])")
    return ",\n           ".join(rows)


def _bucket_cte_sql(tables: list[list[list[float]]], dim: int) -> str:
    """DuckDB twin of similarity._bucket_expr as a CTE chain:
    ``planes(tbl, idx, p)`` VALUES + a grouped sign-bit sum producing
    ``k(vec_id, tbl, bucket)``. The per-plane dot keeps the exact
    left-fold order of Spark's ``aggregate(zip_with(...), 0D, +)``
    (bit-identical doubles → identical signs → identical buckets);
    the OUTER sum over sign bits is integer arithmetic, so its order
    is free. MATERIALIZED: ``k`` feeds a self-join (or probe join) —
    an inlined CTE would re-run the whole sweep per reference."""
    return f"""planes(tbl, idx, p) AS (
    VALUES {_planes_values_sql(tables)}
), k AS MATERIALIZED (
    SELECT n.vec_id, pl.tbl,
           CAST(sum(CASE WHEN list_reduce(list_prepend(0.0, [n.v[i] * pl.p[i] FOR i IN range(1, {dim} + 1)]),
                                          (acc, x) -> acc + x) > 0
                    THEN (1 << pl.idx) ELSE 0 END) AS INT) AS bucket
    FROM n CROSS JOIN planes pl
    GROUP BY n.vec_id, pl.tbl
)"""


def _lsh_near_dup_sql(
    threshold: float, n_planes: int, n_tables: int, dim: int = 64
) -> str:
    """Exact DuckDB twin of ``similarity.cosine_near_dup_lsh`` — the
    banded LSH pair sweep is fully deterministic (the hyperplanes are
    LCG-generated PLAN LITERALS, not engine hashes), so the whole
    family is hash-oracle-able, not merely rows-only.

    Bit-identical by construction: both engines fold the 64 plane
    products sequentially left-to-right from 0.0 (Spark
    ``aggregate(zip_with(...))``, DuckDB ``list_reduce`` over a
    ``list_prepend(0.0, ...)``), both parse the identical ``repr``
    decimal literals to the same IEEE doubles, and the bucket is
    integer arithmetic on the resulting sign bits — so the candidate
    set, the verify cosines, and the rounded scores all match the
    Spark plan exactly (cf. ``similarity._bucket_expr`` /
    ``_banded_candidates``)."""
    from ..operators.similarity import _hyperplanes

    tables = [_hyperplanes(n_planes, dim, seed=42 + t) for t in range(n_tables)]
    return f"""
WITH e AS (
    SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
), n AS MATERIALIZED (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
    FROM e
    -- zero-norm guard, mirroring cosine_near_dup_lsh (ADVICE r5)
    WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0
), {_bucket_cte_sql(tables, dim)}, cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM k a JOIN k b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), pairs AS (
    SELECT c.vec_a, c.vec_b,
           list_reduce(list_prepend(0.0, [na.v[i] * nb.v[i] FOR i IN range(1, len(na.v) + 1)]),
                       (acc, x) -> acc + x) / (na.nrm * nb.nrm) AS cos
    FROM cand c
    JOIN n na ON na.vec_id = c.vec_a
    JOIN n nb ON nb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, round(cos, 6) AS score FROM pairs WHERE cos >= {threshold}
"""


LSH_NEAR_DUP_SQL = _lsh_near_dup_sql(_COSINE_NEAR_DUP_THRESHOLD, n_planes=4, n_tables=8)
LSH_NEAR_DUP_PROD_SQL = _lsh_near_dup_sql(0.9, n_planes=8, n_tables=4)


def _lsh_ann_sql(n_queries: int, k: int, n_planes: int, dim: int = 64) -> str:
    """Exact DuckDB twin of ``similarity.lsh_ann_topk`` (multi-probe
    single-table LSH ANN). Mirrors the Spark plan clause-for-clause:
    the seed-42 literal hyperplane bucket, the Hamming-1 probe set
    (qbucket XOR each single bit, plus the bucket itself), the
    bucket equi-join with self-match excluded, and the
    (cos DESC, neighbor_id) rank on the UNROUNDED cosine. No
    zero-norm guard, exactly like the Spark operator (the testdata
    embeddings have no zero vectors; the guard lives in the
    brute-force faces whose results a zero vector could poison)."""
    from ..operators.similarity import _hyperplanes

    tables = [_hyperplanes(n_planes, dim, seed=42)]
    probe_lits = ", ".join(["0"] + [str(1 << i) for i in range(n_planes)])
    return f"""
WITH e AS (
    SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
), n AS MATERIALIZED (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
    FROM e
), {_bucket_cte_sql(tables, dim)}, b AS (
    SELECT n.vec_id, n.v, n.nrm, k.bucket FROM n JOIN k ON k.vec_id = n.vec_id
), probes AS (
    SELECT q.vec_id AS q_id, q.v AS qv, q.nrm AS qnrm, xor(q.bucket, t.p) AS qbucket
    FROM b q, unnest([{probe_lits}]) AS t(p)
    WHERE q.vec_id < {n_queries}
), scored AS (
    SELECT p.q_id, c.vec_id AS neighbor_id,
           list_reduce(list_prepend(0.0, [c.v[i] * p.qv[i] FOR i IN range(1, len(c.v) + 1)]),
                       (acc, x) -> acc + x) / (c.nrm * p.qnrm) AS cos
    FROM b c JOIN probes p ON c.bucket = p.qbucket
    WHERE c.vec_id != p.q_id
), ranked AS (
    SELECT q_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, round(cos, 6) AS score, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {k}
"""


LSH_ANN_SQL = _lsh_ann_sql(n_queries=10, k=5, n_planes=8)


# The two REGISTERED LSH operating points, evaluated side by side:
# the recall-friendly mid-threshold demo banding and the production
# 0.9-threshold point whose 1.8% candidate ratio is the scale claim.
_LSH_EVAL_POINTS = [
    ("demo_4x8", _COSINE_NEAR_DUP_THRESHOLD, 4, 8),
    ("prod_8x4", 0.9, 8, 4),
]


def similarity_eval_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH operating-point evaluation AS A QUERY
    (operators/similarity.lsh_eval): both registered bandings scored
    against the brute-force exact pair set — per point, the true pair
    count, the banded candidate count, the verified-found count,
    recall, and the candidate ratio (the fraction of all pairs the
    verify stage pays for). This is lsh_candidate_stats + the pytest
    recall assertions productized and driver-hashable: deterministic
    literal hyperplanes make the WHOLE evaluation — including the
    S-curve's measured output — exactly SQL-expressible. The fixture
    is enriched with the planted near-dup stratum
    (operators/similarity.plant_near_dups) so the production point's
    recall is a NUMBER, not a hash-checked NULL over an i.i.d. corpus
    with no true 0.9-pairs (VERDICT r8 item 6)."""
    return similarity.lsh_eval(
        similarity.plant_near_dups(_emb(spark, sf_dir)), _LSH_EVAL_POINTS
    )


def _planted_e_cte_sql(
    dim: int = 64, every: int | None = None, offset: int | None = None
) -> str:
    """The eval blocks' source CTE: embeddings ∪ planted twins —
    DuckDB twin of similarity.plant_near_dups (multipliers hoisted to
    a VALUES CTE so the literal list is built once)."""
    from ..operators.similarity import PLANT_EVERY, PLANT_OFFSET, plant_multipliers

    every = PLANT_EVERY if every is None else every
    offset = PLANT_OFFSET if offset is None else offset
    lits = ", ".join(repr(x) for x in plant_multipliers(dim))
    return f"""pm(m) AS (
        VALUES ([{lits}])
    ), e AS (
        SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + {offset},
               [embedding[i]::DOUBLE * pm.m[i] FOR i IN range(1, {dim} + 1)]
        FROM embeddings, pm WHERE vec_id % {every} = 0
    )"""


def similarity_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion pair mining (operators/similarity.
    margin_mine_pairs — the LASER/CCMatrix bitext-mining scorer) over
    the corpus split into two 'languages' by vec_id parity, with
    deterministic twins planted across the split (every 10th vector
    copies to vec_id+1000001, flipping parity) so the mined set has
    known true pairs: each twin must surface as a mutual best pair
    with a dominant margin. Hash-exact end to end — cosines, ranked
    top-k means folded in rank order, margins, and the mutual-best
    filter are all replayed by the DuckDB twin."""
    from ..operators import similarity as sim

    planted = sim.plant_near_dups(_emb(spark, sf_dir), every=10, offset=1_000_001)
    return sim.margin_mine_pairs(planted, k=4, margin_threshold=1.05)


def _margin_mining_sql(k: int = 4, threshold: float = 1.05, dim: int = 64) -> str:
    """DuckDB twin of similarity_margin_mining: the planted-twin
    source CTE, the brute-force cross scorer, ranked top-k means
    folded in rank order (list(cos ORDER BY rn) + list_reduce — the
    same sequential sum as Spark's array_sort + aggregate), the
    ratio margin, and the mutual-best filter with id tie-breaks."""
    return f"""
WITH {_planted_e_cte_sql(dim, every=10, offset=1_000_001)}, n AS MATERIALIZED (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, e) -> acc + e)) AS nrm
    FROM e
    WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, e) -> acc + e) > 0
), x AS (SELECT vec_id AS x_id, v AS xv, nrm AS xn FROM n WHERE vec_id % 2 = 0),
y AS (SELECT vec_id AS y_id, v AS yv, nrm AS yn FROM n WHERE vec_id % 2 = 1),
scored AS MATERIALIZED (
    SELECT x_id, y_id,
           list_reduce(list_prepend(0.0, [xv[i] * yv[i] FOR i IN range(1, {dim} + 1)]),
                       (acc, e) -> acc + e) / (xn * yn) AS cos
    FROM x CROSS JOIN y
), {_margin_tail_sql(k, threshold)}
"""


def _margin_tail_sql(k: int, threshold: float) -> str:
    """The margin-arithmetic CTE tail shared by both miners' DuckDB
    twins (cf. similarity._margin_pairs_from_scored): per-side ranked
    top-k means folded in rank order, the ratio margin, the
    mutual-best filter with id tie-breaks. Expects a ``scored``
    (x_id, y_id, cos) CTE in scope."""
    return f"""rx AS (
    SELECT x_id, cos, row_number() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id) AS rn
    FROM scored
), kx AS (
    SELECT x_id,
           list_reduce(list_prepend(0.0, list(cos ORDER BY rn)), (acc, e) -> acc + e) / {k} AS kxm
    FROM rx WHERE rn <= {k} GROUP BY x_id
), ry AS (
    SELECT y_id, cos, row_number() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id) AS rn
    FROM scored
), ky AS (
    SELECT y_id,
           list_reduce(list_prepend(0.0, list(cos ORDER BY rn)), (acc, e) -> acc + e) / {k} AS kym
    FROM ry WHERE rn <= {k} GROUP BY y_id
), m AS MATERIALIZED (
    SELECT s.x_id, s.y_id, s.cos, s.cos / ((kx.kxm + ky.kym) / 2.0) AS margin
    FROM scored s JOIN kx USING (x_id) JOIN ky USING (y_id)
), b AS (
    SELECT *,
           row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id) AS bx,
           row_number() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id) AS byy
    FROM m
)
SELECT x_id, y_id, round(cos, 6) AS score, round(margin, 6) AS margin
FROM b WHERE bx = 1 AND byy = 1 AND margin >= {threshold}"""


SIMILARITY_MARGIN_MINING_SQL = _margin_mining_sql()


def similarity_margin_mining_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production face of margin mining (VERDICT r9 item 4):
    candidates from the 8×4 banded hyperplane buckets — the near-dup
    family's measured 1.8%-of-pairs operating point — kept when they
    cross the parity split, margin arithmetic unchanged
    (operators/similarity.margin_mine_pairs_lsh). Same planted-twin
    fixture as the brute-force face, so the mined set has known true
    pairs; planted recall 1.0 is pinned in tests/test_similarity.py,
    and the whole pipeline is hash-exact (literal hyperplanes,
    rank-ordered folds) against the DuckDB twin."""
    from ..operators import similarity as sim

    planted = sim.plant_near_dups(_emb(spark, sf_dir), every=10, offset=1_000_001)
    return sim.margin_mine_pairs_lsh(planted, k=4, margin_threshold=1.05)


def _margin_mining_lsh_sql(
    k: int = 4,
    threshold: float = 1.05,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB twin of similarity_margin_mining_lsh: the planted-twin
    source CTE, the _bucket_cte_sql banded candidate sweep (identical
    literal hyperplanes), cross-split orientation (even side = X),
    exact cosines on candidates only, then the shared margin tail."""
    from ..operators.similarity import _hyperplanes

    tables = [_hyperplanes(n_planes, dim, seed=42 + t) for t in range(n_tables)]
    return f"""
WITH {_planted_e_cte_sql(dim, every=10, offset=1_000_001)}, n AS MATERIALIZED (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, e) -> acc + e)) AS nrm
    FROM e
    WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, e) -> acc + e) > 0
), {_bucket_cte_sql(tables, dim)}, cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM k a JOIN k b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), oriented AS (
    SELECT CASE WHEN vec_a % 2 = 0 THEN vec_a ELSE vec_b END AS x_id,
           CASE WHEN vec_a % 2 = 0 THEN vec_b ELSE vec_a END AS y_id
    FROM cand WHERE vec_a % 2 != vec_b % 2
), scored AS MATERIALIZED (
    SELECT o.x_id, o.y_id,
           list_reduce(list_prepend(0.0, [nx.v[i] * ny.v[i] FOR i IN range(1, {dim} + 1)]),
                       (acc, e) -> acc + e) / (nx.nrm * ny.nrm) AS cos
    FROM oriented o
    JOIN n nx ON nx.vec_id = o.x_id
    JOIN n ny ON ny.vec_id = o.y_id
), {_margin_tail_sql(k, threshold)}
"""


SIMILARITY_MARGIN_MINING_LSH_SQL = _margin_mining_lsh_sql()


def _lsh_eval_sql(points=None, dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_eval over the PLANTED fixture:
    one per-point block (the _lsh_near_dup_sql CTE machinery plus
    four one-row counts), UNION ALL across points, identical metric
    formulas (same IEEE division trees, 6-dp rounds, NULL recall on
    an empty truth set)."""
    from ..operators.similarity import _hyperplanes

    blocks = []
    for label, threshold, n_planes, n_tables in points or _LSH_EVAL_POINTS:
        tables = [_hyperplanes(n_planes, dim, seed=42 + t) for t in range(n_tables)]
        dot_ab = (
            "list_reduce(list_prepend(0.0, [na.v[i] * nb.v[i] FOR i IN range(1, len(na.v) + 1)]), "
            "(acc, x) -> acc + x)"
        )
        dot_tr = (
            "list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]), "
            "(acc, x) -> acc + x)"
        )
        blocks.append(f"""
SELECT '{label}' AS point,
       CAST(n_vectors AS INT) AS n_vectors,
       CAST(n_true AS INT) AS n_true,
       CAST(n_candidates AS INT) AS n_candidates,
       CAST(n_found AS INT) AS n_found,
       CASE WHEN n_true > 0 THEN round(n_found / CAST(n_true AS DOUBLE), 6) END AS recall,
       round(n_candidates / (n_vectors * (n_vectors - 1) / 2.0), 6) AS candidate_ratio
FROM (
    WITH {_planted_e_cte_sql(dim)}, n AS MATERIALIZED (
        SELECT vec_id, v,
               sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
        FROM e
        WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0
    ), {_bucket_cte_sql(tables, dim)}, cand AS MATERIALIZED (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM k a JOIN k b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT (SELECT count(*) FROM n) AS n_vectors,
           (SELECT count(*) FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE {dot_tr} / (a.nrm * b.nrm) >= {threshold}) AS n_true,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM cand c
             JOIN n na ON na.vec_id = c.vec_a
             JOIN n nb ON nb.vec_id = c.vec_b
             WHERE {dot_ab} / (na.nrm * nb.nrm) >= {threshold}) AS n_found
)""")
    return "\nUNION ALL\n".join(blocks)


SIMILARITY_EVAL_LSH_SQL = _lsh_eval_sql()


def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k (operators/quantize.quantized_topk):
    the serving-side compression path — 3.5× narrower vectors on the
    shuffle/broadcast wire than float32, scored with exact integer
    dots. Oracle-exact BY CONSTRUCTION: the explicit floor-rounding
    (`floor(x/scale + 0.5)`), integer dot products < 2^53, and one
    IEEE sqrt + division per pair mean Spark and DuckDB produce
    bit-identical doubles; tests/test_quantize.py pins the
    reconstruction and cosine-error bounds the compression claims."""
    from ..operators import quantize

    return quantize.quantized_topk(_emb(spark, sf_dir), n_queries=10, k=5)


# DuckDB twin of operators/quantize.quantized_topk: same scale floor,
# same floor-rounding, integer dots/norms (exact in BIGINT), and the
# identical zero-norm filter — every float op is IEEE-identical, so
# the driver's value-hash comparison holds bit-for-bit.
QUANTIZED_TOPK_SQL = """
WITH e AS (
    SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
), s AS (
    SELECT vec_id, v,
           greatest(list_max([abs(x) FOR x IN v]) / 127.0, 1e-12) AS scale
    FROM e
), q AS (
    SELECT vec_id,
           [CAST(floor(x / scale + 0.5) AS BIGINT) FOR x IN v] AS q
    FROM s
), n AS (
    SELECT vec_id, q,
           sqrt(CAST(list_reduce(list_prepend(0::BIGINT, [x * x FOR x IN q]),
                                 (acc, x) -> acc + x) AS DOUBLE)) AS nrm
    FROM q
    WHERE list_reduce(list_prepend(0::BIGINT, [x * x FOR x IN q]), (acc, x) -> acc + x) > 0
), scored AS (
    SELECT p.vec_id AS q_id, c.vec_id AS neighbor_id,
           CAST(list_reduce(list_prepend(0::BIGINT,
                    [c.q[i] * p.q[i] FOR i IN range(1, len(c.q) + 1)]),
                (acc, x) -> acc + x) AS DOUBLE) / (c.nrm * p.nrm) AS cos
    FROM n c JOIN n p ON p.vec_id < 10 AND c.vec_id <> p.vec_id
), ranked AS (
    SELECT q_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, round(cos, 6) AS score, rn FROM ranked WHERE rn <= 5
"""


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_ann_topk(_emb(spark, sf_dir), n_queries=10, k=5, n_planes=8)


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(
        _emb(spark, sf_dir), n_queries=10, k=5, n_cells=16, n_probe=4, dim=64
    )


def similarity_ivf_fitted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over k-means-FITTED centroids: 3 distributed Lloyd's
    iterations (operators/similarity.fit_centroids) adapt the cells to
    the corpus before the assign→probe→search pass. Rows-only at the
    driver — the fitted means are float sums over shuffled partials,
    so they are not bit-reproducible in SQL; recall-vs-brute-force
    and fit-quality properties are asserted in
    tests/test_similarity.py. The fixed-centroid twin above keeps the
    hash-exact oracle for the identical query plan."""
    emb = _emb(spark, sf_dir)
    cents = similarity.fit_centroids(emb, n_cells=16, dim=64, n_iter=3)
    return similarity.ivf_topk(
        emb, n_queries=10, k=5, n_cells=16, n_probe=4, dim=64, centroids=cents
    )


def _ivf_sql(n_queries: int = 10, k: int = 5, n_cells: int = 16, n_probe: int = 4, dim: int = 64) -> str:
    """DuckDB twin of ivf_topk, generated from the same deterministic
    centroids so cell assignment, probing, and scores are bit-equal
    (sequential folds, ties broken identically)."""
    cents = similarity.ivf_centroids(n_cells, dim)
    values = ",\n    ".join(
        f"({j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])" for j, c in enumerate(cents)
    )

    def dot(v: str, c: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, [{v}[i] * {c}[i] FOR i IN range(1, len({v}) + 1)]), "
            "(acc, x) -> acc + x)"
        )

    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
      FROM e),
cents(j, c) AS (VALUES
    {values}),
cd AS (SELECT n.vec_id, n.v, n.nrm, cents.j, {dot('n.v', 'cents.c')} AS d
       FROM n CROSS JOIN cents),
ranked_cells AS (SELECT vec_id, v, nrm, j,
                        row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, j) AS rn
                 FROM cd),
cell AS (SELECT vec_id, v, nrm, j AS cell FROM ranked_cells WHERE rn = 1),
probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, j AS qcell
           FROM ranked_cells WHERE vec_id < {n_queries} AND rn <= {n_probe}),
scored AS (SELECT p.q_id, c.vec_id AS neighbor_id,
                  {dot('c.v', 'p.qv')} / (c.nrm * p.qnrm) AS cos
           FROM cell c JOIN probes p ON c.cell = p.qcell AND c.vec_id <> p.q_id),
ranked AS (SELECT q_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM scored)
SELECT q_id, neighbor_id, round(cos, 6) AS score, rn FROM ranked WHERE rn <= {k}
"""


SIMILARITY_IVF_SQL = _ivf_sql()


# ------------------------------------------------------------ text analysis
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_docs(spark, sf_dir))


def _marker_sql(markers: tuple[str, ...]) -> str:
    cond = " OR ".join(f"w = '{m}'" for m in markers)
    return f"len(list_filter(ws, w -> {cond}))"


_LANG_SCORES = ",\n           ".join(
    f"{_marker_sql(markers)} AS s_{lang}" for lang, markers in textstats.LANG_MARKERS.items()
)

TEXT_LANG_ID_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), scored AS (
    SELECT doc_id,
           {_LANG_SCORES}
    FROM w
)
SELECT doc_id,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
            WHEN s_fr >= s_zh THEN 'fr'
            ELSE 'zh' END AS pred_lang,
       CAST(greatest(s_en, s_de, s_es, s_fr, s_zh) AS INTEGER) AS score
FROM scored
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(_docs(spark, sf_dir))


_STOP_SQL = " OR ".join(f"w = '{m}'" for m in textstats.STOPWORDS)

TEXT_QUALITY_SQL = f"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars_text,
           CAST(length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS INTEGER) AS n_punct,
           {_SQL_WORDS} AS ws
    FROM documents
), m AS (
    SELECT doc_id, n_chars_text, n_punct,
           CAST(len(ws) AS INTEGER) AS n_tokens,
           list_reduce(list_prepend(0::BIGINT, [length(w)::BIGINT FOR w IN ws]),
                       (acc, x) -> acc + x) AS token_chars,
           len(list_filter(ws, w -> {_STOP_SQL})) AS n_stop
    FROM base
)
SELECT doc_id, n_chars_text, n_tokens,
       round(token_chars / NULLIF(n_tokens, 0), 6) AS avg_token_len,
       round(n_punct / NULLIF(n_chars_text, 0), 6) AS punct_ratio,
       round(n_stop / NULLIF(n_tokens, 0), 6) AS stopword_ratio,
       round((0.4 * (n_stop / NULLIF(n_tokens, 0))
              + 0.3 * (1 - n_punct / NULLIF(n_chars_text, 0))
              + 0.3 * least((token_chars / NULLIF(n_tokens, 0)) / 10.0, 1.0)) * 1000000.0) / 1000000.0 AS quality
FROM m
"""


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_stats(_docs(spark, sf_dir))


TEXT_TOKEN_STATS_SQL = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{textstats.BPE_ISH_RE}')) AS INTEGER) AS n_bpe_tokens,
           {_SQL_WORDS} AS ws
    FROM documents
)
SELECT doc_id, n_ws_tokens, n_bpe_tokens,
       CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words,
       round(len(list_distinct(ws)) / NULLIF(len(ws), 0), 6) AS type_token_ratio
FROM t
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.tfidf_top_terms(_docs(spark, sf_dir), top_n=5)


TEXT_TFIDF_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest({_SQL_WORDS}) AS term FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), nd AS (
    SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, round(tf.tf * ln(n_docs / df), 6) AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN nd
), ranked AS (
    SELECT doc_id, term, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
    FROM scored
)
SELECT doc_id, term, score, rn FROM ranked WHERE rn <= 5
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_docs(spark, sf_dir))


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
           list_prepend(0::BIGINT,
                        [ascii(c)::BIGINT FOR c IN regexp_extract_all(text, '[\\s\\S]')]),
           (acc, c) -> (acc * 31 + c) % {textstats.FINGERPRINT_MOD}
       ) AS fingerprint
FROM documents
"""


def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.top_ngrams(_docs(spark, sf_dir), top_k=20)


# bigrams in DuckDB: zip two same-length unnests (positional) over the
# 1-based token array; range(1, len) = indices of every bigram start.
_SQL_TOKENS = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"

TEXT_TOP_NGRAMS_SQL = f"""
WITH w AS (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
occ AS (
    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS ngram
    FROM w
)
SELECT ngram, count(*) AS cnt
FROM occ
GROUP BY ngram
ORDER BY cnt DESC, ngram
LIMIT 20
"""


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bigram_lm_scores(_docs(spark, sf_dir))


TEXT_BIGRAM_LM_SQL = f"""
WITH w AS (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
occ AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
           unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
    FROM w
),
c2 AS (SELECT w1, bg, count(*) AS n2 FROM occ GROUP BY w1, bg),
c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
model AS (
    SELECT bg, round(ln(CAST(n2 AS DOUBLE) / n1) * 1000000.0) / 1000000.0 AS logp
    FROM c2 JOIN c1 USING (w1)
)
SELECT occ.doc_id,
       count(*) AS n_bigrams,
       round(CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE) / count(*) * 1000000.0)
           / 1000000.0 AS avg_logp
FROM occ JOIN model USING (bg)
GROUP BY occ.doc_id
"""


def part_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.edit_distance_pairs(load_table(spark, sf_dir, "part"), "p_name", max_dist=3)


PART_FUZZY_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
"""


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/graph.pagerank) over the part–supplier
    bipartite graph from lineitem (supplier nodes carry negated ids to
    keep the two key spaces disjoint), symmetrized so the walk can
    cross both ways. Rows-only at the driver: power-iteration ranks
    are float sums whose exact value depends on summation order; the
    NumPy-differential and sum(rank)==1 contracts live in
    tests/test_graph.py. Row count (= node count) IS deterministic."""
    from ..operators.graph import pagerank

    line = load_table(spark, sf_dir, "lineitem")
    edges = line.select(F.col("l_partkey").alias("u"), (-F.col("l_suppkey")).alias("v"))
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank(sym, n_iter=8).select("node", F.round("rank", 6).alias("rank"))


def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (operators/graph.pagerank_fixed) over the
    same part–supplier bipartite graph as graph_pagerank — the
    exactly-oracled twin: scaled-BIGINT ranks, integer floor
    divisions, order-free sums, so the DuckDB unrolled-round chain
    (GRAPH_PAGERANK_FIXED_SQL) reproduces every rank bit-for-bit.
    With this face registered, the float power iteration remains the
    ONLY rows-only graph query — and its exactly-checkable sibling
    sits beside it."""
    from ..operators.graph import pagerank_fixed

    line = load_table(spark, sf_dir, "lineitem")
    edges = line.select(F.col("l_partkey").alias("u"), (-F.col("l_suppkey")).alias("v"))
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank_fixed(sym, n_iter=8)


def _pagerank_fixed_sql(
    n_iter: int = 8, num: int = 85, den: int = 100, scale: int = 10**9
) -> str:
    """DuckDB twin of graph.pagerank_fixed over the part–supplier
    graph: the same edge prep, then ``n_iter`` unrolled MATERIALIZED
    rounds (the kcore/bpe_train pattern) with the IDENTICAL integer
    formulas — contributions ``r // outdeg``, damping
    ``·num // den``, per-round dangling scalar — so the engines
    agree exactly, floors and all."""
    parts = [
        f"""
WITH raw AS (
    SELECT l_partkey AS u, -l_suppkey AS v FROM lineitem
    UNION ALL
    SELECT -l_suppkey AS u, l_partkey AS v FROM lineitem
), e AS MATERIALIZED (SELECT DISTINCT u, v FROM raw WHERE u != v),
nodes AS MATERIALIZED (SELECT DISTINCT u FROM (SELECT u FROM e UNION ALL SELECT v FROM e) t),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
deg AS MATERIALIZED (SELECT u, count(*) AS outdeg FROM e GROUP BY u),
r0 AS MATERIALIZED (SELECT u, CAST({scale} AS BIGINT) // (SELECT n FROM nn) AS r FROM nodes)"""
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT coalesce(sum(p.r), 0) AS dang
       FROM r{k - 1} p LEFT JOIN deg ON deg.u = p.u WHERE deg.outdeg IS NULL),
c{k} AS MATERIALIZED (SELECT e.v AS u, sum(p.r // deg.outdeg) AS s
       FROM e JOIN r{k - 1} p ON p.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v),
r{k} AS MATERIALIZED (SELECT nodes.u,
       (({den} - {num}) * CAST({scale} AS BIGINT) // {den}) // (SELECT n FROM nn)
       + ({num} * (coalesce(c{k}.s, 0) + (SELECT dang FROM d{k}) // (SELECT n FROM nn))) // {den} AS r
       FROM nodes LEFT JOIN c{k} ON c{k}.u = nodes.u)"""
        )
    parts.append(f"""
SELECT u AS node, CAST(r AS BIGINT) AS rank_fp FROM r{n_iter}""")
    return "".join(parts)


GRAPH_PAGERANK_FIXED_SQL = _pagerank_fixed_sql()


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/textstats.pii_scan_redact) over a CRM-note
    frame synthesized deterministically from `customer` — the slim
    fixture carries no free-text column, so the note embeds a phone,
    an account number, and (keyed on c_custkey) an email for every
    3rd and an IPv4 for every 5th customer, giving genuinely varying
    per-class counts. The operator under test is the scan + redact
    itself: row-local JVM regexp codegen, zero shuffles, counts on
    the raw text and sequential class-ordered masking — at 100 TB it
    fuses into whatever scan feeds it."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d", k % 90 + 10, k % 900 + 100, (k * 7) % 900 + 100, (k * 37) % 9000 + 1000
    )
    email = F.concat(F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com"))
    account = (F.lit(1000000) + k * 13).cast("string")
    ip = F.format_string("%d.%d.%d.%d", k % 90 + 10, k % 256, (k * 3) % 256, (k * 7) % 254 + 1)
    note = F.concat(
        F.col("c_name"), F.lit(" ("), F.col("c_mktsegment"), F.lit(") reachable at "), phone,
        F.when(k % 3 == 0, F.concat(F.lit(" or "), email)).otherwise(F.lit("")),
        F.lit(" acct "), account,
        F.when(k % 5 == 0, F.concat(F.lit(" last seen from "), ip)).otherwise(F.lit("")),
        F.lit(" nation "), F.col("c_nationkey").cast("string"),
    )
    notes = cust.select(k.alias("custkey"), note.alias("note"))
    return textstats.pii_scan_redact(notes, text_col="note", keep=("custkey",))


# The oracle rebuilds the identical note (printf twins format_string)
# and runs the SAME patterns under RE2 — 'g' flag required: DuckDB
# regexp_replace is first-match-only by default while Spark's always
# replaces all. Pattern strings are interpolated from
# textstats.PII_PATTERNS so the two engines can never drift.
_PII = dict(textstats.PII_PATTERNS)
TEXT_PII_SQL = f"""
WITH notes AS (
    SELECT c_custkey AS custkey,
           c_name || ' (' || c_mktsegment || ') reachable at '
           || printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10, c_custkey % 900 + 100,
                     (c_custkey * 7) % 900 + 100, (c_custkey * 37) % 9000 + 1000)
           || CASE WHEN c_custkey % 3 = 0
                   THEN ' or ' || lower(replace(c_name, '#', '')) || '@example.com'
                   ELSE '' END
           || ' acct ' || CAST(1000000 + c_custkey * 13 AS VARCHAR)
           || CASE WHEN c_custkey % 5 = 0
                   THEN ' last seen from ' || printf('%d.%d.%d.%d', c_custkey % 90 + 10,
                            c_custkey % 256, (c_custkey * 3) % 256, (c_custkey * 7) % 254 + 1)
                   ELSE '' END
           || ' nation ' || CAST(c_nationkey AS VARCHAR) AS note
    FROM customer
)
SELECT custkey,
       CAST(len(regexp_extract_all(note, '{_PII["email"]}', 0)) AS INT) AS n_email,
       CAST(len(regexp_extract_all(note, '{_PII["ip"]}', 0)) AS INT) AS n_ip,
       CAST(len(regexp_extract_all(note, '{_PII["phone"]}', 0)) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(note, '{_PII["account"]}', 0)) AS INT) AS n_account,
       CAST(len(regexp_extract_all(note, '{_PII["email"]}', 0))
            + len(regexp_extract_all(note, '{_PII["ip"]}', 0))
            + len(regexp_extract_all(note, '{_PII["phone"]}', 0))
            + len(regexp_extract_all(note, '{_PII["account"]}', 0)) AS INT) AS n_pii,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(note,
           '{_PII["email"]}', '<EMAIL>', 'g'),
           '{_PII["ip"]}', '<IP>', 'g'),
           '{_PII["phone"]}', '<PHONE>', 'g'),
           '{_PII["account"]}', '<ACCOUNT>', 'g') AS redacted
FROM notes
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-calibration statistics (operators/quantize.dim_stats)
    over the embeddings table: per-dimension n/mean/min/max/variance
    from integer-quantized partial sums — exact on any partitioning,
    floats only in fixed-order finishing expressions."""
    from ..operators import quantize

    return quantize.dim_stats(_emb(spark, sf_dir))


EMBEDDING_DIM_STATS_SQL = """
WITH q AS (
    SELECT r.i AS dim,
           CAST(round(embedding[r.i + 1]::DOUBLE * 10000000) AS BIGINT) AS q
    FROM embeddings CROSS JOIN range(0, 64) AS r(i)
), a AS (
    SELECT dim, count(*) AS n, sum(q) AS s, sum(q * q) AS ss,
           min(q) AS mn, max(q) AS mx
    FROM q GROUP BY dim
)
SELECT CAST(dim AS INT) AS dim,
       CAST(n AS INT) AS n,
       round(CAST(s AS DOUBLE) / (n * 10000000.0), 9) AS mean,
       round(CAST(mn AS DOUBLE) / 10000000, 9) AS min_val,
       round(CAST(mx AS DOUBLE) / 10000000, 9) AS max_val,
       round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
             / (n * 100000000000000.0), 9) AS variance
FROM a
"""


def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrate-then-apply (operators/quantize.standardize_long):
    the dim_stats model broadcast back over the corpus as per-element
    z-scores — the corpus never shuffles for the model. Driver-window
    face is LONG (vec_id, dim, z): every column atomic, so the
    driver's pandas sort/hash canonicalizer can factorize it (the r8
    array-shaped row threw ``unhashable type: 'list'`` there). The
    array-shaped pipeline artifact lives in extras as
    embedding_standardize_vec. The oracle recomputes the identical
    ROUNDED stats and applies the same fixed-order
    (x − mean)/sqrt(variance) per element."""
    from ..operators import quantize

    return quantize.standardize_long(_emb(spark, sf_dir))


EMBEDDING_STANDARDIZE_SQL = f"""
WITH stats AS ({EMBEDDING_DIM_STATS_SQL}),
model AS (
    SELECT list(mean ORDER BY dim) AS means,
           list(sqrt(variance) ORDER BY dim) AS stds
    FROM stats
)
SELECT e.vec_id,
       CAST(r.i AS INT) AS dim,
       round(CASE WHEN stds[r.i + 1] = 0.0
                  THEN embedding[r.i + 1]::DOUBLE - means[r.i + 1]
                  ELSE (embedding[r.i + 1]::DOUBLE - means[r.i + 1]) / stds[r.i + 1]
             END, 6) AS z
FROM embeddings e CROSS JOIN model CROSS JOIN range(0, 64) AS r(i)
"""


def embedding_standardize_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-shaped face of embedding_standardize — the actual
    pipeline artifact (one z-vector per row, feeding downstream
    quantize/ANN stages). Extras-only: the driver canonicalizer can't
    hash array columns, so the window hashes the long twin instead."""
    from ..operators import quantize

    return quantize.standardize(_emb(spark, sf_dir))


EMBEDDING_STANDARDIZE_VEC_SQL = f"""
WITH stats AS ({EMBEDDING_DIM_STATS_SQL}),
model AS (
    SELECT list(mean ORDER BY dim) AS means,
           list(sqrt(variance) ORDER BY dim) AS stds
    FROM stats
)
SELECT e.vec_id,
       [round(CASE WHEN stds[i] = 0.0
                   THEN embedding[i]::DOUBLE - means[i]
                   ELSE (embedding[i]::DOUBLE - means[i]) / stds[i] END, 6)
        FOR i IN range(1, 65)] AS z
FROM embeddings e CROSS JOIN model
"""


def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top BPE merge candidates (operators/vocab.bpe_merge_counts):
    one tokenizer-training iteration over the corpus — adjacent
    symbol pairs weighted by word frequency, vocabulary-sized after
    the first aggregate."""
    return vocab.bpe_merge_counts(_docs(spark, sf_dir))


CORPUS_BPE_SQL = f"""
WITH wc AS (
    SELECT term, count(*) AS c
    FROM (SELECT unnest({_SQL_WORDS}) AS term FROM documents)
    GROUP BY term
), p AS (
    SELECT substring(term, i, 2) AS pair, c
    FROM wc, unnest(range(1, length(term))) AS r(i)
    WHERE length(term) >= 2
), g AS (
    SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM p GROUP BY pair
)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
FROM g ORDER BY n DESC, pair LIMIT 20
"""


def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE tokenizer training (operators/vocab.bpe_train):
    k rounds of count-pairs → pick-winner → rewrite over the
    distinct-word table, returning the learned merge table."""
    return vocab.bpe_train_table(_docs(spark, sf_dir), n_merges=vocab.BPE_TRAIN_MERGES)


def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded by the learned BPE merges
    (operators/vocab.bpe_encode_pieces): the post-merge subword
    vocabulary with corpus frequencies."""
    return vocab.bpe_encode_pieces(
        _docs(spark, sf_dir), n_merges=vocab.BPE_TRAIN_MERGES, top_k=30
    )


def _bpe_rounds_sql(k: int) -> str:
    """Unrolled CTE chain computing k BPE merge rounds in DuckDB over
    the SAME bracketed-symbol encoding as operators/vocab (chr(1)/
    chr(2) delimiters, plain greedy replace) — w{r} is the word table
    after r merges, t{r} the round-r winning pair."""
    parts = [
        f"""w0 AS (
    SELECT term, regexp_replace(term, '(.)', chr(1) || '\\1' || chr(2), 'g') AS symstr, c
    FROM (SELECT term, count(*) AS c
          FROM (SELECT unnest({_SQL_WORDS}) AS term FROM documents) GROUP BY term)
)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f"""s{r} AS (
    SELECT string_split(substring(symstr, 2, length(symstr) - 2), chr(2) || chr(1)) AS s, c
    FROM w{r - 1}
), t{r} AS (
    SELECT s[i] AS lft, s[i + 1] AS rgt, CAST(sum(c) AS BIGINT) AS n
    FROM s{r}, unnest(range(1, len(s))) AS u(i)
    GROUP BY lft, rgt ORDER BY n DESC, lft, rgt LIMIT 1
), w{r} AS (
    SELECT w.term,
           replace(w.symstr,
                   chr(1) || t.lft || chr(2) || chr(1) || t.rgt || chr(2),
                   chr(1) || t.lft || t.rgt || chr(2)) AS symstr, w.c
    FROM w{r - 1} w CROSS JOIN t{r} t
)"""
        )
    return ",\n".join(parts)


_BPE_K = vocab.BPE_TRAIN_MERGES
CORPUS_BPE_TRAIN_SQL = f"""
WITH {_bpe_rounds_sql(_BPE_K)}
SELECT CAST(rank AS INT) AS rank, lft, rgt, lft || rgt AS merged, n AS weight
FROM ({" UNION ALL ".join(f"SELECT {r} AS rank, * FROM t{r}" for r in range(1, _BPE_K + 1))})
ORDER BY rank
"""

CORPUS_BPE_ENCODE_SQL = f"""
WITH {_bpe_rounds_sql(_BPE_K)},
pieces AS (
    SELECT unnest(string_split(substring(symstr, 2, length(symstr) - 2), chr(2) || chr(1))) AS piece, c
    FROM w{_BPE_K}
), pc AS (SELECT piece, CAST(sum(c) AS BIGINT) AS n FROM pieces GROUP BY piece)
SELECT piece, n, CAST(row_number() OVER (ORDER BY n DESC, piece) AS INT) AS rank
FROM pc ORDER BY n DESC, piece LIMIT 30
"""


def corpus_bpe_doc_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-TOKENIZE (vocab.bpe_encode_docs): every document as
    its BPE token-id sequence — the trained word table doubles as the
    broadcastable segmentation dictionary, the corpus is touched by
    one posexplode + broadcast join + one doc_id regroup."""
    return vocab.bpe_encode_docs(_docs(spark, sf_dir), n_merges=vocab.BPE_TRAIN_MERGES)


CORPUS_BPE_DOC_ENCODE_SQL = f"""
WITH {_bpe_rounds_sql(_BPE_K)},
seg AS (
    SELECT term,
           string_split(substring(symstr, 2, length(symstr) - 2), chr(2) || chr(1)) AS ps
    FROM w{_BPE_K}
), pc AS (
    SELECT piece, CAST(sum(c) AS BIGINT) AS n
    FROM (SELECT unnest(ps) AS piece, c FROM w{_BPE_K}
          JOIN seg USING (term))
    GROUP BY piece
), vid AS (
    SELECT piece, CAST(row_number() OVER (ORDER BY n DESC, piece) AS INT) AS id FROM pc
), term_ids AS (
    SELECT term, list(v.id ORDER BY u.i) AS word_ids
    FROM seg, unnest(range(1, len(ps) + 1)) AS u(i)
    JOIN vid v ON v.piece = ps[u.i]
    GROUP BY term
), docw AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
occ AS (
    SELECT doc_id,
           unnest(range(1, len(ws) + 1)) AS pos,
           unnest(list_transform(range(1, len(ws) + 1), i -> ws[i])) AS term
    FROM docw
), je AS (
    SELECT o.doc_id, o.pos, t.word_ids FROM occ o JOIN term_ids t USING (term)
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_words,
       CAST(coalesce(sum(len(word_ids)), 0) AS INT) AS n_pieces,
       flatten(list(word_ids ORDER BY pos)) AS ids
FROM je
GROUP BY doc_id
"""


def text_model_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (textstats.model_quality_score)
    over `documents`: a broadcast linear bag-of-words classifier
    scores every doc and emits the keep/drop decision. The oracle
    carries the IDENTICAL weight table (interpolated from the one
    QUALITY_MODEL_WEIGHTS constant) as a VALUES list."""
    return textstats.model_quality_score(_docs(spark, sf_dir))


_QM_VALUES = ", ".join(f"('{t}', {w})" for t, w in textstats.QUALITY_MODEL_WEIGHTS)
TEXT_MODEL_QUALITY_SQL = f"""
WITH w(term, wt) AS (VALUES {_QM_VALUES}),
tok AS (SELECT doc_id, unnest({_SQL_WORDS}) AS term FROM documents),
j AS (SELECT t.doc_id, w.wt FROM tok t LEFT JOIN w ON w.term = t.term)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(count(wt) AS INT) AS n_hits,
       CAST(coalesce(sum(wt), 0) AS BIGINT) AS raw_score,
       round(coalesce(sum(wt), 0) * 1.0 / count(*), 6) AS score,
       (coalesce(sum(wt), 0) * 1.0 / count(*)) >= 0.0 AS keep
FROM j
GROUP BY doc_id
"""


def text_model_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation AS A QUERY (operators/textstats.
    classifier_eval): ROC-AUC of the bag-of-words model's ranking
    against labels from the independent heuristic composite, plus the
    keep-decision's confusion counts and precision/recall — the
    measurement a learned data filter ships with (the similarity
    family's eval rows, for the text-quality model). Mann-Whitney
    midrank AUC in exact integer arithmetic until one final division,
    so the row is hash-checkable."""
    return textstats.classifier_eval(_docs(spark, sf_dir))


TEXT_MODEL_QUALITY_AUC_SQL = f"""
WITH s AS MATERIALIZED ({TEXT_MODEL_QUALITY_SQL}),
q AS MATERIALIZED ({TEXT_QUALITY_SQL}),
jj AS (
    SELECT s.doc_id, s.score, s.keep, (q.quality >= 0.5) AS label
    FROM s JOIN q USING (doc_id) WHERE q.quality IS NOT NULL
), g AS MATERIALIZED (
    SELECT score, count(*) AS cnt,
           sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos,
           sum(CASE WHEN keep AND label THEN 1 ELSE 0 END) AS tp,
           sum(CASE WHEN keep AND NOT label THEN 1 ELSE 0 END) AS fp,
           sum(CASE WHEN NOT keep AND label THEN 1 ELSE 0 END) AS fn
    FROM jj GROUP BY score
), l AS (
    SELECT a.score, a.cnt, a.pos, coalesce(sum(b.cnt), 0) AS n_less
    FROM g a LEFT JOIN g b ON b.score < a.score
    GROUP BY a.score, a.cnt, a.pos
), u AS (
    SELECT sum(pos * (2 * n_less + cnt + 1)) AS two_u,
           sum(pos) AS n_pos, sum(cnt) AS n_docs
    FROM l
), c AS (SELECT sum(tp) AS tp, sum(fp) AS fp, sum(fn) AS fn FROM g)
SELECT CAST(n_docs AS INT) AS n_docs,
       CAST(n_pos AS INT) AS n_pos,
       CAST(n_docs - n_pos AS INT) AS n_neg,
       CASE WHEN n_pos > 0 AND n_docs - n_pos > 0
            THEN round((two_u - n_pos * (n_pos + 1)) / (2.0 * n_pos * (n_docs - n_pos)), 6)
       END AS auc,
       CAST(tp AS INT) AS tp, CAST(fp AS INT) AS fp, CAST(fn AS INT) AS fn,
       CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END AS recall
FROM u CROSS JOIN c
"""


# --------------------------------------------------------------- multimodal
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.blob_metadata(_docs(spark, sf_dir))


MULTIMODAL_META_SQL = """
SELECT doc_id,
       ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       sha256(text) AS sha256_hex,
       lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.extract_features(_docs(spark, sf_dir))


# The fake decode is deterministic (mean byte value of 8 equal chunks,
# operators/multimodal.py:_fake_decode) and the corpus is ASCII, so the
# Arrow-batched mapInPandas path gets a genuine hash-exact oracle: the
# same chunk means expressed over per-character codepoints in DuckDB.
MULTIMODAL_FEATURES_SQL = """
WITH c AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n,
           [ascii(ch) FOR ch IN regexp_extract_all(text, '[\\s\\S]')] AS codes
    FROM documents
), s AS (
    SELECT doc_id, n, codes, greatest(n // 8, 1) AS step FROM c
), f AS (
    SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
           [CASE WHEN n = 0 THEN 0.0
                 WHEN i * step >= n
                 THEN list_aggregate(codes[n - step + 1 : n], 'avg')
                 ELSE list_aggregate(codes[i * step + 1 : least((i + 1) * step, n)], 'avg')
            END FOR i IN range(0, 8)] AS feats
    FROM s
)
SELECT doc_id, n_bytes,
       array_to_string([CAST(CAST(round(x, 6) AS DECIMAL(16,6)) AS VARCHAR) FOR x IN feats], ',') AS features_csv
FROM f
"""


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_frames(_docs(spark, sf_dir))


MULTIMODAL_FRAMES_SQL = f"""
WITH c AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), f AS (
    SELECT doc_id, text, n, greatest(n // {multimodal.N_FRAMES}, 1) AS step, r.i AS frame_idx
    FROM c CROSS JOIN range(0, {multimodal.N_FRAMES}) AS r(i)
    WHERE n > 0 AND r.i * greatest(n // {multimodal.N_FRAMES}, 1) < n
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(frame_idx * step AS INTEGER) AS frame_off,
       lower(hex(encode(substring(text, frame_idx * step + 1,
                                  least({multimodal.FRAME_LEN}, n - frame_idx * step))))) AS frame_hex
FROM f
"""


def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_image_stats(_docs(spark, sf_dir))


# DuckDB twin of decode_image_stats: the blob bytes are wrapped into a
# bottom-up 24-bit BMP (stride 48 = 16px — divisible by 3 AND 4, so
# channel alignment survives row reversal and no pad bytes intrude),
# then genuinely parsed back; the oracle recomputes the channel means
# from raw byte positions ((i-1) % 3 picks B/G/R of the BGR triplets,
# zero padding contributes 0 to each sum) and the TOP image row — the
# LAST stored row, offset 48·(h−1) — so a decoder that ignored BMP's
# bottom-up row order would hash-mismatch. The byte values come from
# hex-pair slices of the UTF-8 blob (hex(encode(text))), NOT from
# per-character ascii(): the Spark side decodes real UTF-8 bytes, and
# a code-point-based oracle would silently diverge on any non-ASCII
# document (code-review r6 finding #2 — latent on today's pure-ASCII
# fixture, wrong on the first accented character).
MULTIMODAL_DECODE_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 48.0) AS BIGINT), 1) AS h,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 0]), 0) / (16 * h), 6) AS mean_b,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 1]), 0) / (16 * h), 6) AS mean_g,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 2]), 0) / (16 * h), 6) AS mean_r,
       rpad(substr(hx, 96 * (h - 1) + 1, 96), 96, '0') AS row0_hex
FROM d
"""


def multimodal_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-space near-dup pairs (multimodal.phash_near_dups): 64-bit
    gradient dHash over the REAL decoded images, pigeonhole 16-bit
    chunk banding for candidates (never all-pairs), exact Hamming
    verify. The oracle recomputes the identical integer hash straight
    from payload byte positions."""
    return multimodal.phash_near_dups(_docs(spark, sf_dir))


# dHash twin in DuckDB, byte-exact: the same grid/band/packing math as
# multimodal._dhash_chunks, computed from the payload byte positions
# (stored row s = p // 48, image row r = h-1-s — the bottom-up BMP
# flip — grid band i = (8r)//h, col block j = col//2), then the same
# pigeonhole chunk join with the same max_bucket cap and Hamming
# filter. Integer-only, so hash-exact across engines.
MULTIMODAL_NEAR_DUP_PHASH_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, n,
           greatest(CAST(ceil(n / 48.0) AS BIGINT), 1) AS h,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
), pos AS (
    SELECT doc_id,
           (8 * (h - 1 - p // 48)) // h AS band,
           ((p % 48) // 3) // 2 AS blk,
           CASE WHEN p < n THEN codes[p + 1] ELSE 0 END AS val
    FROM d, unnest(range(0, 48 * h)) AS u(p)
), blocks AS (
    SELECT doc_id, band, blk, sum(val) AS s FROM pos GROUP BY 1, 2, 3
), bits AS (
    SELECT x.doc_id, x.band, x.blk,
           CASE WHEN x.s > y.s THEN 1 ELSE 0 END AS bit
    FROM blocks x
    JOIN blocks y ON y.doc_id = x.doc_id AND y.band = x.band AND y.blk = (x.blk + 1) % 8
), hb AS (
    SELECT doc_id, band // 2 AS chunk,
           CAST(sum(bit * (1::BIGINT << (15 - ((band % 2) * 8 + blk)))) AS INT) AS v
    FROM bits GROUP BY 1, 2
), h4 AS (
    SELECT d.doc_id,
           coalesce(max(CASE WHEN chunk = 0 THEN v END), 0) AS b0,
           coalesce(max(CASE WHEN chunk = 1 THEN v END), 0) AS b1,
           coalesce(max(CASE WHEN chunk = 2 THEN v END), 0) AS b2,
           coalesce(max(CASE WHEN chunk = 3 THEN v END), 0) AS b3
    FROM d LEFT JOIN hb ON hb.doc_id = d.doc_id
    GROUP BY d.doc_id
), keyed AS (
    SELECT doc_id, u.ch AS chunk, [b0, b1, b2, b3][u.ch + 1] AS key
    FROM h4, unnest(range(0, 4)) AS u(ch)
), capped AS (
    SELECT * FROM keyed
    QUALIFY count(*) OVER (PARTITION BY chunk, key) <= 1000
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS INT) AS hamming
FROM cand c
JOIN h4 x ON x.doc_id = c.doc_a
JOIN h4 y ON y.doc_id = c.doc_b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


def multimodal_near_dup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs (multimodal.audio_near_dups): 64-band
    energy-gradient fingerprint (Haitsma-Kalker style) over the REAL
    RIFF/WAV decode, the same 16-bit pigeonhole chunk banding as the
    phash query for candidates (never all-pairs), exact Hamming
    verify. The oracle reassembles the identical int16 stream from
    payload hex pairs (the MULTIMODAL_DECODE_WAV_SQL recipe) and
    recomputes the integer fingerprint end-to-end."""
    return multimodal.audio_near_dups(_docs(spark, sf_dir))


# AUDIO twin of MULTIMODAL_NEAR_DUP_PHASH_SQL: samples come from the
# WAV oracle's hex-pair int16 reassembly (two's complement via the
# >= 32768 branch), band b sums |sample i| where (64*i)//ns = b
# (0-indexed i; the grid LEFT JOIN zero-fills bands that ns < 64
# leaves empty), bit b compares band b to its cyclic neighbour, and
# chunk c packs bits 16c..16c+15 MSB-first — then the identical
# capped banding self-join + bit_count(xor) tail as the phash oracle.
MULTIMODAL_NEAR_DUP_AUDIO_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, n,
           greatest(CAST(ceil(n / 2.0) AS BIGINT), 1) AS ns,
           rpad(hx, CAST(4 * greatest(CAST(ceil(n / 2.0) AS BIGINT), 1) AS INT), '0') AS hx4
    FROM c
), s AS (
    SELECT doc_id, ns,
           [abs(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
            FOR u IN [CAST('0x' || substr(hx4, 4 * i - 1, 2) || substr(hx4, 4 * i - 3, 2) AS INT)
                      FOR i IN range(1, ns + 1)]] AS av
    FROM d
), pos AS (
    SELECT doc_id, (64 * p) // ns AS band, av[CAST(p AS INT) + 1] AS val
    FROM s, unnest(range(0, ns)) AS u(p)
), bsum AS (
    SELECT doc_id, band, sum(val) AS s FROM pos GROUP BY 1, 2
), grid AS (
    SELECT doc_id, b AS band FROM d, unnest(range(0, 64)) AS u(b)
), bs AS (
    SELECT g.doc_id, g.band, coalesce(m.s, 0) AS s
    FROM grid g LEFT JOIN bsum m ON m.doc_id = g.doc_id AND m.band = g.band
), bits AS (
    SELECT x.doc_id, x.band,
           CASE WHEN x.s > y.s THEN 1 ELSE 0 END AS bit
    FROM bs x
    JOIN bs y ON y.doc_id = x.doc_id AND y.band = (x.band + 1) % 64
), hb AS (
    SELECT doc_id, band // 16 AS chunk,
           CAST(sum(bit * (1::BIGINT << (15 - (band % 16)))) AS INT) AS v
    FROM bits GROUP BY 1, 2
), h4 AS (
    SELECT doc_id,
           max(CASE WHEN chunk = 0 THEN v END) AS b0,
           max(CASE WHEN chunk = 1 THEN v END) AS b1,
           max(CASE WHEN chunk = 2 THEN v END) AS b2,
           max(CASE WHEN chunk = 3 THEN v END) AS b3
    FROM hb GROUP BY doc_id
), keyed AS (
    SELECT doc_id, u.ch AS chunk, [b0, b1, b2, b3][u.ch + 1] AS key
    FROM h4, unnest(range(0, 4)) AS u(ch)
), capped AS (
    SELECT * FROM keyed
    QUALIFY count(*) OVER (PARTITION BY chunk, key) <= 1000
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS INT) AS hamming
FROM cand c
JOIN h4 x ON x.doc_id = c.doc_a
JOIN h4 y ON y.doc_id = c.doc_b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


def multimodal_near_dup_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs (multimodal.video_near_dups): 64-band
    TEMPORAL gradient fingerprint over per-frame pixel sums from the
    REAL RIFF/AVI decode, the same 16-bit pigeonhole chunk banding as
    the image/audio queries for candidates (never all-pairs), exact
    Hamming verify — the last stored modality joins the fingerprint
    dedup family. The oracle recomputes the integer fingerprint from
    payload byte positions: frame sums are row-order-invariant, so
    the bottom-up DIB reversal drops out of the math by design."""
    return multimodal.video_near_dups(_docs(spark, sf_dir))


# VIDEO twin of MULTIMODAL_NEAR_DUP_AUDIO_SQL: the fingerprint fixture
# wraps payloads as 1×1-pixel frames — 4 stride-padded bytes each,
# min 1 frame — so frame f's luminance proxy is the sum of payload
# bytes at positions [4f, 4f+3) (the 4th byte of every frame is DIB
# stride padding that decode_video's row extraction strips, so the
# oracle skips p % 4 = 3; permuting rows inside a frame cannot change
# a sum). Band b collects frames with (64*f)//nf = b, zero-filled via
# the grid LEFT JOIN when nf < 64 — then the identical cyclic-gradient
# bits, MSB-first 16-bit chunk packing, capped pigeonhole banding
# self-join and bit_count(xor) tail as the audio oracle.
MULTIMODAL_NEAR_DUP_VIDEO_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, n,
           greatest(CAST(ceil(n / 4.0) AS BIGINT), 1) AS nf,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
), pos AS (
    SELECT doc_id, (64 * (p // 4)) // nf AS band,
           CASE WHEN p < n AND p % 4 < 3 THEN codes[p + 1] ELSE 0 END AS val
    FROM d, unnest(range(0, 4 * nf)) AS u(p)
), bsum AS (
    SELECT doc_id, band, sum(val) AS s FROM pos GROUP BY 1, 2
), grid AS (
    SELECT doc_id, b AS band FROM d, unnest(range(0, 64)) AS u(b)
), bs AS (
    SELECT g.doc_id, g.band, coalesce(m.s, 0) AS s
    FROM grid g LEFT JOIN bsum m ON m.doc_id = g.doc_id AND m.band = g.band
), bits AS (
    SELECT x.doc_id, x.band,
           CASE WHEN x.s > y.s THEN 1 ELSE 0 END AS bit
    FROM bs x
    JOIN bs y ON y.doc_id = x.doc_id AND y.band = (x.band + 1) % 64
), hb AS (
    SELECT doc_id, band // 16 AS chunk,
           CAST(sum(bit * (1::BIGINT << (15 - (band % 16)))) AS INT) AS v
    FROM bits GROUP BY 1, 2
), h4 AS (
    SELECT doc_id,
           max(CASE WHEN chunk = 0 THEN v END) AS b0,
           max(CASE WHEN chunk = 1 THEN v END) AS b1,
           max(CASE WHEN chunk = 2 THEN v END) AS b2,
           max(CASE WHEN chunk = 3 THEN v END) AS b3
    FROM hb GROUP BY doc_id
), keyed AS (
    SELECT doc_id, u.ch AS chunk, [b0, b1, b2, b3][u.ch + 1] AS key
    FROM h4, unnest(range(0, 4)) AS u(ch)
), capped AS (
    SELECT * FROM keyed
    QUALIFY count(*) OVER (PARTITION BY chunk, key) <= 1000
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS INT) AS hamming
FROM cand c
JOIN h4 x ON x.doc_id = c.doc_a
JOIN h4 y ON y.doc_id = c.doc_b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG decode (multimodal.decode_jpeg_stats): each doc's
    bytes become constant 8×8 blocks behind REAL Huffman entropy
    coding; the general decoder's full path (markers, canonical
    Huffman, dequant, IDCT) reproduces them byte-exactly thanks to
    the DC-exact fixture quantization."""
    return multimodal.decode_jpeg_stats(_docs(spark, sf_dir))


# JPEG twin: byte-position math only. Block i (4 per row) is constant
# at payload byte i (zero-padded); mean over all pixels is therefore
# sum(codes)/(4·block_rows·8·8)·64 = sum(codes)/(4·block_rows), and
# image row 0 is the first four bytes each repeated 8×.
MULTIMODAL_DECODE_JPEG_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 4.0) AS BIGINT), 1) AS br,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(32 AS INT) AS width,
       CAST(8 * br AS INT) AS height,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum(codes), 0) / (4.0 * br), 6) AS mean_gray,
       list_aggregate(
           [repeat(substr(rpad(substr(hx, 1, 8), 8, '0'), 2 * i - 1, 2), 8)
            FOR i IN range(1, 5)],
           'string_agg', '') AS row0_hex
FROM d
"""


def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF89a decode (multimodal.decode_gif_stats): each doc's bytes
    become 8-bit grayscale-palette indices behind REAL variable-width
    LZW (clear codes, width bumps, sub-block chains, an extension
    block the parser must walk); the general decoder reproduces them
    byte-exactly because LZW is lossless."""
    return multimodal.decode_gif_stats(_docs(spark, sf_dir))


# GIF twin: byte-position math only. The grayscale palette maps index
# i to (i,i,i), so the RGB mean equals the zero-padded payload mean,
# and row 0's red channel is the first 16 payload bytes.
MULTIMODAL_DECODE_GIF_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 16.0) AS BIGINT), 1) AS h,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum(codes), 0) / (16.0 * h), 6) AS mean_gray,
       rpad(substr(hx, 1, 32), 32, '0') AS row0_hex
FROM d
"""


def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_ppm_stats(_docs(spark, sf_dir))


# PPM twin of MULTIMODAL_DECODE_SQL: RGB channel order, top-down rows,
# no stride padding — row0 is simply the first 48 payload bytes, and
# (i-1) % 3 maps to R/G/B instead of B/G/R. Same byte-exact hex-pair
# parsing of the UTF-8 blob.
MULTIMODAL_DECODE_PPM_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 48.0) AS BIGINT), 1) AS h,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 0]), 0) / (16 * h), 6) AS mean_r,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 1]), 0) / (16 * h), 6) AS mean_g,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 2]), 0) / (16 * h), 6) AS mean_b,
       rpad(substr(hx, 1, 96), 96, '0') AS row0_hex
FROM d
"""


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_png_stats(_docs(spark, sf_dir))


# PNG twin of MULTIMODAL_DECODE_PPM_SQL — and deliberately IDENTICAL
# to it: PNG stores RGB top-down with no stride padding, and the five
# scanline filters + deflate are lossless, so the decoded pixels must
# equal the zero-padded payload byte-for-byte. The Spark side
# genuinely compresses (make_png: filter row%5 → zlib) and inflates /
# de-filters back (operators/multimodal._decode_png); the oracle never
# sees the container, only the payload bytes — any inflate or filter
# reconstruction bug hash-mismatches.
MULTIMODAL_DECODE_PNG_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 48.0) AS BIGINT), 1) AS h,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 0]), 0) / (16 * h), 6) AS mean_r,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 1]), 0) / (16 * h), 6) AS mean_g,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 2]), 0) / (16 * h), 6) AS mean_b,
       rpad(substr(hx, 1, 96), 96, '0') AS row0_hex
FROM d
"""


def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_audio_stats(_docs(spark, sf_dir))


# AUDIO twin of the image-decode oracles: make_wav zero-pads the blob
# to whole 16-bit little-endian PCM samples (min 1) behind a real RIFF
# container (odd-sized JUNK chunk between fmt and data, so the Spark
# side must genuinely walk word-aligned chunks); the oracle reassembles
# the SAME int16 stream straight from payload hex pairs — sample i =
# bytes (2i-1, 2i) little-endian, i.e. '0x' || high-hex || low-hex
# with high = byte 2i — two's-complement via the >= 32768 branch — and
# recomputes every stat. A byte-order, padding, chunk-walk, or sign
# bug on the Spark side hash-mismatches. All integer math except
# duration (ns·0.125 ms, exact in binary) and one IEEE division for
# mean_abs, rounded 6dp on both sides.
MULTIMODAL_DECODE_WAV_SQL = f"""
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, n,
           greatest(CAST(ceil(n / 2.0) AS BIGINT), 1) AS ns,
           rpad(hx, CAST(4 * greatest(CAST(ceil(n / 2.0) AS BIGINT), 1) AS INT), '0') AS hx4
    FROM c
), s AS (
    SELECT doc_id, n, ns,
           [CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
            FOR u IN [CAST('0x' || substr(hx4, 4 * i - 1, 2) || substr(hx4, 4 * i - 3, 2) AS INT)
                      FOR i IN range(1, ns + 1)]] AS sm,
           substr(hx4, 1, 32) AS head
    FROM d
)
SELECT doc_id,
       CAST({multimodal.WAV_SAMPLE_RATE} AS INT) AS sample_rate,
       CAST(ns AS INT) AS n_samples,
       CAST(n AS INT) AS n_data_bytes,
       round(ns * 1000.0 / {multimodal.WAV_SAMPLE_RATE}, 6) AS duration_ms,
       round(list_sum([abs(x) FOR x IN sm]) * 1.0 / ns, 6) AS mean_abs,
       CAST(list_max([abs(x) FOR x IN sm]) AS INT) AS peak_abs,
       CAST(len([i FOR i IN range(1, ns) IF (sm[i] < 0) <> (sm[i + 1] < 0)]) AS INT) AS n_zero_cross,
       head AS head_hex
FROM s
"""


def multimodal_decode_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_video_stats(_docs(spark, sf_dir))


# VIDEO twin of MULTIMODAL_DECODE_SQL: make_avi zero-pads the blob to
# whole 192-byte frames (16×4 px bottom-up BGR DIBs) behind a real
# RIFF tree (hdrl/avih/strl + movi '00db' chunks); the oracle
# recomputes the channel means straight from payload byte positions —
# identical to the BMP recipe since frame stride 48 is divisible by 3
# and padding contributes zeros — and pins frame 0's TOP image row,
# which is the LAST stored row of its bottom-up DIB (bytes 144..192),
# so a decoder ignoring per-frame row order hash-mismatches.
MULTIMODAL_DECODE_AVI_SQL = """
WITH c AS (
    SELECT doc_id,
           lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, n,
           greatest(CAST(ceil(n / 192.0) AS BIGINT), 1) AS nf,
           [CAST('0x' || substr(hx, 2 * i - 1, 2) AS INT) FOR i IN range(1, n + 1)] AS codes
    FROM c
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(4 AS INT) AS height,
       CAST(nf AS INT) AS n_frames,
       CAST(n AS INT) AS n_data_bytes,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 0]), 0) / (64 * nf), 6) AS mean_b,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 1]), 0) / (64 * nf), 6) AS mean_g,
       round(coalesce(list_sum([codes[i] FOR i IN range(1, len(codes) + 1) IF (i - 1) % 3 = 2]), 0) / (64 * nf), 6) AS mean_r,
       rpad(substr(hx, 289, 96), 96, '0') AS frame0_row0_hex
FROM d
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_video_frames(_docs(spark, sf_dir))


# The REAL-decode twin of MULTIMODAL_FRAMES_SQL: sampled frames come
# from genuinely parsed AVI movi chunks, and each sampled frame's TOP
# row is the LAST stored row of its bottom-up DIB — payload bytes
# [192·idx+144, 192·idx+192) — so per-frame row reversal is pinned at
# every sampled position. Same evenly-strided selection arithmetic as
# the byte-offset query.
MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH c AS (
    SELECT doc_id, lower(hex(encode(text))) AS hx, octet_length(encode(text)) AS n
    FROM documents
), d AS (
    SELECT doc_id, hx, greatest(CAST(ceil(n / 192.0) AS BIGINT), 1) AS nf FROM c
), f AS (
    SELECT doc_id, hx, nf, greatest(nf // {multimodal.N_VIDEO_SAMPLES}, 1) AS step, r.i AS k
    FROM d CROSS JOIN range(0, {multimodal.N_VIDEO_SAMPLES}) AS r(i)
    WHERE r.i * greatest(nf // {multimodal.N_VIDEO_SAMPLES}, 1) < nf
)
SELECT doc_id,
       CAST(k AS INT) AS sample_idx,
       CAST(k * step AS INT) AS frame_idx,
       rpad(substr(hx, 2 * (192 * k * step + 144) + 1, 96), 96, '0') AS top_row_hex
FROM f
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_blobs(_docs(spark, sf_dir))


MULTIMODAL_RESIZE_SQL = f"""
WITH c AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), r AS (
    SELECT doc_id, CAST(n AS INTEGER) AS orig_bytes,
           array_to_string([substring(text, i, 1)
                            FOR i IN range(1, n + 1)
                            IF (i - 1) % {multimodal.RESIZE_FACTOR} = 0], '') AS resized
    FROM c
)
SELECT doc_id, orig_bytes,
       CAST(octet_length(encode(resized)) AS INTEGER) AS resized_bytes,
       lower(hex(encode(substring(resized, 1, 16)))) AS resized_hex16
FROM r
"""


# ------------------------------------------------- consolidated driver rows
def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four per-document text analyses — language ID, quality
    score, token stats, fingerprint — as ONE projection-only corpus
    pass (operators/textstats.doc_profile: single scan, zero joins,
    zero shuffles; the oracle still joins the four granular SQLs), so
    every text operator is CORRECTNESS-verified each round. The
    granular queries remain the product surface (EXTRA_QUERIES keeps
    their individual pytest parity)."""
    return textstats.doc_profile(_docs(spark, sf_dir))


TEXT_DOC_PROFILE_SQL = f"""
SELECT *
FROM ({TEXT_LANG_ID_SQL}) l
JOIN ({TEXT_QUALITY_SQL}) q USING (doc_id)
JOIN ({TEXT_TOKEN_STATS_SQL}) t USING (doc_id)
JOIN ({TEXT_FINGERPRINT_SQL}) f USING (doc_id)
"""


def multimodal_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-blob metadata (pure built-ins), fake-decode features, and
    resize output in one driver row covering three multimodal
    operators — computed in a single pass (operators/multimodal.
    blob_profile: JVM metadata projection → one mapInPandas doing
    features + resize in the same Arrow batch; no doc_id joins; the
    oracle still joins the three granular SQLs)."""
    return multimodal.blob_profile(_docs(spark, sf_dir))


MULTIMODAL_DOC_PROFILE_SQL = f"""
SELECT *
FROM ({MULTIMODAL_META_SQL}) m
JOIN (SELECT doc_id, features_csv FROM ({MULTIMODAL_FEATURES_SQL})) f USING (doc_id)
JOIN ({MULTIMODAL_RESIZE_SQL}) r USING (doc_id)
"""


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning — the composition story the
    granular operators exist for: (1) single-pass quality profile
    (textstats.doc_profile: one scan, no shuffle), (2) quality floor
    at 0.46 (inside the corpus's observed 0.42-0.55 band, so the
    filter genuinely splits), (3) n-gram-Jaccard near-dup removal via
    the inverted-index join (dedup.ngram_jaccard_pairs), dropping the
    higher doc_id of each pair with a broadcast anti join. Returns
    the surviving (doc_id, quality, n_tokens)."""
    docs = _docs(spark, sf_dir)
    prof = textstats.doc_profile(docs).select("doc_id", "quality", "n_tokens")
    dup_b = (
        dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.2, max_df=1000)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return prof.where(F.col("quality") >= 0.46).join(
        F.broadcast(dup_b), "doc_id", "left_anti"
    )


CORPUS_CLEAN_SQL = f"""
SELECT q.doc_id, q.quality, q.n_tokens
FROM ({TEXT_QUALITY_SQL}) q
WHERE q.quality >= 0.46
  AND q.doc_id NOT IN (SELECT DISTINCT doc_b FROM ({DEDUP_NGRAM_SQL}))
"""


def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed train/val split over documents
    (operators/sampling.train_val_split): ≈5% 'val', the rest 'train',
    stable across runs/partitioning/engines — md5-bucket assignment is
    a pure function of (salt, doc_id), so the exact same documents land
    in 'val' on any cluster. Pure projection; oracle-exact."""
    from ..operators import sampling

    docs = _docs(spark, sf_dir).select("doc_id")
    return sampling.train_val_split(docs, key="doc_id")


_BUCKET_SQL = "substring(md5('split-v1' || '|' || CAST(doc_id AS VARCHAR)), 1, 2)"

CORPUS_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN {_BUCKET_SQL} < '0d' THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster canonicalization: near-dup pairs (n-gram Jaccard
    ≥ 0.2) → connected components (operators/graph.connected_components,
    large-star/small-star iterative joins) → one row per document with
    its component id (= min doc_id in the cluster), the component
    size, and whether this doc is the canonical keeper. The step a
    real dedup pipeline runs AFTER pair generation: "A~B, B~C" must
    collapse to one kept document even though (A,C) was never emitted
    as a pair. The label set is tiny next to the corpus (only docs
    that appear in some pair), so BOTH the label join and the
    size join are broadcasts: component sizes are aggregated on the
    label frame alone (docs outside every pair are singletons, size
    1 by coalesce) — the corpus itself never shuffles, where a
    ``count(*) OVER (PARTITION BY component_id)`` window would
    repartition every document into mostly-singleton partitions."""
    from ..operators import graph

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.2, max_df=1000)
    labels = graph.connected_components(pairs).withColumnRenamed("node", "doc_id")
    sizes = labels.groupBy(F.col("component").alias("component_id")).agg(
        F.count("*").cast("int").alias("component_size")
    )
    out = docs.join(F.broadcast(labels), "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component_id")
    )
    return out.join(F.broadcast(sizes), "component_id", "left").select(
        "doc_id",
        "component_id",
        F.coalesce("component_size", F.lit(1)).cast("int").alias("component_size"),
        (F.col("doc_id") == F.col("component_id")).alias("is_canonical"),
    )


# Min-label reachability as a recursive CTE: UNION (not UNION ALL)
# dedups the frontier, so the fixpoint terminates; min over all
# reachable labels = the component minimum on an undirected graph.
DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS (
    SELECT doc_a, doc_b FROM ({DEDUP_NGRAM_SQL})
), sym AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(id, lbl) AS (
    SELECT u, u FROM sym
    UNION
    SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.id
), lbl AS (
    SELECT id, min(lbl) AS component_id FROM reach GROUP BY 1
)
SELECT d.doc_id,
       coalesce(l.component_id, d.doc_id) AS component_id,
       CAST(count(*) OVER (PARTITION BY coalesce(l.component_id, d.doc_id)) AS INTEGER)
           AS component_size,
       d.doc_id = coalesce(l.component_id, d.doc_id) AS is_canonical
FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
"""


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the engine's own deterministic
    split: the ≈5% 'val' bucket (operators/sampling.train_val_split)
    plays the held-out eval set; every 'train' document sharing ≥1
    4-word shingle with it is reported with its overlap count/ratio
    (operators/textstats.benchmark_overlap). k=4 is tuned to the
    corpus: it flags the genuine near-dup leakage (~7% of train docs)
    without the flag-everything degeneracy of k=3 on this small
    vocabulary. Two filtered scans of documents (train + benchmark
    branches — the split tag is a pure projection, so both filters
    push down)."""
    from ..operators import sampling

    tagged = sampling.train_val_split(_docs(spark, sf_dir), key="doc_id")
    train = tagged.where(F.col("split") == "train").select("doc_id", "text")
    bench = tagged.where(F.col("split") == "val").select("doc_id", "text")
    return textstats.benchmark_overlap(train, bench, k=4)


_SHINGLE4_SQL = (
    "CASE WHEN len(ws) < 4 THEN [] ELSE "
    "list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] "
    "FOR i IN range(1, len(ws) - 2)]) END"
)

TEXT_DECONTAMINATE_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), sh AS (
    SELECT doc_id, {_SHINGLE4_SQL} AS s FROM w
), split AS (
    SELECT doc_id, CASE WHEN {_BUCKET_SQL} < '0d' THEN 'val' ELSE 'train' END AS sp
    FROM documents
), ex AS (
    SELECT sh.doc_id, len(s) AS n_sh, sp, unnest(s) AS g
    FROM sh JOIN split USING (doc_id)
), v AS (
    SELECT DISTINCT g FROM ex WHERE sp = 'val'
)
SELECT t.doc_id,
       CAST(count(*) AS INTEGER) AS n_common_shingles,
       round(count(*) / max(t.n_sh), 6) AS overlap_ratio
FROM ex t JOIN v USING (g)
WHERE t.sp = 'train'
GROUP BY t.doc_id
"""


def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest gate (operators/dedup.incremental_ingest):
    the deterministic ≈5% 'val' bucket plays the incoming shard, the
    'train' bucket the existing corpus; every shard document is
    admitted ('novel') or flagged against its best corpus match
    ('exact' / 'near' with the argmax-Jaccard match id). Same split
    device as text_decontaminate; same max_df=1000 corpus-side
    inverted-index cap as dedup_ngram_jaccard."""
    from ..operators import sampling

    tagged = sampling.train_val_split(_docs(spark, sf_dir), key="doc_id")
    new = tagged.where(F.col("split") == "val").select("doc_id", "text")
    corpus = tagged.where(F.col("split") == "train").select("doc_id", "text")
    return dedup.incremental_ingest(new, corpus, k=3, threshold=0.2, max_df=1000)


_SHINGLE3_SQL = (
    "CASE WHEN len(ws) < 3 THEN [] ELSE "
    "list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2] "
    "FOR i IN range(1, len(ws) - 1)]) END"
)

DEDUP_INCREMENTAL_SQL = f"""
WITH split AS (
    SELECT doc_id, text,
           CASE WHEN {_BUCKET_SQL} < '0d' THEN 'val' ELSE 'train' END AS sp
    FROM documents
), newdocs AS (SELECT doc_id, text FROM split WHERE sp = 'val'),
corp AS (SELECT doc_id, text FROM split WHERE sp = 'train'),
exact AS (
    SELECT n.doc_id, min(c.doc_id) AS exact_match
    FROM newdocs n JOIN corp c ON md5(n.text) = md5(c.text)
    GROUP BY 1
),
w_n AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM newdocs),
w_c AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM corp),
ex_n AS (
    SELECT doc_id, len(s) AS n_sh, unnest(s) AS g
    FROM (SELECT doc_id, {_SHINGLE3_SQL} AS s FROM w_n)
),
ex_c AS (
    SELECT doc_id AS cid, len(s) AS c_n_sh, unnest(s) AS g
    FROM (SELECT doc_id, {_SHINGLE3_SQL} AS s FROM w_c)
),
kept_c AS (
    SELECT * FROM ex_c QUALIFY count(*) OVER (PARTITION BY g) <= 1000
),
common AS (
    SELECT n.doc_id, c.cid, n.n_sh, c.c_n_sh, count(*) AS common
    FROM ex_n n JOIN kept_c c USING (g)
    GROUP BY 1, 2, 3, 4
),
pairs AS (
    SELECT doc_id, cid, round(common / (n_sh + c_n_sh - common), 6) AS j
    FROM common
    WHERE round(common / (n_sh + c_n_sh - common), 6) >= 0.2
),
best_near AS (
    SELECT doc_id, cid AS near_match, j AS near_j
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, cid) AS rn
          FROM pairs)
    WHERE rn = 1
)
SELECT n.doc_id,
       CASE WHEN e.exact_match IS NOT NULL THEN 'exact'
            WHEN b.near_match IS NOT NULL THEN 'near'
            ELSE 'novel' END AS status,
       coalesce(e.exact_match, b.near_match) AS best_match,
       CASE WHEN e.exact_match IS NOT NULL THEN 1.0 ELSE b.near_j END AS jaccard
FROM newdocs n
LEFT JOIN exact e USING (doc_id)
LEFT JOIN best_near b USING (doc_id)
"""


# SQL twin of dedup.duplicated_ngram_fraction (the function itself is
# registered next to the other dedup queries near the top of the file;
# the SQL lives here because it shares _SHINGLE4_SQL with
# TEXT_DECONTAMINATE_SQL)
DEDUP_NGRAM_FRACTION_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), sh AS (
    SELECT doc_id, {_SHINGLE4_SQL} AS s FROM w
), ex AS (
    SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh WHERE len(s) > 0
), dfreq AS (
    SELECT g, count(*) AS df FROM ex GROUP BY g
)
SELECT ex.doc_id,
       CAST(max(ex.n_sh) AS INT) AS n_shingles,
       CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS INT) AS n_dup_shingles,
       round(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) / max(ex.n_sh), 6) AS dup_frac
FROM ex JOIN dfreq USING (g)
GROUP BY ex.doc_id
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (dedup.duplicated_spans): the
    Lee-et-al. ExactSubstr cut list — maximal word-position runs
    covered by cross-document duplicated 4-grams, merged by interval
    union, one row per span. The oracle rebuilds positional shingles
    and replays the identical gaps-and-islands merge in SQL."""
    return dedup.duplicated_spans(_docs(spark, sf_dir))


# Positional twin of DEDUP_NGRAM_FRACTION_SQL: per-START-position
# 4-gram occurrences (NOT list_distinct — every covered position
# counts), document frequency over per-doc DISTINCT shingles, then
# the textbook gaps-and-islands interval union (running max(end)
# over preceding rows → island ids) replayed exactly as the Spark
# window does it. Spans merge when overlapping OR adjacent, so each
# row is a maximal run of covered words.
DEDUP_SUBSTRING_SPANS_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), sh AS (
    SELECT doc_id, CAST(i AS INT) AS start, CAST(i + 3 AS INT) AS "end",
           ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] AS g
    FROM w, unnest(range(1, len(ws) - 2)) AS u(i)
    WHERE len(ws) >= 4
), dfreq AS (
    SELECT g FROM (SELECT DISTINCT doc_id, g FROM sh) GROUP BY g HAVING count(*) >= 2
), iv AS (
    SELECT doc_id, start, "end" FROM sh JOIN dfreq USING (g)
), m AS (
    SELECT doc_id, start, "end",
           max("end") OVER (PARTITION BY doc_id ORDER BY start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
    FROM iv
), isl AS (
    SELECT doc_id, start, "end",
           sum(CASE WHEN prev_max IS NULL OR start > prev_max + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start) AS island
    FROM m
)
SELECT doc_id,
       CAST(min(start) AS INT) AS span_start,
       CAST(max("end") AS INT) AS span_end,
       CAST(max("end") - min(start) + 1 AS INT) AS span_words
FROM isl GROUP BY doc_id, island
"""


def dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite stage (dedup.remove_duplicated_spans): the
    deduplicated corpus itself — covered words sliced out, survivors
    re-joined, span-free docs passed through. The oracle recomputes
    coverage from the UNMERGED intervals (same union as the merged
    spans) and rebuilds the text with an ordered string_agg."""
    return dedup.remove_duplicated_spans(_docs(spark, sf_dir))


DEDUP_SUBSTRING_REWRITE_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), sh AS (
    SELECT doc_id, CAST(i AS INT) AS start, CAST(i + 3 AS INT) AS "end",
           ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] AS g
    FROM w, unnest(range(1, len(ws) - 2)) AS u(i)
    WHERE len(ws) >= 4
), dfreq AS (
    SELECT g FROM (SELECT DISTINCT doc_id, g FROM sh) GROUP BY g HAVING count(*) >= 2
), iv AS (
    SELECT doc_id, start, "end" FROM sh JOIN dfreq USING (g)
), cov AS (
    SELECT DISTINCT doc_id, CAST(p AS INT) AS p
    FROM iv, unnest(range(start, "end" + 1)) AS v(p)
), tok AS (
    SELECT doc_id, CAST(i AS INT) AS p, ws[i] AS wd
    FROM w, unnest(range(1, len(ws) + 1)) AS u(i)
), kept AS (
    SELECT t.doc_id, t.p, t.wd
    FROM tok t ANTI JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
), tot AS (
    SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id
), reb AS (
    SELECT doc_id, count(*) AS n_kept,
           string_agg(wd, ' ' ORDER BY p) AS cleaned_text
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(tot.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(tot.n_words, 0) - coalesce(reb.n_kept, 0) AS INT) AS n_removed,
       coalesce(reb.cleaned_text, '') AS cleaned_text
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN reb USING (doc_id)
"""


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (dedup.cdc_chunks): LBFS-style
    rolling boundaries over the word stream, md5 chunk signatures,
    cross-document sharing counts. The oracle replays the identical
    Horner hash with list_reduce and the same prefix-sum chunk ids."""
    return dedup.cdc_chunks(_docs(spark, sf_dir))


# Chunk twin: the SAME polynomial hash (Horner base 31 over code
# points, mod 1e9+7 — list_reduce's first-element seed equals
# Spark's 0-seeded aggregate because 0*31 + c0 = c0), the same
# boundary rule (hash % 8 = 0 cuts AFTER the word), the same
# preceding-rows prefix sum for chunk ids, and md5 over the
# space-joined chunk words.
DEDUP_CDC_CHUNKS_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), tok AS (
    SELECT doc_id, CAST(i AS INT) AS p, ws[i] AS wd,
           CASE WHEN list_reduce(
                    [CAST(unicode(c) AS BIGINT) FOR c IN string_split(ws[i], '')],
                    (acc, x) -> (acc * 31 + x) % 1000000007
                ) % 8 = 0 THEN 1 ELSE 0 END AS b
    FROM w, unnest(range(1, len(ws) + 1)) AS u(i)
), ch AS (
    SELECT doc_id, p, wd,
           coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
    FROM tok
), chunks AS (
    SELECT doc_id, CAST(c AS INT) AS chunk_idx,
           CAST(min(p) AS INT) AS chunk_start,
           CAST(count(*) AS INT) AS n_words,
           md5(string_agg(wd, ' ' ORDER BY p)) AS chunk_md5
    FROM ch GROUP BY doc_id, c
), share AS (
    SELECT chunk_md5, CAST(count(DISTINCT doc_id) AS INT) AS n_docs_sharing
    FROM chunks GROUP BY chunk_md5
)
SELECT doc_id, chunk_idx, chunk_start, n_words, chunk_md5, n_docs_sharing
FROM chunks JOIN share USING (chunk_md5)
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher repetition rules
    that are non-vacuous on this corpus — its documents never repeat
    a 5-gram internally, so duplicate-n-gram *fractions* would verify
    a column of zeros; top-1 word/bigram concentration genuinely
    varies, 0.01–0.17 observed). Flag threshold 0.08 sits at the
    ~90th percentile of observed top-bigram fraction, so the flag
    splits the corpus."""
    return textstats.repetition_stats(_docs(spark, sf_dir), top_bigram_flag=0.08)


TEXT_REPETITION_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), b AS (
    SELECT doc_id, ws,
           CASE WHEN len(ws) < 2 THEN []
                ELSE [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]
           END AS bg
    FROM w
), m AS (
    SELECT doc_id,
           CAST(len(ws) AS INTEGER) AS n_words,
           CASE WHEN len(ws) = 0 THEN NULL
                ELSE list_max([len(list_filter(ws, x -> x = w)) FOR w IN list_distinct(ws)])
           END AS twc,
           len(bg) AS nbg,
           CASE WHEN len(bg) = 0 THEN NULL
                ELSE list_max([len(list_filter(bg, x -> x = g)) FOR g IN list_distinct(bg)])
           END AS tbc
    FROM b
)
SELECT doc_id, n_words,
       round(twc / NULLIF(n_words, 0), 6) AS top_word_frac,
       round(tbc / NULLIF(nbg, 0), 6) AS top_bigram_frac,
       coalesce(tbc / NULLIF(nbg, 0) > 0.08, FALSE) AS repetitive
FROM m
"""


# per-stratum keep rates for the rebalancing sample: the dominant
# 'en' stratum (~44% of docs) keeps 26/256 ≈ 10%, every minority
# language keeps 128/256 = 50% — the output is roughly
# language-balanced without any global counting.
_STRAT_BUCKETS = {"en": 26, "de": 128, "es": 128, "fr": 128, "zh": 128}


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing downsample (operators/sampling.
    stratified_sample): deterministic per-stratum hash-bucket rates
    over the ground-truth `lang` column. Pure filter — no shuffle, no
    RNG, no global counts — and reproducible across engines, which is
    what makes it oracle-checkable row-for-row."""
    from ..operators import sampling

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return sampling.stratified_sample(
        docs, key="doc_id", stratum="lang", buckets_by_stratum=_STRAT_BUCKETS
    )


_STRAT_CASE = " ".join(
    f"WHEN '{val}' THEN '{format(b, '02x')}'" for val, b in _STRAT_BUCKETS.items()
)

CORPUS_STRATIFIED_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE substring(md5('strat-v1' || '|' || CAST(doc_id AS VARCHAR)), 1, 2)
      < CASE lang {_STRAT_CASE} ELSE '00' END
"""


def embedding_centroid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table embedding analytics (operators/similarity.
    lang_centroid_scores): join documents⋈embeddings on id, build the
    per-language centroid with quantize-then-aggregate integer sums
    (order-independent ⇒ bit-reproducible ⇒ hash-oracle-able, unlike a
    naive double sum over shuffled partials), then score every doc's
    cosine to its own language's centroid — the embedding-space
    outlier signal corpus curation filters on."""
    return similarity.lang_centroid_scores(
        _docs(spark, sf_dir), _emb(spark, sf_dir), dim=64
    )


EMBEDDING_CENTROID_SQL = """
WITH j AS (
    SELECT d.doc_id, d.lang, [x::DOUBLE FOR x IN e.embedding] AS v
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
), q AS (
    SELECT doc_id, lang, v,
           [CAST(round(x * 10000000) AS BIGINT) FOR x IN v] AS qv
    FROM j
), ex AS (
    SELECT lang, r.i AS pos, qv[r.i + 1] AS val
    FROM q CROSS JOIN range(0, 64) AS r(i)
), sums AS (
    SELECT lang, pos, sum(val) AS s, count(*) AS n FROM ex GROUP BY 1, 2
), cents AS (
    SELECT lang, max(n) AS lang_n, list(s ORDER BY pos) AS sums FROM sums GROUP BY 1
), c2 AS (
    SELECT lang, lang_n,
           [CAST(s AS DOUBLE) / (lang_n * 10000000.0) FOR s IN sums] AS c
    FROM cents
), scored AS (
    SELECT doc_id, q.lang, lang_n,
           list_reduce(list_prepend(0.0, [q.v[i] * c[i] FOR i IN range(1, len(q.v) + 1)]),
                       (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN q.v]), (acc, x) -> acc + x))
              * sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN c]), (acc, x) -> acc + x)))
           AS cos
    FROM q JOIN c2 USING (lang)
)
SELECT doc_id, lang, CAST(lang_n AS INTEGER) AS lang_n, round(cos, 6) AS centroid_cos
FROM scored
"""

def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.
    pack_sequences): every document's global token offset in
    deterministic doc_id order and the 512-token training sequence it
    starts in — computed as a distributed prefix sum (range partition
    → per-partition subtotal → broadcast exclusive prefixes →
    per-partition parallel window), never a single-task global
    window."""
    from ..operators import packing

    return packing.pack_sequences(_docs(spark, sf_dir), seq_len=512)


CORPUS_PACK_SQL = f"""
WITH t AS (
    SELECT doc_id, len({_SQL_WORDS}) AS n_tokens FROM documents
), c AS (
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
    FROM t
)
SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start_token,
       CAST(start // 512 AS BIGINT) AS seq_id,
       CAST(start % 512 AS INTEGER) AS seq_off
FROM c
"""


def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (operators/packing.
    chunk_documents, 32-token windows, 8-token overlap) — the RAG /
    embedding-prep transform. Row-local sequence→slice→explode; the
    corpus scan never shuffles."""
    from ..operators import packing

    return packing.chunk_documents(_docs(spark, sf_dir), chunk_tokens=32, overlap=8)


CORPUS_CHUNK_SQL = f"""
WITH w AS (
    SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), s AS (
    SELECT doc_id, ws,
           CASE WHEN len(ws) = 0 THEN [] ELSE range(0, (len(ws) - 1) // 24 + 1) END AS idxs
    FROM w
), ex AS (
    SELECT doc_id, ws, unnest(idxs) AS chunk_idx FROM s
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk_text
FROM ex
"""

def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted source mixing (operators/sampling.
    quality_weighted_sample): every source keeps a fraction of its
    documents proportional to its mean quality score (best source =
    256/256). The rates are DERIVED FROM THE DATA yet the whole
    selection is bit-reproducible: quantized integer quality sums,
    fixed-point argmax, integer-DIV cut-offs, md5-bucket membership —
    so even this data-dependent sampler carries a hash-exact DuckDB
    oracle. On this corpus the source means sit close together, so
    cuts land at 250-256 and only the tail is dropped; the per-source
    cut column and dropped rows keep the parity non-vacuous."""
    from ..operators import sampling

    docs = _docs(spark, sf_dir)
    quality = textstats.quality_score(docs).select("doc_id", "quality")
    return sampling.quality_weighted_sample(docs, quality)


CORPUS_SOURCE_MIX_SQL = f"""
WITH q AS (
    SELECT doc_id, quality FROM ({TEXT_QUALITY_SQL})
), j AS (
    SELECT d.doc_id, d.source, CAST(round(q.quality * 1000000) AS BIGINT) AS q6
    FROM documents d JOIN q USING (doc_id)
), stats AS (
    SELECT source, sum(q6) AS s, count(*) AS n FROM j GROUP BY 1
), ranked AS (
    SELECT source, s, n,
           row_number() OVER (
               ORDER BY (CAST(s AS DECIMAL(38,0)) * 1000000000000) // n DESC, source
           ) AS rn
    FROM stats
), best AS (
    SELECT s AS s_max, n AS n_max FROM ranked WHERE rn = 1
), cuts AS (
    SELECT source, CAST((256 * s * n_max) // (n * s_max) AS INTEGER) AS cut
    FROM stats CROSS JOIN best
)
SELECT d.doc_id, d.source, c.cut
FROM documents d JOIN cuts c USING (source)
WHERE substring(md5('mix-v1' || '|' || CAST(d.doc_id AS VARCHAR)), 1, 2)
      < CASE WHEN c.cut >= 256 THEN 'zz' ELSE lpad(lower(hex(c.cut)), 2, '0') END
"""

# --------------------------------------------------------- round-5 additions


def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import words_col
    from ..operators.dedup import _spread

    # _spread (r15): the single-row-group documents file otherwise
    # runs the whole tokenize+md5×4+partial-sketch pass — the query's
    # dominant CPU — on ONE task (a measured 1.7 s single-task stage
    # at sf0.1; the parquet row-group split-count lie, cf.
    # cosine_near_dup_pairs). Counter sums are integers, so the
    # sketch — and the DuckDB oracle replay — is partitioning-
    # independent.
    toks = _spread(_docs(spark, sf_dir)).select(
        F.explode(words_col("text")).alias("token")
    )
    return sketches.cms_heavy_hitters(toks, k=15)


def _cms_sql(depth: int = 4, width: int = 512, k: int = 15) -> str:
    """DuckDB twin of cms_heavy_hitters: same md5 bucket hash (one
    digest per occurrence, hex slice [8r+1, 8r+8] per depth row, mod
    width), so the sketch counters — and therefore every min-over-rows
    estimate — are bit-equal."""
    rows = ", ".join(f"({i})" for i in range(depth))
    bucket = f"CAST('0x' || substr(md5(item), r * 8 + 1, 8) AS BIGINT) % {width}"
    return f"""
WITH toks AS (SELECT unnest({_SQL_WORDS}) AS item FROM documents),
probes AS (SELECT item, r FROM toks CROSS JOIN (VALUES {rows}) d(r)),
sketch AS (
    SELECT r, {bucket} AS bucket, count(*) AS cnt
    FROM probes GROUP BY 1, 2
),
cand AS (SELECT DISTINCT item FROM toks),
cp AS (SELECT item, r, {bucket} AS bucket
       FROM cand CROSS JOIN (VALUES {rows}) d(r)),
est AS (
    SELECT cp.item, min(coalesce(s.cnt, 0)) AS est
    FROM cp LEFT JOIN sketch s ON s.r = cp.r AND s.bucket = cp.bucket
    GROUP BY cp.item
),
ranked AS (SELECT item, est, row_number() OVER (ORDER BY est DESC, item) AS rn FROM est)
SELECT item AS token, est, rn FROM ranked WHERE rn <= {k}
"""


CMS_HEAVY_HITTERS_SQL = _cms_sql()


def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.source_cap(_docs(spark, sf_dir), cap=10)


def _source_cap_sql(cap: int = 10, headroom: int = 2, salt: str = "cap-v1") -> str:
    """DuckDB twin of sampling.source_cap — both phases mirrored (the
    broadcast count/cut table AND the pre-filter), so the comparison is
    exact even in the measure-zero case where the pre-filter undershoots
    the cap."""
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
cuts AS (
    SELECT source, LEAST(CAST((256 * {cap} * {headroom} + n - 1) // n AS INT), 256) AS cut
    FROM counts
),
b AS (
    SELECT d.doc_id, d.source,
           substring(md5('{salt}' || '|' || CAST(d.doc_id AS VARCHAR)), 1, 2) AS bkt,
           c.cut
    FROM documents d JOIN cuts c USING (source)
),
surv AS (
    SELECT doc_id, source, bkt FROM b
    WHERE bkt < CASE WHEN cut >= 256 THEN 'zz' ELSE lpad(lower(hex(cut)), 2, '0') END
),
ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) AS rn
    FROM surv
)
SELECT doc_id, source, rn FROM ranked WHERE rn <= {cap}
"""


CORPUS_SOURCE_CAP_SQL = _source_cap_sql()


# The registered threshold sits inside the fixture's observed cosine
# distribution (pair max ~0.51 — see _COSINE_NEAR_DUP_THRESHOLD) so the
# dedup predicate is non-vacuous: 8 cells / 0.35 removes 61 of 500
# vectors at sf0.001 and 70 at sf0.01, and the oracle verifies the cell
# assignment AND the dominated-set subtraction value-exactly.
_SEMDEDUP_CELLS = 8
_SEMDEDUP_THRESHOLD = 0.35


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup(
        _emb(spark, sf_dir), n_cells=_SEMDEDUP_CELLS, threshold=_SEMDEDUP_THRESHOLD
    )


def dedup_semantic_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over k-means-fitted cells (similarity.fit_centroids —
    the data-adaptive clustering the published method actually uses;
    the deterministic-centroid twin above carries the oracle, this
    face carries the quality: fitted cells group near-duplicates
    together more often, so fewer cross-cell pairs escape the
    intra-cell check). Rows-only at the driver — the fit's float sums
    are partitioning-dependent; quality pinned in
    tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    cents = similarity.fit_centroids(emb, n_cells=_SEMDEDUP_CELLS)
    return similarity.semantic_dedup(
        emb, n_cells=_SEMDEDUP_CELLS, threshold=_SEMDEDUP_THRESHOLD, centroids=cents
    )


def _semantic_dedup_sql(
    n_cells: int = _SEMDEDUP_CELLS,
    threshold: float = _SEMDEDUP_THRESHOLD,
    dim: int = 64,
) -> str:
    """DuckDB twin of similarity.semantic_dedup, generated from the
    same deterministic centroids (cf. _ivf_sql — identical assignment
    tie-break: argmax dot, lowest cell id)."""
    cents = similarity.ivf_centroids(n_cells, dim)
    values = ",\n    ".join(
        f"({j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])" for j, c in enumerate(cents)
    )

    def dot(v: str, c: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, [{v}[i] * {c}[i] FOR i IN range(1, len({v}) + 1)]), "
            "(acc, x) -> acc + x)"
        )

    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
      FROM e
      WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0),
cents(j, c) AS (VALUES
    {values}),
cd AS (SELECT n.vec_id, n.v, n.nrm, cents.j, {dot('n.v', 'cents.c')} AS d
       FROM n CROSS JOIN cents),
cell AS (SELECT vec_id, v, nrm, j AS cell
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, j) AS rnk
               FROM cd)
         WHERE rnk = 1),
dominated AS (
    SELECT DISTINCT b.vec_id
    FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= {threshold}
)
SELECT c.vec_id, c.cell FROM cell c
WHERE NOT EXISTS (SELECT 1 FROM dominated d WHERE d.vec_id = c.vec_id)
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


# "table hash" is the corpus's most frequent bigram (48 occurrences at
# sf0.01), so the phrase join and the occurrence ranking are both
# non-vacuous; unit tests exercise 3-token phrases and misses.
_PHRASE = ("table", "hash")


def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.phrase_search(_docs(spark, sf_dir), list(_PHRASE), top_k=10)


def _phrase_sql(phrase=_PHRASE, top_k: int = 10) -> str:
    """DuckDB twin of textstats.phrase_search: the adjacency joins are
    re-expressed as one array comprehension counting start positions
    where every phrase term matches at its offset."""
    m = len(phrase)
    cond = " AND ".join(f"ws[i + {j}] = '{t}'" for j, t in enumerate(phrase))
    return f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
c AS (
    SELECT doc_id,
           len([i FOR i IN range(1, len(ws) - {m} + 2) IF {cond}]) AS n
    FROM w
),
ranked AS (
    SELECT doc_id, CAST(n AS INT) AS n_occurrences,
           row_number() OVER (ORDER BY n DESC, doc_id) AS rn
    FROM c WHERE n > 0
)
SELECT doc_id, n_occurrences, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= {top_k}
"""


TEXT_PHRASE_SQL = _phrase_sql()


def similarity_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation AS A QUERY
    (operators/similarity.ranking_metrics): the IVF ANN results scored
    against the brute-force exact top-k as ground truth — per-query
    recall and MRR, i.e. the measurement the pytest recall assertions
    make, productized and oracle-checked (both inputs are
    deterministic, so the whole evaluation is SQL-expressible)."""
    emb = _emb(spark, sf_dir)
    results = similarity.ivf_topk(emb, n_queries=10, k=5, n_cells=16, n_probe=4, dim=64)
    truth = similarity.brute_force_topk(emb, n_queries=10, k=5).select(
        "q_id", F.col("neighbor_id").alias("rel_id")
    )
    return similarity.ranking_metrics(results, truth)


SIMILARITY_EVAL_SQL = f"""
WITH res AS ({_ivf_sql()}),
tru AS (SELECT q_id, neighbor_id AS rel_id FROM ({SIMILARITY_TOPK_SQL})),
hits AS (
    SELECT r.q_id, count(*) AS n_hit, min(r.rn) AS first_rank
    FROM res r JOIN tru t ON r.q_id = t.q_id AND r.neighbor_id = t.rel_id
    GROUP BY 1
),
ret AS (SELECT q_id, count(*) AS n_retrieved FROM res GROUP BY 1),
rel AS (SELECT q_id, count(*) AS n_relevant FROM tru GROUP BY 1)
SELECT coalesce(rel.q_id, ret.q_id) AS q_id,
       CAST(coalesce(rel.n_relevant, 0) AS INT) AS n_relevant,
       CAST(coalesce(ret.n_retrieved, 0) AS INT) AS n_retrieved,
       CAST(coalesce(h.n_hit, 0) AS INT) AS n_hit,
       round(coalesce(h.n_hit, 0) / NULLIF(coalesce(rel.n_relevant, 0), 0), 6) AS recall,
       coalesce(round(1.0 / h.first_rank, 6), 0.0) AS mrr
FROM rel
FULL OUTER JOIN ret ON rel.q_id = ret.q_id
LEFT JOIN hits h ON coalesce(rel.q_id, ret.q_id) = h.q_id
"""


_BM25_TERMS = ("spark", "window", "join")  # all present in the fixture vocabulary


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bm25_search(_docs(spark, sf_dir), list(_BM25_TERMS))


def _bm25_sql(terms=_BM25_TERMS, k1: float = 1.2, b: float = 0.75, top_k: int = 10) -> str:
    """DuckDB twin of textstats.bm25_search: identical expression tree
    and float literals (k1+1 rendered from the same Python double), so
    the 6-dp-rounded contributions and their decimal sum are
    bit-equal."""
    from ..functions.numeric import sql_decimal_sum

    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ({in_list}) GROUP BY 1, 2),
dl AS (SELECT doc_id, len(ws) AS dl FROM w),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
    SELECT tf.doc_id,
           round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * {k1 + 1}) / (tf + {k1} * ({1 - b} + ({b} * dl) / avgdl)),
                 6) AS part
    FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
),
scored AS (SELECT doc_id, round({sql_decimal_sum('part')}, 6) AS score
           FROM contrib GROUP BY doc_id),
ranked AS (SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
           FROM scored)
SELECT doc_id, score, rn FROM ranked WHERE rn <= {top_k}
"""


TEXT_BM25_SQL = _bm25_sql()


# same-threshold triangle analysis of the near-dup graph; 0.35 sits in
# the fixture's cosine mass (3 triangles at sf0.001, 4 at sf0.01) so
# the wedge-close path is exercised non-vacuously.
_TRIANGLE_THRESHOLD = 0.35


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts of the cosine near-dup graph via the
    degree-oriented wedge join (operators/graph.triangle_counts) —
    dense-clique detection over the dedup candidate pairs."""
    from ..operators import graph

    pairs = similarity.cosine_near_dup_pairs(_emb(spark, sf_dir), _TRIANGLE_THRESHOLD)
    return graph.triangle_counts(pairs)


def graph_kcore_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_kcore's scale path: the same simultaneous peel fed by
    the banded-LSH pair sweep instead of the all-pairs baseline — no
    quadratic stage, still exactly oracled (the LSH pairs CTE feeds
    the same unrolled-peel oracle; see graph_triangles_lsh for the
    composition rationale)."""
    from ..operators import graph

    pairs = similarity.cosine_near_dup_lsh(
        _emb(spark, sf_dir), threshold=_TRIANGLE_THRESHOLD, n_planes=4, n_tables=8
    )
    return graph.kcore(pairs, k=2, src="vec_a", dst="vec_b")


def graph_triangles_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_triangles' SCALE PATH, end-to-end: the same
    degree-oriented wedge join fed by the banded-LSH pair sweep
    (similarity.cosine_near_dup_lsh) instead of the all-pairs cosine
    baseline — no quadratic stage anywhere in the plan, so the whole
    query inherits the LSH family's near-linear scaling instead of
    the edge build's O(n²) (SCALING.md charges graph_triangles with
    exactly that inherited term). Exactly oracled: the deterministic
    literal hyperplanes make the LSH edge list itself
    SQL-replayable (_triangles_lsh_sql composes _lsh_near_dup_sql
    into the shared triangle tail). Recall relative to the exact-fed
    twin follows the banding S-curve; on planted identical-duplicate
    cliques recall is exactly 1 (equal vectors share every bucket) —
    asserted in tests/test_graph.py. graph.kcore composes with the
    same LSH edge source identically."""
    from ..operators import graph

    pairs = similarity.cosine_near_dup_lsh(
        _emb(spark, sf_dir), threshold=_TRIANGLE_THRESHOLD, n_planes=4, n_tables=8
    )
    return graph.triangle_counts(pairs)


def _triangles_tail_sql() -> str:
    """The edge-source-independent tail of the triangle-count oracle:
    degree orientation, wedge enumeration, closing-edge probe, and
    the member count — mirrors graph.triangle_counts exactly (UNION
    ALL everywhere, same (degree, id) tie-breaks). Prepend any WITH
    chain that ends in an ``e0(a, b)`` CTE of undirected a < b edges."""
    return """
deg AS (SELECT node, count(*) AS d
        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY node),
o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b) THEN e0.a ELSE e0.b END AS lo,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b) THEN e0.b ELSE e0.a END AS hi,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e0.a < e0.b) THEN db.d ELSE da.d END AS dhi
      FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b),
wedge AS (SELECT w1.lo, w1.hi AS x, w2.hi AS y
          FROM o w1 JOIN o w2 ON w1.lo = w2.lo
          WHERE w1.dhi < w2.dhi OR (w1.dhi = w2.dhi AND w1.hi < w2.hi)),
tri AS (SELECT wedge.lo, wedge.x, wedge.y
        FROM wedge JOIN o ON o.lo = wedge.x AND o.hi = wedge.y),
member AS (SELECT lo AS node FROM tri
           UNION ALL SELECT x FROM tri
           UNION ALL SELECT y FROM tri)
SELECT node, CAST(count(*) AS INT) AS n_triangles FROM member GROUP BY node
"""


def _triangles_sql(threshold: float = _TRIANGLE_THRESHOLD) -> str:
    """DuckDB twin of graph.triangle_counts over the exact cosine
    near-dup pairs (see _triangles_tail_sql for the shared tail)."""
    dot = (
        "list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]), "
        "(acc, x) -> acc + x)"
    )
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
      FROM e
      -- zero-norm guard (ADVICE r5): without it a 0-vector is a NaN
      -- universal hub inflating every node's triangle count
      WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0),
e0 AS (SELECT a.vec_id AS a, b.vec_id AS b
       FROM n a JOIN n b ON a.vec_id < b.vec_id
       WHERE {dot} / (a.nrm * b.nrm) >= {threshold}),{_triangles_tail_sql()}"""


def _triangles_lsh_sql(
    threshold: float = _TRIANGLE_THRESHOLD, n_planes: int = 4, n_tables: int = 8
) -> str:
    """Triangle-count oracle over the LSH-generated edge list — the
    exact _lsh_near_dup_sql pair sweep (deterministic literal
    hyperplanes, bit-identical buckets and verify cosines) as the
    ``e0`` source of the shared degree-oriented tail."""
    pairs = _lsh_near_dup_sql(threshold, n_planes=n_planes, n_tables=n_tables)
    return f"""
WITH e0 AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM ({pairs})),{_triangles_tail_sql()}"""


GRAPH_TRIANGLES_SQL = _triangles_sql()
GRAPH_TRIANGLES_LSH_SQL = _triangles_lsh_sql()


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the cosine near-dup graph (operators/graph.kcore):
    the maximal subgraph where every vector keeps >= 2 near-dup
    neighbours — dense duplicate clusters minus the incidental pair
    chains. Simultaneous peel, fixpoint-probed per round; the oracle
    unrolls the same rounds as a generated CTE chain (the bpe_train
    pattern for iterative algorithms). Like graph_triangles, the edge
    list comes from the REGISTERED O(n²) cosine pair baseline so the
    driver row is directly comparable to graph_triangles — SCALING.md
    charges both against embeddings growth and shows the inherited
    super-linear edge build. The scale path is the LSH pair
    generator, which composes identically and stays exactly oracled
    (see graph_triangles_lsh / _lsh_near_dup_sql)."""
    from ..operators import graph

    pairs = similarity.cosine_near_dup_pairs(_emb(spark, sf_dir), _TRIANGLE_THRESHOLD)
    return graph.kcore(pairs, k=2, src="vec_a", dst="vec_b")


def _kcore_sql(threshold: float = _TRIANGLE_THRESHOLD, k: int = 2, rounds: int = 24) -> str:
    """DuckDB twin of graph.kcore over the cosine near-dup pairs: the
    same symmetric edge list (zero-norm guard included), then
    ``rounds`` unrolled peel rounds — survivors = nodes with degree
    >= k, edges filtered to survivor pairs. The peel is a fixpoint,
    so unrolling MORE rounds than the data needs is a no-op; the
    Spark side raises if it ever needs more than the same bound
    (graph.kcore max_rounds), so the engines cannot silently
    disagree."""
    dot = (
        "list_reduce(list_prepend(0.0, [a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]), "
        "(acc, x) -> acc + x)"
    )
    parts = [
        f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
      FROM e
      WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0),
p AS (SELECT a.vec_id AS a, b.vec_id AS b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE {dot} / (a.nrm * b.nrm) >= {threshold}),
e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM p UNION ALL SELECT b, a FROM p)"""
    ]
    parts.extend(_kcore_round_parts(k, rounds))
    return "".join(parts)


def _kcore_round_parts(k: int, rounds: int) -> list[str]:
    """The edge-source-independent peel unroll shared by the exact
    and LSH-fed k-core oracles: ``rounds`` MATERIALIZED round CTEs
    over an ``e0(u, v)`` symmetric edge list, then the core-degree
    count. Each round references the previous one three times (degree
    scan + two survivor subqueries) — without MATERIALIZED the
    inlined tree grows 3^rounds and DuckDB re-opens the base parquet
    scan exponentially many times ("Too many open files")."""
    parts = []
    for r in range(1, rounds + 1):
        parts.append(
            f""",
s{r} AS MATERIALIZED (SELECT u FROM e{r - 1} GROUP BY u HAVING count(*) >= {k}),
e{r} AS MATERIALIZED (SELECT x.u, x.v FROM e{r - 1} x
         WHERE x.u IN (SELECT u FROM s{r}) AND x.v IN (SELECT u FROM s{r}))"""
        )
    parts.append(
        f"""
SELECT u AS node, CAST(count(*) AS INT) AS core_degree FROM e{rounds} GROUP BY u"""
    )
    return parts


def _kcore_lsh_sql(
    threshold: float = _TRIANGLE_THRESHOLD,
    k: int = 2,
    rounds: int = 24,
    n_planes: int = 4,
    n_tables: int = 8,
) -> str:
    """k-core oracle over the LSH-generated edge list — the exact
    _lsh_near_dup_sql pair sweep as the ``e0`` source of the shared
    peel unroll (cf. _triangles_lsh_sql)."""
    pairs = _lsh_near_dup_sql(threshold, n_planes=n_planes, n_tables=n_tables)
    parts = [
        f"""
WITH p AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM ({pairs})),
e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM p UNION ALL SELECT b, a FROM p)"""
    ]
    parts.extend(_kcore_round_parts(k, rounds))
    return "".join(parts)


GRAPH_KCORE_SQL = _kcore_sql()
GRAPH_KCORE_LSH_SQL = _kcore_lsh_sql()


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lang is the skewed stratum on this corpus (en ≈ 3.4× fr), so the
    # α=0.5 flattening genuinely drops head-language rows while the
    # tail keeps cut=256 — non-vacuous in both directions
    return sampling.temperature_mix(
        _docs(spark, sf_dir), key="doc_id", stratum="lang", alpha=0.5
    )


def _temperature_mix_sql(alpha: float = 0.5, salt: str = "temp-v1") -> str:
    """DuckDB twin of sampling.temperature_mix — same 9-dp-rounded
    pow rate, same floor to the 65536-bucket cut (4 hex chars: the
    256-bucket space would zero out extreme-skew strata — see the
    operator docstring), same md5 bucket filter."""
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
mn AS (SELECT min(n) AS n_min FROM counts),
cuts AS (
    SELECT lang,
           least(65536, CAST(floor(65536 * round(pow(mn.n_min / n, {1.0 - alpha}), 9)) AS INT)) AS cut
    FROM counts CROSS JOIN mn
)
SELECT d.doc_id, d.lang, c.cut
FROM documents d JOIN cuts c USING (lang)
WHERE substring(md5('{salt}' || '|' || CAST(d.doc_id AS VARCHAR)), 1, 4)
      < CASE WHEN c.cut >= 65536 THEN 'zzzz' ELSE lpad(lower(hex(c.cut)), 4, '0') END
"""


CORPUS_TEMPERATURE_SQL = _temperature_mix_sql()


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.weighted_priority_sample(
        _docs(spark, sf_dir), key="doc_id", weight="n_chars", k=50
    )


def _weighted_sample_sql(k: int = 50, salt: str = "wsample-v1") -> str:
    """DuckDB twin of sampling.weighted_priority_sample — same md5-
    derived u (13 hex chars = 2^52, exactly double-representable),
    same ln(u)/w ranking rounded to 9 dp."""
    from ..operators.sampling import _U_DENOM

    return f"""
WITH s AS (
    SELECT doc_id, n_chars,
           (CAST('0x' || substr(md5('{salt}' || '|' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1)
               / {_U_DENOM!r} AS u
    FROM documents WHERE n_chars > 0
),
p AS (SELECT doc_id, n_chars, round(ln(u) / n_chars, 9) AS pr FROM s),
ranked AS (SELECT doc_id, n_chars, pr,
                  row_number() OVER (ORDER BY pr DESC, doc_id) AS rn
           FROM p)
SELECT doc_id, n_chars, pr, rn FROM ranked WHERE rn <= {k}
"""


CORPUS_WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus release summary ("data card"): document and
    token volumes, mean quality, unique-fingerprint count (exact-dup
    proxy), and language spread — ONE profile scan (doc_profile with
    ``keep=("source",)``, so no corpus-wide doc_id join) plus one
    groupBy(source) with map-side partials. The mean uses decimal_sum
    so it is addition-order-independent and hash-oracle-able."""
    from ..functions.numeric import decimal_sum

    prof = textstats.doc_profile(_docs(spark, sf_dir), keep=("source",))
    return (
        prof.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(decimal_sum(F.col("quality")) / F.count("*"), 6).alias("mean_quality"),
            F.count_distinct("fingerprint").alias("n_unique_fingerprints"),
            F.count_distinct("pred_lang").cast("int").alias("n_langs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


CORPUS_DATA_CARD_SQL = f"""
WITH prof AS ({TEXT_DOC_PROFILE_SQL}),
j AS (SELECT d.source, p.* FROM documents d JOIN prof p USING (doc_id))
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(CAST(quality AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS mean_quality,
       count(DISTINCT fingerprint) AS n_unique_fingerprints,
       CAST(count(DISTINCT pred_lang) AS INT) AS n_langs,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens
FROM j GROUP BY source
"""


def corpus_release_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end release gate composing the round-5 curation ops in
    the order a production corpus build runs them: per-source quota
    cap (no domain dominates) → quality floor → exact-dup
    canonicalization (min doc_id per fingerprint). Returns the kept
    (doc_id, source, quality).

    Plan shape: the cap runs its two-phase rank on (doc_id, source)
    only; quality + fingerprint come from ONE doc_profile scan; the
    dedup canonicalization windows over fingerprint AFTER the cap and
    floor have shrunk the row set. Three shuffles total on the
    surviving slice, never a second corpus scan."""
    docs = _docs(spark, sf_dir)
    capd = sampling.source_cap(docs, cap=10).select("doc_id", "source")
    prof = textstats.doc_profile(docs).select("doc_id", "quality", "fingerprint")
    j = capd.join(prof, "doc_id").where(F.col("quality") >= 0.46)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        j.withColumn("fr", F.row_number().over(w))
        .where(F.col("fr") == 1)
        .select("doc_id", "source", "quality")
    )


CORPUS_RELEASE_SQL = f"""
WITH capd AS ({_source_cap_sql()}),
q AS ({TEXT_QUALITY_SQL}),
f AS ({TEXT_FINGERPRINT_SQL}),
j AS (
    SELECT capd.doc_id, capd.source, q.quality, f.fingerprint
    FROM capd JOIN q USING (doc_id) JOIN f USING (doc_id)
    WHERE q.quality >= 0.46
),
kept AS (
    SELECT doc_id, source, quality,
           row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS fr
    FROM j
)
SELECT doc_id, source, quality FROM kept WHERE fr = 1
"""


def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/quantize.pq_adc_topk):
    the corpus is scored purely from its 8-code PQ index via a
    broadcast per-query lookup table — no float vector access at query
    time; deterministic codebooks make even this approximate search
    hash-exact against DuckDB."""
    from ..operators import quantize

    return quantize.pq_adc_topk(_emb(spark, sf_dir))


def _pq_adc_sql(n_queries: int = 10, k: int = 5) -> str:
    """DuckDB twin of quantize.pq_adc_topk, generated from the same
    deterministic codebooks: identical sub-dot folds, argmax
    tie-breaks, 6-dp LUT rounding, and decimal summation."""
    from ..operators import quantize

    books = quantize.pq_codebooks()
    sub_dim = len(books[0][0])
    values = ",\n    ".join(
        f"({s}, {j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for s, book in enumerate(books)
        for j, c in enumerate(book)
    )
    sub_dot = (
        f"list_reduce(list_prepend(0.0, [{{vec}}[cb.s * {sub_dim} + i] * cb.c[i] "
        f"FOR i IN range(1, {sub_dim + 1})]), (acc, x) -> acc + x)"
    )
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x)) AS nrm
      FROM e
      WHERE list_reduce(list_prepend(0.0, [x * x FOR x IN v]), (acc, x) -> acc + x) > 0),
u AS (SELECT vec_id, [x / nrm FOR x IN v] AS u FROM n),
cb(s, j, c) AS (VALUES
    {values}),
cells AS (
    SELECT vec_id, s, j AS code FROM (
        SELECT u.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY u.vec_id, cb.s
                                  ORDER BY {sub_dot.format(vec='u.u')} DESC, cb.j) AS rnk
        FROM u CROSS JOIN cb
    ) WHERE rnk = 1
),
lut AS (
    SELECT q.vec_id AS q_id, cb.s, cb.j AS code,
           round({sub_dot.format(vec='q.u')}, 6) AS w
    FROM u q CROSS JOIN cb WHERE q.vec_id < {n_queries}
),
scored AS (
    SELECT l.q_id, c.vec_id AS neighbor_id,
           round(CAST(SUM(CAST(w AS DECIMAL(25,6))) AS DOUBLE), 6) AS score
    FROM cells c JOIN lut l ON l.s = c.s AND l.code = c.code AND c.vec_id <> l.q_id
    GROUP BY 1, 2
),
ranked AS (SELECT q_id, neighbor_id, score,
                  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS rn
           FROM scored)
SELECT q_id, neighbor_id, score, rn FROM ranked WHERE rn <= {k}
"""


PQ_ADC_SQL = _pq_adc_sql()


def text_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.source_unigram_kl(_docs(spark, sf_dir))


def _source_drift_sql(vocab_size: int = 25, alpha: float = 0.5) -> str:
    """DuckDB twin of textstats.source_unigram_kl — same vocabulary
    rank, same smoothing constants (rendered from the same Python
    floats), same REALIZED-vocabulary smoothing denominator (ADVICE
    r5: nominal V breaks Σp=1 on small corpora), same 9-dp rounding
    and DECIMAL(25,9) summation."""
    return f"""
WITH toks AS (SELECT source, unnest({_SQL_WORDS}) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (
    SELECT tok FROM (
        SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rn FROM counts
    ) WHERE rn <= {vocab_size}
),
vt AS (SELECT t.source, t.tok FROM toks t JOIN vocab USING (tok)),
corpus AS (SELECT tok, count(*) AS ct FROM vt GROUP BY tok),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS v_sz FROM corpus),
per_src AS (SELECT source, tok, count(*) AS cst FROM vt GROUP BY 1, 2),
src_tot AS (SELECT source, CAST(sum(cst) AS BIGINT) AS n_s FROM per_src GROUP BY source),
grid AS (
    SELECT s.source, s.n_s,
           (coalesce(p.cst, 0) + {alpha}) / (s.n_s + {alpha} * t.v_sz) AS p,
           c.ct / t.n_total AS q
    FROM src_tot s CROSS JOIN corpus c
    LEFT JOIN per_src p ON p.source = s.source AND p.tok = c.tok
    CROSS JOIN tot t
),
contrib AS (SELECT source, n_s, round(p * ln(p / q), 9) AS c FROM grid)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
       round(CAST(SUM(CAST(c AS DECIMAL(25,9))) AS DOUBLE), 9) AS kl
FROM contrib GROUP BY source
"""


TEXT_SOURCE_DRIFT_SQL = _source_drift_sql()


# Fixture vocabulary is ~30 distinct words; size 25 leaves real OOV
# hits so the reserved-id path is exercised, not just compiled.
_VOCAB_SIZE = 25


def corpus_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab.vocab_encode(_docs(spark, sf_dir), size=_VOCAB_SIZE)


CORPUS_VOCAB_ENCODE_SQL = f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
occ AS (
    SELECT doc_id,
           unnest(range(1, len(ws) + 1)) AS pos,
           unnest(list_transform(range(1, len(ws) + 1), i -> ws[i])) AS tok
    FROM w
),
counts AS (SELECT tok, count(*) AS c FROM occ GROUP BY tok),
vocab AS (
    SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS id
    FROM counts ORDER BY c DESC, tok LIMIT {_VOCAB_SIZE}
),
enc AS (
    SELECT occ.doc_id, occ.pos, coalesce(v.id, 0) AS id
    FROM occ LEFT JOIN vocab v ON occ.tok = v.tok
)
SELECT doc_id,
       list(id ORDER BY pos) AS ids,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS INT) AS n_oov
FROM enc GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        # r8 rotation: dedup_exact, similarity_cosine_near_dup (the
        # documented O(n²) baseline — still headline in the bench and
        # SCALING.md's super-linear anchor), and multimodal_decode_image
        # to EXTRA with oracles kept; their slots plus the relational/
        # corpus/events rotations let the driver hash the r7-oracled
        # families (PNG/WAV decode, BPE merge counts, dim-stats,
        # standardize, model quality) and the NEW r8 queries (iterated
        # BPE train/encode, perceptual-hash near-dup). Window stays
        # 50/50 oracled.
        QuerySpec("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_SQL, dedup.ngram_jaccard_pairs.__doc__, headline=True, tags=("northstar", "dedup")),
        # DEDUP_PAIRS_EXACT_SQL is the exact uncapped pair set at the
        # registered 0.5 threshold; the 32×2 banding keeps per-pair miss
        # probability ≤ 1e-4 anywhere at/above it (see _MINHASH_THRESHOLD
        # comment), so the oracle is robust to adversarial fixtures, not
        # corpus-shape-dependent. The mid-similarity S-curve regime is
        # additionally pinned by
        # tests/test_dedup.py::test_minhash_lsh_recall_and_precision.
        # r12 rotation OUT (driver-green 10 rounds since r2; see
        # plans/relational.py r12 rotation comment): dedup_minhash_lsh
        # moves to EXTRA below with its exact oracle.
        # r5 rotation: dedup_simhash and similarity_ann_lsh (both
        # rows-only by construction, pytest-pinned recall) moved to
        # EXTRA_QUERIES to open driver slots for the two new ORACLED
        # families below — the window's oracled count rises 45 → 47.
        QuerySpec("dedup_semantic", dedup_semantic, SEMANTIC_DEDUP_SQL, similarity.semantic_dedup.__doc__, headline=True, tags=("northstar", "dedup", "similarity", "pipeline")),
        # r8 session-3 rotation: the brute-force topk baseline and the
        # centroid-score pipeline face keep their oracles in extras; their
        # slots carried the video fingerprint near-dup (rotated OUT r13
        # after 5 driver-green rounds — phash/audio keep the modality
        # family in-window; its exact oracle moves to EXTRA below) and
        # the entity-resolution pipeline (plans/entity.py).
        # r6 rotation (VERDICT r5 item 7): the three rows-only window
        # entries (similarity_cosine_near_dup_lsh,
        # similarity_ivf_fitted_topk, events_distinct_rollup) moved to
        # EXTRA_QUERIES — their correctness evidence was always the
        # pytest property suite, not the driver's rows-only check — to
        # open slots for the ORACLED r5 families text_bm25_search,
        # graph_triangles, corpus_release_pipeline. Window: 50/50 oracled.
        QuerySpec("sketch_heavy_hitters", sketch_heavy_hitters, CMS_HEAVY_HITTERS_SQL, sketches.cms_heavy_hitters.__doc__, headline=True, tags=("northstar", "sketch", "approx", "topk")),
        # r7 rotation: similarity_quantized_topk moved to EXTRA (the
        # quantize family keeps its oracle there + the PQ-ADC twin;
        # similarity_ivf_topk keeps ANN in-window) — freed slots, with
        # q17/json_funcs/events_sliding/events_session, carry the five
        # r6-oracled families the driver had never hashed:
        # dedup_incremental_ingest, text_phrase_search,
        # events_anomaly_zscore, events_transition_matrix,
        # corpus_temperature_mix. Window stays 50/50 oracled.
        QuerySpec("dedup_incremental_ingest", dedup_incremental_ingest, DEDUP_INCREMENTAL_SQL, dedup.incremental_ingest.__doc__, headline=True, tags=("northstar", "dedup", "pipeline", "join")),
        # text_phrase_search rotated to EXTRA in r14 (driver-hashed
        # green r7-r13; keeps headline bench + exact oracle in parity)
        # — the freed slot carries multimodal_decode_wav, the real
        # RIFF-walk audio decode parity row never driver-hashed
        # (VERDICT r13 item 8).
        QuerySpec("multimodal_decode_wav", multimodal_decode_wav, MULTIMODAL_DECODE_WAV_SQL, multimodal.decode_audio_stats.__doc__, tags=("northstar", "multimodal", "decode", "audio")),
        # corpus_temperature_mix rotated to EXTRA late-r8 (driver-
        # hashed green in r7; corpus family stays in-window via
        # pack_sequences / release_pipeline / bpe_train+encode). Its
        # slot and events_transition_matrix's carry the LSH family's
        # r8 exact-oracle upgrade: the banded pair sweep and the
        # LSH-fed triangle scale path, both hash-checked now that the
        # deterministic literal hyperplanes have DuckDB twins.
        QuerySpec("similarity_cosine_near_dup_lsh", similarity_cosine_near_dup_lsh, LSH_NEAR_DUP_SQL, similarity_cosine_near_dup_lsh.__doc__, headline=True, tags=("northstar", "similarity", "dedup", "lsh")),
        QuerySpec("graph_triangles_lsh", graph_triangles_lsh, GRAPH_TRIANGLES_LSH_SQL, graph_triangles_lsh.__doc__, headline=True, tags=("northstar", "graph", "dedup", "lsh")),
        # r9 (VERDICT r8 items 3+4): the production LSH operating
        # point and the eval harness join the window — the prod
        # point's near-empty candidate set is now a driver-hashed
        # claim, and the recall/candidate-ratio numbers at BOTH
        # operating points are hash-checked, not just parity-checked.
        QuerySpec("similarity_near_dup_lsh_prod", similarity_near_dup_lsh_prod, LSH_NEAR_DUP_PROD_SQL, similarity_near_dup_lsh_prod.__doc__, headline=True, tags=("northstar", "similarity", "dedup", "lsh", "production")),
        # r13 rotation OUT: similarity_eval_lsh (driver-green since r9;
        # the similarity family keeps 4 in-window faces) → EXTRA below.
        QuerySpec("similarity_ivf_topk", similarity_ivf_topk, SIMILARITY_IVF_SQL, similarity.ivf_topk.__doc__, headline=True, tags=("northstar", "similarity", "ivf")),
        QuerySpec("text_bm25_search", text_bm25_search, TEXT_BM25_SQL, textstats.bm25_search.__doc__, headline=True, tags=("northstar", "text", "topk")),
        # r9: graph_triangles (exact-fed) joined graph_kcore in extras
        # as the documented O(n²)-edge-build anchors (SCALING.md exp
        # 1.29/1.20 — the edge build, not the wedge/peel); the window
        # hashes the LSH-fed twins (exp ~0.71) plus the fixed-point
        # PageRank with its bit-exact unrolled-CTE oracle, so no
        # hashed headline row is super-linear except the declared
        # cosine baseline.
        QuerySpec("graph_kcore_lsh", graph_kcore_lsh, GRAPH_KCORE_LSH_SQL, graph_kcore_lsh.__doc__, headline=True, tags=("northstar", "graph", "dedup", "lsh", "iterative")),
        QuerySpec("graph_pagerank_fixed", graph_pagerank_fixed, GRAPH_PAGERANK_FIXED_SQL, graph_pagerank_fixed.__doc__, headline=True, tags=("northstar", "graph", "iterative")),
        QuerySpec("corpus_release_pipeline", corpus_release_pipeline, CORPUS_RELEASE_SQL, corpus_release_pipeline.__doc__, headline=True, tags=("northstar", "text", "dedup", "sampling", "pipeline")),
        # r9 rotation (VERDICT r8 item 4): the window now hashes the
        # two COMPRESSED-codec parsers the driver had never checked —
        # JPEG (Huffman + IDCT + chroma upsampling) and GIF (LZW) —
        # displacing the r8-hashed AVI/WAV container rows and the
        # consolidated multimodal_doc_profile (all three keep oracles
        # in extras; the near-dup rows below still drive the AVI and
        # WAV decode paths end-to-end). PNG stays: zlib + scanline
        # filters is the third nontrivial codec.
        QuerySpec("multimodal_decode_jpeg", multimodal_decode_jpeg, MULTIMODAL_DECODE_JPEG_SQL, multimodal.decode_jpeg_stats.__doc__, tags=("northstar", "multimodal", "decode", "jpeg")),
        QuerySpec("multimodal_decode_gif", multimodal_decode_gif, MULTIMODAL_DECODE_GIF_SQL, multimodal.decode_gif_stats.__doc__, tags=("northstar", "multimodal", "decode", "gif")),
        # r10 rotation (VERDICT r9 item 3): PNG (driver-hashed green
        # r7-r9; JPEG+GIF keep the compressed-codec family in-window)
        # moves to extras with its oracle; its slot carries the
        # margin-criterion pair miner the driver has never hashed.
        QuerySpec("similarity_margin_mining", similarity_margin_mining, SIMILARITY_MARGIN_MINING_SQL, similarity.margin_mine_pairs.__doc__, tags=("northstar", "similarity", "mining", "pipeline")),
        QuerySpec("multimodal_near_dup_phash", multimodal_near_dup_phash, MULTIMODAL_NEAR_DUP_PHASH_SQL, multimodal.phash_near_dups.__doc__, headline=True, tags=("northstar", "multimodal", "dedup", "decode")),
        QuerySpec("corpus_pack_sequences", corpus_pack_sequences, CORPUS_PACK_SQL, corpus_pack_sequences.__doc__, headline=True, tags=("northstar", "packing", "pipeline")),
        QuerySpec("dedup_components", dedup_components, DEDUP_COMPONENTS_SQL, dedup_components.__doc__, headline=True, tags=("northstar", "dedup", "graph", "iterative")),
        QuerySpec("text_decontaminate", text_decontaminate, TEXT_DECONTAMINATE_SQL, text_decontaminate.__doc__, headline=True, tags=("northstar", "text", "dedup", "pipeline")),
        # late-r7: the NEW PII scrub takes the slot freed by
        # scalar_datetime_funcs (see plans/relational.py rotation
        # comment); its multimodal sibling multimodal_decode_wav and
        # cdc_scd2_history stay extras (parity-green in pytest).
        QuerySpec("text_pii_redact", text_pii_redact, TEXT_PII_SQL, textstats.pii_scan_redact.__doc__, headline=True, tags=("northstar", "text", "pii", "pipeline")),
        # r10 rotation: the ExactSubstr cut list (driver-hashed green
        # r8-r9; the rewrite stage — the harder, consuming face —
        # stays in-window) moves to extras; its slot carries the
        # quality model's ROC-AUC eval row.
        QuerySpec("text_model_quality_auc", text_model_quality_auc, TEXT_MODEL_QUALITY_AUC_SQL, textstats.classifier_eval.__doc__, tags=("northstar", "text", "model", "eval")),
        # late-r8 rotation (slots freed by grouping_variants /
        # percentile_suite / distinct_suite, plans/relational.py):
        # the driver hashes the storage-leg chunking, the asymmetric
        # containment detector, and the k-core peel.
        QuerySpec("dedup_cdc_chunks", dedup_cdc_chunks, DEDUP_CDC_CHUNKS_SQL, dedup.cdc_chunks.__doc__, headline=True, tags=("northstar", "dedup", "text", "storage")),
        QuerySpec("dedup_containment", dedup_containment, DEDUP_CONTAINMENT_SQL, dedup.containment_pairs.__doc__, headline=True, tags=("northstar", "dedup", "text", "join")),
        # r9: the ExactSubstr REWRITE stage (the deduplicated corpus
        # itself) joins its cut-list producer in-window — the full Lee
        # et al. 2021 pipeline is driver-hashed end to end.
        QuerySpec("dedup_substring_rewrite", dedup_substring_rewrite, DEDUP_SUBSTRING_REWRITE_SQL, dedup.remove_duplicated_spans.__doc__, tags=("northstar", "dedup", "text", "pipeline")),
        # r8 rotation IN — the remaining r7-oracled families the
        # driver had never hashed, plus the new iterated-BPE pair.
        # late-r8 rotation: corpus_bpe_merges (the single-iteration
        # count, strictly subsumed by the full trainer below) moves to
        # extras with its oracle; its slot carries the NEW audio
        # fingerprint near-dup so the driver hashes the full modality
        # triad (shingles / pixels / PCM). Window stays 50/50 oracled.
        QuerySpec("multimodal_near_dup_audio", multimodal_near_dup_audio, MULTIMODAL_NEAR_DUP_AUDIO_SQL, multimodal.audio_near_dups.__doc__, headline=True, tags=("northstar", "multimodal", "dedup", "decode", "audio")),
        QuerySpec("corpus_bpe_train", corpus_bpe_train, CORPUS_BPE_TRAIN_SQL, vocab.bpe_train.__doc__, headline=True, tags=("northstar", "text", "vocab", "iterative", "pipeline")),
        # r10 rotation: embedding_dim_stats (hashed green since
        # late-r7; standardize consumes the same moments in-window)
        # moves to extras — its slot goes to the transactional-table
        # CDC face in plans/relational.py (cdc_merge_orders_manifest).
        # r13 rotation OUT: embedding_standardize itself follows
        # (driver-green since late-r7) → EXTRA below. The three r13
        # slots carry scd2_point_in_time, manifest_delete_dv (both
        # exactly-oracled extras never driver-hashed), and the NEW
        # cross-table atomic-commit face group_atomic_ivm — all in
        # plans/relational.py.
        # r11 rotation: text_model_quality (hashed green since late-r7;
        # the text/model family keeps text_model_quality_auc in-window)
        # moves to extras — its slot goes to the manifest delete face
        # in plans/relational.py (manifest_delete_from).
    ]
}

# Granular per-document text/multimodal queries — folded into the
# *_doc_profile driver rows above; each keeps its own oracle here and
# is verified by tests/test_parity.py at sf0.001 every CI run.
EXTRA_QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        QuerySpec("dedup_minhash_lsh", dedup_minhash_lsh, DEDUP_PAIRS_EXACT_SQL, dedup_minhash_lsh.__doc__, headline=True, tags=("northstar", "dedup", "lsh")),
        # r13 rotation: three long-green veterans parked here with
        # their exact oracles (tests/test_parity.py keeps checking
        # them; headline flags keep them benched)
        QuerySpec("multimodal_near_dup_video", multimodal_near_dup_video, MULTIMODAL_NEAR_DUP_VIDEO_SQL, multimodal.video_near_dups.__doc__, headline=True, tags=("northstar", "multimodal", "dedup", "decode", "video")),
        QuerySpec("similarity_eval_lsh", similarity_eval_lsh, SIMILARITY_EVAL_LSH_SQL, similarity.lsh_eval.__doc__, tags=("northstar", "similarity", "lsh", "eval")),
        QuerySpec("embedding_standardize", embedding_standardize, EMBEDDING_STANDARDIZE_SQL, embedding_standardize.__doc__, tags=("northstar", "similarity", "quantize", "pipeline")),
        QuerySpec("text_model_quality", text_model_quality, TEXT_MODEL_QUALITY_SQL, textstats.model_quality_score.__doc__, tags=("northstar", "text", "model", "pipeline")),
        QuerySpec("corpus_chunk_documents", corpus_chunk_documents, CORPUS_CHUNK_SQL, corpus_chunk_documents.__doc__, tags=("northstar", "packing", "pipeline")),
        QuerySpec("text_repetition_stats", text_repetition_stats, TEXT_REPETITION_SQL, text_repetition_stats.__doc__, tags=("northstar", "text")),
        QuerySpec("corpus_stratified_sample", corpus_stratified_sample, CORPUS_STRATIFIED_SQL, corpus_stratified_sample.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("corpus_source_mix", corpus_source_mix, CORPUS_SOURCE_MIX_SQL, corpus_source_mix.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("corpus_clean_pipeline", corpus_clean_pipeline, CORPUS_CLEAN_SQL, corpus_clean_pipeline.__doc__, tags=("northstar", "text", "dedup", "pipeline")),
        QuerySpec("corpus_train_val_split", corpus_train_val_split, CORPUS_SPLIT_SQL, corpus_train_val_split.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("text_lang_id", text_lang_id, TEXT_LANG_ID_SQL, textstats.lang_id.__doc__, tags=("northstar", "text")),
        QuerySpec("text_quality_score", text_quality_score, TEXT_QUALITY_SQL, textstats.quality_score.__doc__, tags=("northstar", "text")),
        QuerySpec("text_token_stats", text_token_stats, TEXT_TOKEN_STATS_SQL, textstats.token_stats.__doc__, tags=("northstar", "text")),
        QuerySpec("text_fingerprint", text_fingerprint, TEXT_FINGERPRINT_SQL, textstats.fingerprint.__doc__, tags=("northstar", "text")),
        QuerySpec("text_top_ngrams", text_top_ngrams, TEXT_TOP_NGRAMS_SQL, textstats.top_ngrams.__doc__, tags=("northstar", "text", "topk")),
        QuerySpec("text_bigram_lm", text_bigram_lm, TEXT_BIGRAM_LM_SQL, textstats.bigram_lm_scores.__doc__, tags=("northstar", "text", "pipeline")),
        QuerySpec("part_fuzzy_pairs", part_fuzzy_pairs, PART_FUZZY_PAIRS_SQL, dedup.edit_distance_pairs.__doc__, tags=("northstar", "dedup", "fuzzy", "join")),
        QuerySpec("corpus_source_cap", corpus_source_cap, CORPUS_SOURCE_CAP_SQL, sampling.source_cap.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("corpus_vocab_encode", corpus_vocab_encode, CORPUS_VOCAB_ENCODE_SQL, vocab.vocab_encode.__doc__, headline=True, tags=("northstar", "text", "pipeline")),
        QuerySpec("corpus_weighted_sample", corpus_weighted_sample, CORPUS_WEIGHTED_SAMPLE_SQL, sampling.weighted_priority_sample.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("similarity_quantized_topk", similarity_quantized_topk, QUANTIZED_TOPK_SQL, similarity_quantized_topk.__doc__, tags=("northstar", "similarity", "quantize")),
        # r9: the array-shaped standardize face — the driver window
        # hashes the long (vec_id, dim, z) twin (r8's one red row was
        # this array column hitting the driver canonicalizer).
        QuerySpec("embedding_standardize_vec", embedding_standardize_vec, EMBEDDING_STANDARDIZE_VEC_SQL, embedding_standardize_vec.__doc__, tags=("northstar", "similarity", "quantize", "pipeline")),
        QuerySpec("corpus_data_card", corpus_data_card, CORPUS_DATA_CARD_SQL, corpus_data_card.__doc__, tags=("northstar", "text", "pipeline")),
        QuerySpec("similarity_pq_adc_topk", similarity_pq_adc_topk, PQ_ADC_SQL, similarity_pq_adc_topk.__doc__, tags=("northstar", "similarity", "quantize", "pq")),
        QuerySpec("text_source_drift", text_source_drift, TEXT_SOURCE_DRIFT_SQL, textstats.source_unigram_kl.__doc__, tags=("northstar", "text", "pipeline", "drift")),
        QuerySpec("dedup_semantic_fitted", dedup_semantic_fitted, None, dedup_semantic_fitted.__doc__, tags=("northstar", "dedup", "similarity", "kmeans", "pipeline")),
        # rotated out of the driver window in r5/r6 (see QUERIES
        # comment); rows-only smoke runs in test_parity, recall/quality
        # properties in tests/test_dedup.py / tests/test_similarity.py
        # r8: simhash moved off xxhash64 onto a portable multiply-shift
        # word hash (operators/dedup.SIMHASH_K1 comment) — exact oracle.
        QuerySpec("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_SQL, dedup.simhash_near_dups.__doc__, tags=("northstar", "dedup")),
        QuerySpec("dedup_ngram_fraction", dedup_ngram_fraction, DEDUP_NGRAM_FRACTION_SQL, dedup.duplicated_ngram_fraction.__doc__, tags=("northstar", "dedup", "text", "pipeline")),
        QuerySpec("similarity_eval_ivf", similarity_eval_ivf, SIMILARITY_EVAL_SQL, similarity_eval_ivf.__doc__, tags=("northstar", "similarity", "ivf", "eval")),
        QuerySpec("embedding_centroid_scores", embedding_centroid_scores, EMBEDDING_CENTROID_SQL, embedding_centroid_scores.__doc__, headline=True, tags=("northstar", "similarity", "text", "pipeline")),
        QuerySpec("similarity_ann_lsh", similarity_ann_lsh, LSH_ANN_SQL, similarity.lsh_ann_topk.__doc__, tags=("northstar", "similarity", "lsh")),
        # r10 (VERDICT r9 item 4): the LSH-fed margin-mining path the
        # brute-force face's docstring promised — candidates from the
        # 8×4 production banding, margin arithmetic unchanged, exactly
        # oracled; planted recall pinned in tests/test_similarity.py.
        QuerySpec("similarity_margin_mining_lsh", similarity_margin_mining_lsh, SIMILARITY_MARGIN_MINING_LSH_SQL, similarity.margin_mine_pairs_lsh.__doc__, headline=True, tags=("northstar", "similarity", "mining", "lsh", "pipeline", "production")),
        # r10 rotation OUT (VERDICT r9 item 3): the three rows below
        # were driver-hashed green r7-r9 and each leaves an in-window
        # sibling covering the family (JPEG+GIF for decode, the
        # ExactSubstr rewrite for spans, standardize for dim stats);
        # their slots carry margin mining, the AUC eval, and the
        # manifest CDC face into the window. Oracles unchanged —
        # test_parity keeps hash-checking them every run.
        QuerySpec("multimodal_decode_png", multimodal_decode_png, MULTIMODAL_DECODE_PNG_SQL, multimodal.decode_png_stats.__doc__, tags=("northstar", "multimodal", "decode")),
        QuerySpec("dedup_substring_spans", dedup_substring_spans, DEDUP_SUBSTRING_SPANS_SQL, dedup.duplicated_spans.__doc__, headline=True, tags=("northstar", "dedup", "text", "pipeline")),
        QuerySpec("embedding_dim_stats", embedding_dim_stats, EMBEDDING_DIM_STATS_SQL, embedding_dim_stats.__doc__, tags=("northstar", "similarity", "quantize", "stats")),
        # r8: the LSH family gained EXACT oracles (_lsh_near_dup_sql)
        # — the hyperplanes are deterministic plan literals, not
        # engine hashes, so "rows-only" was needlessly weak. The pair
        # sweep and the LSH-fed triangles moved INTO the driver
        # window (late-r8); in r9 the production point, the eval
        # harness, and the LSH-fed k-core followed (see QUERIES).
        QuerySpec("corpus_temperature_mix", corpus_temperature_mix, CORPUS_TEMPERATURE_SQL, sampling.temperature_mix.__doc__, tags=("northstar", "sampling", "pipeline")),
        QuerySpec("similarity_ivf_fitted_topk", similarity_ivf_fitted_topk, None, similarity_ivf_fitted_topk.__doc__, tags=("northstar", "similarity", "ivf", "kmeans")),
        QuerySpec("graph_pagerank", graph_pagerank, None, graph_pagerank.__doc__, tags=("northstar", "graph", "iterative")),
        # r9: graph_pagerank_fixed (the exact-oracle twin of the float
        # face above) moved INTO the driver window; the exact-fed
        # triangle/k-core rows moved here as the documented
        # O(n²)-edge-build anchors (SCALING.md exp 1.29/1.20) beside
        # the cosine baseline — their LSH-fed twins are the hashed
        # window rows and the 100 TB path.
        QuerySpec("graph_triangles", graph_triangles, GRAPH_TRIANGLES_SQL, graph_triangles.__doc__, tags=("northstar", "graph", "dedup")),
        QuerySpec("graph_kcore", graph_kcore, GRAPH_KCORE_SQL, graph_kcore.__doc__, tags=("northstar", "graph", "dedup", "iterative")),
        QuerySpec("multimodal_meta", multimodal_meta, MULTIMODAL_META_SQL, multimodal.blob_metadata.__doc__, tags=("northstar", "multimodal")),
        QuerySpec("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_SQL, multimodal.extract_features.__doc__, tags=("northstar", "multimodal")),
        QuerySpec("multimodal_resize", multimodal_resize, MULTIMODAL_RESIZE_SQL, multimodal.resize_blobs.__doc__, tags=("northstar", "multimodal")),
        QuerySpec("multimodal_frames", multimodal_frames, MULTIMODAL_FRAMES_SQL, multimodal.sample_frames.__doc__, tags=("northstar", "multimodal")),
        QuerySpec("multimodal_decode_ppm", multimodal_decode_ppm, MULTIMODAL_DECODE_PPM_SQL, multimodal.decode_ppm_stats.__doc__, tags=("northstar", "multimodal", "decode")),
        # r9: JPEG/GIF moved INTO the driver window; the container
        # rows they displaced (AVI, WAV — hashed green in r8) and the
        # consolidated multimodal_doc_profile keep their oracles here.
        QuerySpec("multimodal_decode_avi", multimodal_decode_avi, MULTIMODAL_DECODE_AVI_SQL, multimodal.decode_video_stats.__doc__, tags=("northstar", "multimodal", "decode", "video")),
        # multimodal_decode_wav promoted to the driver window in r14
        # (VERDICT r13 item 8); text_phrase_search holds its oracle +
        # headline bench slot here after 7 green driver rounds.
        QuerySpec("text_phrase_search", text_phrase_search, TEXT_PHRASE_SQL, textstats.phrase_search.__doc__, headline=True, tags=("northstar", "text", "topk", "join")),
        QuerySpec("multimodal_doc_profile", multimodal_doc_profile, MULTIMODAL_DOC_PROFILE_SQL, multimodal_doc_profile.__doc__, tags=("northstar", "multimodal")),
        QuerySpec("text_tfidf", text_tfidf, TEXT_TFIDF_SQL, textstats.tfidf_top_terms.__doc__, tags=("northstar", "text")),
        QuerySpec("multimodal_frame_sample", multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL, multimodal.sample_video_frames.__doc__, tags=("northstar", "multimodal", "decode", "video")),
        QuerySpec("similarity_topk", similarity_topk, SIMILARITY_TOPK_SQL, similarity.brute_force_topk.__doc__, headline=True, tags=("northstar", "similarity")),
        # late-r8 rotation OUT (oracle kept; the full trainer
        # corpus_bpe_train stays in-window and subsumes this count):
        QuerySpec("corpus_bpe_merges", corpus_bpe_merges, CORPUS_BPE_SQL, vocab.bpe_merge_counts.__doc__, tags=("northstar", "text", "vocab", "pipeline")),
        # r9 rotation OUT (oracles kept; both hashed green in r8):
        # the encode face — the trainer it depends on stays in-window;
        # and the consolidated text profile, whose granular twins
        # (lang_id / quality / token_stats / fingerprint) all keep
        # their own oracles in this dict.
        QuerySpec("corpus_bpe_encode", corpus_bpe_encode, CORPUS_BPE_ENCODE_SQL, vocab.bpe_encode_pieces.__doc__, tags=("northstar", "text", "vocab", "iterative", "pipeline")),
        QuerySpec("text_doc_profile", text_doc_profile, TEXT_DOC_PROFILE_SQL, text_doc_profile.__doc__, tags=("northstar", "text")),
        QuerySpec("corpus_bpe_doc_encode", corpus_bpe_doc_encode, CORPUS_BPE_DOC_ENCODE_SQL, vocab.bpe_encode_docs.__doc__, tags=("northstar", "text", "vocab", "iterative", "pipeline")),
        # r8 rotation OUT (oracles kept; see the QUERIES comment):
        QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_SQL, dedup.exact_dedup_stats.__doc__, tags=("northstar", "dedup")),
        QuerySpec("similarity_cosine_near_dup", similarity_cosine_near_dup, COSINE_NEAR_DUP_SQL, similarity_cosine_near_dup.__doc__, headline=True, tags=("northstar", "similarity", "dedup")),
        QuerySpec("multimodal_decode_image", multimodal_decode_image, MULTIMODAL_DECODE_SQL, multimodal.decode_image_stats.__doc__, tags=("northstar", "multimodal", "decode")),
    ]
}
