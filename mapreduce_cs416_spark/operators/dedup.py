"""Deduplication operators over the `documents` table — the LLM-data-
pipeline surface (north star; not in the reference, which only has the
per-group set-dedup inside its indexer map, mrapps/indexer.go:21-25).

Four strategies, all shuffle-conscious:

- exact        : hash-groupBy on a content digest — one shuffle on the
                 digest, arbitrarily wide scale-out.
- ngram Jaccard: exact k-shingle Jaccard via an inverted-index
                 (shingle → doc) self-join. The join key is the
                 shingle, so common-shingle skew is the scale risk;
                 ``max_df`` drops shingles above a document-frequency
                 cap (stop-shingles carry ~no signal) — the standard
                 prefix-filtering mitigation.
- MinHash LSH  : signature → banding → bucket join; candidates then
                 *verified* with exact Jaccard so false positives drop
                 out; false negatives bounded by the (bands, rows)
                 S-curve. Hash-function-dependent → no SQL oracle;
                 tests assert recall vs the exact operator.
- SimHash      : 64-bit fingerprint, near-dups = Hamming ≤ d via
                 16-bit-chunk pigeonhole banding.

Everything is built-in expressions (xxhash64 / explode / groupBy) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WORD_SPLIT_RE


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Group documents by content digest: copies per digest + kept id
    (min doc_id = the reference's deterministic last-writer analog)."""
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def shingle_sets(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>, n_sh) with distinct k-word shingles."""
    joined = ", ".join(f"words[i+{j}]" for j in range(k))
    return (
        docs.select(
            "doc_id",
            F.filter(F.split("text", WORD_SPLIT_RE), lambda w: w != F.lit("")).alias("words"),
        )
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN size(words) < {k} THEN array() "
                f"ELSE array_distinct(transform(sequence(0, size(words) - {k}), "
                f"i -> concat_ws(' ', {joined}))) END"
            ).alias("shingles"),
        )
        .select("doc_id", "shingles", F.size("shingles").alias("n_sh"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.2, max_df: int | None = None
) -> DataFrame:
    """Exact k-gram Jaccard near-dup pairs via inverted-index join.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold. ``max_df`` (document-frequency cap per
    shingle) bounds join skew at scale; None = exact semantics.
    """
    sh = shingle_sets(docs, k)
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
    if max_df is not None:
        keep = ex.groupBy("sh").agg(F.count("*").alias("df")).where(F.col("df") <= max_df)
        ex = ex.join(F.broadcast(keep.select("sh")), "sh")
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, k: int = 3, n_hashes: int = 64) -> DataFrame:
    """(doc_id, sig array<bigint>) MinHash signatures over k-shingles.

    One explode + one shuffle: n_hashes min-aggregates over
    xxhash64(shingle, seed_i), computed map-side-partial so the
    exchange carries one row per doc. Docs with no shingles are
    excluded up front — they have no Jaccard similarity to anything
    by definition, and keeping them would make every shingle-less doc
    share one signature and collide in every LSH band.
    """
    ex = (
        shingle_sets(docs, k)
        .where(F.col("n_sh") > 0)
        .select("doc_id", F.explode("shingles").alias("sh"))
    )
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]
    agg = ex.groupBy("doc_id").agg(*mins)
    sig = F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
    return agg.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified with exact Jaccard.

    banding: `bands` bands of n_hashes/bands rows; bucket key =
    hash(band_idx, sig slice). Candidate pairs (same bucket in any
    band) are then verified against the exact shingle sets, so output
    precision is exact; recall follows the LSH S-curve
    1-(1-s^r)^b. Returns (doc_a, doc_b, jaccard).
    """
    rows = n_hashes // bands
    sigs = minhash_signatures(docs, k, n_hashes)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.hash(F.lit(i), F.slice("sig", i * rows + 1, rows)).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    buckets = sigs.select("doc_id", F.explode(band_cols).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = shingle_sets(docs, k).select("doc_id", "shingles")
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sa"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard_raw"),
        )
    )
    return verified.where(F.col("jaccard_raw") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard")
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash bigint): 64-bit SimHash over word tokens.

    Per-bit contributions aggregated as 64 conditional sums (map-side
    partial, one shuffle, one output row per doc) — no 64× row
    explosion.
    """
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", WORD_SPLIT_RE), lambda w: w != F.lit(""))).alias("w"),
    ).select("doc_id", F.xxhash64("w").alias("h"))
    sums = [
        F.sum(F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)).alias(f"s{j}")
        for j in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    bit_terms = " + ".join(f"(CASE WHEN s{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)" for j in range(64))
    return agg.select("doc_id", F.expr(bit_terms).alias("simhash"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole banding on four 16-bit chunks: any pair within Hamming
    3 must agree on >= 1 chunk, so candidates = equal-chunk joins
    (4 shuffles on 16-bit keys), then exact bit_count(xor) filter.
    """
    sh = simhash64(docs)
    chunks = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), F.expr(f"(simhash >> {16 * c}) & 65535").alias("key"))
            for c in range(4)
        ]
    )
    keyed = sh.select("doc_id", "simhash", F.explode(chunks).alias("ck")).select(
        "doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
