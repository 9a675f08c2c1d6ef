"""Vocabulary building + token-id encoding — the tokenize→ids step a
training-data pipeline runs last, after cleaning/dedup/packing.

The reference has nothing like it (its closest op is the wc-style
token count, mrapps/wc.go:19-40); this is north-star surface. Both
steps are pure DataFrame ops with one token-shuffle each, and the
whole pipeline — including frequency-rank tie-breaks and OOV mapping —
is deterministic and engine-portable, so the registered query carries
an exact DuckDB oracle (plans/northstar.CORPUS_VOCAB_ENCODE_SQL).

Scale shape:
- build_vocab: one groupBy(token) with map-side combine (the wordcount
  shuffle), then top-``size`` via sort+limit — TakeOrderedAndProject,
  per-partition heads merged on the driver, never a global sort; the
  rank window then runs over ``size`` rows only.
- encode_documents: the vocabulary is bounded (``size`` rows) →
  broadcast; encoding is a map-side join on the exploded tokens plus
  one groupBy(doc_id) to reassemble per-document id arrays in token
  order. The corpus shuffles once, keyed by doc_id — no skew risk
  beyond document length itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_col

# id 0 is reserved for out-of-vocabulary tokens; real ids are 1..size
OOV_ID = 0


def build_vocab(tokens: DataFrame, col: str = "token", size: int = 25) -> DataFrame:
    """Frequency-ranked vocabulary: (token, id) with id 1..size by
    (count desc, token) — the tie-break makes the id assignment a pure
    function of the corpus."""
    from ..functions.ranking import ranked_topk

    counts = tokens.groupBy(F.col(col).alias("tok")).agg(F.count("*").alias("c"))
    # window-free rank (functions/ranking): WindowExec's "No Partition
    # Defined" WARN would bury real warnings, and a literal partition
    # key gets constant-folded back to an empty spec (VERDICT r5 item 5)
    return ranked_topk(counts, [F.desc("c"), F.col("tok")], size, rn="id").select("tok", "id")


def encode_documents(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Encode each document's token stream against the vocabulary:
    (doc_id, ids, n_tokens, n_oov), ids in original token order with
    OOV_ID for misses. Documents with zero tokens produce no row (they
    have no token stream to encode) — matching the SQL twin."""
    occ = docs.select("doc_id", F.posexplode(words_col("text")).alias("pos", "tok"))
    enc = occ.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(OOV_ID)).alias("id")
    )
    return enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
        ).alias("ids"),
        F.count("*").cast("int").alias("n_tokens"),
        F.sum(F.when(F.col("id") == OOV_ID, 1).otherwise(0)).cast("int").alias("n_oov"),
    )


def vocab_encode(docs: DataFrame, size: int = 25) -> DataFrame:
    """build_vocab + encode_documents over the documents table."""
    tokens = docs.select(F.explode(words_col("text")).alias("token"))
    return encode_documents(docs, build_vocab(tokens, size=size))


def bpe_merge_counts(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """ONE training iteration of a BPE tokenizer: count every adjacent
    symbol pair across the corpus, weighted by word frequency, and
    rank the merge candidates — the inner loop of Sennrich et al.'s
    byte-pair encoding (arXiv:1508.07909), where the top pair becomes
    the next merge rule.

    Scale shape: the corpus collapses to its DISTINCT word counts
    first (one groupBy — the working set is the vocabulary, not the
    corpus), then each distinct word explodes into its length−1
    adjacent pairs via substring over a sequence (pure codegen HOF,
    no Python), weighted by the word's corpus count, and one more
    groupBy sums per pair. Later iterations rewrite words by the
    learned merges and re-count — the per-iteration dataflow is
    identical, always vocabulary-sized after the first aggregate."""
    wc = (
        docs.select(F.explode(words_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .where(F.length("term") >= 2)
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")
        ).alias("pair"),
        "c",
    )
    from ..functions.ranking import ranked_topk

    counts = pairs.groupBy("pair").agg(F.sum("c").alias("n"))
    return ranked_topk(counts, [F.desc("n"), F.col("pair")], top_k, rn="rank").select(
        "pair", "n", "rank"
    )
