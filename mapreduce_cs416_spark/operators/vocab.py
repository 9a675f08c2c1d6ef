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

from ..functions.text import bind_once, words_col

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
    """build_vocab + encode over the documents table.

    The vocabulary is driver-bounded by construction (``size`` rows),
    so the encode phase inlines it as a LITERAL map and encodes each
    document with a pure transform() over its token array — identical
    output to ``encode_documents``' join/regroup path (property-
    checked by tests/test_vocab.py) with ZERO shuffles after the
    vocab build: no token explosion, no 600k-row regroup, no
    per-document array_sort. The bounded collect is the centroid
    discipline (similarity.py) — ``size`` rows, never corpus-sized;
    ``encode_documents`` remains the scale path for vocabularies too
    large to inline."""
    tokens = docs.select(F.explode(words_col("text")).alias("token"))
    vocab_rows = build_vocab(tokens, size=size).collect()
    mapping = F.create_map(
        *[F.lit(v) for row in vocab_rows for v in (row["tok"], row["id"])]
    )
    ws = words_col("text")
    encoded = bind_once(
        ws,
        lambda w: F.transform(
            w, lambda tok: F.coalesce(F.element_at(mapping, tok), F.lit(OOV_ID))
        ),
    )
    out = docs.select("doc_id", encoded.alias("ids")).where(F.size("ids") > 0)
    return out.select(
        "doc_id",
        "ids",
        F.size("ids").alias("n_tokens"),
        F.size(F.filter("ids", lambda i: i == F.lit(OOV_ID))).cast("int").alias("n_oov"),
    )


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


# ------------------------------------------------------- iterated BPE
# Each symbol is bracketed as \x01sym\x02 and a word is the
# concatenation of its bracketed symbols. Under that encoding the BPE
# merge step — replace every leftmost non-overlapping occurrence of
# the winning pair — is EXACTLY one engine-built-in string replace()
# (leftmost, non-overlapping, resumes after the replacement), the same
# mechanism as Sennrich's reference re.sub. The delimiters cannot
# occur inside symbols (words_col tokens are \p{L}-only), so a match
# always aligns to symbol boundaries, and adjacent matches share no
# characters, so a==b runs pair up left-to-right exactly like the
# sequential scan. This is what makes the trainer engine-portable: the
# DuckDB oracle (plans/northstar.CORPUS_BPE_TRAIN_SQL) unrolls the
# same rounds over the same encoding with DuckDB's replace().
SYM_OPEN = "\x01"
SYM_CLOSE = "\x02"

# rounds for the registered train/encode queries — also drives the
# unrolled CTE chain in the oracle SQL, ONE constant for both engines
BPE_TRAIN_MERGES = 8


def _bracket(sym: str) -> str:
    return SYM_OPEN + sym + SYM_CLOSE


def _syms(symstr: str = "symstr"):
    """Symbol array from a bracketed symbol string (pure codegen)."""
    inner = F.expr(f"substring({symstr}, 2, length({symstr}) - 2)")
    return F.split(inner, SYM_CLOSE + SYM_OPEN)


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """(term, symstr, c): the corpus collapsed to its DISTINCT words
    (one wordcount shuffle — the working set is the vocabulary, not
    the corpus), each word encoded as bracketed per-character symbols.
    ``term`` rides along untouched through the merge rounds so the
    trained table doubles as the word→segmentation dictionary
    (bpe_encode_docs)."""
    wc = (
        docs.select(F.explode(words_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    sym = F.concat_ws(
        "",
        F.transform(
            F.split("term", ""),
            lambda ch: F.concat(F.lit(SYM_OPEN), ch, F.lit(SYM_CLOSE)),
        ),
    )
    return wc.select("term", sym.alias("symstr"), "c")


def _top_pair(words: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent symbol pair, weighted by word count;
    ties broken (count desc, left, right) so the winner is a pure
    function of the corpus. ONE vocabulary-sized shuffle + a ONE-row
    collect (the bounded-driver-state discipline of
    graph.connected_components' fixpoint probe)."""
    pr = words.select(_syms().alias("s"), "c").where(F.size("s") >= 2)
    pairs = pr.select(
        F.explode(
            F.expr("transform(sequence(1, size(s) - 1), i -> struct(s[i-1] AS lft, s[i] AS rgt))")
        ).alias("p"),
        "c",
    ).select("p.lft", "p.rgt", "c")
    top = (
        pairs.groupBy("lft", "rgt")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.desc("n"), "lft", "rgt")
        .limit(1)
        .collect()
    )
    return (top[0]["lft"], top[0]["rgt"], top[0]["n"]) if top else None


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """The full iterated BPE training loop (Sennrich et al.,
    arXiv:1508.07909): repeat n_merges times — count adjacent symbol
    pairs over the distinct-word table, pick the most frequent,
    rewrite every word by that merge — returning the learned merge
    rules [(rank, lft, rgt, merged, weight)] and the final rewritten
    word table.

    Scale shape: after the initial wordcount shuffle the working set
    is vocabulary-sized forever; each round is ONE pair-count shuffle
    over it, a 1-row collect, and a map-side string rewrite. Driver
    state is the k-row merge table. Per-round word tables are LAZY
    localCheckpoints materialized by the NEXT round's ``_top_pair``
    collect (r14 — the kcore/connected_components one-job-per-round
    discipline: the probe reads ``words`` through a single branch, so
    the multi-branch-over-lazy race cannot occur); the superseded
    round's blocks are freed right after that materialization. The
    final round's table is returned lazy — its upstream is the
    previous MATERIALIZED checkpoint plus one deterministic
    string-replace projection, so even a multi-branch consumer only
    risks re-running that projection."""
    from .graph import _unpersist_checkpoint

    # the initial table stays EAGER: its upstream (the corpus
    # wordcount) is the expensive scan a lazy race would re-run
    words = bpe_word_table(docs).localCheckpoint()
    prev = None
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = _top_pair(words)  # materializes words' lazy checkpoint
        if prev is not None:
            _unpersist_checkpoint(prev)
            prev = None
        if top is None:
            break
        lft, rgt, n = top
        merges.append((rank, lft, rgt, lft + rgt, n))
        prev = words
        words = words.withColumn(
            "symstr",
            F.replace(
                "symstr",
                F.lit(_bracket(lft) + _bracket(rgt)),
                F.lit(_bracket(lft + rgt)),
            ),
        ).localCheckpoint(eager=False)
    # The final LAZY checkpoint still reads the penultimate round's
    # MATERIALIZED blocks (prev) until a consumer action materializes
    # it — so prev cannot be freed here (ADVICE r14: it used to leak
    # until session end). Carry it on the returned frame; consumers
    # free both via _free_words once they are done with the table.
    words._bpe_pinned = prev  # type: ignore[attr-defined]
    return merges, words


def _free_words(words: DataFrame) -> None:
    """Free a bpe_train word table's checkpoint blocks AND the
    penultimate round's blocks it carries (see bpe_train's return
    note). Safe on frames that were never materialized."""
    from .graph import _unpersist_checkpoint

    _unpersist_checkpoint(words)
    pinned = getattr(words, "_bpe_pinned", None)
    if pinned is not None:
        _unpersist_checkpoint(pinned)


def bpe_train_table(docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES) -> DataFrame:
    """The learned merge table as a DataFrame — (rank, lft, rgt,
    merged, weight), the artifact a tokenizer build publishes."""
    merges, words = bpe_train(docs, n_merges)
    _free_words(words)
    return docs.sparkSession.createDataFrame(
        merges, "rank int, lft string, rgt string, merged string, weight long"
    )


def bpe_encode_pieces(
    docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES, top_k: int = 30
) -> DataFrame:
    """Train-then-encode: run the merge loop, then count the resulting
    subword pieces across the corpus (piece frequency weighted by word
    count) — the post-BPE vocabulary, top_k by (count desc, piece).
    The encode step reads the ALREADY-REWRITTEN word table the loop
    ends with: applying k merges to the corpus costs nothing beyond
    training itself."""
    from ..functions.ranking import ranked_topk

    _, words = bpe_train(docs, n_merges)
    pieces = words.select(F.explode(_syms()).alias("piece"), "c")
    counts = pieces.groupBy("piece").agg(F.sum("c").cast("long").alias("n"))
    return ranked_topk(counts, [F.desc("n"), F.col("piece")], top_k, rn="rank").select(
        "piece", "n", "rank"
    )


def bpe_encode_docs(
    docs: DataFrame, n_merges: int = BPE_TRAIN_MERGES
) -> DataFrame:
    """Train-then-TOKENIZE: run the merge loop, derive the piece
    vocabulary (ids 1..V by count desc, piece — same tie-break as
    build_vocab), and encode EVERY document as its token-id sequence:
    (doc_id, n_words, n_pieces, ids) with ids in word order then
    piece order within each word. No OOV arises by construction —
    every corpus word is in the trained table.

    Scale shape: the trained word table IS the segmentation
    dictionary (term → pieces), vocabulary-sized, so it broadcasts;
    per-word piece-id arrays are precomputed on that table (two
    vocabulary-sized joins), and the corpus itself is touched by ONE
    posexplode + broadcast join + one groupBy(doc_id) reassembly —
    the encode_documents shuffle shape, independent of k."""
    _, words = bpe_train(docs, n_merges)
    # piece vocabulary: (piece, id) with id 1..V — bounded, rank via
    # a window-free sort over the vocabulary-sized aggregate
    pieces = words.select(F.explode(_syms()).alias("piece"), "c")
    counts = pieces.groupBy("piece").agg(F.sum("c").cast("long").alias("n"))
    from ..functions.ranking import ranked_topk

    vocab_ids = ranked_topk(
        counts, [F.desc("n"), F.col("piece")], (1 << 31) - 1, rn="id"
    ).select("piece", "id")
    # term → ordered piece-id array, all vocabulary-sized work
    seg = words.select(
        "term", F.posexplode(_syms()).alias("idx", "piece")
    ).join(F.broadcast(vocab_ids), "piece")
    term_ids = seg.groupBy("term").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "id"))), lambda s: s["id"]
        ).alias("word_ids")
    ).localCheckpoint()
    _free_words(words)

    occ = docs.select("doc_id", F.posexplode(words_col("text")).alias("pos", "term"))
    enc = occ.join(F.broadcast(term_ids), "term")
    out = enc.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word_ids"))),
                lambda s: s["word_ids"],
            )
        ).alias("ids"),
        F.count("*").cast("int").alias("n_words"),
    )
    return out.select(
        "doc_id",
        "n_words",
        F.size("ids").alias("n_pieces"),
        "ids",
    )
