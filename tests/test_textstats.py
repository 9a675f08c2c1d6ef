"""Semantic tests for the text-analysis operators — hand-constructed
inputs with known answers (the parity suite only proves Spark and
DuckDB agree; these prove the agreed answer is right)."""

from __future__ import annotations

from mapreduce_cs416_spark.operators import textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id_detects_marker_language(spark):
    docs = _docs(
        spark,
        [
            (0, "the cat and the dog of a house to a tree"),
            (1, "der hund und die katze und das haus nicht"),
            (2, "el perro y los gatos que las casas y el sol"),
        ],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs).collect()}
    assert out == {0: "en", 1: "de", 2: "es"}


def test_quality_score_known_values(spark):
    # 4 tokens, 16 chars, no punctuation, one stopword ("the")
    docs = _docs(spark, [(0, "the quick brown fox")])
    r = textstats.quality_score(docs).collect()[0]
    assert r["n_tokens"] == 4
    assert r["punct_ratio"] == 0.0
    assert r["stopword_ratio"] == 0.25
    assert r["avg_token_len"] == 4.0  # (3+5+5+3)/4
    assert 0.0 <= r["quality"] <= 1.0


def test_token_stats_known_values(spark):
    docs = _docs(spark, [(0, "ab ab cd, 12 x!")])
    r = textstats.token_stats(docs).collect()[0]
    assert r["n_ws_tokens"] == 5          # whitespace splits
    assert r["n_bpe_tokens"] == 7         # ab ab cd , 12 x !
    assert r["n_distinct_words"] == 3     # ab cd x (letters only)
    assert r["type_token_ratio"] == 0.75  # 3 distinct / 4 letter tokens


def test_fingerprint_is_polynomial_hash(spark):
    text = "ab"
    expected = (ord("a") * 31 + ord("b")) % textstats.FINGERPRINT_MOD
    r = textstats.fingerprint(_docs(spark, [(0, text)])).collect()[0]
    assert r["fingerprint"] == expected


def test_py_letter_tokens_excludes_nl_no_categories():
    """Python \\w-based regexes admit Nl (Roman numeral Ⅻ) and No
    (vulgar fraction ½), which Java/RE2 \\p{L} treats as delimiters;
    the category-L tokenizer must match \\p{L} exactly."""
    from mapreduce_cs416_spark.functions.text import py_letter_tokens

    assert py_letter_tokens("chapter Ⅻ covers ½ of the course") == [
        "chapter", "covers", "of", "the", "course",
    ]
    assert py_letter_tokens("héllo wörld Ⅻ½") == ["héllo", "wörld"]
    assert py_letter_tokens("Ⅻ½") == []


def test_udtf_and_compat_match_explode_on_nl_no_chars(spark, tmp_path):
    """All three tokenizer surfaces — codegen explode (\\p{L}), UDTF,
    and the run_mapreduce compat plugin — must agree on a corpus with
    Nl/No characters (VERDICT r3 item 4)."""
    from mapreduce_cs416_spark.plans.corpus import mr_wordcount_compat, wordcount
    from mapreduce_cs416_spark.plans.relational import udtf_tokenize

    docs = spark.createDataFrame(
        [
            (0, "chapter Ⅻ covers ½ of the course", "en", "t", 32),
            (1, "héllo wörld Ⅻ½ und ½Ⅻ mixed½tokens", "de", "t", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    expected = sorted((r["word"], r["cnt"]) for r in wordcount(spark, sf).collect())
    assert ("Ⅻ", 2) not in dict(expected).items() and "Ⅻ" not in dict(expected)
    assert dict(expected)["mixed"] == 1 and dict(expected)["tokens"] == 1
    got_udtf = sorted((r["word"], r["cnt"]) for r in udtf_tokenize(spark, sf).collect())
    got_compat = sorted((r["word"], r["cnt"]) for r in mr_wordcount_compat(spark, sf).collect())
    assert got_udtf == expected
    assert got_compat == expected


def test_tfidf_common_term_scores_zero(spark):
    # "shared" appears in every doc -> idf = ln(1) = 0; unique terms win
    docs = _docs(
        spark,
        [(0, "shared alpha"), (1, "shared beta"), (2, "shared gamma")],
    )
    out = textstats.tfidf_top_terms(docs, top_n=1).collect()
    top = {r["doc_id"]: (r["term"], r["score"]) for r in out}
    assert top[0][0] == "alpha" and top[0][1] > 0
    assert top[1][0] == "beta"
    assert top[2][0] == "gamma"


def test_repetition_stats_flags_repetitive_doc(spark):
    docs = _docs(
        spark,
        [
            (0, "spam ham spam ham spam ham spam ham spam ham"),  # one bigram pair dominates
            # all-distinct and long enough that 1/n_bigrams < the 0.08 flag
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (2, ""),  # empty: null fractions, not flagged, no crash
        ],
    )
    out = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    # doc 0: 10 words, top word 5×, 9 bigrams, "spam ham" 5×
    assert out[0]["n_words"] == 10
    assert out[0]["top_word_frac"] == 0.5
    assert out[0]["top_bigram_frac"] == round(5 / 9, 6)
    assert out[0]["repetitive"]
    # doc 1: every word and bigram unique (20 words → top frac 1/20, 1/19)
    assert out[1]["top_word_frac"] == 0.05
    assert not out[1]["repetitive"]
    # doc 2: no tokens
    assert out[2]["n_words"] == 0
    assert out[2]["top_word_frac"] is None
    assert not out[2]["repetitive"]


def test_benchmark_overlap_counts_shared_shingles(spark):
    train = _docs(
        spark,
        [
            (0, "one two three four five six"),  # shares 4-shingles with benchmark
            (1, "totally different words here now"),  # no overlap
        ],
    )
    bench = _docs(spark, [(100, "zero one two three four five")])
    out = {r["doc_id"]: r for r in textstats.benchmark_overlap(train, bench, k=4).collect()}
    # doc 0 shingles: {one two three four, two three four five, three four five six};
    # benchmark contains the first two → n_common = 2 of 3
    assert set(out) == {0}
    assert out[0]["n_common_shingles"] == 2
    assert out[0]["overlap_ratio"] == round(2 / 3, 6)


# ----------------------------------------------------------------- BM25


def test_bm25_ranks_term_density(spark):
    """With equal document lengths, more query-term occurrences must
    score strictly higher; documents with zero query terms are absent."""
    from mapreduce_cs416_spark.operators.textstats import bm25_search

    docs = spark.createDataFrame(
        [
            (0, "cat cat cat dog dog dog"),
            (1, "cat dog dog dog dog dog"),
            (2, "fish fish fish fish fish fish"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["score"], r["rn"]) for r in bm25_search(docs, ["cat"]).collect()}
    assert set(out) == {0, 1}
    assert out[0][0] > out[1][0] and out[0][1] == 1


def test_bm25_length_normalization(spark):
    """Same tf, longer document => lower score (the b·dl/avgdl
    denominator term)."""
    from mapreduce_cs416_spark.operators.textstats import bm25_search

    docs = spark.createDataFrame(
        [
            (0, "cat dog"),
            (1, "cat dog dog dog dog dog dog dog dog dog dog dog"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["score"] for r in bm25_search(docs, ["cat"]).collect()}
    assert out[0] > out[1]


# ---------------------------------------------------------- source drift KL


def test_source_drift_nonnegative_and_orders_drift(spark):
    """KL >= 0 (both distributions sum to 1 over the vocab), and a
    source with a skewed unigram distribution must score higher than
    sources drawn from the shared distribution."""
    from mapreduce_cs416_spark.operators.textstats import source_unigram_kl

    balanced = "a b c d e f g h i j"
    rows = []
    for i in range(40):
        rows.append((i, balanced, "normal0" if i % 2 == 0 else "normal1"))
    for i in range(40, 60):
        rows.append((i, "a a a a a a a a a j", "drifted"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r["kl"] for r in source_unigram_kl(docs, vocab_size=10).collect()}
    assert set(out) == {"normal0", "normal1", "drifted"}
    assert all(v >= -1e-6 for v in out.values()), out
    # the normals also score > 0 (the corpus mixture q includes the
    # drifted mass), so assert separation, not near-zero normals
    assert out["drifted"] > out["normal0"] * 3 and out["drifted"] > out["normal1"] * 3, out


def test_phrase_search_adjacency_and_misses(spark):
    """3-token phrase: only true consecutive runs match; scrambled or
    gapped occurrences of the same tokens must not."""
    from mapreduce_cs416_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (0, "big red fox jumps big red fox"),   # 2 occurrences
            (1, "red big fox"),                      # scrambled: no match
            (2, "big red dog fox"),                  # gapped: no match
            (3, "prefix big red fox suffix"),        # 1 occurrence
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.phrase_search(docs, ["big", "red", "fox"]).collect()}
    assert set(out) == {0, 3}
    assert out[0]["n_occurrences"] == 2 and out[0]["rn"] == 1
    assert out[3]["n_occurrences"] == 1 and out[3]["rn"] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        textstats.phrase_search(docs, [])


def test_pii_scan_redact_counts_and_masks(spark):
    rows = [
        (0, "mail bob.smith+x@corp.example.io now"),
        (1, "call 12-345-678-9012 re acct 1234567"),
        (2, "host 10.0.255.1 clean text here"),
        (3, "no pii at all"),
        (4, "two mails a@b.co and c.d@e.org plus 192.168.1.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, note string")
    out = {
        r["doc_id"]: r
        for r in textstats.pii_scan_redact(df, text_col="note", keep=("doc_id",)).collect()
    }
    assert (out[0]["n_email"], out[0]["n_pii"]) == (1, 1)
    assert out[0]["redacted"] == "mail <EMAIL> now"
    assert (out[1]["n_phone"], out[1]["n_account"], out[1]["n_pii"]) == (1, 1, 2)
    assert out[1]["redacted"] == "call <PHONE> re acct <ACCOUNT>"
    assert (out[2]["n_ip"], out[2]["n_pii"]) == (1, 1)
    assert out[3]["n_pii"] == 0 and out[3]["redacted"] == "no pii at all"
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_pii"]) == (2, 1, 3)


def test_pii_redaction_order_prevents_double_masking(spark):
    """Class ordering is part of the contract: the email's digit-run
    local part and the IP's dotted octets must be masked as EMAIL/IP,
    never re-matched by the later account pattern; a digit run inside
    a word stays untouched (no \\b)."""
    rows = [
        (0, "9876543@x.io from 123.45.6.78 ref 00112233 sku A1234567B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, note string")
    row = textstats.pii_scan_redact(df, text_col="note", keep=("doc_id",)).collect()[0]
    assert row["redacted"] == "<EMAIL> from <IP> ref <ACCOUNT> sku A1234567B"
    # audit counts run on the RAW text: the bare run and the email's
    # local part both \b-qualify as account runs, the IP does not.
    assert (row["n_email"], row["n_ip"], row["n_account"]) == (1, 1, 2)


def test_model_quality_score_hand_weights(spark):
    weights = spark.createDataFrame(
        [("good", 2), ("bad", -3)], "term string, w long"
    )
    docs = _docs(
        spark,
        [
            (0, "good good stuff"),     # raw 4, 3 tokens
            (1, "bad news"),            # raw -3, 2 tokens -> drop
            (2, "totally unknown words"),  # raw 0 -> keep (>= 0)
        ],
    )
    out = {r["doc_id"]: r for r in textstats.model_quality_score(docs, weights).collect()}
    assert (out[0]["raw_score"], out[0]["n_hits"], out[0]["n_tokens"]) == (4, 2, 3)
    assert out[0]["score"] == round(4 / 3, 6) and out[0]["keep"]
    assert out[1]["raw_score"] == -3 and not out[1]["keep"]
    assert out[2]["raw_score"] == 0 and out[2]["n_hits"] == 0 and out[2]["keep"]


def test_classifier_eval_auc_matches_sequential_reference(spark, sf_dir):
    """The distributed integer rank-sum AUC (grouped theta join, 2U
    accumulator) must equal a sequential midrank Mann-Whitney computed
    in plain Python over the collected (score, label) pairs — an
    implementation-independent check of the tie handling."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.operators.textstats import (
        classifier_eval,
        model_quality_score,
        quality_score,
    )
    from mapreduce_cs416_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    row = classifier_eval(docs).collect()[0]

    pairs = (
        model_quality_score(docs)
        .select("doc_id", "score")
        .join(
            quality_score(docs).select(
                "doc_id", (F.col("quality") >= 0.5).alias("label")
            ),
            "doc_id",
        )
        .where(F.col("label").isNotNull())
        .collect()
    )
    ordered = sorted((p["score"], bool(p["label"])) for p in pairs)
    # sequential midranks over tie groups
    ranks: dict[float, float] = {}
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][0] == ordered[i][0]:
            j += 1
        ranks[ordered[i][0]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    n1 = sum(1 for _, lbl in ordered if lbl)
    n0 = len(ordered) - n1
    u = sum(ranks[s] for s, lbl in ordered if lbl) - n1 * (n1 + 1) / 2.0
    want = round(u / (n1 * n0), 6)
    assert row["n_docs"] == len(ordered)
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert row["auc"] == pytest.approx(want, abs=1e-6), (row["auc"], want)
    # The measured value on this corpus is ~0.2: the bag-of-words
    # model ANTI-correlates with the heuristic composite (its weights
    # reward terms the stopword/punctuation heuristic penalizes) —
    # which is exactly why a filter ships with an eval row. Pin that
    # the measurement is a real discriminative number, not degenerate.
    assert row["auc"] is not None and 0.0 < row["auc"] < 1.0
    assert abs(row["auc"] - 0.5) > 0.05  # measurably non-random
