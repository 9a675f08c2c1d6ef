"""Contracts of operators/vocab.py: frequency-ranked ids, order-
preserving encoding, OOV handling, and partition invariance (the id
assignment is a pure function of the corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_cs416_spark.functions.text import py_letter_tokens
from mapreduce_cs416_spark.operators import vocab
from mapreduce_cs416_spark.sources.tables import load_table


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat"),
            (2, "zebra"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )


def test_vocab_ranks_by_frequency_then_token(spark):
    docs = _docs(spark)
    toks = docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("token")).where(
        F.col("token") != ""
    )
    v = {r["tok"]: r["id"] for r in vocab.build_vocab(toks, size=3).collect()}
    # counts: the=3, sat=2, rest=1 → ids 1, 2; third slot = alphabetic
    # tie-break among count-1 tokens (cat < dog < mat < on < zebra)
    assert v == {"the": 1, "sat": 2, "cat": 3}


def test_encode_preserves_order_and_marks_oov(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: r for r in vocab.vocab_encode(docs, size=3).collect()}
    # doc 3 has no tokens → no row (matches the SQL twin)
    assert set(out) == {0, 1, 2}
    ids = {d: list(out[d]["ids"]) for d in out}
    # vocab: the=1 sat=2 cat=3; everything else OOV (0)
    assert ids[0] == [1, 3, 2, 0, 1, 0]  # the cat sat on the mat
    assert ids[1] == [1, 0, 2]  # the dog sat
    assert ids[2] == [0]  # zebra
    assert out[0]["n_tokens"] == 6 and out[0]["n_oov"] == 2
    assert out[2]["n_oov"] == 1


def test_encode_matches_python_tokenizer_counts(spark, sf_dir):
    """n_tokens must equal the compat tokenizer's count per document —
    the encoding covers exactly the token stream, nothing dropped."""
    docs = load_table(spark, sf_dir, "documents")
    enc = {r["doc_id"]: r["n_tokens"] for r in vocab.vocab_encode(docs).collect()}
    for row in docs.select("doc_id", "text").limit(50).collect():
        expect = len(py_letter_tokens(row["text"]))
        if expect:
            assert enc[row["doc_id"]] == expect, row["doc_id"]
        else:
            assert row["doc_id"] not in enc


def test_vocab_encode_is_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = {(r["doc_id"], tuple(r["ids"])) for r in vocab.vocab_encode(docs).collect()}
    again = {
        (r["doc_id"], tuple(r["ids"]))
        for r in vocab.vocab_encode(docs.repartition(13)).collect()
    }
    assert base == again and base


def test_bpe_merge_counts_hand_corpus(spark):
    """Adjacent pairs are counted per distinct word and weighted by
    the word's corpus frequency; single-char words contribute none."""
    from mapreduce_cs416_spark.operators.vocab import bpe_merge_counts

    docs = spark.createDataFrame(
        [(0, "abab abab ab"), (1, "ab cd x")], "doc_id long, text string"
    )
    out = {r["pair"]: (r["n"], r["rank"]) for r in bpe_merge_counts(docs).collect()}
    # 'abab' (count 2) contributes pairs ab,ba,ab -> ab x2, ba x1 per occurrence
    # 'ab' (count 2) contributes ab; 'cd' (1) -> cd; 'x' too short
    assert out["ab"][0] == 2 * 2 + 2  # 6
    assert out["ba"][0] == 2
    assert out["cd"][0] == 1
    assert "x" not in out
    assert out["ab"][1] == 1  # the winning merge rule
