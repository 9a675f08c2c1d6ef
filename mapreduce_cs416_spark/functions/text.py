"""Text column functions — tokenization, shingling, quality signals.

All JVM-side built-ins (split/filter/transform/size) so the hot path
stays inside whole-stage codegen; no Python UDFs here.

Tokenizer contract: the reference's word-count map splits on runs of
non-letters via ``unicode.IsLetter`` (mrapps/wc.go:21-24). The regex
class ``\\p{L}`` is the Java/RE2 equivalent, so the same pattern works
in Spark (Java regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# runs of non-letters; mirrors unicode.IsLetter tokenization (mrapps/wc.go:21-24)
WORD_SPLIT_RE = r"[^\p{L}]+"


def words_col(text: Column | str, pattern: str = WORD_SPLIT_RE) -> Column:
    """Array of non-empty word tokens from a text column."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, pattern), lambda w: w != F.lit(""))


def word_shingles(words: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) from a token array.

    Built from transform(sequence(...)) so it stays codegen'd; empty
    array when the document has fewer than k tokens.
    """
    joined = ", ".join(f"__w[i+{j}]" for j in range(k))
    expr = (
        f"CASE WHEN size(__w) < {k} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size(__w) - {k}), "
        f"i -> concat_ws(' ', {joined}))) END"
    )
    # F.expr can't reference a Column directly; route through a lambda-free
    # rewrite using the input column via `transform` on a struct trick is
    # messier — instead require callers to project the token array to a
    # column named by `words` when it is a string, or inline via expr().
    if isinstance(words, str):
        return F.expr(expr.replace("__w", words))
    raise TypeError("word_shingles expects the NAME of a token-array column")
