"""Text column functions — tokenization, shingling, quality signals.

All JVM-side built-ins (split/filter/transform/size) so the hot path
stays inside whole-stage codegen; no Python UDFs here.

Tokenizer contract: the reference's word-count map splits on runs of
non-letters via ``unicode.IsLetter`` (mrapps/wc.go:21-24). The regex
class ``\\p{L}`` is the Java/RE2 equivalent, so the same pattern works
in Spark (Java regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# runs of non-letters; mirrors unicode.IsLetter tokenization (mrapps/wc.go:21-24)
WORD_SPLIT_RE = r"[^\p{L}]+"


def py_letter_tokens(text: str) -> list[str]:
    """Pure-Python twin of the ``WORD_SPLIT_RE`` tokenizer for the
    Python compat surfaces (run_mapreduce map plugins, UDTFs): runs of
    Unicode *letter* characters (category L*), exactly matching Go's
    ``unicode.IsLetter`` (mrapps/wc.go:21-24) and Java/RE2 ``\\p{L}``.

    NOT ``re.findall(r"[^\\W\\d_]+")``: Python's ``\\w`` admits
    categories Nl/No (Roman numerals Ⅻ, vulgar fractions ½) that
    ``\\p{L}`` treats as delimiters, so the regex version diverges from
    the JVM/DuckDB tokenization on non-ASCII corpora.
    """
    import unicodedata

    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if unicodedata.category(ch)[0] == "L":
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def bind_once(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row and pass it to ``fn`` as a lambda
    variable: ``transform(array(col), x -> fn(x))[0]``.

    Catalyst's CollapseProject inlines a projected expression into
    every downstream reference — an expression referenced n times is
    evaluated n times per row. For cheap expressions that's free; for
    a tokenize/shingle pipeline referenced tens of times (e.g. a
    k-shingle window over `words`, or 64 MinHash lanes over
    `shingles`) it multiplies the per-row CPU by n. Binding through a
    single-element transform() makes every reference a lambda-variable
    lookup instead.
    """
    return F.transform(F.array(col), fn)[0]


def words_col(text: Column | str, pattern: str = WORD_SPLIT_RE) -> Column:
    """Array of non-empty word tokens from a text column."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, pattern), lambda w: w != F.lit(""))


def word_shingles(words: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) from a token array.

    Pure higher-order built-ins; the token array is bound once per row
    (see ``bind_once``) so the k element accesses per shingle are
    array lookups, not re-evaluations of the tokenizer. Empty array
    when the document has fewer than k tokens.
    """

    def shingles_of(ws: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(ws) - k)
        window = lambda i: F.concat_ws(" ", *[F.get(ws, i + j) for j in range(k)])  # noqa: E731
        return F.when(F.size(ws) < k, F.array().cast("array<string>")).otherwise(
            F.array_distinct(F.transform(idx, window))
        )

    return bind_once(words, shingles_of)
