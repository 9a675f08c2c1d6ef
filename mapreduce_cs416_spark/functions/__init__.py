from .text import WORD_SPLIT_RE, words_col, word_shingles
from .vectors import as_double_array, dot_fold, l2_norm
from .numeric import decimal_sum

__all__ = [
    "WORD_SPLIT_RE",
    "words_col",
    "word_shingles",
    "as_double_array",
    "dot_fold",
    "l2_norm",
    "decimal_sum",
]
