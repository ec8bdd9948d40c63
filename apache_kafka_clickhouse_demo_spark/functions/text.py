"""Text primitives shared by the dedup / text-analysis operators.

Each primitive exists in two bit-identical forms: a Spark Column expression
(builtins only — stays in whole-stage codegen) and a DuckDB SQL snippet
generator used by the oracle queries.  Tokenization is deliberately simple
and exactly mirrored: lower-case, trim, split on runs of whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword lists for the language-ID heuristic (top function
# words per language; public knowledge).  Scores are distinct-token overlap
# with each list — deterministic and SQL-expressible in both engines.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it", "you", "that", "was", "for", "on", "are", "with", "as"),
    "es": ("de", "la", "que", "el", "en", "los", "del", "las", "por", "un", "para", "con", "una", "su", "es"),
    "fr": ("le", "de", "la", "et", "les", "des", "est", "un", "une", "du", "dans", "que", "pour", "qui", "sur"),
    "de": ("der", "die", "und", "das", "den", "von", "ist", "mit", "im", "des", "ein", "auf", "nicht", "eine", "als"),
    "zh": ("的", "了", "是", "我", "不", "在", "他", "有", "这", "个", "上", "们", "来", "到", "时"),
}

#: English stopwords for the quality-score stopword ratio.
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def tokens(text: Column | str) -> Column:
    """array<string> of lower-cased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def word_shingles(toks: Column | str, n: int) -> Column:
    """Word n-gram shingles of a token array (space-joined strings).

    Row-local (no shuffle); a doc with fewer than n tokens yields its full
    token string as the single shingle so no document hashes to empty.
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(t, i + 1, n), " "),
    )
    return ngrams


# ---------------------------------------------------------------------------
# DuckDB-SQL side (must mirror the Spark expressions exactly)
# ---------------------------------------------------------------------------


def sql_tokens(text_expr: str) -> str:
    return f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"


def sql_word_shingles(toks_expr: str, n: int) -> str:
    """DuckDB list of word n-grams of a token list expression.

    range(0, greatest(len-n, 0)+1) gives the same i = 0..max(len-n, 0)
    domain as the Spark `sequence`; list slicing is 1-based inclusive in
    both engines' idioms used here.
    """
    return (
        f"list_transform(range(0, greatest(len({toks_expr}) - {n}, 0) + 1), "
        f"i -> array_to_string({toks_expr}[i + 1 : i + {n}], ' '))"
    )


def sql_string_array_literal(values: tuple[str, ...] | list[str]) -> str:
    inner = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{inner}]"
