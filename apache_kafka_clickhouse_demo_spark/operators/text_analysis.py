"""Text analysis operators (SURVEY.md §2.7): language ID, quality scoring,
token counting, document fingerprinting.

All pure column expressions over the `documents` table — row-local, no
shuffle, executed inside whole-stage codegen; at 100 TB these run at scan
throughput.  Every operator has an exact DuckDB oracle (queries.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from apache_kafka_clickhouse_demo_spark.sources.tables import (
    is_wide_source,
    pin_wide,
    spread_small,
)

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.functions import text as TX

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


_LANG_TD = "_lang_td"
_LANG_SC = "_lang_sc"


def _staged_lang(df: DataFrame, text_col: str, out_cols: list[Column]) -> DataFrame:
    """Project `out_cols` + (pred_lang, lang_score): the language-ID argmax
    as STAGED projections that stay in whole-stage codegen.

    predicted = argmax over languages of |distinct(tokens) ∩ stopwords(lang)|,
    ties broken by language code ascending, 'und' if all scores are 0.

    Staging is the performance design: the distinct-token array and the
    per-language score array each become a REAL projected column, so the
    12 `array_intersect`s reference an attribute (evaluated once) and run
    as codegen builtins.  The earlier single-expression form bound them
    with `transform(array(x), lambda ...)` — single evaluation, but the
    whole subtree then ran per-row in the interpreted HOF evaluator:
    measured ~18ms/row vs sub-ms staged.  Catalyst's CollapseProject will
    not undo the staging: it only inlines a projected alias into multiple
    references when the expression is cheap (attribute/literal), and both
    staged arrays are expensive.
    """
    langs = sorted(TX.LANG_STOPWORDS)
    with_td = df.withColumn(_LANG_TD, F.array_distinct(TX.tokens(text_col)))
    with_sc = with_td.withColumn(
        _LANG_SC,
        F.array(
            *[
                F.size(
                    F.array_intersect(
                        F.col(_LANG_TD),
                        F.array(*[F.lit(w) for w in TX.LANG_STOPWORDS[lang]]),
                    )
                )
                for lang in langs
            ]
        ),
    )
    best = F.array_max(F.col(_LANG_SC))
    pred = F.lit("und")
    for i in reversed(range(len(langs))):  # earlier codes win ties
        pred = F.when(
            (best > 0) & (F.element_at(F.col(_LANG_SC), i + 1) == best),
            F.lit(langs[i]),
        ).otherwise(pred)
    # NULL text -> NULL prediction (the oracle's CASE has no ELSE); the
    # bare when-chain fell through to 'und' for NULL scores (code-review r6)
    pred = F.when(best.isNull(), F.lit(None).cast("string")).otherwise(pred)
    return with_sc.select(
        *out_cols, pred.alias("pred_lang"), best.cast("int").alias("lang_score")
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword-overlap language heuristic (see _staged_lang).

    spread_small: the scores are the most CPU-expensive row-local work in
    the engine, so a single-file scan must not pin them to one core."""
    return _staged_lang(
        spread_small(docs), text_col, [F.col(id_col).alias("doc_id")]
    )


def _quality_cols(text_col: str) -> list[Column]:
    """The quality-score feature columns (aliased), for reuse by both
    quality_score and the one-pass text_profile.

    Features (all deterministic, SQL-portable):
      n_chars, n_tokens, avg_token_len, punct_ratio (punctuation chars /
      chars), stopword_ratio (stopword tokens / tokens), quality in [0,1].
    """
    t = F.trim(F.lower(F.col(text_col)))
    toks = TX.tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in TX.QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))

    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    avg_token_len = F.round(tok_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 4)
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 4)

    # Composite: reward mid-length docs and stopword presence, punish symbol soup.
    quality = F.round(
        F.least(n_tokens.cast("double") / 64.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.2,
        4,
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    ]


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality features + composite score."""
    return docs.select(F.col(id_col).alias("doc_id"), *_quality_cols(text_col))


def _token_count_cols(text_col: str) -> list[Column]:
    t = F.trim(F.lower(F.col(text_col)))
    ws = F.size(F.split(t, r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
    return [ws.alias("ws_tokens"), bpe.alias("bpe_tokens")]


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return docs.select(F.col(id_col).alias("doc_id"), *_token_count_cols(text_col))


def _repetition_cols(text_col: str) -> list[Column]:
    """The Gopher/C4 repetition-signal columns minus n_tokens (aliased), for
    reuse by both repetition_stats and the one-pass text_profile (which
    already emits n_tokens from the quality features — same expression)."""
    toks = TX.tokens(text_col)
    # NULL text -> NULL gram stats (without the guard, sequence/greatest
    # NULL-ignoring semantics degenerate the shingle array to [NULL])
    grams = F.when(F.col(text_col).isNotNull(), TX.word_shingles(toks, 2))
    n_tok = F.size(toks)
    n_tok_d = F.size(F.array_distinct(toks))
    n_2g = F.size(grams)
    n_2g_d = F.size(F.array_distinct(grams))
    return [
        n_tok_d.alias("n_distinct_tokens"),
        n_2g.alias("n_2grams"),
        n_2g_d.alias("n_distinct_2grams"),
        F.round(1.0 - n_tok_d.cast("double") / F.greatest(n_tok, F.lit(1)), 4).alias(
            "dup_token_ratio"
        ),
        F.round(1.0 - n_2g_d.cast("double") / F.greatest(n_2g, F.lit(1)), 4).alias(
            "dup_2gram_ratio"
        ),
    ]


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document text profile: quality features + token counts +
    repetition (duplicate-token / duplicate-2-gram) signals + language ID,
    all in a SINGLE row-local projection.

    At 100 TB this matters: a curation pass needs all four signals, and
    joining four separate per-doc outputs back on doc_id would add three
    data-sized shuffles for what is fundamentally one scan.  Every column
    here is a pure expression over the same row (the lang stages project
    helper columns, never add an exchange), so the whole profile runs at
    scan throughput with zero data-sized shuffles.

    spread_small: the profile is the most CPU-expensive row-local
    projection in the engine, so a single-file scan must not pin it to one
    core — the small-scan round-robin spread (a no-op on many-file cluster
    inputs) is what lets it actually run at scan throughput.
    """
    return _staged_lang(
        spread_small(docs),
        text_col,
        [
            F.col(id_col).alias("doc_id"),
            *_quality_cols(text_col),
            *_token_count_cols(text_col),
            *_repetition_cols(text_col),
        ],
    )


#: Gopher rule thresholds (Rae et al. 2021, table A1 — the rule-based
#: quality gate RefinedWeb/FineWeb inherit).  Ratios are exact integer
#: MILLI-units (floor of ratio*1000) so the oracle hashes bit-identically.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_MILLI = 3_000
GOPHER_MAX_MEAN_WORD_LEN_MILLI = 10_000
GOPHER_MAX_SYMBOL_RATIO_MILLI = 100  # '#' + '...' per word <= 0.1
GOPHER_MAX_BULLET_LINE_MILLI = 900  # <= 90% of lines bullet-led
GOPHER_MAX_ELLIPSIS_LINE_MILLI = 300  # <= 30% of lines ellipsis-ended
GOPHER_MIN_ALPHA_WORD_MILLI = 800  # >= 80% of words contain a letter
GOPHER_MIN_STOP_HITS = 2  # >= 2 distinct required stopwords present
#: the paper's 8 "required words"
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher rule-based quality filtering (Rae et al. 2021 — the
    rule set RefinedWeb/FineWeb apply before any learned classifier):
    per-rule signals plus the conjunction `keep`, emitted per document
    so a pipeline can FILTER on keep or inspect which rule fired.

    Every rule is restated in exact integer arithmetic (milli-unit
    floor divisions, both operands non-negative, so Spark `div` and
    DuckDB `//` agree) and — deliberately — WITHOUT higher-order
    functions: per-token work is expressed as non-overlapping regex
    counts over the whole text (`(^|\\s)[^\\s]*[a-z]` hits each
    letter-bearing word exactly once — a match cannot restart inside a
    word because the boundary anchor needs whitespace; `(?m)` line
    anchors count bullet-led / ellipsis-ended lines), total word
    characters as `length(regexp_replace(t, '\\s+', ''))`, and stopword
    hits as a distinct-token intersect with the 8-word literal list.
    The phrase_search lesson (r11): HOF lambdas run interpreted at ~10x
    a codegen operator's per-row cost — this stays whole-stage-codegen
    end to end, zero exchanges, scan-bound at 100 TB.

    Output: (doc_id, n_words, mean_word_len_milli, symbol_ratio_milli,
    bullet_line_milli, ellipsis_line_milli, alpha_word_milli,
    n_stop_hits, keep).  NULL/empty texts emit n_words = 0, NULL milli
    metrics (0/0 is undefined, not zero), n_stop_hits = 0, keep = false.
    The patterns use only the Java/RE2-identical regex subset (the
    PII_PATTERNS contract).
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    t = F.trim(F.lower(raw))
    empty = F.length(t) == 0
    n_words = F.when(empty, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")
    word_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.split(t, r"\.\.\.", -1)) - 1
    n_lines = F.size(F.split(raw, r"\n", -1)).cast("long")
    n_bullet_lines = F.regexp_count(raw, F.lit(r"(?m)^[ \t]*[-*•]"))
    n_ellipsis_lines = F.regexp_count(raw, F.lit(r"(?m)\.\.\.[ \t]*$"))
    n_alpha_words = F.regexp_count(t, F.lit(r"(^|\s)[^\s]*[a-z]"))
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.split(t, r"\s+")), stop_arr)
    )
    # greatest(n_stop, 0): size() is -1 on the empty-text split edge
    n_stop = F.greatest(n_stop, F.lit(0)).cast("int")

    def milli(num, den):
        return F.when(F.col(den) > 0, F.expr(f"{num} div {den}")).cast("long")

    staged = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        # Widen BEFORE multiplying: length()/regexp_count() are int32, so
        # (count * 1000) would silently wrap under non-ANSI Spark for docs
        # with >2,147,483 countable units (realistic web-crawl size) while
        # DuckDB's BIGINT length() stays exact — the bm25-score wrap class
        # (ADVICE r11).  cast("long") first keeps the whole chain 64-bit.
        (word_chars.cast("long") * 1000).alias("_wc"),
        ((n_hash + n_ellipsis).cast("long") * 1000).alias("_sym"),
        (n_bullet_lines.cast("long") * 1000).alias("_bul"),
        (n_ellipsis_lines.cast("long") * 1000).alias("_ell"),
        (n_alpha_words.cast("long") * 1000).alias("_alpha"),
        n_lines.alias("_nl"),
        n_stop.alias("n_stop_hits"),
    )
    out = staged.select(
        "doc_id",
        "n_words",
        milli("_wc", "n_words").alias("mean_word_len_milli"),
        milli("_sym", "n_words").alias("symbol_ratio_milli"),
        milli("_bul", "_nl").alias("bullet_line_milli"),
        milli("_ell", "_nl").alias("ellipsis_line_milli"),
        milli("_alpha", "n_words").alias("alpha_word_milli"),
        "n_stop_hits",
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len_milli") >= GOPHER_MIN_MEAN_WORD_LEN_MILLI)
        & (F.col("mean_word_len_milli") <= GOPHER_MAX_MEAN_WORD_LEN_MILLI)
        & (F.col("symbol_ratio_milli") <= GOPHER_MAX_SYMBOL_RATIO_MILLI)
        & (F.col("bullet_line_milli") <= GOPHER_MAX_BULLET_LINE_MILLI)
        & (F.col("ellipsis_line_milli") <= GOPHER_MAX_ELLIPSIS_LINE_MILLI)
        & (F.col("alpha_word_milli") >= GOPHER_MIN_ALPHA_WORD_MILLI)
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return out.withColumn("keep", F.coalesce(keep, F.lit(False)))


def normalize_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode + whitespace normalization — the ftfy-lite first step of
    every curation pipeline (Dolma/CCNet run a variant before any
    filter, so downstream token/shingle/hash rules see one canonical
    byte form for visually-identical text).  Fixed rule order, each
    step exactly mirrored by the oracle:

      1. Unicode NFC (composed canonical form)
      2. CRLF / lone CR -> LF
      3. NBSP (U+00A0) -> space
      4. strip C0/C1 control chars except tab + LF
      5. collapse space/tab runs -> one space
      6. trim

    Plan shape: ONE Arrow-batched mapInPandas pass for the NFC step
    (Python's unicodedata — NFC is standard-defined, so DuckDB's
    nfc_normalize agrees byte-for-byte; Spark has no NFC builtin), then
    steps 2-6 as whole-stage-codegen regexp_replace/trim.  The Python
    boundary carries the raw text in and BOTH raw + NFC text out — the
    raw copy rides back so the `changed` flag can compare against the
    original without a second scan (the honest price; stated, not
    hidden).  Row-local, zero exchanges, scan-bound at 100 TB.

    Output: (doc_id, norm_text, changed); NULL text stays NULL with
    changed = false."""
    from pyspark.sql import types as T

    def gen(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["_nfc"] = pd.Series(
                [
                    None if t is None else unicodedata.normalize("NFC", t)
                    for t in pdf["_raw"]
                ],
                index=pdf.index,
                dtype=object,
            )
            yield pdf

    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_raw")
    )
    schema = T.StructType(
        list(src.schema.fields) + [T.StructField("_nfc", T.StringType())]
    )
    nfc = src.mapInPandas(gen, schema)
    # \x{...} escapes: the one hex-codepoint syntax Java regex and
    # DuckDB's RE2 share (\uXXXX is Java-only)
    n = F.col("_nfc")
    n = F.regexp_replace(n, r"\r\n?", "\n")
    n = F.regexp_replace(n, r"\x{00A0}", " ")
    n = F.regexp_replace(
        n, r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}-\x{9F}]", ""
    )
    n = F.regexp_replace(n, r"[ \t]+", " ")
    n = F.trim(n)
    return nfc.select(
        "doc_id",
        n.alias("norm_text"),
        F.coalesce(n != F.col("_raw"), F.lit(False)).alias("changed"),
    )


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    each document with the interpolated bigram-LM surprisal
    (`bigram_rarity` — this engine's integer-exact stand-in for CCNet's
    KenLM perplexity), calibrate the score WITHIN ITS LANGUAGE to an
    integer permille rank (`sampling.calibrate_scores` — perplexity
    distributions are not comparable across languages, the reason CCNet
    buckets per language), and cut the calibrated rank into the paper's
    head / middle / tail thirds (low surprisal = most-predictable text
    = head, the slice CCNet keeps for LM training).

    Output: (doc_id, lang, avg_rarity, calib, bucket), one row per
    document with >= 2 tokens (the bigram_rarity contract).  All
    arithmetic is integer (milli-rank thresholds compared as
    calib * 3 < 1000 / 2000), so the composition stays hash-exact.

    Plan shape: bigram_rarity's vocab-side enrichment + one doc_id
    equi-join to re-attach the language (corpus x corpus — a shuffle
    join by construction, both sides wide) + calibrate_scores' single
    per-language window (languages are bounded-cardinality).
    """
    from apache_kafka_clickhouse_demo_spark.operators import sampling as SMP

    wide = is_wide_source(docs)
    rare = bigram_rarity(docs, text_col=text_col, id_col=id_col)
    # plain select, no spread_small: this side feeds straight into a
    # shuffle join (no CPU-bound work to unlock), so an extra
    # round-robin exchange would be pure cost
    langs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    )
    # pin BOTH corpus-derived sides (code-review r12): the rarity side
    # is a per-doc aggregate whose size estimate shrinks through
    # stacked width ratios — the r9 misplan class pin_wide exists for
    scored = pin_wide(rare.select("doc_id", "avg_rarity"), wide).join(
        pin_wide(langs, wide), "doc_id"
    )
    calib = SMP.calibrate_scores(scored, "lang", "avg_rarity", "doc_id")
    bucket = (
        F.when(F.col("calib") * 3 < 1000, F.lit("head"))
        .when(F.col("calib") * 3 < 2000, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return calib.select(
        "doc_id", "lang", "avg_rarity", "calib", bucket.alias("bucket")
    )


#: C4 cleaning thresholds (Raffel et al. 2020 §2.2 — the line/page rule
#: set the C4 corpus was built with; the public ancestor of every
#: "clean the Common Crawl" recipe).
C4_MIN_LINE_WORDS = 5  # a retained line has >= 5 words
C4_MIN_KEPT_LINES = 3  # a retained page has >= 3 retained lines
#: Stand-in for the paper's blocklist ("List of Dirty, Naughty, Obscene
#: or Otherwise Bad Words") — the real list is a runtime input a caller
#: passes via `badwords=`; shipping it verbatim adds nothing to the
#: operator's semantics.  Matching is distinct-token intersection,
#: exactly like the Gopher stopword rule.
C4_BADWORDS = ("badword", "slur", "obscenity")


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    badwords: tuple[str, ...] = C4_BADWORDS,
) -> DataFrame:
    """C4 line- and page-level cleaning (Raffel et al. 2020 §2.2):

    line rules (a line survives iff ALL hold):
      * ends in a terminal punctuation mark (``. ! ? "`` after trim)
      * has at least `C4_MIN_LINE_WORDS` whitespace words
      * does not mention "javascript" (case-insensitive)
    page rules (signals emitted per document):
      * `has_lorem`  — page contains "lorem ipsum"
      * `has_brace`  — page contains "{" (code)
      * `has_badword`— any page token is in `badwords`
      * `keep`       — >= `C4_MIN_KEPT_LINES` surviving lines and no
                       page-level flag fired

    Output: (doc_id, n_lines, n_kept_lines, has_lorem, has_brace,
    has_badword, clean_text, keep) — clean_text is the surviving lines
    re-joined with newlines ('' when none survive), so a pipeline can
    FILTER on keep and continue with the cleaned page (the C4 recipe's
    actual output), exactly like `gopher_rules` feeds its `keep`.

    Unlike gopher_rules (whole-text regex counts, zero HOFs), the line
    rules genuinely need per-line predicates AND per-line recomposition
    (the kept lines come back out), so this uses one array `filter` over
    the split lines — the HOF runs interpreted, but it is row-local,
    zero-exchange, and does one pass over each line; restating "keep the
    matching lines" as whole-text regex surgery would trade that for a
    catastrophic-backtracking hazard on crawl-sized pages.  Scan-bound at
    100 TB.  NULL text behaves as '' (no lines survive, keep = false).
    The remaining C4 step — drop any three-sentence span seen twice in
    the corpus — is the `passage_dedup` operator; compose them.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(raw, r"\n", -1)

    def line_ok(x: Column) -> Column:
        t = F.trim(x)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= C4_MIN_LINE_WORDS)
            & ~F.lower(x).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    low = F.lower(raw)
    bad_arr = F.array(*[F.lit(w) for w in badwords])
    n_bad = F.size(
        F.array_intersect(F.array_distinct(F.split(F.trim(low), r"\s+")), bad_arr)
    )
    staged = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        low.contains("lorem ipsum").alias("has_lorem"),
        raw.contains("{").alias("has_brace"),
        # greatest(..., 0): size() is -1 on the empty-split edge
        (F.greatest(n_bad, F.lit(0)) > 0).alias("has_badword"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    keep = (
        (F.col("n_kept_lines") >= C4_MIN_KEPT_LINES)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_badword")
    )
    return staged.withColumn("keep", F.coalesce(keep, F.lit(False)))


def doc_chunks(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking for training pipelines: split each document
    into `chunk_tokens`-token windows starting every `stride` tokens
    (overlap = chunk_tokens - stride), emitting one row per chunk with its
    index, text, and token count.

    Row-local sequence + posexplode — zero shuffles, scan throughput at
    100 TB; the fan-out factor is ~n_tokens/stride.  The final (possibly
    short) tail window is kept: training pipelines pad or pack it, they
    don't silently drop document tails.  Deterministic, so re-chunking a
    grown corpus reproduces all previous chunk ids.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = TX.tokens(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_tokens))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.array_join("chunk", " ").alias("chunk_text"),
        F.size("chunk").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    max_tokens: int = 64,
    buckets: int = 8,
    salt: str = "pack:",
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    n_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing for training batches: assign every chunk a
    (bucket, pack_id, pack_pos) so that concatenating each bucket's chunk
    stream in (doc_id, chunk_idx) order and cutting it at every
    `max_tokens` tokens yields the packs — the concatenate-and-cut packing
    GPT-style pretraining uses (a chunk belongs to the pack where its
    first token lands).

    Distributed design: packing is bucketed by a deterministic hash of the
    document id, and each bucket packs independently — ONE shuffle on the
    bucket key, then a per-bucket running-sum window.  A single global
    pack stream would serialize 100 TB through one partition; per-bucket
    streams are how distributed training prep actually packs (each bucket
    becomes one data-loader shard).  All integer arithmetic, exact
    cross-engine.

    Output: (bucket, doc_id, chunk_idx, n_tokens, start_tok, pack_id,
    pack_pos); pack_id is bucket-local, start_tok is the chunk's first
    token offset in its bucket's stream.  NULL-token chunks (degenerate
    NULL-text docs) keep NULL offsets rather than vanishing.
    """
    from pyspark.sql import Window

    if max_tokens <= 0 or buckets <= 0:
        # non-ANSI Spark turns % 0 / div 0 into NULL buckets and pack ids
        # — silent corruption, not an error (code-review r6)
        raise ValueError("max_tokens and buckets must be positive")
    bucket = H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % buckets
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(n_col).cast("long")).over(w) - F.col(n_col)).cast("long")
    return (
        chunks.withColumn("bucket", bucket)
        .withColumn("start_tok", start)
        .select(
            "bucket",
            F.col(id_col).alias("doc_id"),
            F.col(idx_col).alias("chunk_idx"),
            F.col(n_col).alias("n_tokens"),
            "start_tok",
            F.expr(f"start_tok div {max_tokens}").alias("pack_id"),
            (F.col("start_tok") % max_tokens).alias("pack_pos"),
        )
    )


def pack_bins_ffd(
    items: DataFrame,
    capacity: int,
    buckets: int = 64,
    salt: str = "ffd:",
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
) -> DataFrame:
    """First-fit-decreasing bin packing of WHOLE documents into
    fixed-capacity training bins — the no-cross-contamination packing
    regime (Krell et al. 2021: keep each document intact in one
    sequence instead of concatenate-and-cut, so attention never spans
    document boundaries; FFD is the classic 11/9-optimal heuristic that
    keeps padding waste near the bin-count lower bound).

    `pack_chunks` is the other regime (concatenate-and-cut, documents
    may split); this one never splits — a document longer than
    `capacity` gets a bin of its own, flagged `overflow` (the caller
    chunks upstream if that is not acceptable — stated contract).

    Distributed design: documents hash-bucket by id (same h48 rule as
    pack_chunks) and each bucket packs INDEPENDENTLY with sequential
    FFD inside one `applyInPandas` group — one shuffle on the bucket
    key, per-bucket work O(n_b log n_b) sort + O(n_b * bins_touched)
    placement scan.  FFD is inherently sequential; bucketing is the
    standard parallelization (each bucket is one dataloader shard), and
    the sort key (n_tokens desc, id asc) plus the deterministic bucket
    hash make the full assignment bit-reproducible — pinned against a
    pure-Python replica in tests/test_pack_bins.py (non-SQL-expressible:
    bin state is a sequential fold, the BPE/unigram precedent).

    Output: (bucket, bin_id, doc_id, n_tokens, bin_fill, overflow) —
    bin_id is bucket-local and ordered by bin creation; bin_fill is the
    bin's total tokens (repeated per member row); NULL/negative token
    counts are rejected upstream by the cast + filter (stated: such
    rows are dropped, they cannot be packed).
    """
    from pyspark.sql import types as T

    if capacity <= 0 or buckets <= 0:
        raise ValueError("capacity and buckets must be positive")
    # stated drop rule (code-review r12): rows with NULL id, NULL
    # tokens, or negative tokens are dropped — a NULL id cannot join a
    # deterministic bucket, and the long cast is a CONTRACT (integer
    # ids only; a non-integer id would silently null out while its
    # hash still picked a bucket)
    src = items.select(
        (
            H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % buckets
        ).alias("bucket"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_col).cast("long").alias("n_tokens"),
    ).filter(
        F.col("doc_id").isNotNull()
        & F.col("n_tokens").isNotNull()
        & (F.col("n_tokens") >= 0)
    )

    out_schema = T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
            T.StructField("overflow", T.BooleanType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in out_schema.fields}
            )
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []  # bin_id -> current fill
        max_free = -1  # fast reject: the LARGEST remaining capacity
        assign: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            placed = -1
            if n <= max_free:
                for b, f in enumerate(fills):
                    if f + n <= capacity:
                        placed = b
                        fills[b] = f + n
                        break
            if placed < 0:
                placed = len(fills)
                fills.append(n)
            assign.append(placed)
            max_free = capacity - min(fills)
        return pd.DataFrame(
            {
                "bucket": int(pdf["bucket"].iloc[0]),
                "bin_id": assign,
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "bin_fill": [fills[b] for b in assign],
                "overflow": [
                    int(t) > capacity for t in pdf["n_tokens"].to_numpy()
                ],
            }
        )

    return src.groupBy("bucket").applyInPandas(pack, out_schema)


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition signals: duplicate-token and duplicate
    2-gram fractions per document.  Boilerplate, keyword-stuffed, or
    generation-loop documents score high and get filtered before training.

    Row-local (tokenize once per branch, distinct in-place) — scan
    throughput at 100 TB.  The integer counts are the primary output (exact
    cross-engine); the ratios are single-division doubles, bit-identical by
    construction and rounded for safety.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(TX.tokens(text_col)).alias("n_tokens"),
        *_repetition_cols(text_col),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    wide: bool | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by a TF-IDF-style score.

    Score is EXACT integer arithmetic — `tf * 1_000_000 * (N + 1) div
    (df + 1)` — monotone in tf/idf like the classic tf·log-idf but free of
    cross-engine `ln` bit differences, so the operator stays hash-exact
    against the DuckDB oracle.  Ties break on the term ascending.

    Plan shape at 100 TB: explode tokens -> per-(doc, term) count (one
    shuffle with map-side partials) -> per-term document frequency (second
    shuffle, carries one row per distinct (doc, term)) -> corpus size N as
    a 1-row aggregate broadcast -> per-doc top-k window.  The window
    partitions by doc_id over per-term rows, orders of magnitude smaller
    than the corpus text.
    """
    from pyspark.sql import Window as W

    terms = spread_small(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(TX.tokens(text_col)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    if wide is None:
        # reliable only when `docs` is scan-rooted; a caller handing a
        # DERIVED frame (joins/aggregates upstream) must pass its own
        # source-computed flag — the derived estimate is exactly what the
        # r9 misplan class showed cannot be trusted (r10 sweep finding:
        # text_prep's anti-joined train split shrank under the bound and
        # silently disarmed this pin)
        wide = is_wide_source(docs)
    scored = (
        # pin_wide (r9): the document-frequency table is the corpus
        # vocabulary; see unigram_rarity for the misplan class
        tf.join(pin_wide(df_, wide), "term")
        .crossJoin(F.broadcast(n))
        # DECIMAL(38,0) keeps the product exact at any corpus size —
        # tf * 1e6 * (n_docs+1) overflows int64 around n_docs ~ 1e9 with
        # tf >= ~900 and non-ANSI Spark would silently WRAP, corrupting
        # the ranking (code-review r6).  Values identical to the old
        # int64 form wherever that form didn't overflow, so gate hashes
        # are unchanged; ranking uses the untruncated decimal, and the
        # emitted long is NULL (not garbage) in the overflow regime.
        .withColumn(
            "score_dec",
            F.expr("CAST(tf AS DECIMAL(38,0)) * 1000000 * (n_docs + 1) div (df + 1)"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score_dec").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "rank", "term", "tf", "df",
            F.col("score_dec").cast("long").alias("score_micro"),
        )
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: whole-text 48-bit hash + winnowed min-shingle
    hash (the minimum h48 over word 3-gram shingles — a 1-permutation
    MinHash, stable under reordering-free edits at either end).

    Explode + codegen md5 + min() aggregate: the per-shingle hashing runs
    in whole-stage codegen instead of the interpreted HOF evaluator, and
    map-side partial aggregation shrinks the shuffle to one long per doc
    per partition.

    explode_OUTER, not explode: a doc with a NULL text has a NULL token
    (hence shingle) array, and a plain explode would drop its row entirely —
    the oracle emits it with NULL fingerprints.  (Short docs are safe either
    way: word_shingles yields the full token string as a single shingle, so
    shingle arrays are never empty for non-NULL text.)  The outer variant
    keeps one row with s = NULL; h48(NULL) = NULL, so both fingerprints
    surface as exactly the oracle's NULLs."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = TX.tokens(text_col)
    sh = TX.word_shingles(toks, 3)
    exploded = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        H.h48(t).alias("text_fp"),  # once per input row, carried by explode
        F.explode_outer(sh).alias("s"),
    )
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.first("text_fp").alias("text_fp"),
            F.min(H.h48("s")).alias("min_shingle_fp"),
        )
        .select("doc_id", "text_fp", "min_shingle_fp")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every word
    k-gram, slide a window of `window` consecutive k-gram hashes over the
    document, select each window's MINIMUM hash; the fingerprint is the
    distinct selected set.

    The published guarantee this buys over plain min-hashing: any shared
    token run of length >= window + k - 1 between two documents
    contributes at least one COMMON selected hash (every such run spans a
    full window on both sides, and the window's min is position-
    independent), while the expected fingerprint density is only
    2/(window+1) of the full k-gram set — a local, alignment-free
    similarity sketch MinHash (global, permutation-based) cannot provide.
    Selection is by VALUE (classic winnowing tie-breaks equal mins by
    position); the selected SET is identical except under h48 value ties
    (~2^-48), the same collision class `doc_fingerprint` accepts.

    Plan shape at 100 TB: one row-local projection chain — tokenize,
    k-gram, per-gram h48, window-min, distinct+sort — ZERO exchanges; the
    output is ~2/(window+1) x corpus-gram count.  Short docs (< k tokens)
    fingerprint their full token string (word_shingles' single-shingle
    floor), so no document hashes to empty.

    Output: (doc_id, n_grams, fingerprint) with `fingerprint` the sorted
    selected hashes '-'-joined (scalar string: driver-canonicalizable and
    directly comparable/joinable downstream).
    """
    if window <= 0 or k <= 0:
        raise ValueError("k and window must be positive")
    toks = TX.tokens(text_col)
    grams = TX.word_shingles(toks, k)
    hashed = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        # NULL-text parity with doc_fingerprint and the oracle (review
        # r7): the NULL propagates to a [NULL] hash array, whose joined
        # fingerprint Spark would render '' while DuckDB renders NULL —
        # carry the flag and emit NULL explicitly
        F.col(text_col).isNull().alias("_null_text"),
        F.transform(grams, lambda g: H.h48(g)).alias("hashes"),
    )
    wins = F.sequence(
        F.lit(0), F.greatest(F.size("hashes") - window, F.lit(0))
    )
    selected = F.array_sort(
        F.array_distinct(
            F.transform(
                wins, lambda i: F.array_min(F.slice("hashes", i + 1, window))
            )
        )
    )
    return hashed.select(
        "doc_id",
        F.size("hashes").alias("n_grams"),
        F.when(F.col("_null_text"), F.lit(None).cast("string"))
        .otherwise(
            F.array_join(
                F.transform(selected, lambda h: h.cast("string")), "-"
            )
        )
        .alias("fingerprint"),
    )


def unigram_rarity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-statistics quality scoring: the unigram-LM surprisal filter
    of CCNet / Gopher (drop documents whose tokens are improbably rare
    under a language model of the corpus itself), restated log-free so
    the aggregate is EXACT and order-independent at any scale.  Each
    token contributes floor(total_tokens / df(token)) — the reciprocal of
    its unigram probability, a monotone surrogate for -log p — and a
    document's score is the per-token mean of that integer mass.  Rare-
    token-heavy documents (gibberish, codes, boilerplate IDs) score high;
    stopword-heavy prose scores low.  Avoiding log keeps the per-doc sum
    an integer (no float accumulation order to mirror), the house rule
    for oracle-exact aggregates; floor() runs on an IEEE double quotient
    computed identically by both engines, and is exact while
    total_tokens < 2^53 (a 100 TB corpus is ~1e13).  int64 bounds: max
    contrib = total (a df=1 token), so a doc's mass overflows only past
    ~1e6 singleton tokens at 1e13 corpus tokens — the ANSI sum fails
    loudly there instead of wrapping.

    Output: (doc_id, n_tokens, rarity_mass, avg_rarity), one row per
    document with >= 1 token (tokenization never yields zero tokens);
    unordered.

    Plan shape at 100 TB: tokenize+explode is row-local; the vocabulary
    aggregate shuffles once keyed by token (map-side combinable count —
    the df table is the corpus vocabulary, NOT broadcast: it can be
    billions of rows and joins hash-to-hash); the corpus total is a
    single-row aggregate attached by broadcast; the occurrence-vocab join
    shuffles on the same token key (AQE absorbs stopword skew — "the"
    carries ~5% of all occurrences); the per-doc sum is the last
    exchange.
    """
    occ = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(TX.tokens(text_col)).alias("tok"),
    )
    vocab = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total_row = vocab.agg(F.sum("df").alias("_total"))
    contrib = F.floor(F.col("_total").cast("double") / F.col("df")).cast("long")
    out = (
        # pin_wide (r9): the vocabulary is corpus-sized, but Catalyst's
        # static size estimate shrinks through the aggregate and planned a
        # BROADCAST of it at the 100x rehearsal — the driver-collect this
        # docstring promises never happens.  Above the source-size bound
        # the hint pins the hash-to-hash shuffle join (the aggregate's own
        # token partitioning is reused on that side).
        occ.join(pin_wide(vocab, is_wide_source(docs)), "tok")
        .crossJoin(F.broadcast(total_row))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(contrib).cast("long").alias("rarity_mass"),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "rarity_mass",
        F.round(
            F.col("rarity_mass").cast("double") / F.col("n_tokens"), 4
        ).alias("avg_rarity"),
    )


#: hashing-trick feature buckets for the quality classifier (2^12 — small
#: enough that a TRAINED weight table broadcasts as a few KB at any corpus
#: scale, large enough that bucket collisions stay rare at this vocabulary)
QC_BUCKETS = 4096
#: weights live in integer milli-units in [-QC_WEIGHT_SPAN, QC_WEIGHT_SPAN]
QC_WEIGHT_SPAN = 1000
#: keep threshold: mean weight per feature >= tau_millis / 1000
QC_TAU_MILLIS = 0


def _qc_bucket(feat: Column) -> Column:
    """Feature -> hashing-trick bucket in [0, QC_BUCKETS)."""
    return H.h48(feat) % QC_BUCKETS


def _qc_weight(bucket: Column) -> Column:
    """Deterministic per-bucket weight in [-QC_WEIGHT_SPAN, QC_WEIGHT_SPAN]
    as a Spark expression (h48 of the bucket id) — the defining formula the
    oracle mirrors.  The operator itself uses `qc_weight_table()` instead:
    same md5 math precomputed driver-side over all QC_BUCKETS ids, staged
    as a constant-folded literal array, which halves the per-feature md5
    count (one bucket hash instead of bucket + weight hashes)."""
    return (
        H.h48(F.concat(F.lit("qw:"), bucket.cast("string")))
        % (2 * QC_WEIGHT_SPAN + 1)
        - QC_WEIGHT_SPAN
    )


def qc_weight_table() -> list[int]:
    """The demo model's full weight vector, bucket id -> milli-unit weight.

    Stands in for a TRAINED fastText weight vector: this container has no
    training corpus or fastText binary, so the demo model derives each
    bucket's weight from a second md5 — computed here in Python with the
    SAME bit math as `functions.hashing.h48` (first 12 hex chars of md5 as
    an integer), so the expression form `_qc_weight`, this table, and the
    DuckDB oracle agree bit-for-bit (pinned by pytest).  A real deployment
    replaces this with the trained vector via the `weights` argument.
    """
    import hashlib

    span = 2 * QC_WEIGHT_SPAN + 1
    return [
        int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:12], 16) % span
        - QC_WEIGHT_SPAN
        for b in range(QC_BUCKETS)
    ]


def quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_millis: int = QC_TAU_MILLIS,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Model-based quality scoring — the fastText-style linear classifier
    of the DataComp-LM / RefinedWeb curation recipes (a supervised bag of
    hashed word n-grams), restated in exact integer arithmetic.  Features
    are unigrams + word bigrams (fastText ``wordNgrams=2``); each feature
    hashes into one of QC_BUCKETS buckets (the hashing trick, so the model
    is fixed-size no matter the vocabulary) and contributes that bucket's
    integer milli-unit weight; a document KEEPs when its mean weight per
    feature clears ``tau_millis``.  The sigmoid of the real classifier is
    monotone in this mean, so thresholding the integer mean is equivalent
    to thresholding the probability — and keeps the aggregate exact and
    order-independent, the house rule for oracle-exact operators.

    ``weights=None`` uses the deterministic built-in demo model (weight =
    second h48 of the bucket id); passing a ``(bucket int, weight long)``
    DataFrame scores with a real trained vector instead.

    Output: (doc_id, n_features, weight_sum, avg_weight, keep), one row
    per document (NULL text scores as empty text); unordered.

    Plan shape at 100 TB: the default path is FULLY row-local — tokenize,
    shingle, hash, and sum all run inside one projection, so the operator
    executes at scan throughput with ZERO exchanges (the ideal curation
    filter: it composes with any downstream op without a shuffle).  The
    trained-weights path explodes features and broadcast-joins the
    bucket->weight table (<= QC_BUCKETS rows, a few KB — broadcastable at
    any scale) then re-aggregates per doc: one exchange, keyed by doc_id.
    int64 bounds: |weight| <= 1000, so a doc overflows only past ~9e15
    features — unreachable.
    """
    toks = TX.tokens(F.coalesce(F.col(text_col), F.lit("")))
    feats = F.concat(toks, TX.word_shingles(toks, 2))
    # stage the feature array as a real projected column (see _staged_lang:
    # HOF lambdas sit outside codegen CSE, so an unstaged array would be
    # recomputed by every reference)
    staged = spread_small(docs).select(
        F.col(id_col).alias("doc_id"), feats.alias("_feats")
    )
    if weights is None:
        # one array Literal (NOT CreateArray of 4096 Literal children —
        # that folded to the same runtime plan but cost ~3 s of driver-side
        # tree walking per cold plan, measured r9); element_at on it is an
        # O(1) lookup per feature
        wtab = F.lit([int(w) for w in qc_weight_table()]).cast("array<long>")
        scored = staged.select(
            "doc_id",
            F.size("_feats").cast("int").alias("n_features"),
            F.aggregate(
                F.col("_feats"),
                F.lit(0).cast("long"),
                lambda acc, f: acc
                + F.element_at(wtab, _qc_bucket(f).cast("int") + 1),
            ).alias("weight_sum"),
        )
    else:
        occ = staged.select(
            "doc_id",
            F.size("_feats").cast("int").alias("n_features"),
            F.explode("_feats").alias("_f"),
        ).withColumn("_bucket", _qc_bucket(F.col("_f")).cast("int"))
        w = weights.select(
            F.col("bucket").cast("int").alias("_bucket"),
            F.col("weight").cast("long").alias("_w"),
        )
        scored = (
            occ.join(F.broadcast(w), "_bucket", "left")
            .groupBy("doc_id", "n_features")
            .agg(F.sum(F.coalesce(F.col("_w"), F.lit(0))).alias("weight_sum"))
            .select("doc_id", "n_features", "weight_sum")
        )
    return scored.select(
        "doc_id",
        "n_features",
        "weight_sum",
        F.round(
            F.col("weight_sum").cast("double") / F.col("n_features"), 4
        ).alias("avg_weight"),
        (
            F.col("weight_sum") * 1000 >= F.lit(int(tau_millis)) * F.col("n_features")
        ).alias("keep"),
    )


def substring_dedup(
    docs: DataFrame,
    window_words: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-substring removal (the ExactSubstr rule of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"), at token-
    window granularity: every OVERLAPPING `window_words`-token window
    (stride 1) that re-occurs anywhere in the corpus is removed from all
    but its globally FIRST occurrence (first = smallest (doc_id, position)),
    and each document is rebuilt from the tokens not covered by any removed
    window.  Unlike `chunk_dedup` (non-overlapping passages, whole-passage
    drop), this removes arbitrary-alignment repeated SPANS — overlapping
    duplicated windows merge into maximal spans, so a long quote copied
    mid-sentence disappears wherever it recurs while the earliest document
    keeps it verbatim.  The suffix-array formulation of the paper is
    inherently sequential; the window-hash formulation is the
    shuffle-friendly restatement: a span of >= window_words repeated tokens
    is exactly a run of duplicated windows.

    Output: (doc_id, n_tokens, n_dup_tokens, kept_text), one row per input
    document (docs shorter than the window have no windows and pass
    through whole); unordered.

    Plan shape at 100 TB: windowing is row-local (sequence + posexplode in
    codegen); occurrences shuffle ONCE keyed by the 6-byte h48(window) for
    the global first-occurrence aggregate (map-side combinable min of the
    (doc_id, pos) int64 encoding — same contract as `chunk_dedup`:
    positions < 2^20, doc_ids < 2^43); duplicates join back on the same
    key (AQE absorbs boilerplate skew); the per-doc span collection is the
    second exchange and the rebuild join on doc_id the third.  Span
    merging + token rebuild are single-pass row-local folds (O(tokens)
    per document, not O(tokens * spans)).  The h48-collision guard is
    `chunk_dedup`'s, in the fail-safe direction: a later window is removed
    only when its text EQUALS the first occurrence's text, so a distinct
    window colliding with an earlier hash is kept, never destroyed.
    """
    if window_words <= 0:
        raise ValueError("window_words must be positive")
    w = window_words
    toks = TX.tokens(text_col)
    starts = F.when(
        F.size(toks) >= w, F.sequence(F.lit(0), F.size(toks) - w)
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(starts, lambda s: F.array_join(F.slice(toks, s + 1, w), " "))
    occ = (
        spread_small(docs)
        .select(F.col(id_col).alias("doc_id"), F.posexplode(wins).alias("wpos", "wtext"))
        .select(
            "doc_id",
            "wpos",
            "wtext",
            H.h48("wtext").alias("whash"),
            (F.col("doc_id") * F.lit(1 << 20) + F.col("wpos")).alias("occ_key"),
        )
        # both the first-occurrence aggregate and the join probe read occ;
        # without materialization the tokenize+hash scan runs twice
        .persist()
    )
    firsts = occ.groupBy("whash").agg(
        F.min("occ_key").alias("first_key"),
        F.min_by("wtext", "occ_key").alias("first_text"),
    )
    wide = is_wide_source(docs)
    dup_starts = (
        # pin_wide (r9, caught by the 100x rehearsal): `firsts` has one
        # row per DISTINCT WINDOW — corpus-sized — but Catalyst's static
        # estimate shrinks through the aggregate and planned a broadcast
        # that aborted the driver at 100x (>1 GiB collect).  Same for
        # `dup_starts` below.  The hints pin spill-safe shuffle joins on
        # the keys both aggregates are already partitioned by.
        occ.join(pin_wide(firsts, wide), "whash")
        .filter((F.col("occ_key") != F.col("first_key")) & (F.col("wtext") == F.col("first_text")))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("wpos")).alias("dups"))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).cast("int").alias("n_tokens"),
    )
    joined = base.join(pin_wide(dup_starts, wide), "doc_id", "left").withColumn(
        "dups", F.coalesce("dups", F.array().cast("array<int>"))
    )
    # merge sorted window starts into disjoint spans [s, e): extend the
    # last span while the next start falls inside it, else open a new one.
    # try_element_at(acc, -1) is NULL on the empty accumulator (ANSI-safe),
    # making the first element open the first span.
    spans = F.aggregate(
        F.col("dups"),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            F.try_element_at(acc, F.lit(-1))["e"] >= p,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.try_element_at(acc, F.lit(-1))["s"].alias("s"),
                        F.greatest(
                            F.try_element_at(acc, F.lit(-1))["e"], p + F.lit(w)
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc, F.array(F.struct(p.alias("s"), (p + F.lit(w)).alias("e")))
            )
        ),
    )
    with_spans = joined.withColumn("_spans", spans)
    # rebuild: single cursor fold over the disjoint sorted spans — emit the
    # tokens between the cursor and each span start, jump the cursor to the
    # span end, then flush the tail.  O(tokens) per row.
    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(
            F.lit(0).alias("cur"), F.array().cast("array<string>").alias("parts")
        ),
        lambda acc, sp: F.struct(
            sp["e"].alias("cur"),
            F.concat(
                acc["parts"], F.slice(F.col("_toks"), acc["cur"] + 1, sp["s"] - acc["cur"])
            ).alias("parts"),
        ),
        lambda acc: F.concat(
            acc["parts"],
            F.slice(F.col("_toks"), acc["cur"] + 1, F.col("n_tokens") - acc["cur"]),
        ),
    )
    return with_spans.select(
        "doc_id",
        "n_tokens",
        F.aggregate(
            "_spans", F.lit(0), lambda a, sp: a + (sp["e"] - sp["s"])
        ).cast("int").alias("n_dup_tokens"),
        F.array_join(rebuilt, " ").alias("kept_text"),
    )


def chunk_dedup(
    docs: DataFrame,
    chunk_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-passage removal (the CCNet / C4 / RefinedWeb line-dedup
    rule): split each document into consecutive NON-overlapping
    `chunk_words`-token passages, keep only the globally FIRST occurrence
    of each distinct passage (first = smallest (doc_id, position)), and
    rebuild every document from its surviving passages.  Boilerplate that
    recurs across a crawl — headers, footers, license blocks — survives
    exactly once, in the earliest document that carried it; documents left
    with zero surviving passages drop out entirely.

    Output: (doc_id, n_chunks, n_kept, kept_text), one row per surviving
    document, with `kept_text` the order-preserving concatenation; rows are
    unordered (a corpus-sized global sort is the caller's decision).

    Plan shape at 100 TB: chunking is row-local (sequence + posexplode in
    codegen); occurrences shuffle ONCE keyed by the 6-byte portable
    `h48(chunk)` — never the chunk text — for the global first-occurrence
    aggregate (map-side combinable `min` of an encoded (doc_id, pos)
    int64); survivors join back on the same key (AQE handles the skewed
    boilerplate chunks — millions of copies of one footer hash); the
    rebuild groupBy(doc_id) is the third and last exchange.  Occurrence
    encoding `doc_id * 2^20 + pos` is exact while documents stay under
    2^20 chunks (a 100 TB crawl shard is, by orders of magnitude) and
    doc_ids stay below 2^43.
    """
    if chunk_words <= 0:
        raise ValueError("chunk_words must be positive")
    toks = TX.tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(chunk_words)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_words))
    # the tokenize + per-chunk md5 projection is the expensive stage; a
    # single-file local scan must not pin it to one core (spread_small is a
    # no-op on many-file cluster inputs)
    occ = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(chunks).alias("n_chunks"),
        F.posexplode(chunks).alias("cpos", "chunk"),
    ).select(
        "doc_id",
        "n_chunks",
        "cpos",
        H.h48(F.array_join("chunk", " ")).alias("chash"),
        F.array_join("chunk", " ").alias("ctext"),
        (F.col("doc_id") * F.lit(1 << 20) + F.col("cpos")).alias("occ_key"),
    )
    # persist: both the first-occurrence aggregate AND the join probe side
    # read `occ`, and without materialization Spark recomputes the dominant
    # tokenize+md5 scan once per consumer (measured 1.5s -> 0.9s at sf0.1).
    # A window-min over chash would be single-scan too but concentrates
    # each chunk hash in ONE task — boilerplate skew (millions of copies of
    # one footer) is this operator's expected case at 100 TB, and the
    # groupBy(+map-side combine) / AQE-skew-join pair handles it where a
    # window cannot.  Cache lifetime: freed by the registry's per-query
    # clearCache (same contract as the dedup operators' persists).
    occ = occ.persist()
    # h48-collision guard (ADVICE r6): the 48-bit key makes birthday
    # collisions expected at ~1e10+ chunks, and keying the drop on the
    # hash alone would silently destroy a DISTINCT passage that collides
    # with an earlier one.  Carrying the first occurrence's text and
    # confirming equality before dropping fails SAFE: a colliding distinct
    # passage is kept (its own later duplicates are then also kept — a
    # ~2^-48-rate under-dedup, the harmless direction for training data,
    # vs. silent content loss).  min_by ships one candidate text per
    # (partition, chash) through the aggregate's map-side combine, so the
    # shuffle stays hash-keyed and near-constant per distinct chunk.
    firsts = occ.groupBy("chash").agg(
        F.min("occ_key").alias("first_key"),
        F.min_by("ctext", "occ_key").alias("first_text"),
    )
    # pin_wide (r9, caught by the 100x rehearsal): `firsts` is one row
    # per DISTINCT PASSAGE — corpus-sized — but the static size estimate
    # shrinks through the aggregate and Catalyst planned a broadcast of it
    # at 100x.  The hint pins the spill-safe shuffle join on chash, the
    # key the aggregate is already partitioned by.
    kept = occ.join(pin_wide(firsts, is_wide_source(docs)), "chash").filter(
        (F.col("occ_key") == F.col("first_key"))
        | (F.col("ctext") != F.col("first_text"))
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.max("n_chunks").cast("int").alias("n_chunks"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cpos", "ctext"))),
                    lambda s: s["ctext"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (keyword search over the corpus)
# ---------------------------------------------------------------------------

#: fixed-point scales for the two BM25 factors (micro-units each)
BM25_IDF_SCALE = 1_000_000
BM25_TF_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 keyword retrieval (Robertson et al., TREC-3): top-k
    documents per query string, restated in exact integer arithmetic.

    With the standard constants k1 = 6/5 and b = 3/4, clearing
    denominators turns BM25's two factors into integer ratios:

        idf(df)        ~ (N - df + 0.5)/(df + 0.5)  = (2N - 2df + 1)/(2df + 1)
        tf_sat(tf, dl) = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))
                       = 44*tf*TOT / (20*tf*TOT + 6*TOT + 18*dl*N)

    where N = corpus document count, TOT = corpus token count (so
    avgdl = TOT/N enters exactly, never as a rounded double).  Each factor
    is computed as an exact DECIMAL(38,0) product floor-divided once into
    micro-units (`div`, both operands positive, so Spark's truncation and
    DuckDB's `//` agree), and the per-term contributions — integers —
    sum order-independently per (query, doc).  DEVIATION FROM TEXTBOOK
    BM25, stated honestly: the idf factor is the Robertson odds RATIO
    itself, not its log — per-term rankings are identical (the ratio is
    monotone in df exactly as the log is) but cross-term weighting trades
    log-compression for integer exactness, the house rule that keeps the
    operator hash-exact against the DuckDB oracle (same trade as
    `tfidf_top_terms`).  Queries are tokenized driver-side by the same
    lower/split rule as `TX.tokens` and deduplicated (classic BM25 with
    qtf = 1 for short queries).

    Output: (query_id, rank, doc_id, bm25_score_micro long), rank 1..k by
    (score desc, doc_id asc); queries matching no document emit no rows;
    like tfidf_top_terms, ranking uses the untruncated decimal and the
    emitted long is NULL (not garbage) past ~1e9-doc corpora.

    Plan shape at 100 TB: the explode is filtered to QUERY TERMS before
    the (doc, term) aggregate, so the one corpus-scale shuffle carries
    only matching occurrences; document frequency aggregates to <= |query
    vocabulary| rows and the corpus (N, TOT) to one row — both
    bounded-by-construction broadcasts (the literal `isin` bounds them,
    not an estimate).  Per-query top-k runs the same two-phase
    partial/merge reduction as `similarity._two_phase_topk` — a window
    partitioned by the handful of query ids would funnel every candidate
    row through one task per query at scale.  Doc length rides the
    explode (grouping key constant per doc), so no corpus-side join or
    second scan feeds the score.
    """
    # TX.py_tokens, not str.split(): queries tokenize by the same
    # ASCII-whitespace rule as TX.tokens applies to documents
    qt_rows = sorted(
        {(int(qid), t) for qid, q in queries for t in TX.py_tokens(q)}
    )
    if not qt_rows:
        raise ValueError("bm25_topk: queries contain no terms")
    all_terms = sorted({t for _, t in qt_rows})

    toks = TX.tokens(F.coalesce(F.col(text_col), F.lit("")))
    base = spread_small(docs).select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("_toks")).cast("long").alias("tot_tokens"),
    )
    occ = base.select(
        "doc_id", F.size("_toks").cast("long").alias("dl"), F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(all_terms))
    tf = occ.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    spark = docs.sparkSession
    qt = spark.createDataFrame(qt_rows, "query_id int, term string")

    return bm25_score_topk(tf, dfreq, stats, qt, k)


def bm25_score_topk(
    tf: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qt: DataFrame,
    k: int,
) -> DataFrame:
    """Shared BM25 scoring + per-query two-phase top-k — extracted so the
    scan path (`bm25_topk`) and the index-backed path
    (`search_index.bm25_lookup`) provably compute the SAME integer
    formula (their bit-identity is a test contract, and a copy would let
    them silently drift).  tf = (doc_id, dl, term, tf); dfreq = (term,
    df); stats = 1 row (n_docs, tot_tokens); qt = (query_id, term)."""
    scored = (
        # dfreq <= |query vocabulary| rows and stats is 1 row: bounded by
        # construction, so the unconditional broadcasts are scale-safe
        # (bcast_small's "genuinely bounded" carve-out)
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.expr(
                f"CAST(2*n_docs - 2*df + 1 AS DECIMAL(38,0)) * {BM25_IDF_SCALE}"
                " div (2*df + 1)"
            ),
        )
        .withColumn(
            "_tfs",
            F.expr(
                f"CAST(44 AS DECIMAL(38,0)) * tf * tot_tokens * {BM25_TF_SCALE}"
                " div (CAST(20 AS DECIMAL(38,0))*tf*tot_tokens"
                " + 6*tot_tokens + 18*dl*n_docs)"
            ),
        )
        # long * long would wrap past ~1e9 docs; the decimal product is
        # exact and the final emit degrades to NULL like tfidf_top_terms
        .withColumn("_w", F.expr("CAST(_idf AS DECIMAL(38,0)) * _tfs"))
        .join(F.broadcast(qt), "term")
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(F.sum("_w").alias("_score"))

    entry = F.struct(
        (-F.col("_score")).alias("neg_score"),
        F.col("doc_id").alias("doc_id"),
        F.col("_score").alias("score"),
    )
    partial = per_doc.select("query_id", entry.alias("e")).groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("topk"))
    merged = partial.groupBy("query_id").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("topk"))), 1, k).alias("topk")
    )
    return (
        merged.select("query_id", F.posexplode("topk").alias("_pos", "e"))
        .select(
            "query_id",
            (F.col("_pos") + 1).cast("int").alias("rank"),
            F.col("e.doc_id").alias("doc_id"),
            F.col("e.score").cast("long").alias("bm25_score_micro"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: DSIR shares the classifier family's hashed feature space (QC_BUCKETS
#: buckets over unigram+bigram features via `_qc_bucket`) so the two
#: operators' feature extraction provably cannot drift; the demo lambda
#: table is salted differently ("dw:") so their demo models are distinct.
DSIR_WEIGHT_SPAN = 1000


def _dsir_demo_lambda(bucket: Column) -> Column:
    """Deterministic demo log-ratio (milli-units) per bucket — the Spark
    expression form the oracle mirrors; `dsir_lambda_table()` precomputes
    the same md5 math driver-side (see `_qc_weight` for the rationale)."""
    return (
        H.h48(F.concat(F.lit("dw:"), bucket.cast("string")))
        % (2 * DSIR_WEIGHT_SPAN + 1)
        - DSIR_WEIGHT_SPAN
    )


def dsir_lambda_table() -> list[int]:
    """Demo importance-weight table, bucket id -> milli-unit log-ratio."""
    import hashlib

    out = []
    for b in range(QC_BUCKETS):
        h = int(hashlib.md5(f"dw:{b}".encode()).hexdigest()[:12], 16)
        out.append(h % (2 * DSIR_WEIGHT_SPAN + 1) - DSIR_WEIGHT_SPAN)
    return out


def dsir_fit(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    alpha: int = 1,
    scale_millis: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[int]:
    """Learn the DSIR importance log-ratio table from a target-domain
    sample vs the raw corpus (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed unigram+bigram
    bag-of-n-grams distributions p_target / p_raw with add-alpha
    smoothing, lambda(b) = log(p_target(b)) - log(p_raw(b)) in integer
    milli-units.

    Driver-side learning, engine-side application — the same split as
    `quality_classifier`'s trained-weights path: each distribution is ONE
    hash-aggregate whose result is bounded by construction (<= QC_BUCKETS
    rows, collect is a few KB at any corpus size), and the float `log`
    runs in Python only — the learned table is integers, so applying it
    (`dsir_weights` / `dsir_select`) stays hash-exact cross-engine.
    """
    import math

    def counts(df: DataFrame) -> tuple[dict[int, int], int]:
        toks = TX.tokens(F.coalesce(F.col(text_col), F.lit("")))
        feats = F.concat(toks, TX.word_shingles(toks, 2))
        rows = (
            spread_small(df)
            .select(F.explode(feats).alias("_f"))
            .groupBy(_qc_bucket(F.col("_f")).cast("int").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        cmap = {r["b"]: r["c"] for r in rows}
        return cmap, sum(cmap.values())

    tmap, t_tot = counts(target_docs)
    rmap, r_tot = counts(raw_docs)
    td = t_tot + alpha * QC_BUCKETS
    rd = r_tot + alpha * QC_BUCKETS
    return [
        round(
            scale_millis
            * (
                math.log((tmap.get(b, 0) + alpha) / td)
                - math.log((rmap.get(b, 0) + alpha) / rd)
            )
        )
        for b in range(QC_BUCKETS)
    ]


def dsir_weights(
    docs: DataFrame,
    lam: list[int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance weight: sum of the lambda table over
    the doc's hashed unigram+bigram features (the log importance ratio of
    the doc under the learned bag-of-n-grams model — sums of integer
    milli-log-ratios, exact and order-independent).

    `lam=None` applies the deterministic demo table; pass `dsir_fit`'s
    result for a learned one.  Output: (doc_id, n_features,
    weight_millis), one row per doc, NULL text scoring as empty.

    Plan shape at 100 TB: fully row-local — the table rides along as one
    array Literal (same staging rationale as `quality_classifier`) and
    the whole operator is one projection, zero exchanges, scan-bound.
    int64 bounds: |lambda| <= ~20*scale at any realistic smoothing, so a
    doc overflows only past ~4e14 features — unreachable.
    """
    table = lam if lam is not None else dsir_lambda_table()
    if len(table) != QC_BUCKETS:
        raise ValueError(f"lambda table must have {QC_BUCKETS} entries")
    toks = TX.tokens(F.coalesce(F.col(text_col), F.lit("")))
    feats = F.concat(toks, TX.word_shingles(toks, 2))
    staged = spread_small(docs).select(
        F.col(id_col).alias("doc_id"), feats.alias("_feats")
    )
    ltab = F.lit([int(w) for w in table]).cast("array<long>")
    return staged.select(
        "doc_id",
        F.size("_feats").cast("int").alias("n_features"),
        F.aggregate(
            F.col("_feats"),
            F.lit(0).cast("long"),
            lambda acc, f: acc + F.element_at(ltab, _qc_bucket(f).cast("int") + 1),
        ).alias("weight_millis"),
    )


def dsir_select(
    docs: DataFrame,
    k: int,
    lam: list[int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the k documents with the highest DSIR importance weight —
    the deterministic top-k variant of the paper's Gumbel-top-k
    resampling (stated honestly: Gumbel noise requires a per-row
    `-log(-log(u))`, whose cross-engine log-bit differences would break
    the oracle's exact-hash contract; top-k-by-weight is the noise-free
    limit and the paper's own "top-k heuristic" comparison point).
    Ties break on doc_id ascending, so the selected SET is deterministic.

    Plan shape: `dsir_weights` (row-local) then orderBy+limit — Catalyst
    plans TakeOrderedAndProject, the true distributed top-k (per-partition
    k-heaps, one k-row merge), never a global sort.
    """
    return (
        dsir_weights(docs, lam=lam, text_col=text_col, id_col=id_col)
        .orderBy(F.col("weight_millis").desc(), F.col("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Positional phrase matching (exact multi-word occurrence counting)
# ---------------------------------------------------------------------------

#: Java-regex metacharacters (Pattern class); escaped one-by-one instead
#: of \Q...\E quoting because a token could itself contain the \E
#: terminator (tokens are arbitrary non-whitespace runs).
_JAVA_REGEX_META = re.compile(r"([\\.\[\]{}()<>*+\-=!?^$|])")


def _java_regex_quote(s: str) -> str:
    return _JAVA_REGEX_META.sub(r"\\\1", s)


def phrase_matches(
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact positional phrase search: for each (phrase_id, phrase) count
    the occurrences of the phrase's token sequence in every document —
    the quoted-query primitive BM25's bag-of-words scoring cannot express
    (and the contamination-checking shape for exact-string probes at
    word grain).

    Phrases are tokenized driver-side by the same lower/split rule as
    `TX.tokens`; a document row is emitted per matching phrase with its
    occurrence count (non-matching pairs are dropped, so output is
    match-sparse).  Semantics are the sliding token window:
    n_matches = |{i : toks[i : i+m] == phrase}| — overlapping occurrences
    count individually ("a a a" contains "a a" twice).

    The count is computed as ONE `regexp_count` over the space-joined
    token string with a zero-width lookahead, `(?= t1 t2 ... tm )`:
    tokens cannot contain the ASCII-space separator (TX.tokens split on
    it), so the space-anchored pattern matches exactly at token
    boundaries — never inside a token — and the ZERO-WIDTH match is what
    makes overlapping occurrences all count (the engine advances one
    character after each hit instead of consuming the window, so "a a a"
    yields 2 for "a a"; a consuming pattern would also steal the
    boundary space the next occurrence needs as its leading anchor).
    This replaced a per-window `F.filter(sequence, i -> slice == lit)`
    compare that ran in the interpreted HOF evaluator (lambdas sit
    outside whole-stage codegen) at ~10x the per-row constant — measured
    100x rehearsal dropped from 31.9x to scan-bound (SCALING.md).

    Plan shape at 100 TB: ONE projection + explode of a |phrases|-length
    struct array, zero exchanges — scan throughput, composes with any
    downstream op.  The joined string builds once per row (shared
    subexpression across phrases); each phrase is one JVM regex pass,
    O(doc length * phrase length) worst case with a codegen-resident
    inner loop — linear fan-out a cluster absorbs by partitioning,
    never a join.
    """
    ptoks = [(int(pid), TX.py_tokens(p)) for pid, p in phrases]
    if not ptoks or any(not t for _, t in ptoks):
        raise ValueError("phrase_matches: every phrase needs >= 1 token")

    toks = TX.tokens(F.coalesce(F.col(text_col), F.lit("")))
    staged = spread_small(docs).select(
        F.col(id_col).alias("doc_id"),
        # leading/trailing space so the first/last token window also has
        # both boundary anchors
        F.concat(
            F.lit(" "), F.array_join(toks, " "), F.lit(" ")
        ).alias("_joined"),
    )

    def count_expr(terms: list[str]) -> Column:
        pat = "(?= " + " ".join(_java_regex_quote(t) for t in terms) + " )"
        return F.regexp_count("_joined", F.lit(pat))

    entries = F.array(
        *[
            F.struct(
                F.lit(pid).alias("phrase_id"), count_expr(t).alias("n_matches")
            )
            for pid, t in ptoks
        ]
    )
    return (
        staged.select("doc_id", F.explode(entries).alias("e"))
        .select(
            F.col("e.phrase_id").cast("int").alias("phrase_id"),
            "doc_id",
            F.col("e.n_matches").cast("int").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


def bigram_rarity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram-LM surprisal filter — the next LM order up
    from `unigram_rarity` (toward the 5-gram KenLM filter of CCNet),
    restated log- and float-free so the aggregate is exact and
    order-independent.

    Model: p(cur | prev) interpolated half-and-half with the unigram,
        p_hat = (1/2) * c_bg/c_prev + (1/2) * c_uni/T
    Each bigram position contributes the integer reciprocal
        floor(1 / p_hat) = (2 * c_prev * T) div (c_bg * T + c_uni * c_prev)
    — one exact integer division (all terms positive, so Spark's
    truncating `div` and DuckDB's `//` agree), never a float quotient;
    a document's score is the per-bigram mean.  Unseen-bigram smoothing
    comes from the unigram interpolation term (c_bg >= 1 for every
    OBSERVED bigram, and only observed bigrams occur in scoring — the
    interpolation is what keeps rare continuations from scoring as
    infinities in the real model, mirrored here).

    Output: (doc_id, n_bigrams, bigram_mass, avg_rarity), one row per
    document with >= 2 tokens (single-token docs have no bigram and emit
    no row — stated contract, mirrored by the oracle); unordered.

    Plan shape at 100 TB: bigram pairs build row-locally (adjacent-token
    zip, no self-join); the unigram and bigram vocabularies are two
    corpus-keyed aggregates (map-side combinable); counts are attached
    VOCAB-side — the bigram vocabulary joins the unigram table twice (on
    prev, on cur), orders of magnitude fewer rows than occurrences —
    then occurrences join the enriched bigram vocab ONCE on the bigram
    key.  Every corpus-derived join side is pin_wide-pinned (the r9
    misplan class); the corpus total is a 1-row broadcast.  DECIMAL(38,0)
    keeps c_prev*T exact past int64 (T ~ 1e13 at 100 TB); the emitted
    per-position value is <= 2*T, comfortably long.
    """
    wide = is_wide_source(docs)
    toks = TX.tokens(text_col)
    base = spread_small(docs).select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    )
    occ_uni = base.select("doc_id", F.explode("_t").alias("tok"))
    uni = occ_uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c_uni"))
    total_row = uni.agg(F.sum("c_uni").alias("_total"))

    # adjacent-token zip, row-local; the size filter BEFORE the sequence
    # guards Spark's descending sequence(1, b<1) footgun on 0/1-token
    # docs (they have no bigram and emit no row — stated contract)
    pairs = (
        base.filter(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("prev"),
                        F.element_at("_t", i + 1).alias("cur"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    bg_vocab = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    enriched = (
        bg_vocab.join(
            pin_wide(uni.select(F.col("tok").alias("prev"), F.col("c_uni").alias("c_prev")), wide),
            "prev",
        )
        .join(
            pin_wide(uni.select(F.col("tok").alias("cur"), F.col("c_uni").alias("c_cur")), wide),
            "cur",
        )
    )
    scored = (
        pairs.join(pin_wide(enriched, wide), ["prev", "cur"])
        .crossJoin(F.broadcast(total_row))
        .withColumn(
            "_contrib",
            F.expr(
                "CAST(2 AS DECIMAL(38,0)) * c_prev * _total"
                " div (CAST(c_bg AS DECIMAL(38,0)) * _total + c_cur * c_prev)"
            ),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.sum("_contrib").cast("long").alias("bigram_mass"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        "bigram_mass",
        F.round(
            F.col("bigram_mass").cast("double") / F.col("n_bigrams"), 4
        ).alias("avg_rarity"),
    )


# ---------------------------------------------------------------------------
# PII redaction (typed detect-and-replace with per-type counts)
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) — applied IN ORDER, each pattern counted
#: against the text as it stands when its turn comes (progressive), so
#: counts always equal the number of replacements actually made.
#: Patterns deliberately use only the regex subset Java (Spark) and RE2
#: (DuckDB) implement identically: ASCII classes, bounded repetition,
#: word boundaries — no backreferences, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,}\d", "<PHONE>"),
]


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Typed PII redaction — the corpus-prep pass that strips contact
    details before training (emails, IPv4 addresses, phone-like numbers),
    with per-type counts so a pipeline can FILTER on PII density as well
    as redact (both are standard web-curation stages; `pii_scrub` keeps
    the reference-era digit scrub, this is the typed family).

    Each pattern is counted and replaced against the PROGRESSIVE text
    (after the previous patterns' replacements), staged as a real column
    per step — both engines therefore see identical intermediate strings
    and the counts exactly equal the replacements made, whatever the
    overlap between patterns (an IP inside an already-redacted email can
    never double-count).

    Output: (doc_id, redacted, n_email, n_ipv4, n_phone); NULL text
    passes through as NULL with zero counts.

    Plan shape at 100 TB: one projection chain, zero exchanges —
    scan-bound, JVM-side regex in whole-stage codegen.
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out = spread_small(docs).select(F.col(id_col).alias("doc_id"), F.col(text_col))
    stage = out.withColumn("_s0", cur)
    counts = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        stage = stage.withColumn(
            f"n_{name}", F.regexp_count(F.col(f"_s{i}"), F.lit(pat)).cast("int")
        ).withColumn(f"_s{i+1}", F.regexp_replace(F.col(f"_s{i}"), pat, repl))
        counts.append(f"n_{name}")
    last = f"_s{len(PII_PATTERNS)}"
    return stage.select(
        "doc_id",
        # NULL in -> NULL out (the empty-string working copy was only for
        # the regex chain)
        F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(F.col(last)).alias(
            "redacted"
        ),
        *counts,
    )
