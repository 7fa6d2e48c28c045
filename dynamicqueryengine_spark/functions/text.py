"""Text-analysis operators for training-data pipelines (SURVEY.md §7 Phase 4;
beyond the reference surface, which has no scalar function library at all —
SURVEY.md §2.5).

Everything here is a pure ``pyspark.sql.Column`` expression — JVM-side,
whole-stage-codegen-friendly, no Python UDFs — so these run at 100 TB with
filter pushdown and partition parallelism intact. Each operator has a DuckDB
SQL mirror (``*_SQL`` helpers) used by the oracle gate; regex patterns are
restricted to syntax shared by Java regex and RE2 (no lookahead/backrefs).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- normalization ------------------------------------------------------

_WS = r"\s+"


def normalize_text(col: Column) -> Column:
    """lower → trim → collapse whitespace. The canonical form used by
    dedup hashing and fingerprints."""
    return F.regexp_replace(F.trim(F.lower(col)), _WS, " ")


def normalize_text_sql(expr: str) -> str:
    return f"regexp_replace(trim(lower({expr})), '{_WS}', ' ', 'g')"


# --- token counting -----------------------------------------------------

# BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# punctuation runs (GPT-2-style pattern minus lookahead, which RE2 lacks).
BPE_PATTERN = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, _WS))
    )


def token_count_ws_sql(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({expr}), '{_WS}')) END"
    )


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count via the shared-dialect pre-tokenizer regex."""
    return F.regexp_count(col, F.lit(BPE_PATTERN))


def token_count_bpe_sql(expr: str) -> str:
    pattern = BPE_PATTERN.replace("'", "''")  # escape for SQL string literal
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


# --- quality scoring ----------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from"
).split()

_PUNCT = r"[^A-Za-z0-9\s]"
_ALPHA = r"[A-Za-z]"


def _padded(col: Column) -> Column:
    """lower+trim with every whitespace run doubled and the ends padded, so
    each token is flanked by spaces on both sides and word-set membership
    becomes ONE codegen'd ``regexp_count(' (w1|w2|…) ')`` pass. The
    higher-order ``filter(split(...), t -> t.isin(...))`` formulation is
    CodegenFallback (interpreted per token) and measured 4.5× slower at
    sf0.1; counts are identical (verified row-for-row on the corpus)."""
    return F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(col)), _WS, "  "), F.lit(" ")
    )


def _word_set_hits(
    col: Column, words: list[str], padded: Column | None = None
) -> Column:
    """``padded`` lets a caller bind :func:`_padded` ONCE (via
    util.bind_columns) and share it across the six word-set scans of a
    quality+language battery — identical counts, 6× fewer lower/trim/
    whitespace-doubling passes over the raw text."""
    base = _padded(col) if padded is None else padded
    return F.regexp_count(base, F.lit(" (" + "|".join(words) + ") "))


def stopword_ratio(col: Column, padded: Column | None = None) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    tokens = F.split(F.trim(F.lower(col)), _WS)
    hits = _word_set_hits(col, _STOPWORDS, padded)
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def stopword_ratio_sql(expr: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS)
    toks = f"regexp_split_to_array(trim(lower({expr})), '{_WS}')"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> list_contains([{words}], t))) AS DOUBLE)"
        f" / len({toks}) ELSE 0.0 END"
    )


def punct_ratio(col: Column) -> Column:
    return F.when(
        F.length(col) > 0,
        F.regexp_count(col, F.lit(_PUNCT)).cast("double") / F.length(col),
    ).otherwise(F.lit(0.0))


def punct_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(len(regexp_extract_all({expr}, '{_PUNCT}')) AS DOUBLE) / length({expr}) "
        f"ELSE 0.0 END"
    )


_ASCII_LETTERS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


def alpha_ratio(col: Column) -> Column:
    # length - length(translate(text, letters, '')) == regexp_count('[A-Za-z]')
    # but translate is a single table-lookup pass (~2× faster than the regex
    # scan at sf0.1); the SQL mirror keeps the regex form.
    alpha = F.length(col) - F.length(F.translate(col, _ASCII_LETTERS, ""))
    return F.when(
        F.length(col) > 0, alpha.cast("double") / F.length(col)
    ).otherwise(F.lit(0.0))


def alpha_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(len(regexp_extract_all({expr}, '{_ALPHA}')) AS DOUBLE) / length({expr}) "
        f"ELSE 0.0 END"
    )


def _round6_portable(col: Column) -> Column:
    """Half-up rounding to 6 dp as floor(x·10⁶ + 0.5)/10⁶ — the SAME
    three IEEE double ops in Spark and DuckDB, so both engines produce
    the bit-identical result even when x sits EXACTLY on a .5 boundary.
    Engine-native round() differs there: the quality formula's 0.1/0.3
    weights over small-integer ratios routinely land on exact decimal
    halves (found at sf0.1: doc with unrounded quality 0.5385625 —
    Spark BigDecimal-HALF_UP said …562, DuckDB said …563). Nonnegative
    inputs only (floor-based half-up rounds negative halves toward
    +inf)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _round6_portable_sql(expr: str) -> str:
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def quality_score(col: Column, padded: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: favors alphabetic text of
    reasonable length with some stopword structure and little punctuation
    noise. Deterministic arithmetic shared with the SQL mirror — the
    final rounding is the portable floor-form (see
    :func:`_round6_portable`), not engine-native round.
    ``padded`` optionally shares one pre-bound :func:`_padded` pass with
    other features (see :func:`_word_set_hits`)."""
    length_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    return _round6_portable(
        F.lit(0.3) * length_score
        + F.lit(0.3) * alpha_ratio(col)
        + F.lit(0.3) * F.least(stopword_ratio(col, padded) * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0)))
    )


def quality_score_sql(expr: str) -> str:
    length_score = f"least(length({expr}) / 500.0, 1.0)"
    inner = (
        f"0.3 * {length_score} + 0.3 * {alpha_ratio_sql(expr)} "
        f"+ 0.3 * least({stopword_ratio_sql(expr)} * 4, 1.0) "
        f"+ 0.1 * (1.0 - least({punct_ratio_sql(expr)} * 5, 1.0))"
    )
    return _round6_portable_sql(inner)


# --- language identification (marker-word heuristic) ---------------------

# Small high-frequency marker sets per language. An n-gram/stopword-hit
# heuristic: predicted language = argmax of marker hits, ties broken by
# language code order (deterministic).
LANG_MARKERS: dict[str, list[str]] = {
    "de": "der die das und ist nicht ein eine mit für auf werden".split(),
    "en": "the and is of to in that it for with as this".split(),
    "es": "el la los las y es de que en un una por".split(),
    "fr": "le la les et est de que en un une pour dans".split(),
    "zh": "的 了 是 在 我 有 和 就 不 人 都 一".split(),
}


def _lang_hits(col: Column, lang: str, padded: Column | None = None) -> Column:
    return _word_set_hits(col, LANG_MARKERS[lang], padded)


def _lang_hits_sql(expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    toks = f"regexp_split_to_array(trim(lower({expr})), '{_WS}')"
    return f"len(list_filter({toks}, t -> list_contains([{words}], t)))"


def detect_language(col: Column, padded: Column | None = None) -> Column:
    """Predicted language code, or 'und' when no marker hits at all.

    argmax via ``array_max`` over (hits, -rank, lang) structs — structs
    compare field-by-field, so the max entry is the highest hit count with
    ties broken toward the FIRST language in code order (greatest -rank),
    exactly the SQL mirror's first-matching-WHEN semantics. One hits
    subtree per language, vs O(langs²) for a greatest+CASE chain — keeps
    Catalyst analysis/codegen time flat as languages are added.
    ``padded`` optionally shares one pre-bound :func:`_padded` pass."""
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: code order
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _lang_hits(col, lang, padded).alias("h"),
                    F.lit(-i).alias("o"),
                    F.lit(lang).alias("l"),
                )
                for i, lang in enumerate(langs)
            ]
        )
    )
    return F.when(best["h"] > 0, best["l"]).otherwise(F.lit("und"))


def detect_language_sql(expr: str) -> str:
    langs = sorted(LANG_MARKERS)
    hits = {lang: _lang_hits_sql(expr, lang) for lang in langs}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    clauses = " ".join(
        f"WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    )
    return f"(CASE {clauses} ELSE 'und' END)"


# --- document fingerprinting ---------------------------------------------

_ROLL_BASE = 257
_ROLL_MOD = 1_000_000_007  # keeps acc*257+cp < 2^63 (ANSI-safe, no overflow)


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (both engines ship
    md5, so this is oracle-checkable)."""
    return F.md5(normalize_text(col))


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


def fingerprint_rolling(col: Column) -> Column:
    """Polynomial rolling hash (Rabin–Karp) over the normalized text's
    code points: acc = (acc*257 + codepoint) mod 1e9+7. Expressed with
    ``F.aggregate`` over the char array — single pass, JVM-side."""
    chars = F.split(normalize_text(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(_ROLL_BASE) + F.ascii(ch)) % F.lit(_ROLL_MOD),
    )


def fingerprint_rolling_sql(expr: str) -> str:
    # DuckDB list_reduce has no initial value; seed with a prepended 0.
    # BIGINT cast keeps acc*257 out of INT32 overflow (DuckDB default int32).
    chars = (
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex({normalize_text_sql(expr)}, ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT)))"
    )
    return (
        f"list_reduce({chars}, (acc, cp) -> (acc * {_ROLL_BASE} + cp) % {_ROLL_MOD})"
    )
