"""Shared text expressions, emitted for BOTH engines from one definition.

Every text operator (tokenize, shingle, stopword/punct metrics, language
markers) is defined once here as a pair of expression builders — Spark SQL
and DuckDB SQL — so the oracle is mirrored by construction, not by hand.

All of this is JVM-side column expressions (whole-stage codegen); no Python
UDFs anywhere in the text path.
"""

from __future__ import annotations

# NOTE on escaping: Spark SQL string literals process backslash escapes
# ('\\s+' in SQL text → \s+), DuckDB's do not ('\s+' stays \s+).

SPARK_TOKENS = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"
DUCK_TOKENS = "list_filter(string_split_regex(lower({col}), '\\s+'), x -> x <> '')"


def tokens_spark(col: str = "text") -> str:
    return SPARK_TOKENS.format(col=col)


def tokens_duck(col: str = "text") -> str:
    return DUCK_TOKENS.format(col=col)


def shingles_spark(toks: str, k: int) -> str:
    """Word k-gram shingles from a token-array expression (Spark).

    Guard: Spark's sequence(1, n) with n < 1 would count DOWN — emit an
    empty array for short docs instead.
    """
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - {k} + 1), "
        f"i -> array_join(slice({toks}, i, {k}), ' ')) END"
    )


def shingles_duck(toks: str, k: int) -> str:
    """Same shingles in DuckDB (generate_series(1, n<1) is already empty;
    list slice [i:j] is 1-based inclusive)."""
    return (
        f"list_transform(generate_series(1, len({toks}) - {k} + 1), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' '))"
    )


# Stopwords / language marker lists (shared constants → identical in both
# engines by construction).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as")

LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is", "to", "in"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans", "que"),
}
LANG_PRIORITY = ("en", "es", "de", "fr")  # deterministic argmax tie-break


def _in_list_spark(var: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"array_contains(array({arr}), {var})"


def _in_list_duck(var: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"list_contains([{arr}], {var})"


def count_in_list_spark(toks: str, words: tuple[str, ...]) -> str:
    return f"size(filter({toks}, x -> {_in_list_spark('x', words)}))"


def count_in_list_duck(toks: str, words: tuple[str, ...]) -> str:
    return f"len(list_filter({toks}, x -> {_in_list_duck('x', words)}))"


# Portable character-class counts. '[ -~]' = printable ASCII (literal range,
# identical regex semantics in both engines).
def nonascii_count_spark(col: str) -> str:
    return f"length(regexp_replace({col}, '[ -~]', ''))"


def nonascii_count_duck(col: str) -> str:
    return f"length(regexp_replace({col}, '[ -~]', '', 'g'))"


def punct_count_spark(col: str) -> str:
    return f"length(regexp_replace({col}, '[a-zA-Z0-9\\\\s]', ''))"


def punct_count_duck(col: str) -> str:
    return f"length(regexp_replace({col}, '[a-zA-Z0-9\\s]', '', 'g'))"


def langid_case(score: dict[str, str], nonascii: str, n_chars: str) -> str:
    """Shared CASE expression for language prediction given per-language
    score expressions (dialect-neutral SQL)."""
    branches = []
    for lang in LANG_PRIORITY:
        others = [o for o in LANG_PRIORITY if o != lang]
        cond = " AND ".join(f"{score[lang]} >= {score[o]}" for o in others)
        branches.append(f"WHEN {score[lang]} > 0 AND {cond} THEN '{lang}'")
    return (
        f"CASE WHEN {nonascii} * 10 > {n_chars} * 3 THEN 'zh' "
        + " ".join(branches)
        + " ELSE 'und' END"
    )
