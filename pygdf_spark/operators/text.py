"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.9-text /
nvtext parity, plus the north-star extensions).

All operators are pure DataFrame transformations (scan-friendly,
shuffle only where an aggregation demands it) and return DataFrames, so
they compose with the rest of the engine and scale horizontally: every
per-document computation is a narrow map over the documents partitions.

Reference parity (nvtext, exposed via .str in cuDF):
- tokenize            : nvtext/tokenize.hpp:58 (py string.py:4160)
- token_count         : nvtext/tokenize.hpp:121
- ngrams / char ngrams: nvtext/generate_ngrams.hpp:58,88 (py :4341)
- normalize_spaces    : nvtext/normalize.hpp:51
- replace/filter_tokens: nvtext/replace.hpp:84,131
- edit_distance       : nvtext/edit_distance.hpp:59
Language-ID, quality scoring and fingerprinting are north-star
extensions (no cuDF analog) built from the same primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygdf_spark.functions.hashing import md5_u64

#: whitespace tokenizer pattern (nvtext default delimiter semantics)
WS = r"\s+"

#: BPE-ish pretokenizer: letter runs, digit runs, single punctuation —
#: the regex family GPT-style tokenizers use as the pre-split.
BPE_ISH = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword markers for the n-gram/language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "les", "des"],
    "de": ["der", "die", "und"],
    # pinyin particles chosen to not collide with Romance-language
    # function words ('de' is the most frequent Spanish/French word —
    # it mislabeled ordinary es/fr text as zh)
    "zh": ["shi", "bu", "zhe"],
}


def tokens(col) -> Column:
    """tokenize (tokenize.hpp:58): whitespace split of trimmed text.
    Blank/whitespace-only text yields [] (nvtext token_count('') is 0 —
    a plain split would yield the phantom [''] and count 1). The trim
    is REGEX \\s (F.trim strips only ASCII spaces, so a tab/newline
    edge would leave phantom '' tokens that corrupt counts, simhash
    votes, and shingle sets)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(
        t == "", F.array().cast("array<string>")
    ).otherwise(F.split(t, WS))


def token_count(col) -> Column:
    """token_count (tokenize.hpp:121)."""
    return F.size(tokens(col))


def bpe_ish_count(col) -> Column:
    """Sub-word-ish token count via the BPE pre-split regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH), 0))


def normalize_spaces(col) -> Column:
    """normalize.hpp:51 — collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, WS, " "))


def ngrams(col, n: int = 2, sep: str = " ") -> Column:
    """word n-grams (generate_ngrams.hpp:58) as an array column —
    zip_with over n shifted slices of the token array (JVM-side, no UDF).

    Shape matters: HOF lambdas are interpreted (outside whole-stage
    codegen), and a lambda body that references the token-array
    EXPRESSION re-tokenizes the document once per produced element —
    O(tokens²) work per document, quadratic in doc length. The slice/
    zip_with form evaluates the split only O(n) times per row (measured
    ~5× faster at sf0.1 on 300-char docs; the gap grows with doc size).
    Short texts (< n tokens) yield an empty array via the clamped slice
    length; NULL text yields [] (split of NULL) to match the previous
    behavior and the oracle SQL."""
    w = tokens(col)
    if n == 1:
        return F.coalesce(w, F.array().cast("array<string>"))
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    parts = [F.slice(w, j + 1, m) for j in range(n)]
    out = parts[0]
    for j in range(1, n):
        out = F.zip_with(out, parts[j], lambda a, b: F.concat(a, F.lit(sep), b))
    return F.coalesce(out, F.array().cast("array<string>"))


def doc_fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of space-normalized,
    lower-cased text (rolling-hash analog, exact-dedup key)."""
    return F.md5(F.lower(normalize_spaces(col)))


def fingerprint_u64(col) -> Column:
    """64-bit numeric fingerprint (bucket-joinable)."""
    return md5_u64(F.lower(normalize_spaces(col)))


def lang_scores(col) -> dict[str, Column]:
    """Per-language marker-hit counts (word-boundary regex)."""
    c = F.col(col) if isinstance(col, str) else col
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(F.lower(c), F.lit(pat))
    return out


def lang_id(col) -> Column:
    """Heuristic language-ID: argmax of marker scores with fixed
    precedence order (deterministic ties)."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → build reversed
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Quality scoring features + composite score per document.

    Pure column arithmetic — identical formula is mirrored in the
    oracle SQL. Score ∈ [0,1]: longer docs with low punctuation/digit
    noise and healthy stopword mass score higher.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tok = token_count(text_col)
    # \p{L}\p{N}: Java and RE2 agree on Unicode categories; ASCII \w
    # counted every accented/CJK letter as punctuation
    n_punct = F.regexp_count(c, F.lit(r"[^\p{L}\p{N}\s]"))
    n_digit = F.regexp_count(c, F.lit(r"[0-9]"))
    n_stop = F.regexp_count(F.lower(c), F.lit(r"\b(the|a|of|and|to|is|in)\b"))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    digit_ratio = n_digit.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1))
    score = (
        0.3 * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
        + 0.2 * (1.0 - F.least(digit_ratio * 10.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 8).alias("punct_ratio"),
        F.round(digit_ratio, 8).alias("digit_ratio"),
        F.round(stop_ratio, 8).alias("stop_ratio"),
        F.round(score, 8).alias("quality"),
    )
