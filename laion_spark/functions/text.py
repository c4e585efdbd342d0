"""Text-analysis column functions (north star Q26) — all pure Catalyst
expressions (JVM-side); nothing here touches Python at runtime.

Surface: token statistics, quality scoring, language identification
(stopword + script heuristic), document fingerprints. Each returns a
Column usable in any select/filter — composable with the rest of the
engine, and cheap at 100 TB (single scan, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: ColumnOrName, lowercase: bool = True) -> Column:
    c = _c(col)
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def token_count(col: ColumnOrName) -> Column:
    return F.size(tokens(col, lowercase=False))


def distinct_token_ratio(col: ColumnOrName) -> Column:
    t = tokens(col)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def avg_token_length(col: ColumnOrName) -> Column:
    t = tokens(col, lowercase=False)
    return F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / F.size(t)


def punct_ratio(col: ColumnOrName) -> Column:
    """Fraction of characters that are not alnum/space/CJK."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(c), F.lit(1))


def uppercase_ratio(col: ColumnOrName) -> Column:
    c = _c(col)
    uppers = F.length(F.regexp_replace(c, r"[^\p{Lu}]", ""))
    letters = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
    return uppers.cast("double") / F.greatest(letters, F.lit(1))


#: minimal per-language stopword lists for the heuristic lang-id
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def stopword_ratio(col: ColumnOrName, lang: str = "en") -> Column:
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(t), F.lit(1))


def cjk_ratio(col: ColumnOrName) -> Column:
    c = _c(col)
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿぀-ヿ가-힯]", ""))
    return cjk.cast("double") / F.greatest(F.length(F.regexp_replace(c, r"\s", "")), F.lit(1))


def lang_id(col: ColumnOrName) -> Column:
    """Heuristic language id over {en,de,fr,es,zh,unknown}: CJK script
    ratio first, else argmax stopword-hit count; 'unknown' when no list
    scores. One pass, pure expressions (a real model would be a
    pandas_udf — deliberately avoided in the default path)."""
    def _hits(lang: str) -> Column:
        words = STOPWORDS[lang]
        # NOTE: the lambda must be unary — F.filter treats a 2-arg
        # lambda as (element, index)
        return F.size(F.filter(tokens(col), lambda x: x.isin(*words)))

    scores = {lang: _hits(lang) for lang in STOPWORDS}
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang, s in scores.items():
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return F.when(cjk_ratio(col) > 0.3, F.lit("zh")).otherwise(best_lang)


def quality_score(col: ColumnOrName, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, stopword
    presence, moderate punctuation, vocabulary diversity. The weights
    are a starting point, not a law — each term is exposed above for
    custom scoring."""
    c = _c(col)
    n = token_count(c)
    length_term = (
        F.when((n >= 10) & (n <= 2000), 1.0)
        .when(n > 2000, F.lit(2000.0) / n)  # decay past the sweet spot
        .otherwise(n.cast("double") / 10.0)
    )
    stop_term = F.least(stopword_ratio(c, lang) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    diversity_term = F.least(distinct_token_ratio(c) * 2.0, F.lit(1.0))
    return (
        length_term * 0.3 + stop_term * 0.25 + punct_term * 0.2 + diversity_term * 0.25
    )


def doc_fingerprint(col: ColumnOrName) -> Column:
    """Portable content fingerprint (md5 hex)."""
    return F.md5(_c(col).cast("binary"))


def _bind_tokens(col: ColumnOrName, body, lowercase: bool = True) -> Column:
    """Evaluate ``body(token_array)`` with the token array bound ONCE as
    a lambda variable. Referencing the ``split(...)`` expression inside
    an index-mapping ``transform`` lambda inlines it into the body,
    which the HOF then re-evaluates once per element — one split per
    n-gram/window index (the recompute-inside-HOF class measured at
    >10x the real work in the dedup pipeline)."""
    return F.element_at(F.transform(F.array(tokens(col, lowercase)), body), 1)


def ngrams(col: ColumnOrName, n: int = 2, lowercase: bool = True) -> Column:
    """Word n-grams WITH duplicates — repetition analysis needs the
    multiset; ``laion_spark.operators.dedup.shingles`` is the
    distinct-set variant for dedup."""

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        # concat_ws over element_at: no per-gram array allocation (6x
        # over array_join(slice(..)) in the interpreted HOF evaluator)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
        )
        # sequence(1, m<1) counts DOWN; short docs get an empty list
        return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))

    return _bind_tokens(col, body, lowercase)


def dup_ngram_ratio(col: ColumnOrName, n: int = 2) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram:
    1 - distinct/total (the Gopher/C4-style intra-document repetition
    signal — high values mark boilerplate, keyword stuffing, and
    generation loops). NULL for documents with no n-grams."""
    g = ngrams(col, n)
    return F.when(
        F.size(g) >= 1,
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g),
    )


def rolling_hashes(col: ColumnOrName, window: int = 5) -> Column:
    """Winnowing-style token-window rolling hashes (Spark-only; xxhash64
    over joined token windows). Used for substring-level fingerprinting:
    two documents sharing any window hash share a 5-token run."""

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (window - 1))
        hashes = F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(window)])),
        )
        # sequence(1, m<1) counts DOWN; short docs get an empty hash list
        return F.when(F.size(t) >= window, hashes).otherwise(F.array().cast("array<bigint>"))

    return _bind_tokens(col, body)


#: BPE-style pretokenizer (north star Q26): a simplified GPT-2-shape
#: pattern — contraction suffixes, letter runs, digit runs, punctuation
#: runs — restricted to constructs Java regex and RE2 treat identically
#: (no lookahead), so counts are cross-engine comparable.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_tokens(col: ColumnOrName) -> Column:
    """Token pieces under the BPE-ish pretokenizer (token-count proxy
    for budget estimation over a 100 TB corpus — pure JVM regex)."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: ColumnOrName) -> Column:
    return F.size(bpe_tokens(col))


#: PII detection patterns (curation pass; catalog t21). Restricted to
#: the Java-regex / RE2 common subset — no lookaround, no
#: backreferences — so any engine scores a corpus identically.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    # 10-digit NANP plus the short 7-digit fallback. Branch order is
    # cosmetic here: the 7-digit branch cannot match a prefix of the
    # 10-digit form (its final [0-9]{4} is broken by the dash after
    # the exchange), so either ordering matches identically.
    "nanp_phone": "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}|\\+1-[0-9]{3}-[0-9]{4}",
    "ipv4": "([0-9]{1,3}\\.){3}[0-9]{1,3}",
}


def pii_counts(col: ColumnOrName) -> dict[str, Column]:
    """Per-pattern occurrence counts for one text column (JVM regex,
    scan-local). Keys mirror ``PII_PATTERNS``; redaction is
    ``regexp_replace`` with the same patterns on the same plan."""
    c = _c(col)
    return {k: F.regexp_count(c, F.lit(p)) for k, p in PII_PATTERNS.items()}


def pii_flag(col: ColumnOrName) -> Column:
    """1 when any PII pattern matches, else 0."""
    counts = list(pii_counts(col).values())
    hit = counts[0] > 0
    for c in counts[1:]:
        hit = hit | (c > 0)
    return F.when(hit, 1).otherwise(0)


def canonicalize_url(col: ColumnOrName) -> Column:
    """Crawl-corpus URL canonicalization (catalog d17): lowercase,
    strip fragment, drop the www. prefix, remove utm_* tracking
    parameters, strip a trailing slash. The rewrite chain uses NO
    capture-group replacements (Spark ``$1`` vs RE2 ``\\1`` disagree),
    so the identical chain runs in any engine for oracle checks."""
    u = F.lower(F.regexp_replace(_c(col), "#.*$", ""))
    u = F.replace(u, F.lit("://www."), F.lit("://"))
    u = F.regexp_replace(u, "utm_[a-z_]+=[^&]*&", "")
    u = F.regexp_replace(u, "[?&]utm_[a-z_]+=[^&]*$", "")
    return F.regexp_replace(u, "/$", "")
