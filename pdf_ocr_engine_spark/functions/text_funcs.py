"""Text-analysis column expressions — JVM-side, whole-stage-codegen friendly.

Everything here is built from ``pyspark.sql.functions`` (no Python UDFs):
language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting (normalized md5).  Each has an exact ANSI-SQL twin used by the
DuckDB oracle (see ``pdf_ocr_engine_spark.queries``), with integer-valued
scores wherever cross-engine float determinism would be at risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny deterministic per-language stopword lists for the lang-ID heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "es": ("el", "los", "que", "de", "y", "una", "es", "para"),
    "de": ("der", "die", "und", "das", "nicht", "ein", "ist", "zu"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(col), r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def word_token_count(col: Column) -> Column:
    """BPE-ish regex token count: alphanumeric runs + single non-space
    punctuation marks each count as one token."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0))).cast("long")


def stopword_hits(col: Column, lang: str = "en") -> Column:
    words = list(STOPWORDS[lang])
    return F.size(F.filter(tokens(col), lambda x: x.isin(words))).cast("long")


def norm_ws(col: Column) -> Column:
    """Normalization for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(F.encode(norm_ws(col), "UTF-8"))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), F.lit(0))).cast("long")


def quality_features(col: Column) -> dict[str, Column]:
    """Integer-exact quality features (cross-engine hash-stable):
    chars, tokens, punct marks, English stopword hits, and a boolean
    `is_quality` flag (≥1 stopword per 10 tokens and ≥5 tokens)."""
    toks = token_count(col)
    stop = stopword_hits(col, "en")
    return {
        "n_chars_m": F.length(col).cast("long"),
        "n_tokens": toks,
        "n_punct": punct_count(col),
        "stop_hits": stop,
        "is_quality": (stop * 10 >= toks) & (toks >= 5),
    }


def lang_id(col: Column) -> Column:
    """Stopword-hit language ID with fixed precedence (en,fr,es,de) on ties;
    'und' when no stopwords hit at all."""
    hits = {lg: stopword_hits(col, lg) for lg in ("en", "fr", "es", "de")}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build from lowest precedence up so 'en' wins ties
    for lg in ("de", "es", "fr", "en"):
        expr = F.when((hits[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def top_ngram_stats(df, n: int = 1, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Per-document n-gram dominance — the Gopher-style repetition signal
    (Rae et al. 2021 §A1.1: documents whose most frequent n-gram covers a
    large fraction of the text are boilerplate/spam): ``(id, n_grams,
    top_cnt)`` where ``top_cnt`` is the count of the most frequent n-gram.

    Pure relational plan: explode → two-phase count per (doc, gram) → max/
    sum per doc.  Both aggregations combine map-side, and the shuffle key
    (doc, gram) is high-cardinality and unskewed — the shape survives
    10^12 documents.  Empty documents drop out here; callers zero-fill
    with a left join (see ``q_repetition``)."""
    toks = F.split(F.trim(norm_ws(F.col(text_col))), " ")
    if n == 1:
        grams = toks
    else:
        width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        parts = [F.slice(toks, i + 1, width) for i in range(n)]
        grams = parts[0]
        for p in parts[1:]:
            grams = F.zip_with(grams, p, lambda a, b: F.concat_ws("_", a, b))
    g = (df.select(F.col(id_col), F.explode(grams).alias("gram"))
         .where(F.col("gram") != ""))
    per = g.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return per.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_cnt"))


def canonical_url(col: Column) -> Column:
    """Crawl-grade URL canonicalization — the dedup PRE-key (the same page
    arrives as ``HTTP://Example.com:80/a`` and ``http://example.com/a``;
    exact-dedup on raw urls misses them all).  Deliberately conservative —
    only transformations that never change which resource is addressed:

    * scheme and host lowercased (path/query case preserved — servers may
      be case-sensitive there);
    * default ports stripped (``:80`` for http, ``:443`` for https);
    * fragment removed (never sent to the server);
    * trailing ``?`` (empty query) removed;
    * trailing slash collapsed on the bare-authority form only
      (``http://h/`` → ``http://h``).

    Pure column expressions (simple regexes shared verbatim with the
    DuckDB oracle — no dialect-divergent constructs)."""
    u = col
    # lowercase scheme://host[:port] (group 1), keep the rest (group 2)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)",
                                 1)),
        F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""))
    u = F.regexp_replace(u, r"#.*$", "")               # fragment
    # lookahead-free (RE2-portable) default-port strip
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"\?$", "")                # empty query
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u
