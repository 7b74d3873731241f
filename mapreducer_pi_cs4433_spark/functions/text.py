"""Text-analysis operators for LLM training-data pipelines.

All hot-path logic is built-in Spark SQL expressions (JVM-side, codegen) —
no Python UDFs. Each operator is deterministic cross-engine so it can be
oracle-checked against DuckDB:

- tokenization: regex whitespace split (identical in Java regex and RE2)
- ratios: int/int double divisions (bit-identical IEEE754 in both engines)
- fingerprints: MD5 (identical standard everywhere)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists per language for the marker-count language-ID
# heuristic. Deliberately small and hardcoded: the point is the *operator
# shape* (per-token scoring + argmax over languages), which at 100 TB runs as
# a pure column expression with zero shuffles.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es": ("el", "la", "los", "es", "una", "que", "de", "no"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni", "ta", "men"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (StringTokenizer semantics,
    generalizing the reference WordCount.java:24-28)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword count: split on whitespace AND on transitions
    between word characters and punctuation/digits (a cheap BPE-ish proxy
    for budget estimation). Pure regex -> JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"(\s+|(?<=[A-Za-z])(?=[^A-Za-z\s])|(?<=[^A-Za-z\s])(?=[A-Za-z]))")
    return F.size(F.filter(pieces, lambda t: t != ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals per document.

    Ratios are int/int divisions so the doubles are bit-identical across
    engines (no float aggregation). Columns:
      n_chars_actual, n_tokens, avg_token_len, punct_ratio, stopword_ratio
    """
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    en_stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, F.lower(t))))
    return df.withColumns(
        {
            "n_chars_actual": n_chars,
            "n_tokens": n_tokens,
            "avg_token_len": F.when(
                n_tokens > 0, n_token_chars / n_tokens
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(
                F.lit(0.0)
            ),
            "stopword_ratio": F.when(n_tokens > 0, n_stop / n_tokens).otherwise(
                F.lit(0.0)
            ),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count marker hits per language over the
    lowercased token array, argmax with deterministic tie-break on language
    code. Adds `lang_pred` + one `score_<lang>` per language.

    Narrow (per-row) plan: at 100 TB this is a single scan with zero
    shuffles; the marker arrays are literals baked into codegen.
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    out = df
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))),
        )
    # argmax via greatest + chained when (deterministic tie-break: first in
    # sorted language order wins)
    langs = sorted(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.lit(None).cast("string")
    for la in reversed(langs):
        pred = F.when(F.col(f"score_{la}") == best, F.lit(la)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """All k-character shingles of the (whitespace-normalized) text as an
    array. Expression-only: sequence + transform + substring."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(c, r"\s+", " ")
    n = F.length(norm)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: norm.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array(norm))


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    distinct: bool = True,
) -> DataFrame:
    """Relational shingle stream: (id, shingle) — one row per (distinct)
    k-char shingle of the whitespace-normalized text.

    This is the scale-path twin of char_shingles(): array higher-order
    functions run as interpreted CodegenFallback expressions (~14us per
    element), so every shingle consumer (MinHash, SimHash, Jaccard,
    fingerprints) goes through this explode instead — generate + substring
    stay inside whole-stage codegen. Texts shorter than k yield the whole
    text, matching char_shingles.
    """
    norm = F.regexp_replace(F.col(text_col), r"\s+", " ")
    out = (
        df.select(F.col(id_col).alias("id"), norm.alias("_norm"))
        .select(
            "id",
            "_norm",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select("id", F.col("_norm").substr(F.col("_i"), F.lit(k)).alias("shingle"))
    )
    return out.distinct() if distinct else out


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: MD5 each k-char shingle, keep
    the minimum digest (a 1-permutation MinHash). MD5 is standardized, so
    DuckDB computes the identical fingerprint — unlike engine-private hash
    functions. Relational min-aggregate over the exploded shingle stream
    (codegen path). Returns (id_col, fingerprint hex string)."""
    sh = exploded_shingles(df, text_col, id_col, k, distinct=False)
    return sh.groupBy(F.col("id").alias(id_col)).agg(
        F.min(F.md5("shingle")).alias("fingerprint")
    )
