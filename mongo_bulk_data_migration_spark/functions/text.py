"""Text-analysis functions for training-data pipelines — all JVM-side.

Every function here returns a Column built from pyspark.sql.functions only
(whole-stage codegen, no Python in the hot path), and has an equivalent
ANSI-SQL form for the DuckDB oracle (see ``__spark_entry__.oracle_sql``).
Token counting / quality / language-ID are the standard pre-filters a
100 TB corpus pass applies before tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword lists (deterministic heuristic language-ID)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

WORD_SPLIT = "\\s+"


def words(text: Column) -> Column:
    return F.split(F.trim(text), WORD_SPLIT)


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: words + punct burden)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(words(text))
    ).cast("int")


# GPT-2-style pre-tokenizer grammar, restricted to constructs RE2 and Java
# regex evaluate identically (ordered alternation, no lookahead): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, and
# whitespace runs each count as one token.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer regex.

    Pure JVM (regexp_extract_all) — a closer LLM-token proxy than whitespace
    splitting (punctuation and contractions count separately)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast("int")


def char_count(text: Column) -> Column:
    return F.length(text).cast("int")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(text, "[\\.,;:!\\?'\"()\\[\\]{}-]", "")
    return F.round(
        (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1)), 6
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of words that are (lang) stopwords."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(words(F.lower(text)), lambda w: F.array_contains(sw, w)))
    return F.round(hits / F.greatest(F.size(words(text)), F.lit(1)), 6)


def avg_word_len(text: Column) -> Column:
    return F.round(
        F.aggregate(words(text), F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / F.greatest(F.size(words(text)), F.lit(1)),
        6,
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + word shape —
    the usual cheap pre-filter before expensive dedup/tokenize stages."""
    n_chars = F.length(text)
    n_words = F.size(words(text))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
    wl = avg_word_len(text)
    shape_ok = F.when((wl >= 2.0) & (wl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    return F.round((len_ok + shape_ok + punct_ok) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language."""
    lw = words(F.lower(text))
    out = {}
    for lang, sws in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sws])
        out[lang] = F.size(F.filter(lw, lambda w: F.array_contains(arr, w)))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; deterministic 'und' tiebreak when
    no stopword matches at all."""
    scores = lang_scores(text)
    # stable argmax: iterate in fixed order, strictly-greater wins
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def dup_word_frac(text: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier word —
    the Gopher-style within-document repetition signal (word granularity).
    Pure JVM (split + array_distinct), codegen'd."""
    ws = words(text)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(ws)) / F.greatest(F.size(ws), F.lit(1)), 6
    )


def dup_2gram_frac(text: Column) -> Column:
    """Fraction of word-2gram occurrences that are duplicates (Gopher's
    dup-ngram filter at n=2).  Built from sequence+transform higher-order
    functions — no explode, no shuffle, O(words) per row."""
    ws = words(text)
    n = F.size(ws)
    # guard: sequence(0, -1) would be a DESCENDING range, not empty
    grams = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
    )
    return F.when(n < 2, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / (n - 1), 6)
    )


def repetition_keep(text: Column) -> Column:
    """Gopher-style keep decision from the repetition signals (thresholds
    deterministic; tuned for the synthetic small-vocab corpus where natural
    repetition is high)."""
    return (dup_word_frac(text) <= 0.98) & (dup_2gram_frac(text) <= 0.6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    the exact-dedup key (reference analog: content hash)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), "\\s+", " ")))
