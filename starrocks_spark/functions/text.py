"""Text-processing primitives for the LLM-data-pipeline operators:
normalization, shingling, portable 60-bit hashing, MinHash signatures,
SimHash, winnowing fingerprints, token counting, language ID.

Design rules (all enforced here):

- **Pure built-in expressions.** Every function returns a
  ``pyspark.sql.Column`` built from `pyspark.sql.functions` only — no
  Python UDFs — so the whole pipeline stays inside whole-stage codegen
  and is embarrassingly parallel (row-local; the first shuffle in any
  dedup pipeline is the candidate-pair join).
- **Engine-portable semantics.** Each builder has a ``sql_*`` twin
  producing the equivalent DuckDB SQL so the driver's oracle check can
  verify bit-identical results. The only hash primitive is md5, which
  both engines implement identically; 15 hex chars → a non-negative
  60-bit integer that fits a BIGINT in both.

Reference surface covered: ngram/ngram_search & string functions
(be/src/exprs/string_functions.cpp), murmur-style hashing
(be/src/exprs/hash_functions.cpp — we standardize on md5 for
portability), plus the north-star dedup/text-analysis operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization + tokenization

_NORM_RE = "[^a-z0-9 ]"


def norm_words(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, split on runs of spaces.
    Returns array<string> with no empty tokens."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), _NORM_RE, ""))
    return F.filter(F.split(cleaned, " +"), lambda w: w != F.lit(""))


def sql_norm_words(text: str) -> str:
    return (
        "list_filter(string_split_regex(trim(regexp_replace(lower("
        + text
        + f"), '{_NORM_RE}', '', 'g')), ' +'), w -> w <> '')"
    )


# ---------------------------------------------------------------------------
# portable 60-bit hash

def hash60(s: Column) -> Column:
    """Non-negative 60-bit integer hash: first 15 hex chars of md5.
    Identical in any engine with md5 (the reference standardizes its
    own portable hashes the same way, hash_functions.cpp)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sql_hash60(s: str) -> str:
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# shingles (word n-grams)

def shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams as strings ('w1 w2 w3'). Docs shorter
    than n words yield their full text as the single shingle."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


def sql_shingles(words: str, n: int = 3) -> str:
    return (
        f"list_distinct([array_to_string(list_slice({words}, i, i + {n - 1}), ' ') "
        f"FOR i IN generate_series(1, greatest(len({words}) - {n - 1}, 1))])"
    )


# ---------------------------------------------------------------------------
# MinHash signature + LSH bands

def minhash_pairs(shingle_col: Column) -> Column:
    """The expensive half of the signature: one md5 per shingle split
    into the (h1, h2) halves. Hot-path callers MATERIALIZE this column
    (e.g. in a persisted shingle table) before fanning out to k salts —
    a higher-order lambda re-evaluates its body per sequence element,
    so computing md5 inside the per-salt loop would undo the saving."""
    return F.transform(
        F.transform(shingle_col, lambda s: F.md5(s)),
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 16, 14), 16, 10).cast("long").alias("h2"),
        ),
    )


def minhash_signature_from_pairs(pairs_col: Column, k: int = 16) -> Column:
    """The cheap half: per salt i, min over shingles of h1 + i*h2 —
    pure integer arithmetic over the materialized pairs array."""
    if k > 100:
        # h1 < 2^60, h2 < 2^56: beyond i ≈ 110 the sum exceeds int64 —
        # Spark would wrap silently while the DuckDB twin raises on
        # BIGINT overflow, breaking the portable-semantics contract
        raise ValueError(f"minhash k must be <= 100 (got {k})")
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(pairs_col, lambda p: p["h1"] + i * p["h2"])
        ),
    )


def sql_minhash_pairs(shingle_expr: str) -> str:
    return (
        f"list_transform(list_transform({shingle_expr}, s -> md5(s)), "
        f"m -> {{'h1': ('0x' || substr(m, 1, 15))::BIGINT, "
        f"'h2': ('0x' || substr(m, 16, 14))::BIGINT}})"
    )


def sql_minhash_from_pairs(pairs_expr: str, k: int = 16) -> str:
    return (
        f"[list_min(list_transform({pairs_expr}, "
        f"p -> p.h1 + i * p.h2)) FOR i IN generate_series(0, {k - 1})]"
    )


def lsh_bands(sig: Column, bands: int = 4, rows: int = 4) -> Column:
    """Hash each band of the signature → array<string> of band keys,
    prefixed with the band index so keys from different bands never
    collide."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit("|"),
            F.md5(F.concat_ws(",", F.slice(sig, b * rows + 1, rows))),
        ),
    )


def sql_lsh_bands(sig: str, bands: int = 4, rows: int = 4) -> str:
    return (
        f"[b::VARCHAR || '|' || md5(array_to_string("
        f"list_slice({sig}, b * {rows} + 1, b * {rows} + {rows}), ',')) "
        f"FOR b IN generate_series(0, {bands - 1})]"
    )


# ---------------------------------------------------------------------------
# SimHash (60-bit, row-local)

# 60 bits = every bit of hash60 (the widest portable signature the
# md5-prefix hash provides); 4 chunks of 15 bits each → 32768 candidate
# buckets per chunk (8× the old 48-bit/12-bit layout), so expected
# chunk-block size is corpus/32768 and the pigeonhole guarantee
# (hamming ≤ 3 ⇒ one of 4 chunks identical) is preserved.
_SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = _SIMHASH_BITS // SIMHASH_CHUNKS  # 15


def simhash60(word_hashes: Column) -> Column:
    """60-bit SimHash from an array of word hashes: bit j is set when
    the sum over words of ±1 (sign of word-hash bit j) is positive.
    Entirely row-local array math — zero shuffles, zero UDFs. The bit
    loop is unrolled statically so every shift amount is a literal.

    IMPORTANT (perf): pass a *materialized column* of word hashes
    (e.g. via operators/dedup.py's persist barrier), not a raw
    expression — Catalyst's CollapseProject would otherwise inline the
    expression once per bit (48×)."""
    # Single traversal: one aggregate carrying a 60-long counter array
    # (zip_with add per element), then a threshold + bit-fold pass.
    # The earlier revision ran 60 SEPARATE aggregates (one per bit),
    # i.e. 60 traversals of the hash array per row — measured 3× slower
    # and a much larger codegen unit. Bit j's criterion is unchanged:
    # sum of ±1 over words > 0  ⟺  2·ones > n.
    counts = F.aggregate(
        word_hashes,
        F.array_repeat(F.lit(0).cast("long"), _SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            # literal shift amounts (the SQL shiftright wrapper takes a
            # Python int), built once per element
            F.array(*[(F.shiftright(h, j) % 2) for j in range(_SIMHASH_BITS)]),
            lambda a, c: a + c,
        ),
    )
    n = F.size(word_hashes)
    bits = F.transform(
        counts,
        lambda c: F.when(c * 2 > n, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    # fold from the high bit down: acc*2 + bit avoids a column-typed
    # shift amount
    return F.aggregate(
        F.reverse(bits), F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


def sql_word_hashes(words: str) -> str:
    h = sql_hash60("w")
    return f"list_transform(list_distinct({words}), w -> {h})"


def sql_simhash60(hashes_col: str) -> str:
    """DuckDB twin of simhash60; ``hashes_col`` must reference an
    already-aliased array column (e.g. built via sql_word_hashes)."""
    bit_sum = (
        f"list_reduce(list_transform({hashes_col}, "
        "h -> ((h >> j) % 2) * 2 - 1), (a, b) -> a + b)"
    )
    return (
        f"list_reduce([CASE WHEN {bit_sum} > 0 THEN (1::BIGINT << j) "
        f"ELSE 0::BIGINT END FOR j IN generate_series(0, {_SIMHASH_BITS - 1})], "
        "(a, b) -> a + b)"
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document fingerprinting)

def winnow_grams(words: Column, k: int = 4) -> Column:
    """k-gram rolling hashes (input to winnow_fingerprints).

    PERF CONTRACT: ``words`` must be a materialized column, and the
    result must itself be materialized before feeding it to
    winnow_fingerprints — Spark evaluates array subexpressions
    referenced inside a `transform` lambda once PER ELEMENT (no CSE
    across lambda boundaries), so an inline expression here turns the
    winnowing pass quadratic."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(k - 1), F.lit(1))),
        lambda i: hash60(F.concat_ws(" ", F.slice(words, i, k))),
    )


def winnow_fingerprints(grams: Column, window: int = 5) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): keep the min hash of
    each sliding window over the k-gram hashes → the doc's fingerprint
    set (sorted array<long>). Row-local. ``grams`` must be a
    materialized column (see winnow_grams)."""
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(grams) - F.lit(window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(grams, i, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def sql_winnow_grams(words: str, k: int = 4) -> str:
    """DuckDB k-gram hash array; alias it (e.g. ``AS g``) and feed the
    alias to sql_winnow_fingerprints."""
    h = sql_hash60(f"array_to_string(list_slice({words}, i, i + {k - 1}), ' ')")
    return f"[{h} FOR i IN generate_series(1, greatest(len({words}) - {k - 1}, 1))]"


def sql_winnow_fingerprints(grams_col: str, window: int = 5) -> str:
    g = grams_col
    return (
        f"list_sort(list_distinct([list_min(list_slice({g}, i, i + {window - 1})) "
        f"FOR i IN generate_series(1, greatest(len({g}) - {window - 1}, 1))]))"
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)

_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish token count). The BPE-ish rule
    splits letter runs, single digits, and single punctuation — the
    standard pre-tokenizer shape."""
    ws = F.size(F.filter(F.split(F.trim(text), "\\s+"), lambda w: w != F.lit("")))
    bpe = F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0))
    return ws, bpe


def sql_token_counts(text: str) -> tuple[str, str]:
    ws = (
        f"len(list_filter(string_split_regex(trim({text}), '\\s+'), w -> w <> ''))"
    )
    bpe = f"len(regexp_extract_all({text}, '{_BPE_RE}'))"
    return ws, bpe


# ---------------------------------------------------------------------------
# quality scoring + language ID

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]

# tiny per-language marker lexicons for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def with_quality_features(df, text_col: str = "text",
                          names: list[str] | None = None):
    """``quality_features`` with the normalized-words array
    materialized as a real column first (r13, guide §1.2 per-task
    work): the feature expressions reference the words array up to 8×,
    and the array HOF subtrees (filter/aggregate) evaluate outside
    whole-stage codegen's subexpression elimination, so the inline
    form re-ran the regex normalization per reference — measured 1.75×
    slower on a mid-size corpus. The multi-reference projection keeps
    CollapseProject from inlining the array back (the same barrier
    mechanics as dedup.words_table). Appends the feature columns
    (``names`` subset, default all) to ``df``; expression shapes are
    identical to ``quality_features``, so oracle twins are unchanged.
    """
    text = F.col(text_col)
    staged = df.withColumn("__qf_w", norm_words(text))
    feats = quality_features(text, words=F.col("__qf_w"))
    keep = names or list(feats)
    return staged.select(
        *df.columns, *[feats[k].alias(k) for k in keep]
    )


def quality_features(text: Column,
                     words: Column | None = None) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features, double-typed.
    Mirrors the heuristics of C4/Gopher-style quality filters.
    ``words``: a pre-materialized normalized-words column (see
    ``with_quality_features``); defaults to the inline expression."""
    if words is None:
        words = norm_words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9\\s]"), 0))
    n_stop = F.size(F.filter(words, lambda w: w.isin(_STOPWORDS)))
    avg_word_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n_words.cast("long"),
        "n_chars_m": n_chars.cast("long"),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, n_stop.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0)),
        "avg_word_len": avg_word_len,
    }


def sql_quality_features(text: str) -> dict[str, str]:
    words = sql_norm_words(text)
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return {
        "n_words": f"len({words})::BIGINT",
        "n_chars_m": f"length({text})::BIGINT",
        "punct_ratio": (
            f"CASE WHEN length({text}) > 0 THEN "
            f"len(regexp_extract_all({text}, '[^a-zA-Z0-9\\s]'))::DOUBLE / length({text})::DOUBLE "
            f"ELSE 0.0 END"
        ),
        "stopword_ratio": (
            f"CASE WHEN len({words}) > 0 THEN "
            f"len(list_filter({words}, w -> w IN ({stop_list})))::DOUBLE / len({words})::DOUBLE "
            f"ELSE 0.0 END"
        ),
        "avg_word_len": (
            f"CASE WHEN len({words}) > 0 THEN "
            f"list_reduce(list_transform({words}, w -> length(w)::BIGINT), (a, b) -> a + b)::DOUBLE "
            f"/ len({words})::DOUBLE ELSE 0.0 END"
        ),
    }


def _marker_membership(markers: tuple[str, ...]):
    # Single-parameter lambda built via a factory: PySpark's higher-order
    # function binding counts declared parameters (including defaulted
    # ones), so a `lambda w, m=markers:` form would receive the positional
    # INDEX as `m` and compare words against an integer.
    return lambda w: w.isin(list(markers))


def lang_scores(words: Column) -> dict[str, Column]:
    """Marker-word hit count per language (the n-gram-heuristic
    language-ID: argmax of these scores)."""
    return {
        lang: F.size(F.filter(words, _marker_membership(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }


def sql_lang_scores(words: str) -> dict[str, str]:
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        out[lang] = f"len(list_filter({words}, w -> w IN ({lst})))"
    return out


# ---------------------------------------------------------------------------
# character n-grams + ngram_search (reference: be/src/exprs/ngram.cpp —
# ngram_search(haystack, needle, n) returns the fraction of the
# needle's distinct n-grams found in the haystack)


def char_ngrams(s: Column, n: int = 4) -> Column:
    """Distinct character n-grams of a lowercased string, as
    array<string> — pure sequence/transform expressions."""
    low = F.lower(s)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(low) - (n - 1), F.lit(0))),
            lambda i: F.substring(low, i, F.lit(n)),
        )
    )


def sql_char_ngrams(s: str, n: int = 4) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length(lower({s})) - {n - 1}, 0) + 1), "
        f"i -> substr(lower({s}), i, {n})))"
    )


def ngram_search(haystack: Column, needle: Column, n: int = 4) -> Column:
    """Similarity in [0,1]: |grams(needle) ∩ grams(haystack)| /
    |grams(needle)| (ngram.cpp semantics; 0 when the needle is shorter
    than n)."""
    hg, ng = char_ngrams(haystack, n), char_ngrams(needle, n)
    return F.when(
        F.size(ng) > 0,
        F.size(F.array_intersect(ng, hg)).cast("double")
        / F.size(ng).cast("double"),
    ).otherwise(F.lit(0.0))


def sql_ngram_search(haystack: str, needle: str, n: int = 4) -> str:
    hg, ng = sql_char_ngrams(haystack, n), sql_char_ngrams(needle, n)
    return (
        f"CASE WHEN len({ng}) > 0 THEN "
        f"len(list_intersect({ng}, {hg}))::DOUBLE / len({ng})::DOUBLE "
        f"ELSE 0.0 END"
    )
