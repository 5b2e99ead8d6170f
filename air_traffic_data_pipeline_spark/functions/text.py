"""Text-analysis column expressions (language ID, quality scoring, token
counting, fingerprinting, shingling) — all builtin Spark functions, each with
a DuckDB-SQL rendering that evaluates identically.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic. Public tiny
# lists; the operator contract is determinism, not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "zh": ("de", "shi", "le", "he", "zai"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")  # tie-break precedence

PUNCT_CLASS = "[.,!?;:]"
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def words(text: Column) -> Column:
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    return F.size(words(text)).cast("bigint")


def regex_token_count(text: Column) -> Column:
    """BPE-ish tokenizer: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("bigint")


def normalized(text: Column) -> Column:
    """lower + strip punctuation + collapse runs of spaces (fingerprint base)."""
    no_punct = F.regexp_replace(F.lower(text), PUNCT_CLASS, "")
    return F.trim(F.regexp_replace(no_punct, " +", " "))


def fingerprint(text: Column) -> Column:
    return F.md5(normalized(text))


def stopword_count(text: Column, stops: tuple[str, ...]) -> Column:
    return F.size(
        F.filter(words(text), lambda w: w.isin(*stops))
    ).cast("bigint")


def punct_ratio(text: Column) -> Column:
    n = F.length(text).cast("double")
    stripped = F.length(F.regexp_replace(text, PUNCT_CLASS, "")).cast("double")
    return (n - stripped) / n


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword composite in [0, 1], rounded to 6 dp."""
    wc = word_count(text).cast("double")
    length_part = F.least(F.lit(1.0), wc / F.lit(100.0))
    stop_part = stopword_count(text, LANG_STOPWORDS["en"]).cast("double") / wc
    score = (
        F.lit(0.4) * length_part
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * stop_part
    )
    return F.round(score, 6)


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (MinHash input).

    Direct ``get(w, i)`` element access instead of ``slice(w, i, k)``:
    higher-order-function lambdas are interpreted (not codegen'd), and the
    slice form allocates a k-element array per shingle — measured ~4x slower
    at sf0.1. ``get`` past the end yields NULL, which ``concat_ws`` skips,
    matching slice semantics for docs shorter than k words.
    """
    w = words(text)
    n = F.size(w)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.get(w, i + j - 1) for j in range(k)]),
    )


def exploded_shingles(df, text_col: str = "text", k: int = 3, out: str = "s"):
    """One row per word-k-gram shingle: explode an INDEX sequence, then build
    the shingle in a codegen'd projection — semantically identical to
    ``explode(shingles(text, k))`` but ~7x faster at sf0.1: higher-order
    ``transform`` lambdas are interpreted per element and allocate the full
    shingle array per row, while this form keeps string construction inside
    whole-stage codegen. Keeps every non-text column of ``df``.
    """
    other = [c for c in df.columns if c != text_col]
    w = F.split(F.col(text_col), " ")
    idx = df.select(
        *other,
        w.alias("__w"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1)))
        ).alias("__i"),
    )
    gram = F.concat_ws(
        " ", *[F.get("__w", F.col("__i") + j - 1) for j in range(k)]
    )
    return idx.select(*other, gram.alias(out))


ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def rolling_hash(text: Column) -> Column:
    """Rabin-Karp polynomial rolling hash over characters:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) % 1e9+7)``.

    Pure integer arithmetic in a left fold — bitwise identical in any
    engine. acc < 1e9+7 so acc*31 + 0x10FFFF stays far inside int64.
    """
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
    )


# --- DuckDB renderings -----------------------------------------------------


def words_sql(text: str) -> str:
    return f"string_split({text}, ' ')"


def regex_token_count_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{TOKEN_REGEX}')) AS BIGINT)"


def normalized_sql(text: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({text}), '{PUNCT_CLASS}', '', 'g'),"
        f" ' +', ' ', 'g'))"
    )


def fingerprint_sql(text: str) -> str:
    return f"md5({normalized_sql(text)})"


def stopword_count_sql(text: str, stops: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{s}'" for s in stops)
    return (
        f"CAST(len(list_filter({words_sql(text)}, w -> list_contains([{lst}], w))) AS BIGINT)"
    )


def punct_ratio_sql(text: str) -> str:
    n = f"CAST(length({text}) AS DOUBLE)"
    stripped = f"CAST(length(regexp_replace({text}, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)"
    return f"(({n} - {stripped}) / {n})"


def quality_score_sql(text: str) -> str:
    wc = f"CAST(len({words_sql(text)}) AS DOUBLE)"
    length_part = f"least(CAST(1.0 AS DOUBLE), {wc} / CAST(100.0 AS DOUBLE))"
    stop_part = f"(CAST({stopword_count_sql(text, LANG_STOPWORDS['en'])} AS DOUBLE) / {wc})"
    score = (
        f"(CAST(0.4 AS DOUBLE) * {length_part}"
        f" + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - {punct_ratio_sql(text)})"
        f" + CAST(0.3 AS DOUBLE) * {stop_part})"
    )
    return f"round({score}, 6)"


def rolling_hash_sql(text: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(c) AS BIGINT) for c in string_split({text}, '')]), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )


def shingles_sql(text: str, k: int = 3) -> str:
    w = words_sql(text)
    return (
        f"[array_to_string(({w})[i:i+{k - 1}], ' ') "
        f"for i in generate_series(1, greatest(len({w}) - {k - 1}, 1))]"
    )


def jaro_winkler(a: Column, b: Column) -> Column:
    """Jaro-Winkler similarity as a PURE Catalyst expression — no UDF, no
    Python in the hot path. Semantics pinned to DuckDB's built-in
    ``jaro_winkler_similarity`` (verified bitwise on 4,000 fuzz pairs +
    the textbook fixtures): match window floor(max(|a|,|b|)/2)-1, greedy
    first-unused in-window matching scanned in a-order, transpositions =
    HALF THE MISMATCH COUNT ROUNDED DOWN (integer division — the detail
    naive ports miss), Winkler boost 0.1 per common-prefix char (capped
    at 4) applied only when jaro > 0.7, and 0.0 when either side is
    empty.

    Implementation: one fold over a's positions carrying (used: boolean
    mask over b, matched pairs in a-order); the inner fold picks the
    first unused in-window match. O(|a|*window) per pair, all inside
    whole-stage-codegen-adjacent higher-order functions — suitable for
    blocked pair columns of short strings (names, tokens); for long
    documents use the token-set similarity family instead."""
    la = F.length(a)
    lb = F.length(b)
    w = F.greatest(
        (F.greatest(la, lb).cast("int") / F.lit(2)).cast("int") - F.lit(1),
        F.lit(0),
    )
    empty_pairs = F.expr("CAST(array() AS ARRAY<STRUCT<j: INT, c: STRING>>)")
    empty_ints = F.expr("CAST(array() AS ARRAY<INT>)")
    init = F.struct(
        F.array_repeat(F.lit(False), lb).alias("used"),
        empty_pairs.alias("pairs"),
    )

    def step(acc: Column, i: Column) -> Column:
        ca = F.substring(a, i, 1)
        lo = F.greatest(F.lit(1), i - w)
        hi = F.least(lb, i + w)
        rng = F.when(hi >= lo, F.sequence(lo, hi)).otherwise(empty_ints)
        j = F.aggregate(
            rng,
            F.lit(0),
            lambda found, jj: F.when(found > 0, found).otherwise(
                F.when(
                    (~F.element_at(acc["used"], jj))
                    & (F.substring(b, jj, 1) == ca),
                    jj,
                ).otherwise(F.lit(0))
            ),
        )
        return F.struct(
            F.when(
                j > 0,
                F.transform(
                    acc["used"],
                    lambda x, i0: F.when(i0 == j - 1, F.lit(True)).otherwise(x),
                ),
            )
            .otherwise(acc["used"])
            .alias("used"),
            F.when(
                j > 0,
                F.concat(
                    acc["pairs"], F.array(F.struct(j.alias("j"), ca.alias("c")))
                ),
            )
            .otherwise(acc["pairs"])
            .alias("pairs"),
        )

    folded = F.aggregate(
        F.when(la > 0, F.sequence(F.lit(1), la)).otherwise(empty_ints),
        init,
        step,
    )
    pairs = folded["pairs"]
    m = F.size(pairs)
    b_seq = F.transform(F.array_sort(pairs), lambda p: F.substring(b, p["j"], 1))
    a_seq = F.transform(pairs, lambda p: p["c"])
    t_raw = F.aggregate(
        F.zip_with(a_seq, b_seq, lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda s, v: s + v,
    )
    md = m.cast("double")
    jaro = F.when(m == 0, F.lit(0.0)).otherwise(
        (
            md / la.cast("double")
            + md / lb.cast("double")
            + (md - F.floor(t_raw / F.lit(2)).cast("double")) / md
        )
        / F.lit(3.0)
    )
    pmax = F.least(la, lb, F.lit(4))
    ell = F.aggregate(
        F.when(pmax > 0, F.sequence(F.lit(1), pmax)).otherwise(empty_ints),
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1) & (F.substring(a, i, 1) == F.substring(b, i, 1)), i
        ).otherwise(acc),
    )
    return F.when(
        jaro > F.lit(0.7),
        jaro + ell.cast("double") * F.lit(0.1) * (F.lit(1.0) - jaro),
    ).otherwise(jaro)


# --- American Soundex (round 13) -------------------------------------------

# letter -> digit map with h/w ALREADY REMOVED from the alphabet (they are
# stripped before coding, per the American Soundex h/w rule)
_SDX_FROM = "abcdefgijklmnopqrstuvxyz"
_SDX_TO = "012301202245501262301202"
_SDX_DEDUP_PASSES = 5  # replace('dd','d') x5 collapses runs up to 2^5


def soundex(word: Column) -> Column:
    """American Soundex code (letter + 3 digits) of a lowercase alpha
    word, as a pure Catalyst expression (no UDF): retain the first
    letter, drop h/w from the tail, code consonants via one translate,
    collapse adjacent identical digits (bounded replace passes — a run
    longer than 2^5 cannot survive a <=64-char word), drop vowels, pad
    with zeros. The phonetic rung of the fuzzy-match family next to
    levenshtein / jaro_winkler."""
    first = F.substring(word, 1, 1)
    stripped = F.concat(first, F.translate(F.substring(word, 2, 64), "hw", ""))
    code = F.translate(stripped, _SDX_FROM, _SDX_TO)
    for _ in range(_SDX_DEDUP_PASSES):
        for d in "123456":
            code = F.replace(code, F.lit(d + d), F.lit(d))
    tail = F.replace(F.substring(code, 2, 64), F.lit("0"), F.lit(""))
    return F.concat(F.upper(first), F.substring(F.concat(tail, F.lit("000")), 1, 3))


def soundex_sql(word: str) -> str:
    """The identical expression tree rendered for DuckDB."""
    first = f"substr({word}, 1, 1)"
    code = (
        f"translate({first} || translate(substr({word}, 2, 64), 'hw', ''),"
        f" '{_SDX_FROM}', '{_SDX_TO}')"
    )
    for _ in range(_SDX_DEDUP_PASSES):
        for d in "123456":
            code = f"replace({code}, '{d}{d}', '{d}')"
    tail = f"replace(substr({code}, 2, 64), '0', '')"
    return f"(upper({first}) || substr({tail} || '000', 1, 3))"
