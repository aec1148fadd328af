"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — over the
``documents`` table. The reference has no text functions at all (SURVEY.md
§2.7: "No math beyond comparison, no regex"); these are the
training-data-pipeline extensions the rebuild adds as first-class
operators.

Design rules (cross-engine exactness — every query here carries a DuckDB
oracle):

- **All scores are integer arithmetic** (counts, permilles via
  floor(1000*a/b)) — bit-exact in any engine; no float rounding-mode
  hazards.
- **Everything is pure Column expressions** — whole-stage codegen, no
  Python in the hot path. At 100 TB this is a single narrow map stage:
  no shuffle, filters push down to the parquet/Iceberg scan, and the
  projection prunes to (doc_id, text) only.
- Spark code and the adjacent SQL fragment builders stay in lockstep (the
  same pattern as sources/transcripts.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword dictionaries (public, common function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est", "ne", "une"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "es", "sich", "nicht"],
}
LANG_PRIORITY = ["en", "es", "fr", "de"]  # deterministic argmax tie-break

# BPE-ish token regex: letter runs, single digits, single punctuation —
# a public GPT-2-style simplification that is identical under Java regex
# (Spark) and RE2 (DuckDB).
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_REGEX = r"[^A-Za-z0-9\s]"

# translate() deletion sets for the regex-free count rewrites below.
# Java regex \s (no UNICODE_CHARACTER_CLASS) is exactly these 6 chars.
_DIGITS = "0123456789"
_ALNUM_WS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    + _DIGITS
    + " \t\n\x0b\f\r"
)


def words(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def _permille(num: Column, den: Column) -> Column:
    """floor(1000*num/den) as int — exact cross-engine (see module doc).
    The ×1000 runs in BIGINT: Spark 4's default ANSI mode raises
    ARITHMETIC_OVERFLOW on int32 products, and counts above ~2.1M
    (multi-MB documents) would otherwise abort the job."""
    return F.floor(num.cast("long") * 1000 / den).cast("int")


def text_profile(docs: DataFrame) -> DataFrame:
    """Per-document token counts, quality score, and language ID.

    Shape: one narrow projection over (doc_id, text) for the char-level
    counts, plus an explode → InSet → hash-aggregate pass for the
    per-language stopword hits, joined back on doc_id (two source
    scans; the join is id-keyed and AQE-sized).

    Why an aggregate (and not a per-row form) for stopword hits — both
    per-row forms measured WORSE at scale:
    - HOF filter over the words array: interpreted CodegenFallback,
      re-evaluated per reference in the lang-argmax chain (no CSE
      inside lambda scopes) — ~40 array scans per row.
    - alternation regex (`regexp_count('(?:^|(?<=\\s))(?:the|a|…)')`):
      codegen, but Java regex alternation+lookaround backtracks per
      char position, and a consumer FILTER on quality_score duplicates
      every regex (filter + project are separate operators — codegen
      CSE is per-operator): measured 7–10 s at sf1 / 12.5 s at sf10
      for text_quality vs 5.2 / 6.8 s for this form.
    Each token hashes once against an InSet (O(1)/word), partial
    aggregation collapses word rows map-side (shuffle = 4 ints/doc),
    and — because the hits sit behind an Aggregate — a downstream
    filter on quality can never be pushed back into the expensive scan
    side. Two measured dead ends, for the record: a single-pass
    explode-with-metrics aggregate (CollapseProject hoists the per-doc
    char metrics ABOVE the generator, re-evaluating every regex per
    WORD row — 117 s at sf1), and the alternation regex above. At
    10^12 docs: one word-partial shuffle + one id join, or zero
    shuffles if the corpus is bucketed by doc_id.
    """
    t = F.col("text")
    w = words(t)
    punct_cnt = F.length(F.translate(t, _ALNUM_WS, ""))
    base = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.length(t).alias("n_chars"),
        # = regexp_count(t, BPE_REGEX): every char is consumed as part
        # of a maximal letter run, a single digit, a single punct char,
        # or skipped (\s), so the match count decomposes exactly into
        # letter_runs + digits + punct — one simple regex + two
        # translate() char scans instead of the 3-alternative regex.
        (
            F.regexp_count(t, F.lit(r"[A-Za-z]+"))
            + (F.length(t) - F.length(F.translate(t, _DIGITS, "")))
            + punct_cnt
        ).alias("n_bpe_tokens"),
        # = aggregate(w, 0, acc+length(x)): total non-whitespace chars.
        F.length(F.regexp_replace(t, r"\s+", "")).alias("_sum_wlen"),
        punct_cnt.alias("_punct_cnt"),
    )
    wl = docs.select("doc_id", F.explode(w).alias("wd"))
    hits_agg = wl.groupBy("doc_id").agg(
        *[
            F.count_if(F.lower(F.col("wd")).isin(*STOPWORDS[lang]))
            .cast("int")
            .alias(f"_sh_{lang}")
            for lang in LANG_PRIORITY
        ]
    )
    agg = base.join(hits_agg, "doc_id", "left")
    # every doc has ≥1 exploded row (split of "" is [""]), so the left
    # join always matches; coalesce guards the contract anyway
    hits = {
        lang: F.coalesce(F.col(f"_sh_{lang}"), F.lit(0))
        for lang in LANG_PRIORITY
    }

    # deterministic argmax with LANG_PRIORITY tie-break; all-zero → 'und'.
    # Per-arm conditions are mutually exclusive (strict > vs >= encodes
    # the priority tie-break), so arm evaluation order is irrelevant —
    # the SQL oracle relies on this.
    pred = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = (
                hits[lang] > hits[other]
                if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang)
                else hits[lang] >= hits[other]
            )
            cond = c if cond is None else (cond & c)
        pred = F.when((hits[lang] > 0) & cond, F.lit(lang)).otherwise(pred)

    stop_hits_total = sum(hits.values(), F.lit(0))
    nw = F.col("n_words")
    n_chars = F.col("n_chars")
    punct = F.col("_punct_cnt")
    # NB: floor() is explicit on both engines — DuckDB CASTs double→int by
    # rounding-to-nearest while Spark truncates, so a bare cast diverges.
    stop_pct = F.least(
        F.floor(_permille(stop_hits_total, nw) / F.lit(10)).cast("int"),
        F.lit(30),
    )
    punct_pct = F.least(
        F.floor(_permille(punct, n_chars) / F.lit(10)).cast("int"),
        F.lit(30),
    )
    quality = F.least(nw, F.lit(40)) + stop_pct + (F.lit(30) - punct_pct)

    return agg.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        _permille(F.col("_sum_wlen"), nw).alias("avg_wlen_x1000"),
        _permille(stop_hits_total, nw).alias("stop_permille"),
        _permille(punct, n_chars).alias("punct_permille"),
        quality.cast("int").alias("quality_score"),
        pred.alias("lang_pred"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: whole-doc hash + minimum shingle hash.

    - ``fp`` — md5 of the whitespace-normalized lowercased text (exact-dup
      key with a cross-engine-stable hash).
    - ``rolling_fp`` — Rabin–Karp polynomial rolling hash of the raw text
      (:func:`rolling_hash`) — the classic incremental fingerprint.
    - ``min_shingle_fp`` — min over word-3-shingle md5s (a 1-hash MinHash;
      winnowing-style content marker), null for docs with <3 words.

    Narrow map stage; dedup consumers groupBy ``fp`` (one shuffle on a
    16-byte key — the minimum possible for exact dedup at scale).
    """
    t = F.col("text")
    norm = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    w = words(t)
    sh = shingles(w, 3)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        rolling_hash(t).alias("rolling_fp"),
        F.when(
            F.size(w) >= 3,
            F.array_min(F.transform(sh, lambda s: F.md5(s))),
        ).alias("min_shingle_fp"),
    )


ROLL_BASE = 131
ROLL_MOD = 1_000_000_007


def rolling_hash(t: Column) -> Column:
    """Rabin–Karp polynomial rolling hash over the text's PRINTABLE-ASCII
    projection: h = fold(h*B + ascii(c)) mod p. Exact integer arithmetic
    (h < p ≈ 2^30, h*B + c < 2^38 — no int64 overflow), identical in any
    engine. The projection (strip chars outside \x20-\x7E first) is
    what makes that true: on raw text the engines disagree structurally
    — Spark splits UTF-16 code units (astral chars become surrogate
    halves) while DuckDB splits codepoints, and Spark ascii('')=0 vs
    DuckDB ord('')=-1 on empty text. Empty projection hashes to 0 in
    both. Character-at-a-time lambda fold: fine at profile scale.

    ASCII-ONLY by construction: texts differing solely in non-ASCII
    characters collide (an all-CJK doc hashes to 0, same as empty) —
    do NOT use this as a dedup signal on multilingual corpora; use
    :func:`rolling_fp_codepoint` (codepoint-exact, mapInPandas numpy
    kernel, own DuckDB oracle) there."""
    clean = F.regexp_replace(t, r"[^\x20-\x7E]", "")
    return F.when(F.length(clean) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.split(clean, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % ROLL_MOD,
        )
    )


def rolling_hash_sql(t: str = "text") -> str:
    clean = f"regexp_replace({t}, '[^\\x20-\\x7E]', '', 'g')"
    return (
        f"CASE WHEN length({clean}) = 0 THEN CAST(0 AS BIGINT) ELSE"
        f" list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(string_split({clean}, ''),"
        f" c -> CAST(ord(c) AS BIGINT))),"
        f" (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}) END"
    )


def rolling_fp_codepoint(docs: DataFrame) -> DataFrame:
    """Codepoint-level Rabin–Karp fingerprint — the multilingual form of
    ``rolling_fp`` (which projects to printable ASCII first, so two
    texts differing only in non-ASCII characters collide: an all-CJK
    document hashes to 0, same as empty text — that variant must not be
    a dedup signal on multilingual corpora; this one can be).

    h = fold(h·B + codepoint(c)) mod p over UNICODE CODEPOINTS, which
    both engines can agree on (Python ``str`` iterates codepoints;
    DuckDB ``string_split(t,'')`` + ``ord`` yields codepoints), unlike
    Spark's Column-land ``split``/``ascii`` which see UTF-16 code
    units. Vectorized mapInPandas kernel: the fold is computed as the
    equivalent power sum Σ cp_i·B^(n−1−i) mod p with one numpy
    multiply+mod per document (cp < 2^21, B^k mod p < 2^30 ⇒ products
    < 2^51, exact in int64). Narrow map stage — scan-pruned to
    (doc_id, text), no shuffle.
    """
    import numpy as np
    import pandas as pd

    def kernel(it):
        pows = np.array([1], dtype=np.int64)  # B^k mod p, grown on demand
        for pdf in it:
            texts = pdf["text"].fillna("")
            need = int(texts.str.len().max() or 0)
            while len(pows) < need:
                pows = np.append(pows, pows[-1] * ROLL_BASE % ROLL_MOD)
            out = np.zeros(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                n = len(t)
                if n == 0:
                    continue
                cps = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                out[i] = (cps * pows[n - 1 :: -1] % ROLL_MOD).sum() % ROLL_MOD
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "rolling_fp_cp": out}
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, "doc_id long, rolling_fp_cp long"
    )


def rolling_fp_codepoint_sql(rel: str) -> str:
    """DuckDB twin of :func:`rolling_fp_codepoint` (codepoint fold)."""
    t = "COALESCE(text, '')"
    return f"""
    SELECT doc_id,
           CASE WHEN length({t}) = 0 THEN CAST(0 AS BIGINT) ELSE
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split({t}, ''),
                 c -> CAST(ord(c) AS BIGINT))),
               (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}) END
             AS rolling_fp_cp
    FROM {rel}
    """


def shingles(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a words array (space-joined strings)."""
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (lockstep with the Spark code above)
# ---------------------------------------------------------------------------

def _sql_words(t: str = "text") -> str:
    return f"string_split_regex(trim({t}), '\\s+')"


def _sql_stop_hits(lang: str) -> str:
    lst = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return (
        f"len(list_filter({_sql_words()}, x -> lower(x) IN ({lst})))"
    )


def _sql_permille(num: str, den: str) -> str:
    return f"CAST(floor(({num}) * 1000.0 / ({den})) AS INTEGER)"


def text_profile_sql(rel: str) -> str:
    """DuckDB SQL computing exactly :func:`text_profile` over ``rel``."""
    w = _sql_words()
    hits = {lang: _sql_stop_hits(lang) for lang in LANG_PRIORITY}
    total_hits = " + ".join(f"({h})" for h in hits.values())
    # deterministic argmax, LANG_PRIORITY tie-break (same CASE order as
    # the Spark when-chain: evaluated en → es → fr → de)
    arms = []
    for lang in LANG_PRIORITY:
        conds = [f"({hits[lang]}) > 0"]
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            op = ">" if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang) else ">="
            conds.append(f"({hits[lang]}) {op} ({hits[other]})")
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    # reverse order in Spark builds innermost-first; CASE arms here must
    # check later-priority langs first only if they strictly beat earlier
    # ones — encoded in the per-arm conds, so arm order is irrelevant.
    pred = "CASE " + " ".join(arms) + " ELSE 'und' END"

    nw = f"len({w})"
    # 2-arg list_reduce (this DuckDB lacks the init-value overload);
    # fold over ≥1 word is identical to Spark's 0-seeded int fold.
    sum_wlen = f"list_reduce(list_transform({w}, x -> length(x)), (a,b) -> a+b)"
    punct = f"len(regexp_extract_all(text, '{PUNCT_REGEX}'))"
    quality = (
        f"least({nw}, 40)"
        f" + least(CAST(floor({_sql_permille(total_hits, nw)} / 10.0) AS INTEGER), 30)"
        f" + (30 - least(CAST(floor({_sql_permille(punct, 'length(text)')} / 10.0) AS INTEGER), 30))"
    )
    return f"""
    SELECT doc_id,
           CAST({nw} AS INTEGER) AS n_words,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS INTEGER) AS n_bpe_tokens,
           {_sql_permille(sum_wlen, nw)} AS avg_wlen_x1000,
           {_sql_permille(total_hits, nw)} AS stop_permille,
           {_sql_permille(punct, 'length(text)')} AS punct_permille,
           CAST({quality} AS INTEGER) AS quality_score,
           {pred} AS lang_pred
    FROM {rel}
    """


def shingles_sql(n: int = 3, words_expr: str | None = None) -> str:
    w = words_expr or _sql_words()
    parts = " || ' ' || ".join(f"({w})[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len({w}) - {n - 2}), i -> {parts})"


def fingerprints_sql(rel: str) -> str:
    sh = shingles_sql(3)
    return f"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
           {rolling_hash_sql()} AS rolling_fp,
           CASE WHEN len({_sql_words()}) >= 3
                THEN list_min(list_transform({sh}, s -> md5(s)))
           END AS min_shingle_fp
    FROM {rel}
    """


# ---------------------------------------------------------------------------
# per-language token distribution stats (corpus reporting)
# ---------------------------------------------------------------------------

def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token-count distribution: doc count, total/avg and
    exact p50/p90/p99 token percentiles (linear interpolation — Spark
    `percentile` and DuckDB `quantile_cont` implement the identical
    definition; verified bit-exact incl. the interpolated doubles).

    Scale note: EXACT percentiles buffer each group's values on one
    reducer — fine for a bounded-cardinality reporting dimension like
    lang (≤ a few hundred groups, values are ints), wrong for
    high-cardinality keys. The mergeable scale path for those is
    :func:`token_stats_approx` (t-digest partial aggregation, no
    per-group buffering), tested against this exact form."""
    n = F.size(words(F.col("text")))
    base = docs.select("lang", n.alias("n"))
    return base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.avg("n").alias("avg_tokens"),
        F.percentile("n", F.lit(0.5)).alias("p50_tokens"),
        F.percentile("n", F.lit(0.9)).alias("p90_tokens"),
        F.percentile("n", F.lit(0.99)).alias("p99_tokens"),
        F.max("n").cast("int").alias("max_tokens"),
    )


def token_stats_sql(rel: str) -> str:
    return f"""
    SELECT lang, CAST(COUNT(*) AS INTEGER) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           AVG(n) AS avg_tokens,
           quantile_cont(n, 0.5) AS p50_tokens,
           quantile_cont(n, 0.9) AS p90_tokens,
           quantile_cont(n, 0.99) AS p99_tokens,
           CAST(MAX(n) AS INTEGER) AS max_tokens
    FROM (SELECT lang, CAST(len({_sql_words()}) AS INTEGER) AS n FROM ({rel}))
    GROUP BY lang
    """


def token_stats_approx(docs: DataFrame, accuracy: int = 10000) -> DataFrame:
    """The 100 TB percentile path: `approx_percentile` aggregates a
    mergeable sketch map-side (no per-group value buffering), so it
    scales to arbitrary group cardinality and size. No cross-engine
    oracle (sketch internals are engine-specific); pinned against the
    exact form in tests instead."""
    n = F.size(words(F.col("text")))
    base = docs.select("lang", n.alias("n"))
    pct = F.approx_percentile(
        "n", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(accuracy)
    )
    return base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        pct[0].cast("double").alias("p50_tokens"),
        pct[1].cast("double").alias("p90_tokens"),
        pct[2].cast("double").alias("p99_tokens"),
    )


# ---------------------------------------------------------------------------
# PII / pattern redaction (curation scrub stage)
# ---------------------------------------------------------------------------

# Patterns stay inside the Java-regex ∩ RE2 common subset (char classes,
# bounded repeats, non-capturing groups — no lookaround, no \b) so Spark
# and DuckDB match byte-identically.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("num", r"[0-9]+", "<NUM>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-ish patterns (emails, IPv4s, digit runs) from a text
    column, emitting the cleaned text plus a per-pattern hit count —
    the standard pre-training scrub stage.

    Applied in a fixed order (email → ip → num); each stage counts on
    its own input, and replacement tokens contain no digits, so stages
    cannot re-trigger each other. Pure Column regex ops: narrow map,
    whole-stage codegen, scan-pruned — zero shuffle at any scale."""
    cur = F.col(text_col)
    out = df
    for name, pat, tok in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, tok)
    return out.withColumn("clean_text", cur)


def redact_pii_sql_exprs(text_col: str = "text") -> tuple[str, list[str]]:
    """(clean_text_expr, [count_exprs]) mirroring redact_pii in DuckDB."""
    cur = text_col
    counts = []
    for name, pat, tok in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{tok}', 'g')"
    return cur, counts


# ---------------------------------------------------------------------------
# Repetition profile (Gopher-style repetitiousness filters)
# ---------------------------------------------------------------------------

def repetition_profile(docs: DataFrame) -> DataFrame:
    """Per-doc repetition metrics (the Gopher/Dolma "repetitious text"
    quality signals, word-level — the corpus is single-line):

    - ``n_words`` / ``n_distinct_words`` and ``dup_word_permille`` =
      floor(1000·(n_words−n_distinct)/n_words);
    - ``top_bigram_n`` (occurrences of the most frequent word 2-gram)
      and ``top_bigram_permille`` = floor(1000·top/n_bigrams);
    - ``max_word_run`` — longest consecutive repetition of one word.

    All-integer outputs (cross-engine exact). Scale shape (round 3):
    ZERO shuffles — a document's repetition metrics depend only on that
    document, and per-doc word counts are bounded (kB–MB text), so the
    whole profile is ONE narrow projection using array higher-order
    functions. The bigram mode becomes "longest equal run in the SORTED
    bigram array" (sort ≡ group for counting multiplicities) and
    ``max_word_run`` is the same single-pass run-length aggregate over
    the UNSORTED word array. The previous formulation posexploded to
    (doc_id, pos, word) and ran windows + three grouped aggregations
    over a doc_id exchange — at sf10 (500k docs) that explode shuffle
    was the slowest extended query (12.3 s); this form shuffles nothing
    and scans only (doc_id, text). Docs with <2 words get bigram
    metrics 0; split(trim(text)) yields [''] for empty text so n ≥ 1
    and the permille denominators are never 0.
    """
    # Layered selects keep each array a plain attribute reference, so
    # CollapseProject will NOT inline the tokenizer/bigram arrays into
    # their (multiple) consumers — split runs once per row (the no-CSE
    # lambda trap in BENCH/BASELINE.md §3).
    base = docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).select("doc_id", "w", F.size("w").alias("n"))

    # Sorted bigram array: slice to the first n-1 words, pair each with
    # its successor (transform index i is 0-based; w[i+1] is the
    # 0-based subscript). n=1 ⇒ slice length 0 ⇒ [].
    bg = base.select(
        "doc_id",
        "w",
        "n",
        F.array_sort(
            F.expr(
                "transform(slice(w, 1, n - 1),"
                " (x, i) -> concat(x, ' ', w[i + 1]))"
            )
        ).alias("bs"),
    )

    def _max_equal_run(arr: str) -> Column:
        # Single left-fold: (prev, current-run-length, max-run-length).
        # Initial prev NULL + null-safe <=> so the first element always
        # starts a run of 1; over a sorted array this is the max
        # multiplicity, over the raw word array the max consecutive run.
        return F.expr(
            f"""aggregate({arr},
                 struct(CAST(NULL AS STRING) AS prev, 0 AS cur, 0 AS mx),
                 (acc, x) -> struct(
                     x AS prev,
                     IF(x <=> acc.prev, acc.cur + 1, 1) AS cur,
                     GREATEST(acc.mx,
                              IF(x <=> acc.prev, acc.cur + 1, 1)) AS mx),
                 acc -> acc.mx)"""
        )

    m = bg.select(
        "doc_id",
        F.col("n").cast("int").alias("n_words"),
        F.size(F.array_distinct("w")).cast("int").alias("n_distinct_words"),
        _max_equal_run("bs").cast("int").alias("top_bigram_n"),
        F.size("bs").cast("int").alias("n_bigrams"),
        _max_equal_run("w").cast("int").alias("max_word_run"),
    )

    return m.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        _permille(
            F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")
        ).alias("dup_word_permille"),
        "top_bigram_n",
        # guard the ANSI-mode division: no bigrams ⇒ 0 (the old
        # outer-join formulation produced NULL→coalesce(0) here)
        F.when(
            F.col("n_bigrams") > 0,
            _permille(F.col("top_bigram_n"), F.col("n_bigrams")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("top_bigram_permille"),
        "max_word_run",
    )


def repetition_profile_sql(rel: str) -> str:
    """DuckDB SQL computing exactly :func:`repetition_profile`."""
    w = _sql_words()
    return f"""
    WITH base AS (SELECT doc_id, {w} AS w FROM {rel}),
    word_stats AS (
      SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
             CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_words
      FROM base
    ),
    wp AS (
      SELECT doc_id, s[1] AS pos, s[2] AS word
      FROM (SELECT doc_id, unnest(list_zip(range(1, len(w) + 1), w)) AS s
            FROM base)
    ),
    bigrams AS (
      SELECT doc_id, CAST(max(c) AS INTEGER) AS top_bigram_n,
             CAST(sum(c) AS INTEGER) AS n_bigrams
      FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({shingles_sql(2, 'w')}) AS g FROM base)
        GROUP BY doc_id, g
      ) GROUP BY doc_id
    ),
    runs AS (
      SELECT doc_id, CAST(max(run_len) AS INTEGER) AS max_word_run
      FROM (
        SELECT doc_id, word, island, count(*) AS run_len
        FROM (
          SELECT doc_id, word,
                 pos - row_number()
                   OVER (PARTITION BY doc_id, word ORDER BY pos) AS island
          FROM wp
        ) GROUP BY doc_id, word, island
      ) GROUP BY doc_id
    )
    SELECT ws.doc_id, ws.n_words, ws.n_distinct_words,
           {_sql_permille('ws.n_words - ws.n_distinct_words', 'ws.n_words')}
             AS dup_word_permille,
           COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
           COALESCE({_sql_permille('b.top_bigram_n', 'b.n_bigrams')}, 0)
             AS top_bigram_permille,
           COALESCE(r.max_word_run, 0) AS max_word_run
    FROM word_stats ws
    LEFT JOIN bigrams b USING (doc_id)
    LEFT JOIN runs r USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Vocabulary induction (corpus-wide top-k term counts)
# ---------------------------------------------------------------------------

VOCAB_K = 100


def vocab_top_terms(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Corpus-wide top-k terms by document frequency and total count —
    the seed statistics a tokenizer/vocab build consumes.

    Plan: explode words → ONE hash aggregation on the term (map-side
    partial combine shrinks each partition to its distinct terms before
    the shuffle — at 100 TB the shuffle carries O(partitions × |vocab|)
    rows, not O(corpus tokens)) → global top-k via TakeOrderedAndProject
    (a k-row heap per partition + k-row driver merge; no global sort).
    Ties broken by term ASC — deterministic cross-engine.
    """
    from pyspark.sql import Window  # noqa: F401  (doc parity w/ siblings)

    exploded = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    counts = exploded.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return (
        counts.orderBy(
            F.col("n_occurrences").desc(), F.col("term").asc()
        )
        .limit(k)
        .select(
            "term",
            "n_occurrences",
            "n_docs",
        )
    )


def vocab_top_terms_sql(rel: str, k: int = VOCAB_K) -> str:
    """DuckDB SQL computing exactly :func:`vocab_top_terms`."""
    w = _sql_words()
    return f"""
    SELECT term,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (SELECT doc_id, unnest({w}) AS term FROM {rel})
    GROUP BY term
    ORDER BY n_occurrences DESC, term ASC
    LIMIT {k}
    """


VOCAB_RANK_V = 16  # O(1) scored-vocabulary size (broadcast side)


def vocab_rank_quality(docs: DataFrame, v: int = VOCAB_RANK_V) -> DataFrame:
    """Per-doc unigram-LM-proxy quality: score each document by how its
    tokens rank in the corpus top-``v`` vocabulary — the integer-exact
    stand-in for perplexity filtering (a doc dominated by rare/OOV
    tokens is low-quality or off-distribution; CCNet/Gopher use a KenLM
    perplexity the same way). Float log-probs would never hash-match
    across engines, so the signal is kept rank-based and all-integer:

    - ``n_words`` / ``vocab_hits`` (token occurrences inside the top-v);
    - ``oov_permille`` = floor(1000·(n_words−hits)/n_words);
    - ``mean_vocab_rank`` = floor(sum(rank of each in-vocab token)/hits)
      (0 when no token is in-vocab) — lower = more head-heavy.

    Scale shape: the vocabulary is O(1) by construction (top-v via the
    same TakeOrderedAndProject heap as :func:`vocab_top_terms`, then a
    v-row rank window) and is EXPLICITLY broadcast, so the scoring pass
    is explode → broadcast-hash join → one hash aggregation keyed on
    doc_id (map-side partials; shuffle = 3 ints/doc). At 10^12 docs the
    vocab build is its own corpus pass — production would feed a
    precomputed/sampled vocabulary in place of the inline top-v.
    """
    from pyspark.sql import Window

    ranked = vocab_top_terms(docs, v).select(
        "term",
        F.row_number()
        .over(
            Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        )
        .alias("rank"),
    )  # single-partition window over v = O(1) rows — intentional

    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
    per_doc = (
        tok.join(F.broadcast(ranked), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.count("rank").cast("int").alias("vocab_hits"),
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("_sum_rank"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "vocab_hits",
        _permille(
            F.col("n_words") - F.col("vocab_hits"), F.col("n_words")
        ).alias("oov_permille"),
        F.when(
            F.col("vocab_hits") > 0,
            F.floor(F.col("_sum_rank") / F.col("vocab_hits")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("mean_vocab_rank"),
    )


def vocab_rank_quality_sql(rel: str, v: int = VOCAB_RANK_V) -> str:
    """DuckDB SQL computing exactly :func:`vocab_rank_quality`."""
    w = _sql_words()
    return f"""
    WITH vocab AS (
      SELECT term,
             CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER)
               AS rank
      FROM (SELECT term, count(*) AS n
            FROM (SELECT unnest({w}) AS term FROM {rel})
            GROUP BY term ORDER BY n DESC, term ASC LIMIT {v})
    ),
    tok AS (SELECT doc_id, unnest({w}) AS term FROM {rel}),
    j AS (SELECT t.doc_id, v.rank FROM tok t LEFT JOIN vocab v USING (term))
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_words,
           CAST(count(rank) AS INTEGER) AS vocab_hits,
           {_sql_permille('count(*) - count(rank)', 'count(*)')}
             AS oov_permille,
           CAST(CASE WHEN count(rank) > 0
                     THEN floor(sum(rank) / count(rank)) ELSE 0 END
                AS INTEGER) AS mean_vocab_rank
    FROM j GROUP BY doc_id
    """
