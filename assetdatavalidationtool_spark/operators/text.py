"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. Pure Column expressions throughout (regex +
string builtins) — whole-stage codegen, no UDFs, SQL-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import fingerprint_col, norm_text, spread_small_scan
from .sampling import _hash_bucket

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "be", "this", "that", "from",
]

# tiny marker lexicons for the n-gram language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def _tokens(c: F.Column) -> F.Column:
    # no whitespace-collapse pass: the split subsumes it (identical
    # tokens, ~40% less expression time — see dedup._tokenize)
    return F.filter(F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: t != "")


def _token_count(c: F.Column) -> F.Column:
    """``F.size(_tokens(c))`` without materializing the token array:
    the non-empty tokens of the ``[^a-z0-9']+`` split are exactly the
    maximal ``[a-z0-9']+`` runs of ``lower(c)``, so counting regex
    matches gives the identical value (NULL for NULL input, 0 for
    empty) at a fraction of the cost — no array allocation, no filter
    lambda. Use when only the COUNT is needed."""
    return F.regexp_count(F.lower(c), F.lit(r"[a-z0-9']+"))


def _count_matches(c: F.Column, pattern: str) -> F.Column:
    """Occurrences of a regex in a string: length delta on removal."""
    return F.length(c) - F.length(F.regexp_replace(c, pattern, ""))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_bpe_pieces, avg_token_len).

    ``n_bpe_pieces`` approximates a BPE tokenizer's piece count with the
    classic GPT-2 pre-tokenizer regex family: words + digits + punct
    runs (a cheap, deterministic proxy for budget estimation)."""
    t = F.col(text_col)
    # pieces = maximal alphanumeric runs + maximal non-space punctuation
    # runs (regex-engine-portable: no lookarounds, mirrors in RE2/DuckDB)
    low = F.lower(t)
    alnum_runs = F.size(F.filter(F.split(low, r"[^a-z0-9]+"), lambda p: p != ""))
    other_runs = F.size(F.filter(F.split(low, r"[a-z0-9]+"), lambda p: F.trim(p) != ""))
    # tokenize-once staging: every split lands in its own alias so the
    # final projection reads attributes instead of re-inlining the
    # regex trees (the n_tokens/avg_token_len exprs referenced the
    # token split three times each in the old single-projection form)
    tk = F.col("tk")
    return (
        spread_small_scan(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.length(t).alias("n_chars"),
            _tokens(t).alias("tk"),
            (alnum_runs + other_runs).alias("n_bpe_pieces"),
        )
        .select(
            "doc_id",
            "n_chars",
            F.size(tk).alias("n_tokens"),
            "n_bpe_pieces",
            F.round(
                F.when(
                    F.size(tk) > 0,
                    F.aggregate(tk, F.lit(0), lambda acc, x: acc + F.length(x))
                    / F.size(tk),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("avg_token_len"),
        )
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, punct_ratio, digit_ratio, stopword_ratio, quality).

    quality ∈ [0,1]: a deterministic blend of length band, stopword
    presence, and punctuation/digit moderation — the usual cheap
    pre-filter in corpus pipelines."""
    t = F.col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(F.col("tk"), lambda x: F.array_contains(stop_arr, x))
    )
    # tokenize-once staging: the split and both regexp_replace counters
    # are aliased in the first projection; the quality blend then reads
    # the pre-rounded ratio attributes (the old single-projection form
    # re-inlined each ratio's regex tree into the blend — every regex
    # ran twice per row)
    punct_ratio = F.round(
        F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)), 4
    )
    digit_ratio = F.round(
        F.col("n_digit") / F.greatest(F.col("n_chars"), F.lit(1)), 4
    )
    stop_ratio = F.round(n_stop / F.greatest(F.size(F.col("tk")), F.lit(1)), 4)
    length_band = F.when(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 20000), 1.0
    ).otherwise(0.4)
    quality = F.round(
        length_band * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("digit_ratio") * F.lit(5.0), F.lit(1.0))) * 0.1,
        4,
    )
    return (
        spread_small_scan(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.length(t).alias("n_chars"),
            _tokens(t).alias("tk"),
            _count_matches(t, r"[^\w\s]").alias("n_punct"),
            _count_matches(t, r"[0-9]").alias("n_digit"),
        )
        .select(
            "doc_id",
            "n_chars",
            punct_ratio.alias("punct_ratio"),
            digit_ratio.alias("digit_ratio"),
            stop_ratio.alias("stopword_ratio"),
        )
        .select(
            "doc_id",
            "punct_ratio",
            "digit_ratio",
            "stopword_ratio",
            quality.alias("quality"),
        )
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pred_lang, marker_hits) — marker-word heuristic: count
    hits per language lexicon, argmax with deterministic ties (lexicon
    order). A real pipeline swaps in fastText/CLD3; the dataflow shape
    (narrow scan, no shuffle) is what matters at scale."""
    langs = list(LANG_MARKERS)
    # tokenize-once staging: split → per-lexicon hit counts → argmax,
    # each as its own projection so no expensive alias (the split, the
    # five lexicon scans) is ever re-inlined by CollapseProject. The old
    # single-projection form re-evaluated the split inside every
    # lexicon filter AND re-evaluated every hit count in greatest() and
    # again per CASE branch — ~20 split evaluations per row.
    hits = {}
    for lang in langs:
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits[lang] = F.size(
            F.filter(F.col("tk"), lambda x: F.array_contains(arr, x))
        )
    best_hits = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    # first lexicon in fixed order with the max hit count wins the tie —
    # an explicit CASE chain, mirrored verbatim in the SQL oracle
    pred = F.when(F.col("best") <= 0, F.lit("unknown"))
    for lang in langs:
        pred = pred.when(F.col(f"h_{lang}") == F.col("best"), F.lit(lang))
    return (
        spread_small_scan(df)
        .select(F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tk"))
        .select(
            "doc_id", *[hits[lang].alias(f"h_{lang}") for lang in langs]
        )
        .select(
            "doc_id",
            *[f"h_{lang}" for lang in langs],
            best_hits.alias("best"),
        )
        .select(
            "doc_id",
            pred.alias("pred_lang"),
            F.col("best").alias("marker_hits"),
        )
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, fingerprint) — md5 of the normalized text; the join key
    for exact dedup and incremental re-crawl diffing."""
    return spread_small_scan(df).select(
        F.col(id_col).alias("doc_id"),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
    )


# Conservative, portable PII patterns: email and North-American-style
# phone numbers. Same regex dialect in Spark (Java) and DuckDB (RE2) —
# no lookaround, no \b ambiguity across engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # country code OPTIONAL: bare NANP forms (555-123-4567,
    # (555) 123-4567, 555 123 4567, 555.123.4567) are the common case
    # and must redact too, not only +1-prefixed numbers. Separators
    # between the trailing groups stay mandatory (false-positive guard:
    # a 10-digit blob is an ID as often as a phone).
    "phone": r"(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
}


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, text_redacted, n_emails, n_phones) — scrub emails and
    phone numbers, counting removals. A pre-training corpus MUST pass
    through a scrub stage; these two patterns are the deterministic,
    engine-portable core (production adds NER-based scrubbing as a
    mapInPandas stage on the same dataflow). Pure Column expressions —
    the redaction runs in the scan stage at any scale."""
    t = F.col(text_col)
    emails = PII_PATTERNS["email"]
    phones = PII_PATTERNS["phone"]
    no_email = F.regexp_replace(t, emails, "[EMAIL]")
    return spread_small_scan(df).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(no_email, phones, "[PHONE]").alias("text_redacted"),
        F.size(F.regexp_extract_all(t, F.lit(emails), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(phones), F.lit(0))).alias(
            "n_phones"
        ),
    )


def corpus_vocabulary(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 50
) -> DataFrame:
    """Top-k corpus vocabulary by document frequency →
    (token, doc_freq, total_freq), ordered df desc / token asc.

    One explode + two-level aggregate: per-(doc, token) counts shrink
    map-side first, then the token-level aggregate is tiny (vocab-sized,
    not corpus-sized). The final top-k is a sort over vocab rows only —
    at 100 TB the only big shuffle is the (doc_id, token) aggregate,
    which partial aggregation bounds at distinct-tokens-per-doc."""
    per_doc = (
        spread_small_scan(df)
        .select(F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_doc.groupBy("token")
        .agg(F.count("*").alias("doc_freq"), F.sum("tf").alias("total_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(top_k)
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sequence-packing prep: split each document's token stream into
    overlapping chunks → (doc_id, chunk_id, n_tokens, chunk_text).

    chunk i covers tokens [i*stride, i*stride + chunk_size); the last
    chunk may be short; documents shorter than one chunk yield exactly
    one chunk. The explode is a narrow per-row transformation (no
    shuffle); downstream packing groups by target sequence length."""
    # tokenize-once staging: materialize the split as ``tk`` so the
    # chunk-count arithmetic and the per-chunk slice read an attribute
    # (the old form re-inlined the split into every slice — one full
    # re-tokenization per CHUNK)
    tk = F.col("tk")
    n_chunks = F.when(
        F.size(tk) <= chunk_size, F.lit(1)
    ).otherwise(
        F.ceil((F.size(tk) - F.lit(chunk_size)) / F.lit(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(tk, i * stride + 1, chunk_size).alias("ctoks"),
        ),
    )
    return (
        spread_small_scan(df)
        .select(F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tk"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.ctoks").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
        )
    )


def repetition_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of duplicated tokens and duplicated word 2-grams. Highly
    repetitive documents (keyword stuffing, boilerplate loops, decoding
    failures) score near 1 and are standard quality-filter rejects.

    dup_frac = 1 − |distinct occurrences| / |occurrences| — 0.0 for a
    document with no repeats and for degenerate docs too short to form
    an n-gram. Pure Column expressions, no shuffle, no Python.

    Tokenize-once discipline: the regex split is materialized as its
    own projection (``tk``) and the 2-grams as another (``grams``), so
    every downstream reference reads an attribute instead of
    re-inlining the split tree. The old single-projection form
    re-evaluated the full split inside the gram-builder's HOF lambda —
    O(n_tokens) splits per row, O(n²) regex work (~8 ms/doc, 21% of
    the whole r5 suite). Catalyst keeps the stages separate because
    CollapseProject never inlines a non-cheap alias referenced more
    than once; the 2-gram build is a zip_with over the materialized
    array — O(n) with no re-split.
    """

    def dup_frac(arr: F.Column) -> F.Column:
        total = F.size(arr)
        return F.when(
            total > 0,
            F.round(1.0 - F.size(F.array_distinct(arr)) / total, 4),
        ).otherwise(F.lit(0.0))

    tk = F.col("tk")
    grams = F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, 1, F.size(tk) - 1),
            F.slice(tk, 2, F.size(tk) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        spread_small_scan(df)
        .select(F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tk"))
        .select("doc_id", "tk", grams.alias("grams"))
        .select(
            "doc_id",
            F.size(tk).alias("n_tokens"),
            dup_frac(tk).alias("dup_token_frac"),
            dup_frac(F.col("grams")).alias("dup_2gram_frac"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 256,
    n_lanes: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign token chunks (the output of :func:`chunk_tokens`) to
    fixed-budget packing bins → one row per bin:
    (lane, bin_id, n_chunks, bin_tokens).

    Greedy sequential packing within independent *lanes*: each chunk is
    routed to a lane by a stable hash of ``doc_id`` (a document's
    chunks stay together), ordered by (doc_id, chunk_id) inside the
    lane, and a bin boundary is drawn every ``budget`` tokens of
    running total — ``bin_id = floor(exclusive_cumsum / budget)``. A
    chunk straddling a boundary belongs to the bin its first token
    falls in, so a bin may overrun by at most one chunk (the standard
    overflow-then-truncate packing used for sequence-length batching).

    Scale: ONE shuffle (hash-partition by lane) + a per-lane window
    cumsum; lanes are mutually independent, so parallelism = n_lanes —
    set n_lanes ≈ cluster cores at 10^12 rows. Integer-only arithmetic:
    bit-identical on any engine.
    """
    lane = _hash_bucket(F.col("doc_id"), salt, n_lanes).alias("lane")
    w = (
        Window.partitionBy("lane")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        chunks.select(lane, "doc_id", "chunk_id", "n_tokens")
        .withColumn("bin_id", F.floor(cum_before / budget))
        .groupBy("lane", "bin_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 3
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): score every
    document by its average negative log-likelihood under the corpus's
    own unigram language model, then rank-bucket docs into ``n_buckets``
    perplexity tiers (1 = head / most fluent … n = tail) →
    (doc_id, n_tokens, avg_nll, ppl_bucket).

    Production CCNet uses a KenLM 5-gram; the unigram model is the
    deterministic, engine-portable core with the identical dataflow:
    corpus token counts (vocab-sized aggregate) → per-token cost table →
    broadcast join onto exploded tokens → per-doc aggregate.

    Cross-engine exactness: per-token cost is pre-rounded to INTEGER
    micro-nats (``floor(ln(total/cnt)·1e6 + 0.5)``), so per-doc sums are
    exact BIGINT arithmetic — no float summation-order divergence; the
    per-doc avg_nll is then a fixed sequence of IEEE double ops on
    exact integers (correctly-rounded division, floor) — bit-identical
    on any engine. The tier is ntile over (avg_nll, doc_id) with
    deterministic ties. Docs with zero tokens have no likelihood and
    are absent from the output. At 10^12 docs swap the exact ntile for
    approxQuantile thresholds broadcast as literals (same contract).
    """
    toks_df = spread_small_scan(df).select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tk")
    )
    exploded = toks_df.select("doc_id", F.explode("tk").alias("token"))
    # NOTE (r6): a (doc_id, token) pre-aggregate shared by both
    # consumers was tried (one tokenize pass instead of two) and
    # measured SLOWER (11.2 s vs 8.7 s at sf1.0): the per-token partial
    # aggregates here are nearly free (vocabulary-sized hash tables),
    # while the pre-aggregate pays a corpus-sized composite-key hash
    # table. Two cheap passes beat one expensive one.
    vocab = exploded.groupBy("token").agg(F.count("*").alias("cnt"))
    total_row = vocab.agg(F.sum("cnt").alias("total"))
    cost = vocab.crossJoin(F.broadcast(total_row)).select(
        "token",
        F.floor(F.log(F.col("total") / F.col("cnt")) * 1e6 + 0.5)
        .cast("long")
        .alias("cost"),
    )
    per_doc = (
        exploded.join(F.broadcast(cost), "token")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("cost").alias("sum_cost"))
    )
    avg_nll = F.floor(F.col("sum_cost") / F.col("n_tokens") / 100 + 0.5) / 1e4
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        avg_nll.alias("avg_nll"),
        F.ntile(n_buckets)
        .over(Window.orderBy(avg_nll, F.col("doc_id")))
        .alias("ppl_bucket"),
    )


def boilerplate_captions(
    df: DataFrame,
    caption_col: str = "caption",
    id_col: str = "image_id",
    min_images: int = 5,
) -> DataFrame:
    """Captions shared verbatim across ≥ min_images distinct images →
    (caption, n_images, sample_id).

    Scraped image-text corpora are full of template captions ("click to
    enlarge", alt-text boilerplate) that carry zero training signal and
    skew caption statistics; flagging any caption attached to many
    DISTINCT images is the standard screen (the caption-side analogue of
    the reference's duplicate-key report, ReportGenerator.cs:150-156).

    Normalization is the SHARED ``norm_text`` (also used by
    fingerprinting), so a caption differing only in case/spacing still
    groups and the two screens can never drift apart. NULL captions are
    excluded — grouping them would report rows that merely LACK a
    caption as one giant boilerplate template (missing captions are the
    schema/referential rules' business). Scale: one hash aggregate
    keyed on the normalized caption; count(DISTINCT id) plans as a
    two-phase aggregate (partial distinct map-side), and only
    (caption, id) pairs shuffle — never the image payload. Boilerplate
    by definition concentrates rows on few keys; the distinct
    pre-aggregation is exactly the salting such skew needs.
    """
    return (
        df.where(F.col(caption_col).isNotNull())
        .select(norm_text(F.col(caption_col)).alias("caption"), F.col(id_col))
        .groupBy("caption")
        .agg(
            F.countDistinct(id_col).alias("n_images"),
            F.min(id_col).alias("sample_id"),
        )
        .where(F.col("n_images") >= min_images)
    )
