"""Text-analysis operators for the LLM-data-pipeline surface
(SURVEY.md §2.B LLM-pipeline rows): tokenization, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in Catalyst expressions (split / higher-order array
functions / md5) — no Python in the hot path, so each operator is a
narrow map over the scan and scales linearly with input bytes. Designed
against the ``documents`` fixture (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int
from ..plans.inspect import fan_out

# Tiny per-language marker-word lists for the n-gram/stopword language-ID
# heuristic. Deterministic and cross-engine expressible; real pipelines
# would swap in fastText — the operator shape (score-per-lang → argmax)
# is what matters here.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "value", "table"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

DEFAULT_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization (single-space corpus → exact split)."""
    return F.split(text_col, " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, distinct-token count, avg token length, type/token
    ratio — the basic token-level features."""
    toks = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn(
            "avg_token_len",
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)).cast(
                "double"
            )
            / F.size(toks),
        )
        .withColumn(
            "type_token_ratio",
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        )
    )


def with_quality_score(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Heuristic quality features + composite score.

    Features mirror common pretraining-data filters (C4/Gopher-style):
    length, mean word length, stopword ratio, repetition (1 - type/token).
    All integer-count ratios → bit-identical across engines.
    """
    sw = stopwords or DEFAULT_STOPWORDS
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(sw)))
    n_distinct = F.size(F.array_distinct(toks))
    out = (
        df.withColumn("n_tokens", n)
        .withColumn("stopword_ratio", n_stop.cast("double") / n)
        .withColumn("repetition_ratio", F.lit(1.0) - n_distinct.cast("double") / n)
        .withColumn("mean_word_len", (F.length(F.col(text_col)) - n + 1).cast("double") / n)
    )
    # Composite: in-range length + some-but-not-too-many stopwords + low repetition
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000), F.lit(0.4)).otherwise(0.0)
        + F.when(F.col("stopword_ratio").between(0.01, 0.5), F.lit(0.3)).otherwise(0.0)
        + F.when(F.col("repetition_ratio") < 0.9, F.lit(0.3)).otherwise(0.0)
    )
    return out.withColumn("quality_score", score)


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID: score = matching marker tokens per
    language, predict argmax (ties broken by language code order).

    Composed from higher-order array functions — a narrow map, no
    shuffle, no UDF; at 100 TB this is scan-bound.
    """
    toks = tokens(F.col(text_col))
    scored = df
    for lang, markers in LANG_MARKERS.items():
        scored = scored.withColumn(
            f"score_{lang}", F.size(F.filter(toks, lambda w: w.isin(markers)))
        )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # reversed so earlier codes win ties
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash over
    token hashes, ``h = (h*31 + md5int(tok)) mod 2^61-1``.

    Cross-engine stable (md5 hash family, see functions/hashing.py) and
    order-sensitive, unlike a bag-of-words hash — two docs with the same
    words in different order fingerprint differently. Modulus 2^31-1
    keeps every intermediate ≈2^36, far from BIGINT overflow (Spark 4
    ANSI mode and DuckDB both error on overflow rather than wrap).
    """
    p = 2147483647  # 2^31 - 1
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: (acc * 31 + (md5_int(w) % p)) % F.lit(p),
    )
    return df.withColumn("fingerprint", fp)


def shingles(text_col: Column, k: int = 3) -> Column:
    """w-shingles: overlapping k-token sequences joined by spaces.

    The unit of near-dup detection — token *sets* collapse under a small
    vocabulary (every doc looks like every other), while shingle sets
    preserve sequence and separate genuinely different documents. Built
    from sequence/transform higher-order expressions: narrow, codegen'd.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    win = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
        ),
    )
    return F.when(n >= k, win).otherwise(F.array(text_col))


# Simplified GPT-2-style pretokenizer classes: letter runs, digit runs,
# punctuation. Plain character classes so the Java (Spark) and RE2
# (DuckDB) regex engines agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_regex_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: a regex pretokenizer (letter runs / digit
    runs / single punctuation) plus the chars/4 subword heuristic — the
    two standard cheap estimators of LLM token cost when the real
    tokenizer is too expensive to run over a whole corpus. Narrow map,
    no shuffle; both engines evaluate the same character-class regex.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))
    return (
        df.withColumn("n_regex_tokens", F.size(pieces))
        .withColumn("n_word_tokens", F.size(tokens(F.col(text_col))))
        .withColumn(
            "n_subword_est",
            F.ceil(F.length(F.col(text_col)).cast("double") / 4).cast("bigint"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    shards: int = 16,
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents are laid out in
    stable id order and cut into fixed ``budget``-token training
    sequences (documents may straddle a boundary — the GPT-style
    pack-with-EOD scheme). Returns per-doc placement: shard, start
    sequence index and offset within it.

    Scale shape: a GLOBAL running sum would be a single-partition window,
    so documents are first sharded by a content-stable hash
    (md5(id) % shards) and packed independently per shard — exactly how
    production packing parallelizes; each shard's window is one ordinary
    hash-partitioned exchange. Sequence ids are (shard, seq_in_shard)
    pairs so shards never coordinate.
    """
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col)))
    shard = md5_int(F.col(id_col).cast("string")) % shards
    out = df.select(F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        out.withColumn("cum_tokens", cum)
        .withColumn(
            "start_seq", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
        )
        .withColumn(
            "start_offset", (F.col("cum_tokens") - F.col("n_tokens")) % budget
        )
        .withColumn("end_seq", F.floor((F.col("cum_tokens") - 1) / budget))
    )


# RE2-safe patterns (no backreferences / lookaround) so Spark's Java regex
# and DuckDB's RE2 produce identical replacements. The phone run class
# excludes \n/\t (a \s class merged separate numeric tokens across lines)
# and is length-bounded to the E.164 envelope so timestamps don't get
# swallowed whole.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,14}[0-9]", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """PII redaction: chained regexp_replace for emails / phone-number
    runs / IPv4 literals → placeholder tokens. A narrow scan-bound map
    (codegen'd JVM regex); patterns are RE2-safe so the op stays
    oracle-checkable. Real pipelines extend PII_PATTERNS; the operator
    shape (ordered replace chain + audit count) is the contract.

    ``n_redactions`` counts pattern MATCHES at each step of the replace
    chain (pattern i is counted on the text after replacements 1..i-1),
    not placeholder substrings in the output — documents that already
    contain literal ``<EMAIL>``/``<PHONE>``/``<IP>`` don't inflate the
    audit count."""
    cur = F.col(text_col)
    n = F.lit(0)
    for _, pat, repl in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, repl)
    return df.withColumn(out_col, cur).withColumn("n_redactions", n.cast("int"))


def normalize_text(df: DataFrame, text_col: str = "text", out_col: str = "norm_text") -> DataFrame:
    """Canonical text normalization: lowercase, collapse whitespace runs,
    trim. The standard preprocessing before exact-dedup hashing — two
    docs differing only in case/spacing should collide."""
    collapsed = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.trim(collapsed))


def tfidf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """TF-IDF per (doc, token): ``tf * ln((N+1)/(df+1))`` (smoothed idf).

    Shape: explode → two hash aggregations (tf keyed on (doc, token),
    df keyed on token) → broadcast of the 1-row corpus count. The only
    wide exchanges are on the aggregation keys; the doc count joins in
    as a broadcast, so nothing recombines through the driver. ``tfidf``
    is rounded to 6 decimals for cross-engine comparability (ln is
    correctly-rounded-within-1-ulp on both JVM and libm).
    """
    toks = fan_out(df).select(id_col, F.explode(tokens(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count_distinct(id_col).alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs").cast("double") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
        .select(id_col, "token", "tf", "df", "tfidf")
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct k-gram shingles appear anywhere in the benchmark/eval set —
    the standard guard against evaluation leakage in training corpora
    (n-gram overlap decontamination, as popularized by the GPT-3 and
    PaLM data papers).

    Shape: the benchmark shingle set is distinct-collapsed and BROADCAST
    (eval suites are tiny next to a training corpus — at 100 TB train the
    benchmark side is still MBs), so training shingles never shuffle for
    the probe; the only wide exchange is the per-doc hit count on
    ``id_col``. Output: (id, n_contaminated_ngrams, contaminated) for
    every training doc, zero-filled via a left join so clean docs appear
    explicitly.
    """
    tr = fan_out(train).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("ng"),
    )
    bm = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("ng")
        )
        .distinct()
    )
    hits = (
        tr.join(F.broadcast(bm), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated_ngrams", F.lit(0).cast("bigint")).alias(
                "n_contaminated_ngrams"
            ),
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
    )


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Intra-document repetition: 1 − distinct/total k-gram shingles —
    the cheap detector for boilerplate/template/spam documents whose
    text loops (a standard quality-filter feature alongside
    :func:`with_quality_score`'s length/stopword ratios). A narrow
    codegen'd map; rounded to 6 decimals for cross-engine comparison."""
    sh = shingles(F.col(text_col), k)
    return (
        df.select(
            F.col(id_col),
            F.size(sh).alias("n_ngrams"),
            F.size(F.array_distinct(sh)).alias("n_distinct_ngrams"),
        )
        .withColumn(
            "repetition",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct_ngrams").cast("double") / F.col("n_ngrams"),
                6,
            ),
        )
    )


def build_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the ``size`` most document-frequent tokens with
    a deterministic rank (df DESC, token ASC tiebreak) — the token-list
    step of tokenizer training / stopword discovery.

    Scale shape: distinct-per-doc explode → one hash aggregation keyed on
    token → global top-k. The top-k is ``orderBy().limit()`` — Spark
    plans TakeOrderedAndProject (per-partition heaps merged at the
    driver, O(size) memory), NOT a full sort; the rank window then runs
    over only the ``size`` surviving rows, so its single partition is
    bounded by construction, never O(vocabulary).
    """
    from pyspark.sql import Window

    toks = fan_out(df).select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("token").asc()).limit(size)
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w))


def remove_boilerplate_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Corpus-adaptive boilerplate removal: drop every token whose
    document frequency exceeds ``max_df_frac`` of the corpus — the
    data-driven generalization of a fixed stopword list (CCNet-style
    "remove what the corpus itself says is template text"). Returns
    (id, clean_text, n_removed) with surviving tokens in original order.

    Scale shape: the boilerplate list is DERIVED (distinct-per-doc
    explode → one token-keyed aggregation) but APPLIED as a narrow map —
    the list collapses to a single sorted-array row (bounded by the
    high-df vocabulary, small by Zipf's law) that broadcast-cross-joins
    onto the corpus, where a higher-order ``filter`` keeps order and
    duplicates. The corpus itself never shuffles for the removal pass.
    """
    toks = tokens(F.col(text_col))
    dfreq = (
        fan_out(df)
        .select(F.explode(F.array_distinct(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    stoplist = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(F.col("df") > F.lit(max_df_frac) * F.col("__n"))
        .agg(F.sort_array(F.collect_list("token")).alias("__stop"))
    )
    kept = F.filter(toks, lambda t: ~F.array_contains(F.col("__stop"), t))
    return (
        df.crossJoin(F.broadcast(stoplist))
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("clean_text"),
            (F.size(toks) - F.size(kept)).alias("n_removed"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log2-probability under the corpus's own
    unigram model — the cheap stand-in for the LM-perplexity quality
    filter (CCNet/RedPajama): template/boilerplate text scores high,
    rare-garbage text scores low. Returns (id, n_tokens, avg_logprob).

    Scale shape: one token-keyed aggregation builds the model (partial
    agg collapses each partition to ~vocabulary rows before the
    shuffle); the corpus total collapses to one broadcast row; scoring
    BROADCASTS the frequency table — vocabulary is corpus-sublinear by
    Zipf/Heaps, so this keeps the exploded corpus from re-shuffling on
    token (the naive equi-join would move every token twice). The final
    doc-keyed aggregation again partial-aggregates to ~1 row per doc per
    partition (a doc's exploded tokens are co-located). Rounded to 6
    decimals so double-sum accumulation order and libm log ulp
    differences can't leak into the comparison.
    """
    toks = (
        fan_out(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("__n"))
    return (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log2(F.col("c").cast("double") / F.col("__n"))), 6
            ).alias("avg_logprob"),
        )
    )


def word_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the within-document word
    distribution — the lexical-diversity quality signal: near-zero for
    looping/template text, high for varied prose. Computed as
    H = log2(n) − Σ c·log2(c) / n over per-word counts c, which keeps
    the aggregation a single partial-summable pass (no per-word division
    before the combine). Returns (id, n_tokens, entropy), 6 decimals.
    """
    counts = (
        fan_out(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("entropy"),
    )


def filter_report(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    max_repetition: float = 0.6,
    min_stopword_ratio: float = 0.01,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document filter report: which curation rules each doc trips
    (length bounds, repetition, stopword floor, benchmark contamination)
    and whether it survives — the auditable "why was this dropped" record
    a production pipeline keeps next to the filtered corpus, rather than
    silently deleting rows.

    Reasons are a fixed-order comma-joined string (stable across engines
    and partitionings); ``keep`` is true iff no rule fired. Shape: all
    length/repetition/stopword signals are one narrow codegen'd map; the
    contamination flag joins :func:`ngram_contamination`'s per-doc counts
    on ``id_col`` (benchmark side broadcast there). One wide exchange
    total at any scale.

    The signal map runs on a ``fan_out`` of the input: the per-row
    shingle/stopword expressions are CPU-heavy (~0.1 ms/doc), and a small
    parquet that lands in one partition would otherwise execute them
    single-threaded (measured 4.5 s → 0.4 s at sf0.1 on 32 cores). At
    100 TB the input is already wide and the fan-out is a no-op.
    """
    train = fan_out(train)
    sw = stopwords or DEFAULT_STOPWORDS
    ws = tokens(F.col(text_col))
    ntok = F.size(ws)
    swr = F.size(F.filter(ws, lambda t: t.isin(*sw))).cast("double") / F.size(ws)
    sh = shingles(F.col(text_col), 3)
    rep = F.round(
        F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh), 6
    )
    cont = ngram_contamination(train, benchmark, id_col=id_col, text_col=text_col)
    reasons = F.array_compact(
        F.array(
            F.when(ntok < min_tokens, "too_short"),
            F.when(ntok > max_tokens, "too_long"),
            F.when(rep > max_repetition, "high_repetition"),
            F.when(swr < min_stopword_ratio, "low_stopword"),
            F.when(F.col("contaminated"), "contaminated"),
        )
    )
    return (
        train.join(cont.select(id_col, "contaminated"), id_col)
        .select(
            F.col(id_col),
            ntok.alias("n_tokens"),
            F.array_join(reasons, ",").alias("reasons"),
            (F.size(reasons) == 0).alias("keep"),
        )
    )


def duplicate_ngram_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document duplicate n-gram fraction — the Gopher/Dolma-family
    quality signal "how much of this document's text appears elsewhere in
    the corpus": of the doc's DISTINCT k-word shingles, the fraction
    whose corpus document-frequency is ≥ 2. High values flag boilerplate,
    mirrors, and template text that document-level dedup (exact or
    near-dup) misses because the *whole* documents differ.

    Scale shape: explode distinct shingles once, shingle-keyed df count
    (map-side combined), join the counts back on the same shingle key,
    one doc-keyed aggregation. No pair enumeration anywhere — cost tracks
    corpus shingle volume, not document pairs. At 100 TB, drop
    ultra-high-df shingles from the join's build side first if the df
    table itself gets hot (their df≥2 verdict is already known).

    Returns (id, n_shingles, n_dup_shingles, dup_frac)."""
    from ..plans.inspect import tracked_persist

    sh = F.array_distinct(shingles(F.col(text_col), k))
    toks = tracked_persist(
        fan_out(df).select(F.col(id_col), F.explode(sh).alias("tok"))
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_shingles").cast("double") / F.col("n_shingles"), 6
            ),
        )
    )


def length_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Log2-bucketed context-length histogram: docs and token volume per
    power-of-two token-count bucket — the sequence-length distribution a
    training pipeline checks before choosing context length / packing
    strategy (how much of the corpus is short-doc padding waste, how much
    exceeds the window and gets truncated).

    Scale shape: one narrow codegen'd map (token count → floor(log2))
    followed by one ~30-key aggregation — map-side combine collapses each
    partition to the bucket count first, so the exchange carries
    O(buckets × partitions) rows regardless of corpus size.

    Returns (len_bucket, bucket_lo, n_docs, n_tokens_total, min_tokens,
    max_tokens); bucket_lo = 2^len_bucket, the bucket's inclusive floor.
    """
    ntok = F.size(tokens(F.col(text_col))).cast("bigint")
    bucket = F.floor(F.log2(ntok.cast("double"))).cast("bigint")
    return (
        df.select(ntok.alias("n_tokens"), bucket.alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens_total"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .withColumn("bucket_lo", F.pow(F.lit(2.0), F.col("len_bucket")).cast("bigint"))
        .select("len_bucket", "bucket_lo", "n_docs", "n_tokens_total",
                "min_tokens", "max_tokens")
    )


def quality_quartiles(
    df: DataFrame,
    strata_col: str = "source",
    n_bins: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum quality-score quantile bins: NTILE(n) over
    ``with_quality_score``'s composite, ordered (score desc, doc_id) for
    a deterministic total order, then per-(stratum, bin) stats — the
    "keep the top quartile per domain" selection step of quality-pruned
    corpus construction (DSIR/Ask-LLM-style pipelines bin on a model
    score; the binning machinery is identical).

    Scale shape: the window partitions by ``strata_col``, so each stratum
    sorts independently in parallel — there is no global sort and no
    single-partition window. One exchange on the stratum key feeds both
    the window and the final (stratum, bin) aggregation.

    Returns (stratum, bin, n_docs, avg_score, min_score, max_score).
    """
    from pyspark.sql import Window

    scored = with_quality_score(df, text_col=text_col)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("bin", F.ntile(n_bins).over(w).cast("bigint"))
        .groupBy(F.col(strata_col).alias("stratum"), "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("avg_score"),
            F.round(F.min("quality_score"), 6).alias("min_score"),
            F.round(F.max("quality_score"), 6).alias("max_score"),
        )
    )


def duplicate_span_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document duplicate SPAN extraction — the contiguous-run
    refinement of :func:`duplicate_ngram_stats`: instead of just counting
    duplicated shingles, find each document's maximal runs of consecutive
    shingle positions whose shingle appears in ≥2 distinct documents. A
    long run is a copied passage (boilerplate header, license block,
    syndicated paragraph) — the thing substring-level dedup actually
    removes, where an isolated duplicated shingle is usually a common
    phrase. Suffix-array pipelines (the exact method) don't distribute;
    this shingle-position gaps-and-islands form is the Spark-shaped
    equivalent: runs of duplicated k-shingles ≈ duplicated substrings of
    length ≥ k+run-1 tokens.

    Scale shape: positional shingle explode (persisted, reused twice) →
    shingle-keyed distinct-doc frequency → join-back on the shingle key →
    per-doc window (partitioned by doc — parallel, no global sort) → two
    doc-keyed aggregations. Cost tracks shingle volume; nothing is
    pairwise. Returns one row per doc that has ≥1 duplicated position:
    (id, n_dup_positions, n_runs, max_run_shingles, max_dup_span_tokens).
    """
    from pyspark.sql import Window

    from ..plans.inspect import tracked_persist

    pos = tracked_persist(
        fan_out(df).select(
            F.col(id_col),
            F.posexplode(shingles(F.col(text_col), k)).alias("pos", "tok"),
        )
    )
    dfreq = pos.groupBy("tok").agg(F.count_distinct(id_col).alias("df"))
    dup = pos.join(dfreq.where(F.col("df") >= 2).select("tok"), "tok")
    island = F.col("pos") - F.row_number().over(
        Window.partitionBy(id_col).orderBy("pos")
    )
    runs = (
        dup.withColumn("island", island)
        .groupBy(id_col, "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy(id_col)
        .agg(
            F.sum("run_len").alias("n_dup_positions"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("max_run_shingles"),
        )
        .withColumn("max_dup_span_tokens", F.col("max_run_shingles") + F.lit(k - 1))
    )


def vocab_health(
    df: DataFrame, text_col: str = "text", strata_col: str = "source"
) -> DataFrame:
    """Per-stratum vocabulary-health report: token volume, distinct type
    count, type-token ratio, hapax share (types seen exactly once — the
    long-tail mass), and top-word share (mass of the single most frequent
    token) — the Zipf-shape diagnostics that flag template-generated or
    boilerplate-heavy sources before they skew a training mix.

    Scale shape: one (stratum, token)-keyed count with map-side combine
    — the only exchange that sees token volume, and it carries partial
    counts, not text — then a stratum-keyed rollup over the count table
    (bounded by vocabulary size, not corpus size). All ratios divide
    exact integers once in double, so they are bit-identical across
    engines and partitionings.
    """
    toks = fan_out(df).select(
        F.col(strata_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy(strata_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy(strata_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
            F.max("c").alias("top_count"),
        )
        .select(
            strata_col,
            "n_tokens",
            "n_types",
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
            F.round(F.col("n_hapax").cast("double") / F.col("n_types"), 6).alias(
                "hapax_share"
            ),
            F.round(F.col("top_count").cast("double") / F.col("n_tokens"), 6).alias(
                "top_word_share"
            ),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    min_count: int = 2,
) -> DataFrame:
    """Per-document mean bigram log2-probability with stupid backoff
    (Brants et al. 2007, public paper) — the next step up from the
    unigram proxy (:func:`unigram_logprob`) toward the LM-perplexity
    quality filter: P(w|prev) = c(prev,w)/c(prev) when the bigram
    survives ``min_count`` pruning, else α·c(w)/N. Fluent prose keeps
    its bigrams in the pruned model; token-salad garbage backs off
    everywhere and scores low. Returns (id, n_bigrams, avg_logprob),
    6 decimals.

    Scale shape: bigram rows come from a per-document lag window
    (parallel by doc, no global sort); the bigram model is built with
    one (prev, w)-keyed count and PRUNED before joining back — pruning
    is what keeps the model join's build side vocabulary-scale instead
    of corpus-scale. Unigram table and corpus total broadcast. The
    scoring join keys on (prev, w); the final doc-keyed aggregation
    partial-aggregates per partition.
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    toks = fan_out(df).select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    big = toks.withColumn("pw", F.lag("w").over(w)).where(F.col("pw").isNotNull())
    bi_model = (
        big.groupBy("pw", "w")
        .agg(F.count(F.lit(1)).alias("c_bi"))
        .where(F.col("c_bi") >= min_count)
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("__n"))
    prev_uni = uni.select(F.col("w").alias("pw"), F.col("c_uni").alias("c_prev"))
    logp = F.when(
        F.col("c_bi").isNotNull(),
        F.log2(F.col("c_bi").cast("double") / F.col("c_prev")),
    ).otherwise(
        F.log2(F.lit(alpha) * F.col("c_uni").cast("double") / F.col("__n"))
    )
    return (
        big.join(bi_model, ["pw", "w"], "left")
        .join(F.broadcast(prev_uni), "pw")
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


def lang_consistency(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Within-document language consistency: language-ID each
    ``chunk_tokens``-token chunk (the q39 marker heuristic), then report
    per document the majority language, chunk counts, the majority share,
    and a mixed-language flag — catches code-switched and
    template-spliced documents that a whole-document language label
    averages away (a document-level lang-ID can be confidently 'en' on a
    doc whose second half is another language).

    Scale shape: chunking is a narrow array-slice map (no join back —
    chunks are built per row from the token array); the lang-ID is the
    same narrow higher-order scoring as :func:`with_lang_id`; the only
    exchanges are the (doc, lang)-keyed count and the doc-keyed rollup,
    both bounded by chunks-per-doc × languages. Majority ties break to
    the lexicographically larger language code (max_by struct rule) —
    deterministic across engines.
    """
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "),
    )
    cdf = fan_out(df).select(F.col(id_col), F.explode(chunks).alias(text_col))
    labeled = with_lang_id(cdf).select(F.col(id_col), F.col("lang_pred"))
    per_lang = labeled.groupBy(id_col, "lang_pred").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_lang.groupBy(id_col).agg(
        F.sum("c").alias("n_chunks"),
        F.max_by("lang_pred", F.struct(F.col("c"), F.col("lang_pred"))).alias(
            "majority_lang"
        ),
        F.max("c").alias("n_majority"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("consistency"),
        (F.count(F.lit(1)) > 1).alias("is_mixed"),
    )


def zipf_fit(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Per-stratum Zipf fit: least-squares regression of log2(frequency)
    on log2(rank) over the top ``top_n`` words — natural language sits
    near slope −1; template/boilerplate-heavy strata flatten (few words
    dominate), and token-salad strata steepen irregularly. The
    distribution-shape QA signal that complements vocab_health's scalar
    ratios: (stratum, n_words, slope, intercept, r2), 6 decimals.

    Scale shape: one (stratum, word)-keyed count with map-side combine;
    the rank window partitions by stratum and keeps only top_n rows per
    stratum (WindowGroupLimit); the regression aggregates exactly
    ``top_n`` (x, y) points per stratum — sums over ≤top_n doubles, so
    the 6-decimal round is far outside float association noise.
    """
    from pyspark.sql import Window

    toks = fan_out(df).select(
        F.col(strata_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy(strata_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(strata_col).orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            strata_col,
            F.log2(F.col("rank").cast("double")).alias("x"),
            F.log2(F.col("c").cast("double")).alias("y"),
        )
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, syy = F.sum(F.col("x") * F.col("x")), F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return ranked.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - (cov_n / var_x) * sx) / n, 6).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document Gopher-style repetition-free quality rules (the
    published MassiveText filter heuristics: word-count bounds, mean
    word length bounds, symbol-to-word ratio, bullet/ellipsis line
    ratios, alphabetic-word fraction, required-stopword hits), with the
    same auditable fixed-order ``reasons`` / ``keep`` contract as
    :func:`filter_report`.

    Complements :func:`filter_report` (C4-style length/repetition/
    contamination) and :func:`with_quality_score` (composite score):
    these are the *structural* junk detectors — code listings, menus,
    bullet-farms, ellipsis-truncated scrapes — that token-ratio signals
    miss. Thresholds default to the published values; pipeline callers
    tune per corpus.

    Every signal is exact integer/count arithmetic over one narrow
    codegen'd map (split + higher-order array functions — no UDF, no
    shuffle), so results are bit-identical across engines and the
    operator is scan-bound at 100 TB. Counts of ``#`` and ``...`` use
    non-overlapping leftmost replace semantics, identical in Spark and
    DuckDB. Reference parity: extends the reference's per-record map
    stage (parallel_sort.cpp:21-78 chunk map) to rule evaluation.
    """
    sw = stopwords or ["the", "be", "to", "of", "and", "that", "have", "with"]
    df = fan_out(df)
    ws = tokens(F.col(text_col))
    n_words = F.size(ws)
    sum_len = F.aggregate(ws, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w))
    mean_wl = sum_len.cast("double") / n_words
    txt = F.col(text_col)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("- ") | l.startswith("* ") | l.startswith("• "),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double") / n_lines
    )
    alpha_ratio = (
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n_words
    )
    sw_hits = F.size(F.filter(F.array(*[F.lit(s) for s in sw]), lambda s: F.array_contains(ws, s)))
    feats = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        sw_hits.alias("stopword_hits"),
    )
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_words") < min_words, "too_few_words"),
            F.when(F.col("n_words") > max_words, "too_many_words"),
            F.when(F.col("mean_word_len") < min_mean_word_len, "short_words"),
            F.when(F.col("mean_word_len") > max_mean_word_len, "long_words"),
            F.when(F.col("symbol_ratio") > max_symbol_ratio, "symbol_heavy"),
            F.when(F.col("bullet_ratio") > max_bullet_ratio, "bullet_heavy"),
            F.when(F.col("ellipsis_ratio") > max_ellipsis_ratio, "ellipsis_heavy"),
            F.when(F.col("alpha_word_ratio") < min_alpha_ratio, "non_alpha"),
            F.when(F.col("stopword_hits") < min_stopword_hits, "no_stopwords"),
        )
    )
    return feats.select(
        "*",
        F.array_join(reasons, ",").alias("reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


def hashing_vectorizer(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Feature hashing (the hashing-trick vectorizer): each token maps
    to bucket ``md5(tok) % dim``; with ``signed`` a second hash bit
    gives the occurrence a ±1 sign so collision noise is zero-mean
    (Weinberger et al.'s unbiased variant) — the fixed-width,
    vocabulary-free featurization step in front of linear models or
    similarity search, where :func:`build_vocab`'s id assignment would
    need a corpus-wide vocabulary broadcast.

    Output is the SPARSE form — (id, bucket, weight) triplets, weight =
    signed occurrence sum (possibly 0 or negative under collisions) or
    the plain term frequency — which is what a 100 TB corpus wants
    shuffled: dense dim-arrays would carry dim·n_docs cells of mostly
    zeros through the exchange. One token explode → one (id, bucket)
    aggregation with map-side combine; the md5 family keeps every
    bucket and sign reproducible in ANSI SQL (cross-engine stable,
    functions/hashing.py).
    """
    toks = fan_out(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    bucket = (md5_int(F.col("tok")) % dim).alias("bucket")
    if signed:
        from ..functions.hashing import seeded_hash

        sign = F.when(seeded_hash(F.col("tok"), 1) % 2 == 0, 1).otherwise(-1)
    else:
        sign = F.lit(1)
    return (
        toks.select(id_col, bucket, sign.alias("__s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("__s").alias("weight"))
    )


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-reading-ease-style readability score from deterministic
    proxies: syllables ≈ maximal vowel-group runs (``[aeiouy]+`` over
    the lowercased text — groups cannot span the space between words,
    so whole-text counting equals per-word counting in one regexp
    pass), sentences ≈ terminal-punctuation runs (min 1), and the
    published coefficient form

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).

    The complexity axis the length/stopword quality signals don't
    carry — flags token-salad (few vowels, huge "words") and run-on
    scrape text at opposite ends of the scale. Plain-character-class
    regexes only, so the Java and RE2 engines agree exactly; one
    narrow codegen'd map, scan-bound at any scale.
    Returns (id, n_words, n_sentences, n_syllables, flesch) — flesch
    rounded to 6, integer counts exact.
    """
    df = fan_out(df)
    low = F.lower(F.col(text_col))
    n_words = F.size(tokens(F.col(text_col)))
    n_syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.cast("int").alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Overlapping sliding-window chunker — the retrieval/RAG unit
    (q83's non-overlapping chunker is the sequence-packing unit; an
    embedding index wants overlap so no answer span straddles a chunk
    boundary unseen): chunk k covers tokens ``[k·stride,
    k·stride + chunk_tokens)``, one chunk per stride step while the
    start is inside the document, final chunks partial.

    A narrow per-row transform over the token array (sequence +
    slice + array_join — no join back, no shuffle: chunk rows explode
    from their own document row), so cost is output-token volume and
    the operator is scan-bound at 100 TB; downstream chunk-keyed work
    (embedding, chunk dedup via q156/q165 machinery) shuffles on
    (doc, chunk) naturally. Returns (id, chunk_id, n_tokens,
    chunk_text), deterministic for any stride ≤ chunk_tokens > 0.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("bigint").alias("chunk_id"),
            F.slice(toks, k * stride + 1, chunk_tokens).alias("__w"),
        ),
    )
    return (
        fan_out(df)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.__w").alias("n_tokens"),
            F.array_join("c.__w", " ").alias("chunk_text"),
        )
    )


def vocab_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Jensen–Shannon divergence between two corpora's word
    distributions (nats, with the [0, ln 2] bound) plus support
    accounting — the scalar "how different is this corpus from that
    one" that :func:`vocab_health`'s per-side ratios and
    ``refresh_report``'s population deltas can't give: the number that
    ranks candidate mixtures against a reference corpus before
    :func:`~..operators.sampling.mixing_weights` picks proportions.
    JSD over the MIXTURE m = (p+q)/2 is finite even on disjoint
    vocabularies (KL alone diverges on any word unique to one side).

    One word count per side, a full-outer join on the word (the union
    vocabulary — tokens, not documents, so the exchange is
    vocab-sized), per-word closed-form terms with the 0·ln 0 = 0
    convention, and a scalar finalization. Integer counts → fixed-order
    float terms. Returns one row: (n_words_a, n_words_b, vocab_a,
    vocab_b, vocab_shared, jsd_nats), 6-decimal.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            fan_out(df)
            .select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(a, "na"), counts(b, "nb")
    j = ca.join(cb, "tok", "full_outer").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    w = j.crossJoin(F.broadcast(tot))
    p = F.col("na").cast("double") / F.col("ta")
    q = F.col("nb").cast("double") / F.col("tb")
    m = (p + q) / 2
    term = (
        F.when(F.col("na") > 0, p * F.log(p / m) / 2).otherwise(F.lit(0.0))
        + F.when(F.col("nb") > 0, q * F.log(q / m) / 2).otherwise(F.lit(0.0))
    )
    return w.agg(
        F.max("ta").alias("n_words_a"),
        F.max("tb").alias("n_words_b"),
        F.sum((F.col("na") > 0).cast("bigint")).alias("vocab_a"),
        F.sum((F.col("nb") > 0).cast("bigint")).alias("vocab_b"),
        F.sum(((F.col("na") > 0) & (F.col("nb") > 0)).cast("bigint")).alias(
            "vocab_shared"
        ),
        F.round(F.sum(term), 6).alias("jsd_nats"),
    )


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2_share: float = 0.20,
    max_top3_share: float = 0.18,
    max_top4_share: float = 0.16,
    max_lines: int = 5000,
) -> DataFrame:
    """The REPETITION half of the published Gopher/MassiveText quality
    rules (Rae et al. 2021 §A1.1) — :func:`gopher_rules` covers the
    structural half; this detects looping/templated text: the fraction
    of duplicate LINES (count and character mass) and the share of
    tokens covered by the single most frequent {2,3,4}-gram, each with
    the published drop threshold and the same fixed-order
    ``reasons``/``keep`` contract. (Deviation, documented: n-gram
    coverage is measured in TOKENS — ``n·count(top)/n_tokens`` — not
    characters; the token form is scale-identical and avoids a second
    per-occurrence char walk.)

    Line features are one narrow map (array distinct over the line
    split — duplicate detection per doc is in-array, no shuffle; the
    char-mass pass sorts the line array once and folds a run-length
    state over it — O(L log L) per doc, r15 optimization: the previous
    per-line ``filter(lines, y == x)`` membership count was O(lines²)
    per doc and measured as the dominant cost of this operator at
    sf0.1; a run of r identical lines contributes r·length exactly as
    the old per-occurrence form did, so the numerator is bit-identical).
    ``max_lines`` stays MACHINE-ENFORCED as the per-row memory bound on
    the in-array sort (the _guard_series precedent, zero-copy
    assert_true filter); for a corpus where larger docs are legitimate,
    raise it deliberately.
    Top-n-gram features explode grams to a (doc, n, gram) count and
    take the per-doc argmax — corpus-token-scale shuffles with
    map-side combine (the q134 BPE-pair shape), grouped on the doc key
    so all three n values ride ONE exchange; only the top COUNT is
    kept, so gram-level ties are irrelevant by construction.
    """
    lines = F.split(F.col(text_col), "\n")
    # Zero-copy guard (the _guard_series pattern): assert_true is NULL
    # whenever it doesn't raise, so the filter is always-true on the
    # pass path and the line array is never rewritten per row.
    guard_msg = F.concat(
        F.lit("gopher_repetition: a document has "),
        F.size(lines).cast("string"),
        F.lit(
            f" lines, over max_lines={int(max_lines)} — the in-array "
            "dup-line char-mass pass is O(lines^2) per document; raise "
            "max_lines deliberately or pre-split pathological documents"
        ),
    )
    # Guard the lf branch only: every doc flows through it, so the
    # assert fires on any violation without re-splitting text in the
    # gram branch's predicate too. NULL text passes the guard (coalesce
    # to true): assert_true raises on a NULL condition, and a NULL doc
    # must keep flowing to the graceful keep-row path, not abort the
    # job with a message-less error (review finding, r10).
    # Duplicate-line char mass, linear form: sort the lines once, then
    # one O(L) fold tracks (previous line, current run length, mass);
    # a run of r > 1 identical lines adds r·length(line) — exactly the
    # per-occurrence sum of the quadratic membership-count form it
    # replaces (same integers, same NULL-text propagation: aggregate
    # over a NULL array is NULL).
    run_state = "struct<prev:string,run:bigint,mass:bigint>"
    close_run = lambda acc: F.when(  # noqa: E731 — flush the open run
        acc["run"] > 1, acc["mass"] + acc["run"] * F.length(acc["prev"])
    ).otherwise(acc["mass"])
    dup_char_mass = F.aggregate(
        F.array_sort(lines),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("mass"),
        ).cast(run_state),
        lambda acc, x: F.when(
            acc["prev"].eqNullSafe(x),
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["mass"].alias("mass"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"), F.lit(1).cast("bigint").alias("run"),
                close_run(acc).alias("mass"),
            )
        ),
        close_run,
    )
    lf = df.where(
        F.assert_true(
            F.coalesce(F.size(lines) <= F.lit(int(max_lines)), F.lit(True)),
            guard_msg,
        ).isNull()
    ).select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
            6,
        ).alias("dup_line_frac"),
        F.round(
            dup_char_mass.cast("double")
            / F.greatest(
                F.aggregate(
                    F.transform(lines, F.length),
                    F.lit(0).cast("bigint"),
                    lambda a, x: a + x,
                ),
                F.lit(1).cast("bigint"),
            ),
            6,
        ).alias("dup_line_char_frac"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    ws = tokens(F.col(text_col))

    # Factory, NOT a default-arg lambda: F.transform inspects lambda
    # arity and would call a 2-parameter lambda as (element, index),
    # silently rebinding the captured n to the index column.
    def _gram(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(ws, i + 1, n)).alias("gram"),
        )

    grams = df.select(
        F.col(id_col),
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.when(
                            F.size(ws) >= n,
                            F.transform(
                                F.sequence(F.lit(0), F.size(ws) - n), _gram(n)
                            ),
                        ).otherwise(
                            F.array().cast("array<struct<n:int,gram:string>>")
                        )
                        for n in (2, 3, 4)
                    ]
                )
            )
        ).alias("g"),
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    top = (
        grams.groupBy(id_col, "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n")
        .agg(F.max("c").alias("top_c"))
        .groupBy(id_col)
        .pivot("n", [2, 3, 4])
        .agg(F.first("top_c"))
        .select(
            F.col(id_col),
            F.col("2").alias("__t2"),
            F.col("3").alias("__t3"),
            F.col("4").alias("__t4"),
        )
    )
    feats = lf.join(top, id_col, "left").select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        "n_tokens",
        *[
            F.round(
                F.coalesce(F.col(f"__t{n}"), F.lit(0)).cast("double")
                * n
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias(f"top{n}_share")
            for n in (2, 3, 4)
        ],
    )
    checks = [
        (F.col("dup_line_frac") > max_dup_line_frac, "dup_lines"),
        (F.col("dup_line_char_frac") > max_dup_line_char_frac, "dup_line_chars"),
        (F.col("top2_share") > max_top2_share, "top_2gram"),
        (F.col("top3_share") > max_top3_share, "top_3gram"),
        (F.col("top4_share") > max_top4_share, "top_4gram"),
    ]
    rl = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for cond, name in checks]),
        lambda x: x.isNotNull(),
    )
    return feats.select(
        "*",
        F.coalesce(F.concat_ws(",", rl), F.lit("")).alias("reasons"),
        (F.size(rl) == 0).alias("keep"),
    )


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: the
    fraction of a document's DISTINCT word n-grams that appear nowhere
    in the reference — the scoring complement of q103's decontamination
    (which DROPS overlapping docs, this MEASURES how much of each doc
    is new). A refresh pipeline ranks incoming docs by novelty to
    prioritize genuinely new material; near-zero novelty means the doc
    is recombined boilerplate even when no single document matches it.

    Shape: both sides explode to distinct grams (whitespace tokens
    joined with ' ', the :func:`gopher_repetition` convention — built
    with an index lambda over ``sequence``, never a default-arg
    closure); the reference collapses to its DISTINCT gram set once;
    one gram-keyed LEFT join marks each doc gram found/not-found and a
    doc-keyed count finishes. Exchanges carry grams, never texts; a
    reference gram's duplication count never fans out (distinct before
    the join). Docs with fewer than ``n`` tokens emit 0 grams and NULL
    novelty. Returns (id_col, n_distinct_ngrams, n_novel, novelty).
    """
    ws = tokens(F.col(text_col))
    gram = lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n))  # noqa: E731

    def grams_of(df: DataFrame, with_id: bool):
        cols = [F.col(id_col)] if with_id else []
        g = df.select(
            *cols,
            F.explode(
                F.when(
                    F.size(ws) >= n,
                    F.transform(F.sequence(F.lit(0), F.size(ws) - n), gram),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("__gram"),
        )
        return g.distinct()

    doc_grams = grams_of(docs, True)
    ref_grams = grams_of(reference, False).withColumn("__hit", F.lit(1))
    marked = doc_grams.join(ref_grams, "__gram", "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias("n_novel"),
    )
    all_docs = docs.select(id_col).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_distinct_ngrams", F.lit(0)).alias("n_distinct_ngrams"),
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        F.when(
            F.col("n_distinct_ngrams").isNotNull(),
            F.round(
                F.col("n_novel").cast("double") / F.col("n_distinct_ngrams"), 6
            ),
        ).alias("novelty"),
    )


def collocation_llr(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Dunning log-likelihood-ratio collocations over adjacent token
    pairs — the robust standard for phrase discovery where raw PMI
    (:func:`q143`'s signal) over-rewards rare pairs: LLR weighs the
    full 2×2 contingency (pair observed / a-without-b / b-without-a /
    neither), so a pair must be both SURPRISING and well-attested to
    rank (Dunning 1993). Reported in BITS (log2 — the engine-wide
    cross-engine log convention; the classic ln form is this × ln 2,
    same ranking), as ``llr_bits = 2·[Σ xlogx(cells) − Σ xlogx(row
    margins) − Σ xlogx(col margins) + xlogx(N)]`` with x·log2(x)=0 at 0.

    Margins are over the BIGRAM event space (row = pairs starting with
    a, col = pairs ending with b, N = total pairs) — the correct table
    for "is the next word dependent on this one" (unigram counts would
    miscount doc-final tokens). Scale shape: one pair explode to (a,b)
    counts with map-side combine (the q134 BPE-pair shape), margins via
    two windows OVER THE PAIR-COUNT table (bigram-vocab scale, never
    the corpus), one broadcast total, TakeOrdered(top_k) — gram counts
    shuffle, text never does. Ordering tiebreak (llr DESC, a, b) makes
    top_k deterministic. All log operands are ratios/products of exact
    integer counts; 6-decimal rounding absorbs libm ulp.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array(F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    pair_counts = (
        fan_out(df)
        .select(F.explode(pair_arr).alias("p"))
        .select(F.col("p")[0].alias("a"), F.col("p")[1].alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    margins = pair_counts.select(
        "a", "b", "c_ab",
        F.sum("c_ab").over(wa).alias("__r1"),
        F.sum("c_ab").over(wb).alias("__c1"),
    )
    total = pair_counts.agg(F.sum("c_ab").alias("__n"))

    def xlx(k: F.Column) -> F.Column:
        kd = k.cast("double")
        return F.when(k > 0, kd * F.log2(kd)).otherwise(F.lit(0.0))

    k11 = F.col("c_ab")
    k12 = F.col("__r1") - k11
    k21 = F.col("__c1") - k11
    k22 = F.col("__n") - F.col("__r1") - F.col("__c1") + k11
    llr = F.lit(2.0) * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(F.col("__r1")) - xlx(F.col("__n") - F.col("__r1"))
        - xlx(F.col("__c1")) - xlx(F.col("__n") - F.col("__c1"))
        + xlx(F.col("__n"))
    )
    return (
        margins.where(F.col("c_ab") >= int(min_count))
        .crossJoin(F.broadcast(total))
        .select(
            "a", "b", "c_ab",
            F.col("__r1").alias("n_a_first"),
            F.col("__c1").alias("n_b_second"),
            F.round(llr, 6).alias("llr_bits"),
        )
        .orderBy(F.col("llr_bits").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(int(top_k))
    )


def char_class_report(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document character-class composition — the encoding/garbage
    screen a corpus QC runs next to :func:`with_quality_score` (which
    scores WORDS; this catches mojibake, binary-in-text, digit dumps,
    and wrong-script contamination at the CHARACTER level): fractions
    of ASCII letters, digits, whitespace, ASCII punctuation, and
    everything else (non-ASCII — the script/mojibake mass).

    A pure narrow map: each class count is one ``regexp_count`` over
    the text (anchored, deterministic ASCII classes — identical regex
    semantics across engines), fractions are exact-integer divisions
    in double. Zero-length docs emit NULL fractions, not 0/0. Returns
    (id, n_chars, letter_frac, digit_frac, space_frac, punct_frac,
    other_frac), 6 decimals; the five fractions sum to 1 on non-empty
    docs (asserted in the parity test).
    """
    t = F.col(text_col)
    n = F.length(t)
    classes = {
        "letter": "[A-Za-z]",
        "digit": "[0-9]",
        "space": r"[ \t\n\r]",
        "punct": r"[!-/:-@\[-`{-~]",
    }
    counts = {
        name: F.regexp_count(t, F.lit(pat)) for name, pat in classes.items()
    }
    known = None
    for c in counts.values():
        known = c if known is None else known + c
    fr = lambda c: F.when(n > 0, F.round(c.cast("double") / n, 6))  # noqa: E731
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        fr(counts["letter"]).alias("letter_frac"),
        fr(counts["digit"]).alias("digit_frac"),
        fr(counts["space"]).alias("space_frac"),
        fr(counts["punct"]).alias("punct_frac"),
        fr(n - known).alias("other_frac"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility report: characters per whitespace
    token and per BPE-ish regex token, and the regex/whitespace
    expansion ratio — the compression statistic tokenizer and
    data-mixing decisions hinge on (a source whose chars-per-token is
    2× another's costs 2× the context budget per unit of text; CJK and
    code skew exactly this way). Uses the SAME two counting
    conventions as q96 (:func:`with_regex_token_stats` — whitespace
    split and the letter-run/digit-run/punctuation pretokenizer), so
    the report is consistent with the per-doc counts.

    Pure narrow per-doc counting into ONE group-keyed aggregation of
    exact integer sums; the three ratios are single IEEE divisions of
    those integers (bit-identical cross-engine). Groups whose token
    count is zero emit NULL ratios. Returns (group, n_docs, n_chars,
    n_ws_tokens, n_regex_tokens, chars_per_ws_token,
    chars_per_regex_token, regex_per_ws_ratio), 6-decimal.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))
    # NULL text must contribute NULL (skipped by SUM) to every count —
    # bare F.size() returns -1 for NULL under non-ANSI Spark, which
    # would SUBTRACT from the token sums while the oracle's
    # len(string_split(...)) skips NULLs (review finding, r11).
    has_text = F.col(text_col).isNotNull()
    per_doc = df.select(
        F.col(group_col).alias("__g"),
        F.length(F.col(text_col)).cast("bigint").alias("__nc"),
        F.when(has_text, F.size(tokens(F.col(text_col))))
        .cast("bigint")
        .alias("__nw"),
        F.when(has_text, F.size(pieces)).cast("bigint").alias("__nr"),
    )
    agg = per_doc.groupBy(F.col("__g").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nc").alias("n_chars"),
        F.sum("__nw").alias("n_ws_tokens"),
        F.sum("__nr").alias("n_regex_tokens"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "n_chars",
        "n_ws_tokens",
        "n_regex_tokens",
        F.when(
            F.col("n_ws_tokens") > 0,
            F.round(F.col("n_chars").cast("double") / F.col("n_ws_tokens"), 6),
        ).alias("chars_per_ws_token"),
        F.when(
            F.col("n_regex_tokens") > 0,
            F.round(F.col("n_chars").cast("double") / F.col("n_regex_tokens"), 6),
        ).alias("chars_per_regex_token"),
        F.when(
            F.col("n_ws_tokens") > 0,
            F.round(
                F.col("n_regex_tokens").cast("double") / F.col("n_ws_tokens"), 6
            ),
        ).alias("regex_per_ws_ratio"),
    )


def token_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
) -> DataFrame:
    """Per-token burstiness: among documents that contain a token at
    all, what fraction contain it MORE than once — Church's adaptation
    observation ("the second occurrence is much cheaper than the
    first") as a per-token statistic. Content words repeat within the
    documents that use them (burstiness ≫ their corpus rate predicts);
    function words spread evenly; templated boilerplate maxes the
    metric — the screen that separates topical vocabulary from both,
    feeding the same curation decisions as :func:`vocab_health` and
    q230's repetition rules but at vocabulary granularity.

    ONE (token, doc) count (map-side combined — corpus token volume
    collapses to the doc-frequency frame immediately), one token-keyed
    aggregation; ratios are single IEEE divisions of exact integer
    counts. NULL texts contribute nothing; tokens below ``min_df``
    document-frequency are cut (the :func:`tfidf` min_df convention —
    singleton tokens make burstiness a coin flip). Returns
    (token, n_docs, n_docs_multi, total_count, burstiness,
    mean_count_per_doc), 6-decimal.
    """
    pairs = df.select(
        F.col(id_col).alias("__d"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).groupBy("__d", "token").agg(F.count(F.lit(1)).alias("__c"))
    agg = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("__c") >= 2).cast("bigint")).alias("n_docs_multi"),
        F.sum("__c").alias("total_count"),
    )
    return agg.where(F.col("n_docs") >= min_df).select(
        "token",
        "n_docs",
        "n_docs_multi",
        "total_count",
        F.round(
            F.col("n_docs_multi").cast("double") / F.col("n_docs"), 6
        ).alias("burstiness"),
        F.round(
            F.col("total_count").cast("double") / F.col("n_docs"), 6
        ).alias("mean_count_per_doc"),
    )


def heaps_law_fit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Heaps'-law fit over the per-group (token count, vocabulary size)
    points: least-squares slope β and intercept of
    ln V = ln C + β·ln N across groups — "how fast does vocabulary
    grow with corpus size here" (β ≈ 0.4–0.6 for natural text;
    β near 0 flags a closed templated vocabulary, β near 1 flags
    id-like token churn), the corpus-level companion to q106's vocab
    build and q162's vocab health. One row, plus the fit's R².

    Per-group token totals and distinct counts are exact integers (one
    token explode → two group-keyed aggregations sharing the exchange);
    each group's (ln N, ln V) pair quantizes to micro-units BEFORE the
    regression moments (the stats-family recipe — the transcendental
    step happens once per group, integer arithmetic after), and the
    closed-form OLS runs over exact DECIMAL(38,0) moments of the
    BOUNDED per-group rows into fixed-order IEEE divisions. Groups
    with zero tokens drop AT THE EXPLODE (they emit no token rows, so
    ln never sees them); < 2 usable groups or zero
    x-variance (all groups the same size) → NULL fit. Returns one row:
    (n_groups, heaps_beta, heaps_log_c, r2), 6-decimal.
    """
    dec = "decimal(38,0)"
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    )
    # zero-token groups never reach the groupBy (explode emits no rows
    # for them), so every __n here is >= 1 and ln() is defined
    per = toks.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col("__t")).alias("__v"),
    )
    pts = per.select(
        F.round(F.log(F.col("__n").cast("double")) * scale).cast(dec).alias("__x"),
        F.round(F.log(F.col("__v").cast("double")) * scale).cast(dec).alias("__y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("n_groups").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    beta = cov / vx
    ok = (F.col("n_groups") >= 2) & (vx > 0)
    return mom.select(
        "n_groups",
        F.when(ok, F.round(beta, 6)).alias("heaps_beta"),
        # intercept in the micro-unit log space, rescaled once
        F.when(ok, F.round((sy - beta * sx) / n / F.lit(float(scale)), 6)).alias(
            "heaps_log_c"
        ),
        F.when(ok & (vy > 0), F.round(cov * cov / (vx * vy), 6)).alias("r2"),
    )


def mojibake_report(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source encoding-damage report — the cleaning gate that runs
    BEFORE language-ID/quality scoring (mojibake inflates OOV rates and
    poisons n-gram statistics silently): counts the classic markers of
    a decode gone wrong — U+FFFD replacement characters, raw C0/DEL
    control bytes that survived into text, and the ``â€``-family
    UTF-8-read-as-Latin-1 digraphs — plus the informational ``Ã``
    count (NOT flagged alone: "São" is legitimate text).

    All counts are exact integer length deltas (replace/regexp strips —
    the q267 char-class machinery), so the per-source rollup is pure
    integer sums into one final rate division. A NULL text counts as an
    empty document (coalesced, not dropped — the corpus-accounting
    convention). Returns one row per source:
    (source, n_docs, n_flagged, n_replacement, n_control, n_utf8_digraph,
    n_a_tilde, markers_per_kchar).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))

    def count_sub(sub: str, width: int) -> F.Column:
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(sub)))) / F.lit(width)
        ).cast("bigint")

    n_repl = count_sub("�", 1)
    n_seq = count_sub("â€", 2)
    n_atilde = count_sub("Ã", 1)
    n_ctrl = (
        F.length(t)
        - F.length(
            F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
        )
    ).cast("bigint")
    per_doc = df.select(
        source_col,
        F.length(t).cast("bigint").alias("__len"),
        n_repl.alias("__repl"),
        n_ctrl.alias("__ctrl"),
        n_seq.alias("__seq"),
        n_atilde.alias("__at"),
    )
    flagged = (F.col("__repl") + F.col("__ctrl") + F.col("__seq")) > 0
    g = per_doc.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(flagged.cast("int")).cast("bigint").alias("n_flagged"),
        F.sum("__repl").cast("bigint").alias("n_replacement"),
        F.sum("__ctrl").cast("bigint").alias("n_control"),
        F.sum("__seq").cast("bigint").alias("n_utf8_digraph"),
        F.sum("__at").cast("bigint").alias("n_a_tilde"),
        F.sum("__len").cast("bigint").alias("__chars"),
    )
    markers = F.col("n_replacement") + F.col("n_control") + F.col("n_utf8_digraph")
    return g.select(
        source_col,
        "n_docs",
        "n_flagged",
        "n_replacement",
        "n_control",
        "n_utf8_digraph",
        "n_a_tilde",
        F.when(
            F.col("__chars") > 0,
            F.round(markers.cast("double") * 1000 / F.col("__chars"), 6),
        ).alias("markers_per_kchar"),
    )


def bigram_conditional_entropy(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source conditional entropy H(next token | token) — the
    PREDICTABILITY of a corpus's local word order, the second-order
    companion to :func:`word_entropy` (unigram diversity): looping or
    templated text has near-zero conditional entropy even when its
    unigram entropy looks healthy, which is exactly the failure mode
    repetition filters miss when the repeated unit is a whole phrase.

    H = −Σ_{xy} (c_xy/N)·log2(c_xy/c_x) over whitespace bigrams, with
    the prefix counts c_x derived FROM the bigram counts (so both
    marginals describe the same pair population — no off-by-last-token
    drift). Exactness: counts are integers, each c_xy·log2(c_xy/c_x)
    term is micro-quantized half-up before summation (the q278
    quantized-log convention), and the finalize is integer operands
    into two divisions. Documents with fewer than 2 tokens contribute
    no bigrams. Returns
    (source, n_bigrams, n_bigram_types, n_prefix_types,
    cond_entropy_bits).
    """
    toks = df.where(F.col(text_col).isNotNull()).select(
        source_col, tokens(F.col(text_col)).alias("__a")
    )
    big = (
        toks.where(F.size("__a") >= 2)
        .select(
            source_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__a) - 1), "
                    "i -> struct(__a[i-1] AS x, __a[i] AS y))"
                )
            ).alias("__b"),
        )
        .select(source_col, F.col("__b.x").alias("__x"), F.col("__b.y").alias("__y"))
    )
    cxy = big.groupBy(source_col, "__x", "__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cxy")
    )
    cx = cxy.groupBy(source_col, "__x").agg(F.sum("__cxy").alias("__cx"))
    j = cxy.join(cx, [source_col, "__x"]).select(
        source_col,
        "__x",
        "__cxy",
        F.round(
            F.col("__cxy")
            * F.log2(F.col("__cxy").cast("double") / F.col("__cx"))
            * 1_000_000
        )
        .cast("bigint")
        .alias("__t"),
    )
    return j.groupBy(source_col).agg(
        F.sum("__cxy").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"),
        F.countDistinct("__x").cast("bigint").alias("n_prefix_types"),
        F.round(
            -F.sum("__t").cast("double") / 1_000_000 / F.sum("__cxy"), 6
        ).alias("cond_entropy_bits"),
    )


def template_prefix_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-source template detection over document OPENINGS and
    CLOSINGS: the most common first-k-token prefix and last-k-token
    suffix, their document shares, and the distinct-prefix ratio — the
    boilerplate screen that catches what token-level frequency
    (:func:`remove_boilerplate_tokens`) can't: a source whose docs all
    START with the same cookie banner / license header / nav block has
    a top_prefix_share near 1 and a distinct_prefix_ratio near 0, the
    signature of scraped template pages a curation pipeline strips or
    caps before training.

    Shape: ONE narrow per-doc map builds the k-token prefix/suffix
    strings (JVM split/slice/join — no UDF, no token explode), two
    (source, gram) counts collapse to bounded per-source candidate
    frames, and the top-1 per source is a rank over the count frame
    with ties broken lexicographically (both engines). Docs with NULL
    text are excluded; docs shorter than k tokens contribute their
    whole text (slice caps at length). Returns one row per source:
    (source, n_docs, top_prefix, top_prefix_n, top_prefix_share,
    distinct_prefix_ratio, top_suffix, top_suffix_n,
    top_suffix_share), 6-decimal shares.
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    pre = F.array_join(F.slice(toks, 1, k), " ")
    suf = F.array_join(
        F.when(F.size(toks) <= k, toks).otherwise(F.slice(toks, -k, k)), " "
    )
    pool = df.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("__s"),
        pre.alias("__pre"),
        suf.alias("__suf"),
    )

    def top1(frame: DataFrame, gram: str, out_g: str, out_n: str) -> DataFrame:
        counts = frame.groupBy("__s", gram).agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
        w = Window.partitionBy("__s").orderBy(
            F.col("__c").desc(), F.col(gram).asc()
        )
        return (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "__s", F.col(gram).alias(out_g), F.col("__c").alias(out_n)
            )
        )

    base = pool.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("__pre").cast("bigint").alias("__dp"),
    )
    tp = top1(pool, "__pre", "top_prefix", "top_prefix_n")
    ts = top1(pool, "__suf", "top_suffix", "top_suffix_n")
    return (
        base.join(tp, "__s")
        .join(ts, "__s")
        .select(
            F.col("__s").alias(source_col),
            "n_docs",
            "top_prefix",
            "top_prefix_n",
            F.round(
                F.col("top_prefix_n").cast("double") / F.col("n_docs"), 6
            ).alias("top_prefix_share"),
            F.round(F.col("__dp").cast("double") / F.col("n_docs"), 6).alias(
                "distinct_prefix_ratio"
            ),
            "top_suffix",
            "top_suffix_n",
            F.round(
                F.col("top_suffix_n").cast("double") / F.col("n_docs"), 6
            ).alias("top_suffix_share"),
        )
    )


_CODE_SYMBOLS = r"[{}()\[\];=<>&|#*]"
_CODE_KEYWORDS = (
    r"\b(def|class|import|return|function|var|const|void|public|static|"
    r"printf|include|lambda|elif|endif|struct|typedef)\b"
)


def code_detect_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    symbol_threshold: float = 0.03,
    keyword_threshold: float = 0.01,
) -> DataFrame:
    """Code-vs-prose screen per source: symbol-character density
    (brackets/operators per char), programming-keyword density (per
    whitespace token), and the fraction of documents tripping either
    threshold — the "is this source secretly a code dump" readout a
    data-mixing stage needs BEFORE setting language weights (code in
    the prose mix skews tokenizer fertility q286 and quality scores
    q113; prose in the code mix starves syntax). Heuristic by design —
    a classifier would need labels; these two densities are the
    standard cheap separators.

    ONE narrow per-doc pass (JVM length/regexp_replace/regexp_count —
    no UDF, no explode): symbol count = length delta after stripping
    the symbol class, keyword count = global regex count; per-doc
    densities micro-quantize half-up BEFORE the exact per-source sums
    (the family recipe), so means are single divisions over integers.
    Docs with NULL or empty text are excluded (no density exists).
    Returns (source, n_docs, code_docs, code_frac,
    mean_symbol_density, mean_keyword_density), 6-decimal.
    """
    txt = F.col(text_col)
    pool = df.where(txt.isNotNull() & (F.length(txt) > 0)).select(
        F.col(source_col).alias("__s"),
        F.length(txt).cast("bigint").alias("__nc"),
        (
            F.length(txt)
            - F.length(F.regexp_replace(txt, _CODE_SYMBOLS, ""))
        ).cast("bigint").alias("__sym"),
        F.regexp_count(txt, F.lit(_CODE_KEYWORDS)).cast("bigint").alias("__kw"),
        F.size(F.split(txt, " ")).cast("bigint").alias("__nt"),
    )
    sd = F.col("__sym").cast("double") / F.col("__nc")
    kd = F.col("__kw").cast("double") / F.col("__nt")
    scored = pool.select(
        "__s",
        F.round(sd * 1_000_000).cast("bigint").alias("__qsd"),
        F.round(kd * 1_000_000).cast("bigint").alias("__qkd"),
        (
            (sd >= F.lit(float(symbol_threshold)))
            | (kd >= F.lit(float(keyword_threshold)))
        ).cast("bigint").alias("__code"),
    )
    agg = scored.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__code").cast("bigint").alias("code_docs"),
        F.sum("__qsd").alias("__ssd"),
        F.sum("__qkd").alias("__skd"),
    )
    return agg.select(
        F.col("__s").alias(source_col),
        "n_docs",
        "code_docs",
        F.round(F.col("code_docs").cast("double") / F.col("n_docs"), 6).alias(
            "code_frac"
        ),
        F.round(
            F.col("__ssd").cast("double") / F.col("n_docs") / 1_000_000, 6
        ).alias("mean_symbol_density"),
        F.round(
            F.col("__skd").cast("double") / F.col("n_docs") / 1_000_000, 6
        ).alias("mean_keyword_density"),
    )


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage as a function of the frequency cutoff: for
    every DISTINCT token frequency f, how many vocabulary types occur
    ≥ f times and what share of the corpus' token MASS they cover —
    the curve a tokenizer/vocab budget decision reads ("a 30k vocab
    covers 97% of tokens; the long tail buys 3%"): the cumulative
    complement of :func:`build_vocab`'s top-k cut and the corpus-level
    view behind :func:`vocab_health`'s scalar ratios.

    Shape: one token count (map-side combined), collapsed AGAIN to the
    count-of-counts frame (one row per distinct frequency — the
    Zipf-tail frame, bounded far below vocab size), then ONE
    :func:`~.stats._ranged_cumsum` pass over the frequency axis gives
    both cumulative types and cumulative mass with no global sort.
    Mass accumulates in exact bigint (token totals fit to 9.2e18).
    Returns one row per distinct frequency, descending-coverage:
    (min_count, n_types_at, types_ge, mass_ge, coverage), 6-decimal;
    coverage at the smallest frequency is exactly 1.
    """
    from .stats import _ranged_cumsum

    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    freq = toks.groupBy("__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
        (F.count(F.lit(1)) * F.col("__c")).cast("bigint").alias("__mass"),
    )
    cum = _ranged_cumsum(freq, "__c", ["__nt", "__mass"])
    tot = cum.agg(
        F.max("__cum___nt").alias("__v"), F.max("__cum___mass").alias("__m")
    )
    j = cum.crossJoin(F.broadcast(tot))
    types_ge = F.col("__v") - (F.col("__cum___nt") - F.col("__nt"))
    mass_ge = F.col("__m") - (F.col("__cum___mass") - F.col("__mass"))
    return j.select(
        F.col("__c").alias("min_count"),
        F.col("__nt").alias("n_types_at"),
        types_ge.cast("bigint").alias("types_ge"),
        mass_ge.cast("bigint").alias("mass_ge"),
        F.round(mass_ge.cast("double") / F.col("__m"), 6).alias("coverage"),
    )


def casing_report(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    shout_threshold: float = 0.3,
    min_alpha_tokens: int = 5,
) -> DataFrame:
    """Token-casing profile per source: ALL-CAPS and Title-Case token
    fractions plus a count of "shouting" documents (ALL-CAPS fraction
    over ``shout_threshold`` among docs with at least
    ``min_alpha_tokens`` alphabetic tokens) — the casing complement to
    :func:`char_class_report` (which counts character classes; two
    corpora with identical letter ratios can still differ wildly in
    HEADLINE STYLE vs sentence case) and a cheap screen for
    scraped-navigation/forum-shout noise before training.

    Definitions are pure string predicates over the shared
    :func:`tokens` split (narrow codegen, no regex extraction loop):
    a token is alphabetic when lower(t) ≠ upper(t) (has at least one
    cased letter — digits/punctuation-only tokens don't dilute the
    fractions), ALL-CAPS when t = upper(t), Title-Case when it is not
    ALL-CAPS and its first character upper-cases itself. Per-doc
    counts reduce inside one higher-order fold; fractions are exact
    integer ratios finalized once, 6-decimal. Returns
    (source, n_docs, n_alpha_tokens, allcaps_frac, titlecase_frac,
    n_shouting_docs).
    """
    toks = tokens(F.col(text_col))

    def count_if(pred) -> Column:
        return F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.when(pred(t), 1).otherwise(0),
        )

    def is_alpha(t):
        return F.lower(t) != F.upper(t)

    def is_caps(t):
        return is_alpha(t) & (t == F.upper(t))

    def is_title(t):
        first = F.substring(t, 1, 1)
        return (
            is_alpha(t)
            & (t != F.upper(t))
            & (first == F.upper(first))
            & (first != F.lower(first))
        )

    per = df.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        count_if(is_alpha).alias("__na"),
        count_if(is_caps).alias("__nc"),
        count_if(is_title).alias("__nt"),
    )
    shout = (
        (F.col("__na") >= min_alpha_tokens)
        & (
            F.col("__nc").cast("double")
            >= F.lit(float(shout_threshold)) * F.col("__na").cast("double")
        )
    ).cast("int")
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__na").cast("bigint").alias("n_alpha_tokens"),
        F.sum("__nc").alias("__sc"),
        F.sum("__nt").alias("__st"),
        F.sum(shout).cast("bigint").alias("n_shouting_docs"),
    )
    # the fractions are exact integer ratios: the floor(x·10⁶ + 0.5)
    # recipe is the cross-engine half-up round (F.round's BigDecimal
    # path and a float-multiply round() disagree on .5 boundaries)
    def r6(c):
        return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000

    return agg.select(
        "source",
        "n_docs",
        "n_alpha_tokens",
        F.when(
            F.col("n_alpha_tokens") > 0,
            r6(F.col("__sc").cast("double") / F.col("n_alpha_tokens")),
        ).alias("allcaps_frac"),
        F.when(
            F.col("n_alpha_tokens") > 0,
            r6(F.col("__st").cast("double") / F.col("n_alpha_tokens")),
        ).alias("titlecase_frac"),
        "n_shouting_docs",
    )


def distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 10,
    alpha0: float = 500.0,
    min_count: int = 3,
) -> DataFrame:
    """Fightin'-Words distinctive terms per source (Monroe/Colaresi/
    Quinn 2008: log-odds-ratio with an informative Dirichlet prior,
    z-scored): for each source, the top-``k`` tokens most
    OVER-represented against the rest of the corpus — the token-level
    "what makes this source different" readout that
    :func:`vocab_divergence` (one scalar per corpus pair) and
    :func:`tfidf` (within-document salience, no uncertainty) can't
    give. The prior (corpus frequencies scaled to ``alpha0``
    pseudo-counts) shrinks rare-token odds toward zero and the
    variance term 1/(y_iw+a_w) + 1/(y_jw+a_w) kills the
    low-count false positives raw log-odds rankings drown in.

    One (source, token) count aggregation feeds everything; corpus
    totals re-aggregate from the SAME frame (never a second token
    explode); the rest-of-corpus counts are the closed-form
    differences y_w − y_iw / n − n_i (no anti-join); every δ/σ²/z is
    ONE fixed-order double expression over exact integer counts —
    both engines compute identical doubles, so the per-source
    (z desc, token asc) top-k rank is deterministic, and z rounds
    with the sign-symmetric floor recipe. Tokens under ``min_count``
    in the source are excluded (documented — the prior already
    shrinks them; the cut keeps the candidate frame lean). Degenerate
    limit (documented): a source consisting of ONE repeated token
    that is also the entire corpus drives the first odds denominator
    to zero (infinite log-odds) — both engines produce the same ±inf,
    but the statistic is meaningless there, as it is in the original
    formulation. Returns
    (source, token, n_source, n_rest, log_odds_z, rank).
    """
    from pyspark.sql import Window

    from ..plans.inspect import tracked_persist

    toks = df.where(
        F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
    ).select(
        F.col(source_col).alias("__s"),
        F.explode(tokens(F.col(text_col))).alias("__w"),
    ).where(F.col("__w") != "")
    # the (source, token) cells feed the corpus token totals, the
    # per-source totals, and the scored frame — tracked_persist once;
    # the returned frame is lazy, so release is the CALLER's
    # release_intermediates() (the _doubled_midrank_map convention)
    cells = tracked_persist(
        toks.groupBy("__s", "__w").agg(
            F.count(F.lit(1)).cast("bigint").alias("__y")
        )
    )
    word_tot = cells.groupBy("__w").agg(F.sum("__y").alias("__yw"))
    src_tot = cells.groupBy("__s").agg(F.sum("__y").alias("__ni"))
    n_total = int(
        cells.agg(F.coalesce(F.sum("__y"), F.lit(0)).alias("n")).first()["n"]
    )
    if n_total == 0:
        return df.sparkSession.createDataFrame(
            [],
            "source string, token string, n_source bigint, n_rest bigint, "
            "log_odds_z double, rank int",
        )
    a0 = float(alpha0)
    scored = (
        cells.where(F.col("__y") >= int(min_count))
        .join(word_tot, "__w")
        .join(src_tot, "__s")
    )
    n_lit = F.lit(float(n_total))
    aw = F.lit(a0) * F.col("__yw") / n_lit
    yi = F.col("__y").cast("double")
    yj = (F.col("__yw") - F.col("__y")).cast("double")
    ni = F.col("__ni").cast("double")
    nj = n_lit - F.col("__ni")
    # fixed operand order throughout — the oracle mirrors it verbatim
    delta = (
        F.log((yi + aw) / (ni + F.lit(a0) - yi - aw))
        - F.log((yj + aw) / (nj + F.lit(a0) - yj - aw))
    )
    var = F.lit(1.0) / (yi + aw) + F.lit(1.0) / (yj + aw)
    z = delta / F.sqrt(var)
    w = Window.partitionBy("__s").orderBy(F.col("__z").desc(), F.col("__w").asc())
    out = (
        scored.select(
            "__s", "__w",
            F.col("__y").alias("n_source"),
            (F.col("__yw") - F.col("__y")).cast("bigint").alias("n_rest"),
            z.alias("__z"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            F.col("__s").alias("source"),
            F.col("__w").alias("token"),
            "n_source",
            "n_rest",
            (
                F.signum(F.col("__z"))
                * F.floor(F.abs(F.col("__z")) * 1_000_000 + F.lit(0.5))
                / 1_000_000
            ).alias("log_odds_z"),
            "rank",
        )
    )
    return out


def bigram_surprise(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram surprisal under the CORPUS bigram language
    model (add-1 smoothed) — the sequence-aware quality score the
    unigram logprob (q108) can't give: a doc made of common words in
    impossible orders scores high surprise, spam that repeats one
    frequent bigram scores low. bits_per_bigram is the doc's
    cross-entropy against the corpus; the training-data analogue of
    "score every document with a small LM and cut the tails".

    Model and exactness: the model is the corpus (prev, next) count
    table with add-1 smoothing over the full token vocabulary V
    (P = (c_fw + 1)/(c_f + V), c_f = the first-token bigram total —
    the standard conditional completion, so unseen continuations are
    priceable). Surprisal quantizes ONCE per bigram TYPE as
    round_half_up(−log₂P·10⁶) micro-bits in a fixed-order double
    expression; each doc's total is then the exact integer sum of its
    instance counts × type surprisals — identical integers on both
    engines, ONE division per doc. Docs with < 2 tokens have no
    bigrams and emit no row (documented).

    Scale shape: bigrams come from ONE JVM-side arrays_zip of two
    array slices (no posexplode self-join — a single explode of the
    zipped pairs); the model is a bigram-type aggregation (bounded by
    distinct bigrams, with map-side combine) joined back onto
    per-(doc, bigram) counts by type; V and the total arrive as one
    broadcast row. No Python, no windows over token volume, no
    driver state. Returns (id, group, n_bigrams, bits_per_bigram).
    """
    dec = "decimal(38,0)"
    toks = tokens(F.col(text_col))
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        toks.alias("__tk"),
    ).where(F.size("__tk") >= 2)
    n = F.size("__tk")
    pairs = base.select(
        "__id",
        "__g",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__tk"), 1, n - 1).alias("f"),
                F.slice(F.col("__tk"), 2, n - 1).alias("w"),
            )
        ).alias("__bg"),
    ).select(
        "__id", "__g",
        F.col("__bg.f").alias("__f"), F.col("__bg.w").alias("__w"),
    )
    doc_counts = pairs.groupBy("__id", "__g", "__f", "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__dc")
    )
    model = pairs.groupBy("__f", "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    # V = full token vocabulary (all positions), the smoothing support
    vocab = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .agg(F.countDistinct("__t").cast("bigint").alias("__v"))
    )
    wrow = Window.partitionBy("__f")
    scored = model.withColumn(
        "__cf", F.sum("__c").over(wrow).cast("bigint")
    ).crossJoin(F.broadcast(vocab)).select(
        "__f",
        "__w",
        F.floor(
            -F.log2(
                (F.col("__c") + F.lit(1)).cast("double")
                / (F.col("__cf") + F.col("__v")).cast("double")
            )
            * 1_000_000
            + F.lit(0.5)
        ).cast("bigint").alias("__q"),
    )
    per_doc = (
        doc_counts.join(scored, ["__f", "__w"])
        .groupBy("__id", "__g")
        .agg(
            F.sum("__dc").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("__dc").cast(dec) * F.col("__q")).alias("__bits2"),
        )
    )
    bits = (
        F.col("__bits2").cast("double")
        / F.col("n_bigrams").cast("double")
        / 1_000_000
    )
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        "n_bigrams",
        h6(bits).alias("bits_per_bigram"),
    )
