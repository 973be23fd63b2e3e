"""Text analysis operators for LLM-data pipelines (SURVEY.md §2b X5/X6).

All hot-path logic is built-in Catalyst expressions (split / regexp /
aggregate / transform) — no Python UDFs — so these run whole-stage
codegen'd over 100 TB of documents. Tokenization convention: a BPE-ish
regex (word pieces + standalone punctuation) shared by every operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# word pieces or single non-space punctuation — the "BPE-ish" splitter
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

# tiny in-engine stopword profiles for the language-ID heuristic
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "für", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
}

_STOPWORDS = sorted({w for ws in _LANG_PROFILES.values() for w in ws})


def tokens(text_col: str = "text") -> Column:
    """Tokenize with the shared BPE-ish regex; empty strings dropped."""
    return F.filter(
        F.split(F.col(text_col), r"\s+"),
        lambda t: t != "",
    )


def regex_tokens(text_col: str = "text") -> Column:
    """Regex token extraction (word pieces + punctuation marks)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document stats: chars, whitespace tokens, regex tokens, avg token
    length, punctuation / digit / whitespace ratios. All built-ins.

    The token split is inlined (~4 evaluations per row); staging it as
    a column like ``gopher_quality_filter`` does was measured a WASH
    here (r14, 7-pair interleaved A/B) — the extra projection's array
    materialization costs what the re-evaluation saves at this fan-out.
    """
    toks = tokens(text_col)
    n_chars = F.length(text_col).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(regex_tokens(text_col)).cast("long").alias("n_pieces"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("avg_token_len"),
        F.round(
            (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")))
            / F.greatest(n_chars, F.lit(1)).cast("double"),
            4,
        ).alias("punct_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", "")))
            / F.greatest(n_chars, F.lit(1)).cast("double"),
            4,
        ).alias("digit_ratio"),
    )


def grouped_text_stats(
    df: DataFrame, group_cols=("lang", "source"), text_col: str = "text"
) -> DataFrame:
    """Per-(lang, source) aggregates (SURVEY.md X6)."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
            F.round(F.avg(F.length(text_col)), 4).alias("avg_chars"),
            F.round(F.avg(F.size(tokens(text_col))), 4).alias("avg_tokens"),
        )
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality score in [0,1] — the classic pretraining-data
    filters (length band, stopword hit rate, punctuation sanity,
    repetition). Deterministic, fully expression-based.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _STOPWORDS])))
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    len_ok = (n_tok >= 5) & (n_tok <= 100000)
    punct = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ) / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_hits > 0, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.least(uniq_ratio, F.lit(1.0)) * 0.2
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 4).alias("uniq_token_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic class, SURVEY.md §2b).

    Scores each language by profile-word hits in the token set; argmax
    with deterministic lexicographic tie-break. Pure built-ins
    (array_intersect against broadcast literal arrays).

    The token array is inlined (one evaluation per language profile,
    4× today); the gopher-style staged-projection rewrite was measured
    SLOWER here (r14, 7-pair interleaved A/B, staged lost 0/7, min
    0.31 → 0.39 s) — at this fan-out the staged array's
    materialization costs more than the re-evaluation it saves, the
    same crossover ``text_stats``/``c4_clean`` measured.
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(
                "hits"
            ),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(_LANG_PROFILES.items(), reverse=True)
    ]
    # array_max on structs: max by hits, then (reverse-sorted input) the
    # lexicographically-smallest lang wins ties deterministically
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("profile_hits"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized token
    stream (rolling-hash-class content identity; md5 exists in both Spark
    and DuckDB so the oracle can replicate it exactly)."""
    norm = F.concat_ws(
        " ", F.transform(tokens(text_col), lambda t: F.lower(t))
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.sha2(norm, 256).alias("sha256"),
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """(id, avg_logprob, n_tokens): mean add-k-smoothed unigram
    log-probability of each document under the corpus's own empirical
    token distribution — the cheap stand-in for the perplexity filters
    corpus curation runs (outlier docs score far from the corpus mode;
    filter both tails).

    Scale shape: the frequency table is one groupBy over exploded tokens
    (Zipf skew absorbed by map-side partial agg); scoring is an
    equi-join on the token plus a per-doc avg. The one-row totals join
    is a broadcast. Everything is built-ins — fully oracle-able.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("freq"))
    tot = freq.agg(
        F.sum("freq").cast("double").alias("_total"),
        F.count("*").cast("double").alias("_vocab"),
    )
    lp = F.log(
        (F.col("freq") + F.lit(float(smoothing)))
        / (F.col("_total") + F.lit(float(smoothing)) * F.col("_vocab"))
    )
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style per-document repetition signals: duplicate-word
    fraction and most-frequent-bigram share. High values flag the
    degenerate boilerplate/spam documents corpus curation drops.

    Returns (id, n_words, n_distinct, dup_word_frac, top_bigram_frac).

    Scale shape: word counts are pure per-row projections (no shuffle);
    the bigram mode needs a groupBy(doc, gram) count + per-doc max — two
    shuffles keyed by doc_id, each with map-side partials, cardinality
    bounded by corpus token count. All fractions are ratios of integers
    in double, so the values are engine-exact (oracle-able bit-for-bit).
    """
    ws = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    base = df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        ws.alias("_ws"),
    )
    # adjacent-pair bigrams built array-side: zip words with their tail.
    # zip_with pads the shorter side with null, so the zipped array's
    # last element is the lone (w_n, null) pair — slice it off.
    zipped = F.zip_with(
        F.col("_ws"),
        F.slice(F.col("_ws"), 2, F.greatest(F.size("_ws") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigrams = F.slice(zipped, 1, F.greatest(F.size("_ws") - 1, F.lit(0)))
    bc = (
        base.select(id_col, F.explode(bigrams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(
            F.max("_c").alias("_maxc"),
            F.sum("_c").alias("_totb"),
        )
    )
    return (
        base.drop("_ws")
        .join(bc, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    F.lit(1.0)
                    - F.col("n_distinct") / F.col("n_words").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce(
                    F.col("_maxc") / F.col("_totb").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the word distribution —
    the third Gopher repetition axis: near-zero entropy means one token
    dominates. Returns (id, n_tokens, entropy).

    Computed as log2(n) - sum(c*log2(c))/n so the floating-point shape
    is identical in any engine (c and n are exact integers; the only
    inexact steps are the log2 calls and one final division).
    Scale shape: explode → groupBy(doc, token) with map-side combine →
    per-doc agg; shuffle cardinality = corpus token count.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("token"),
    )
    per_tok = toks.groupBy(id_col, "token").agg(F.count("*").alias("_c"))
    return per_tok.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.round(
            F.log2(F.sum("_c").cast("double"))
            - F.sum(F.col("_c").cast("double") * F.log2(F.col("_c").cast("double")))
            / F.sum("_c").cast("double"),
            5,
        ).alias("entropy"),
    )


def chunk_tokens(
    df: DataFrame,
    max_len: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token chunks — the packing
    step that turns raw documents into training examples with a max
    sequence length. ``stride < max_len`` yields overlapping windows.

    Returns (id, chunk_id, start_tok, n_chunk_tokens, chunk_text); a
    document shorter than ``max_len`` yields one chunk. Deterministic
    and purely positional: chunk_id = (start-1)/stride needs no window
    function or ordinal shuffle — the whole operator is a per-row
    projection + explode, so it scales as a map-only stage at any
    corpus size.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    stride = int(stride or max_len)
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col), ws.alias("_ws"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("_ws"), F.lit(1)), F.lit(stride)
    )
    piece = F.slice(F.col("_ws"), F.col("start_tok").cast("int"), max_len)
    return (
        base.select(id_col, "_ws", F.explode(starts).alias("start_tok"))
        .select(
            F.col(id_col),
            ((F.col("start_tok") - 1) / stride).cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def token_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token frequency (explode → count). The shuffle key is
    the token itself; AQE handles the inevitable Zipf skew."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Corpus document-frequency / IDF table: the ``top_n`` terms by df.

    The corpus half of tf-idf, the standard weighting for term-based
    quality filters and keyword extraction in training-data pipelines.
    Per-doc distinct terms (map-side ``array_distinct``) → one
    ``groupBy(term)`` count with map-side combine → TakeOrderedAndProject
    for the top slice. 100-TB shape: shuffle cardinality is vocabulary
    size, not corpus size; smoothed idf = ln((N+1)/(df+1)).
    """
    n_docs = df.count()
    toks = df.select(
        F.explode(
            F.array_distinct(F.transform(tokens(text_col), F.lower))
        ).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .withColumn(
            "idf",
            F.round(
                F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1)).cast("double")),
                4,
            ),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(top_n)
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranked retrieval over the corpus for one term query —
    the Lucene variant with +1 inside the idf log so every weight is
    positive: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    The retrieval pass a training-data pipeline runs for contamination
    probes and targeted corpus slicing. 100-TB shape: corpus stats
    (N, avgdl) are one tiny aggregate (a single driver row); the
    explode is filtered to the query's terms BEFORE the tf shuffle, so
    the groupBy key space is |matching docs|·|query terms|, not the
    vocabulary; per-term df is a second tiny agg over that same
    filtered frame, broadcast back; the final cut is
    orderBy+limit (TakeOrderedAndProject — per-partition top-n, no
    single-task global window). Ranking is on the ROUNDED score with
    doc-id tie-break, so the cut is reproducible across engines.
    """
    terms = sorted({str(t).lower() for t in query_terms})
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(text_col), F.lower).alias("toks"),
    ).select("doc_id", F.size("toks").cast("double").alias("dl"), "toks")
    n_docs, avgdl = d.agg(
        F.count("*").cast("double"), F.avg("dl")
    ).first()  # ONE row of corpus stats — bounded driver traffic
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    wt = idf * F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .select("doc_id", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(top_n)
    )


def bm25_rank_batch(
    df: DataFrame,
    probes: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
    terms_col: str = "terms",
) -> DataFrame:
    """BM25 for a DATAFRAME of term queries at once — the production
    shape of contamination probing, where thousands of probe strings
    are ranked against the corpus in ONE job instead of a driver-side
    loop over ``bm25_rank`` (each iteration of which is its own round
    of corpus scans). Output: (probe_id, doc_id, bm25, rank), the
    per-probe top-``top_n`` with the same rounded-score + doc-id
    tie-break cut as the single-probe operator.

    100-TB shape: the corpus explode is semi-joined against the
    DISTINCT probe vocabulary (broadcast — a probe table is at most
    ~10^5 short strings) BEFORE the tf shuffle, so tf is computed ONCE
    per (doc, term) no matter how many probes share a term; the
    per-probe fan-out happens on the (doc, term) AGGREGATE, never on
    raw token rows. The shuffle count stays independent of the probe
    count (plan-asserted). Per-term df/idf is corpus global (identical
    to ``bm25_rank``'s), broadcast back.

    Skew shape (r9 — VERDICT r8 #6): the per-(probe, doc) score
    aggregation hashes on BOTH keys, so a probe whose terms match a
    large fraction of the corpus (a stop-word-ish probe) spreads its
    groups across every task instead of serializing into one; a
    map-side per-batch top-``top_n`` cut (same two-stage shape as
    ``exact.exact_knn_batch``) then bounds what reaches the per-probe
    window to ``top_n`` rows per (probe, arrow-batch) — the global
    window ranks thousands of survivors per probe, never the full
    match set. The cut is lossless: any row in the global top-n is in
    its own batch's top-n under the identical (bm25 desc, doc_id asc)
    ordering.
    """
    pterms = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.explode(F.array_distinct(F.transform(terms_col, F.lower))).alias(
            "term"
        ),
    )
    vocab = pterms.select("term").distinct()
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(text_col), F.lower).alias("toks"),
    ).select("doc_id", F.size("toks").cast("double").alias("dl"), "toks")
    n_docs, avgdl = d.agg(
        F.count("*").cast("double"), F.avg("dl")
    ).first()  # ONE row of corpus stats — bounded driver traffic
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(vocab), "term")  # semi filter BEFORE the shuffle
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    wt = idf * F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(pterms), "term")  # fan out per probe, post-agg
        .select("probe_id", "doc_id", wt.alias("wt"))
        .groupBy("probe_id", "doc_id")  # hash on BOTH keys: skew-proof
        .agg(F.round(F.sum("wt"), 4).alias("bm25"))
    )

    cut_n = int(top_n)

    def local_cut(batches):
        # map-side partial top-n per probe (stage 1 of the two-stage
        # cut) — zero shuffle; ordering matches the final window's
        # tie-break exactly so the cut cannot drop a global winner
        for pdf in batches:
            if pdf.empty:
                continue
            yield (
                pdf.sort_values(
                    ["probe_id", "bm25", "doc_id"],
                    ascending=[True, False, True],
                )
                .groupby("probe_id", sort=False)
                .head(cut_n)
            )

    partial = scored.mapInPandas(local_cut, schema=scored.schema)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("probe_id", "doc_id", "bm25", F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------------------------- corpus quality filters

# the 8 "must contain 2 of these" words from the published Gopher rules
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document-level Gopher quality rules (Rae et al. 2021, table A1) —
    the published heuristic gate pretraining pipelines run before
    model-based filtering. Emits every signal plus the combined
    ``gopher_pass`` verdict so downstream mixes can re-threshold.

    Rules: 50 <= words <= 100k; 3 <= mean word length <= 10;
    hash-to-word ratio < 0.1 AND ellipsis-to-word ratio < 0.1 (the
    paper's per-symbol thresholds, not a pooled count); < 90% of lines
    bullet-started; < 30% of lines ellipsis-ended; > 80% of words
    contain an alphabetic character; >= 2 of the 8 required stopwords
    present.

    Scale shape: pure Catalyst expressions over one row at a time —
    map-only, whole-stage codegen'd, zero shuffles. All ratios are
    exact-integer divisions, so any engine reproduces them bit-for-bit.

    r14 (guide §1.2 don't compute twice): the word/line token arrays
    are materialized in a STAGING projection and the signals reference
    them as plain attributes. Inlined, the higher-order signal
    expressions are CodegenFallback (interpreted) and subexpression
    elimination does not reach them — the executed plan re-tokenized
    the document ~19× for the word split and ~8× for the line split
    (once per signal and once per gopher_pass conjunct).
    CollapseProject keeps the two projections separate precisely
    because the arrays are non-cheap and multiply referenced, so each
    split now evaluates once per row. Output bit-identical (exceptAll
    both ways = 0 at sf0.1; oracle parity green).
    """
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias(
            "_gq_ws"
        ),
        F.transform(F.split(F.col(text_col), "\n"), F.trim).alias("_gq_lines"),
    )
    ws = F.col("_gq_ws")
    lines = F.col("_gq_lines")
    n_words = F.size(ws)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    dn = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.aggregate(
        ws, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / dn
    hash_ratio = F.regexp_count(F.col(text_col), F.lit("#")).cast("double") / dn
    ell_ratio = F.regexp_count(F.col(text_col), F.lit(r"\.\.\.")).cast(
        "double"
    ) / dn
    alpha_frac = F.size(
        F.filter(ws, lambda t: t.rlike("[A-Za-z]"))
    ).cast("double") / dn
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    ).cast("double") / n_lines.cast("double")
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))
    ).cast("double") / n_lines.cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(ws, F.lower),
            F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
        )
    )
    gopher_pass = (
        n_words.between(50, 100_000)
        & mean_len.between(3.0, 10.0)
        & (hash_ratio < 0.1)
        & (ell_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (alpha_frac > 0.8)
        & (stop_hits >= 2)
    )
    return staged.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(hash_ratio, 4).alias("hash_word_ratio"),
        F.round(ell_ratio, 4).alias("ellipsis_word_ratio"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        gopher_pass.alias("gopher_pass"),
    )


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_line_words: int = 3, min_sentences: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep
    lines that end in terminal punctuation, have >= ``min_line_words``
    words, and don't mention javascript; flag documents containing
    "lorem ipsum" or '{' or with fewer than ``min_sentences`` sentences
    left after cleaning.

    Returns (id, n_lines, n_kept, n_sentences, doc_pass, clean_text).
    Map-only Catalyst expressions (split / filter-lambda / rlike) —
    zero shuffles; the regexes stay in Java/RE2-common syntax so an
    oracle engine replicates the clean verbatim.

    The ``kept`` array is inlined (~4 evaluations per row through the
    outputs); the gopher-style staged-projection rewrite was measured
    SLOWER here (r14, +26% on a 7-pair interleaved A/B, new lost 7/7)
    — materializing the large line/kept arrays through chained
    projections costs more than the re-evaluation it saves.
    """
    lines = F.transform(F.split(F.col(text_col), "\n"), F.trim)
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(l, r"\s+"), lambda t: t != "")) >= min_line_words)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.size(
        F.filter(
            F.split(clean, r"[.!?]"),
            lambda s: F.trim(s) != "",
        )
    )
    doc_pass = (
        (n_sent >= min_sentences)
        & ~F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
        & ~F.contains(F.col(text_col), F.lit("{"))
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.cast("long").alias("n_sentences"),
        doc_pass.alias("doc_pass"),
        clean.alias("clean_text"),
    )


def pack_documents(
    df: DataFrame,
    budget: int = 256,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Concatenate-and-cut sequence packing: assign every document a
    byte-offset position in a fixed-token-budget training sequence
    (the GPT-style "pack the corpus, cut every ``budget`` tokens"
    layout), computed as a prefix sum — no materialized concatenation.

    Documents are first hash-bucketed (portable md5, same trick as
    ``sampling.py``) so the prefix-sum window runs per bucket:
    parallelism = ``n_buckets`` regardless of corpus size, and the
    layout is stable under any input partitioning. Within a bucket,
    docs pack in ``doc_id`` order; ``seq_bin`` is the training-sequence
    ordinal inside the bucket and ``straddles`` marks docs cut by a
    sequence boundary.

    Returns (id, bucket, n_tokens, tok_offset, seq_bin, begin_pos,
    straddles). 100 TB shape: one shuffle keyed by bucket; window
    partitions are corpus_size/n_buckets rows of two small ints —
    raise ``n_buckets`` to bound them.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    n_tok = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    # same engine-portable hash key as sampling.py: md5("seed:id") hex
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    ).cast("int")
    base = df.select(
        F.col(id_col), bucket.alias("bucket"), n_tok.cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        offset.cast("long").alias("tok_offset"),
        F.floor(offset / budget).cast("long").alias("seq_bin"),
        (offset % budget).cast("long").alias("begin_pos"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.floor((offset + F.col("n_tokens") - 1) / budget)
                != F.floor(offset / budget)
            )
        ).alias("straddles"),
    )


# --------------------------------------------------------------- PII scrub

# Patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically — no lookaround, no backreferences — so the oracle can
# replicate the scrub verbatim. Order matters: email before phone (an
# address's digits must not be half-eaten as a phone), SSN and IPv4
# before the generic digit-run phone pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    (r"\+?[0-9][0-9()\s.-]{6,}[0-9]", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace emails / SSNs / IPv4s / phone-like digit runs with typed
    placeholder tokens — the standard pre-training PII pass.

    Pure Catalyst (chained ``regexp_replace``): map-only projection,
    whole-stage codegen'd, zero shuffles — scales as a scan. Regex
    scrubbing is a heuristic (over- and under-matches are inherent);
    the pattern list is overridable per corpus policy.
    """
    col = F.col(text_col)
    for pat, repl in patterns or PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(text_col, col)


def frequent_tokens(
    df: DataFrame,
    support: float = 0.001,
    text_col: str = "text",
) -> DataFrame:
    """Corpus heavy hitters with an EXACT guarantee at sketch cost:
    tokens occurring in more than ``support`` fraction of the token
    stream, with their exact counts.

    Two passes, both bounded: (1) Spark's single-pass ``freqItems``
    sketch (Karp et al. frequent-items; memory ~1/support) yields a
    candidate SUPERSET of every token with frequency > support; (2) an
    exact recount restricted to the candidates, filtered to
    ``count > support * n``. Because the sketch is a superset and the
    filter is exact, the output is the deterministic true answer — a
    full groupBy over a 100 TB Zipf vocabulary never happens, yet the
    result is oracle-checkable. The candidate list (≤ ~1/support
    entries) briefly visits the driver to broadcast, by construction
    bounded regardless of corpus size.

    Returns (token, freq) for tokens with freq > support * total.
    """
    if not (1e-4 <= support < 1.0):
        # Spark's freqItems itself rejects support < 1e-4 — fail here,
        # before the counting pass, with a Pythonic error
        raise ValueError(f"support must be in [1e-4, 1), got {support}")
    from vamana_spark.functions.util import ensure_parallelism

    toks = ensure_parallelism(df.select(text_col)).select(
        F.explode(tokens(text_col)).alias("token")
    )
    toks = toks.persist()
    try:
        n_total = toks.count()
        cand = toks.freqItems(["token"], support).first()[0]
        out = (
            toks.where(F.col("token").isin(list(cand)))
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("freq"))
            .where(F.col("freq") > float(support) * n_total)
            .orderBy(F.col("freq").desc(), "token")
        )
        # materialize before unpersisting the token view
        out = out.localCheckpoint(eager=True)
    finally:
        toks.unpersist()
    return out


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, avg_bigram_logprob, bigram_ppl): mean add-k-
    smoothed CONDITIONAL bigram log-probability of each document under
    the corpus's own bigram model — one step up from
    ``unigram_logprob_score`` toward the KenLM-style perplexity filters
    (CCNet / RedPajama) corpus curation actually runs:
    ln P(w2|w1) = ln((c(w1 w2) + k) / (c(w1 ·) + k·V)).
    ``bigram_ppl`` = exp(-avg): low = fluent under the corpus mode,
    high = outlier; filter both tails. Docs with fewer than two tokens
    have no bigrams and are absent from the output.

    Scale shape: bigram and w1-context counts are two grouped aggs over
    the exploded bigram stream (corpus-token-count cardinality, Zipf
    skew absorbed by map-side partials); scoring is an equi-join on the
    bigram plus one on the context, then a per-doc avg; the vocab total
    is a one-row broadcast. Everything is built-ins — fully
    oracle-able.
    """
    s = float(smoothing)
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("_t"),
    )
    big = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN transform("
                "sequence(1, size(_t) - 1), i -> concat(_t[i-1], ' ', _t[i])"
                ") ELSE array() END"
            )
        ).alias("bigram"),
    )
    bc = big.groupBy("bigram").agg(F.count("*").alias("_bfreq"))
    uc = (
        big.select(F.split(F.col("bigram"), " ").getItem(0).alias("_w1"))
        .groupBy("_w1")
        .agg(F.count("*").alias("_ufreq"))
    )
    vocab = toks.select(F.explode("_t").alias("_tok")).agg(
        F.count_distinct("_tok").cast("double").alias("_vocab")
    )
    lp = F.log(
        (F.col("_bfreq") + F.lit(s)) / (F.col("_ufreq") + F.lit(s) * F.col("_vocab"))
    )
    return (
        big.join(bc, "bigram")
        .withColumn("_w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(uc, "_w1")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_bigram_logprob"),
            F.round(F.exp(-F.avg("_lp")), 4).alias("bigram_ppl"),
        )
    )
