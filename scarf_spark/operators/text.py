"""Text analysis for training-data pipelines (the large-scale extension
alongside dedup: language ID, quality scoring, token counting, document
fingerprinting). Pure JVM-side string/array expressions — no UDFs — so
they run inside whole-stage codegen at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
}


def _words(text_col: str) -> F.Column:
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, alphabetic regex tokens, and
    character length."""
    # tokenize once into a real column — an inline split() referenced
    # repeatedly is re-evaluated per reference (see word_shingles)
    tok = docs.select(
        F.col(id_col), F.col(text_col), _words(text_col).alias("_w")
    )
    return tok.select(
        F.col(id_col),
        F.size("_w").alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[a-zA-Z]+', 0)")).alias("n_alpha_tokens"),
        F.length(F.col(text_col)).alias("n_chars_computed"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + blended score: mean token length,
    stopword ratio, alpha-char ratio, plus a deterministic blend
    (0.4·min(5·stopword_ratio, 1) + 0.3·alpha_ratio +
    0.3·min(mean_token_len/10, 1)). The kind of cheap per-doc signal
    a corpus filter runs before expensive model scoring.

    All outputs are EXACT parts-per-million integers (integer
    cross-multiplication over the common denominator, then one
    integer division). The former ROUND(float, 6) form was
    boundary-unstable: every ratio here is a small-denominator
    rational, so true values routinely land exactly on a rounding
    half-boundary and engine-level float noise flips the last digit
    either way (first seen as a 1-row divergence in the round-12
    sf0.1 sweep). Integer div is bit-equal in any engine."""
    tok = docs.select(
        F.col(id_col), F.col(text_col), _words(text_col).alias("_w")
    )
    w = F.col("_w")
    sw = STOPWORDS["en"]
    ints = tok.select(
        F.col(id_col),
        F.size(w).alias("_nt"),
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("_sl"),
        F.size(F.filter(w, lambda x: F.lower(x).isin(sw)))
        .cast("long")
        .alias("_sw"),
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
        .cast("long")
        .alias("_al"),
        F.greatest(F.length(F.col(text_col)).cast("long"), F.lit(1).cast("long"))
        .alias("_ltp"),
    ).withColumn("_ntp", F.greatest(F.col("_nt").cast("long"), F.lit(1).cast("long")))
    return ints.selectExpr(
        id_col,
        "_nt AS n_tokens",
        "(1000000 * _sl) div _ntp AS mean_token_len_ppm",
        "(1000000 * _sw) div _ntp AS stopword_ratio_ppm",
        "(1000000 * _al) div _ltp AS alpha_ratio_ppm",
        "(400000 * least(5 * _sw, _ntp) * _ltp + 300000 * _al * _ntp"
        " + 30000 * least(_sl, 10 * _ntp) * _ltp) div (_ntp * _ltp)"
        " AS quality_ppm",
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: count hits against each language's
    list, argmax with deterministic tie-break (hit count desc, then
    language code). Returns (doc_id, pred_lang, n_hits)."""
    tok = docs.select(F.col(id_col), _words(text_col).alias("_w"))
    w = F.col("_w")

    def _hits(swl):
        # NB: a default-arg lambda (x, sw=sw) would be read by PySpark's
        # higher-order-function binding as the 2-arg (element, index)
        # form — capture the list via closure instead.
        return F.size(F.filter(w, lambda x: F.lower(x).isin(swl)))

    hit_cols = []
    for lang, sw in sorted(STOPWORDS.items()):
        hit_cols.append(F.struct(_hits(sw).alias("hits"), F.lit(lang).alias("lang")))
    # argmax via array_max over (hits, -lang) ordering: array_max on
    # structs compares fields in order; to break ties toward the
    # *smaller* language code we sort ascending and take the last of
    # (hits, reversed-lang) — simplest portable form: sort by hits desc
    # then lang asc via sort_array of (negated hits, lang).
    arr = F.array(*[
        F.struct((-c["hits"]).alias("neg"), c["lang"].alias("lang"), c["hits"].alias("hits"))
        for c in hit_cols
    ])
    best = F.sort_array(arr)[0]
    return tok.select(
        F.col(id_col), best["lang"].alias("pred_lang"), best["hits"].alias("n_hits")
    )


def fingerprint(
    docs: DataFrame, mod: int = 1_000_000_007, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted sum of
    60-bit word hashes mod p — sum((pos+1) * (h % 1e9)) % p. Equivalent
    detection power to a rolling hash but expressible as a plain SUM
    (distributable, and reproducible in any engine), instead of a
    sequential fold."""
    words = docs.select(
        F.col(id_col), F.posexplode(_words(text_col)).alias("pos", "w")
    )
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long") % F.lit(1_000_000_000)
    term = (F.col("pos") + 1).cast("long") * h
    return (
        words.select(F.col(id_col), term.alias("t"))
        .groupBy(id_col)
        .agg((F.sum("t") % F.lit(mod)).alias("fingerprint"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the standard LLM-pipeline
    preprocessing step that splits long documents into fixed-size
    character windows with overlap (stride < chunk_size ⇒ consecutive
    chunks share chunk_size - stride chars).

    Chunk starts are every multiple of ``stride`` below the text
    length, generated JVM-side with ``sequence`` + ``posexplode`` — a
    narrow (shuffle-free) transform: each input row expands to its own
    chunks inside the task that read it, so it scales linearly with
    corpus size. Empty documents produce no chunks."""
    n = F.length(F.col(text_col))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = docs.select(
        F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk_text = F.substring(F.col(text_col), F.col("start") + 1, chunk_size)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("start").cast("long").alias("chunk_start"),
        F.length(chunk_text).alias("chunk_len"),
        chunk_text.alias("chunk_text"),
    )


def ngram_top(
    docs: DataFrame,
    n_top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus bigram statistics: the global top-``n_top`` word bigrams
    by occurrence count (tie → lexicographically smaller bigram) with
    document frequency — the vocabulary/contamination report a corpus
    pipeline produces before training.

    Bigrams are built JVM-side (transform over the token array, a
    narrow op), then one hash agg on the bigram key; the final top-k is
    sort+limit (TakeOrderedAndProject — per-partition top-k merged
    once, no global sort of the full vocabulary)."""
    tok = docs.select(F.col(id_col), _words(text_col).alias("ws"))
    grams = tok.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr("transform(sequence(0, size(ws) - 2), i -> "
                       "concat(ws[i], ' ', ws[i + 1]))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(n_top)
    )


# Conservative regexes that parse identically under Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
NUMRUN_RE = "[0-9]{6,}"


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing: replace email addresses with ``<EMAIL>`` and long
    (6+) digit runs — phone/account/SSN-shaped tokens — with ``<NUM>``,
    reporting per-doc match counts. Emails are redacted first so their
    digits can't double-count as number runs. Pure ``regexp_replace`` /
    ``regexp_count`` expressions: whole-stage codegen, no UDFs, safe at
    corpus scale."""
    n_email = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE))
    after_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    n_num = F.regexp_count(after_email, F.lit(NUMRUN_RE))
    return docs.select(
        F.col(id_col),
        n_email.alias("n_emails"),
        n_num.alias("n_number_runs"),
        F.regexp_replace(after_email, NUMRUN_RE, "<NUM>").alias("redacted"),
    )


def bpe_token_counts(
    docs: DataFrame,
    pattern: str = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pretokenizer regex (word
    runs, number runs, punctuation runs, each optionally preceded by a
    space) evaluated JVM-side with regexp_extract_all — the cheap
    token-budget estimator a corpus pipeline runs before a real BPE
    pass. Returns (doc_id, n_bpe_tokens, n_unique_tokens)."""
    toks = F.expr(f"regexp_extract_all({text_col}, '{pattern}', 0)")
    t = docs.select(F.col(id_col), toks.alias("_t"))
    return t.select(
        id_col,
        F.size("_t").alias("n_bpe_tokens"),
        F.size(F.array_distinct("_t")).alias("n_unique_tokens"),
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TRAIN byte-pair-encoding merge rules on the corpus (Sennrich
    2016 — the step that builds a tokenizer vocabulary, upstream of
    :func:`bpe_token_counts` which only counts with a fixed
    pretokenizer). Word-level BPE: the distributed part is the classic
    map-reduce — per-word symbol strings (chars + ``</w>``) weighted by
    corpus word frequency, adjacent-pair counts as ONE hash aggregate
    per merge step; the driver sees exactly one row per step (the
    argmax pair — count DESC, pair ASC tie-break) and feeds it back as
    a literal for the next step's ``replace``. ``n_merges`` jobs total,
    driver traffic = n_merges rows, corpus never leaves the executors.

    Deterministic and oracle-replayable: literal (non-regex) replace
    has identical left-to-right non-overlapping semantics in Spark and
    DuckDB, and counts are integers. Returns one row per merge:
    (step, pair, merged, pair_count)."""
    words = docs.select(
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: w != "")).alias(
            "word"
        )
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("wc"))
    # char-split via split on empty pattern keeps unicode chars whole
    sym = F.concat_ws(
        " ", F.concat(F.filter(F.split("word", ""), lambda c: c != ""), F.array(F.lit("</w>")))
    )
    state = vocab.select("word", "wc", sym.alias("s")).localCheckpoint(eager=False)
    out_rows = []
    for step in range(1, n_merges + 1):
        ws = F.split("s", " ")
        prs = F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        )
        top = (
            state.select("wc", F.explode(prs).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), "pr")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pr"], int(top[0]["c"])
        merged = pair.replace(" ", "")
        out_rows.append((step, pair, merged, cnt))
        state = state.select(
            "word", "wc",
            F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s"),
        ).localCheckpoint(eager=False)
    spark = docs.sparkSession
    return spark.createDataFrame(
        out_rows, "step int, pair string, merged string, pair_count long"
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 3,
    min_doc_frac: float = 0.02,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate detection: an n-gram shingle that occurs
    in at least ``min_doc_frac`` of all documents is boilerplate (nav
    bars, license headers, templated footers); report per document how
    many of its shingles are boilerplate and the boilerplate ratio —
    the pre-filter every web-scale corpus cleaning pass runs (CCNet /
    C4-style repeated-line removal generalized to shingles, since the
    synthetic docs carry no newlines).

    Two aggregations over one shingle table: document frequency per
    shingle (corpus-wide), then a per-doc rollup flagging shingles whose
    df clears the threshold. Both shuffle on the shingle/doc key; the
    df table is naturally heavy-hitter-truncated at scale (broadcast the
    boilerplate set, not the full df table — it is ≤ |shingles| ·
    min_doc_frac⁻¹ entries)."""
    from scarf_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, n, text_col, id_col)
    n_docs = docs.select(id_col).distinct().count()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    boiler = dfreq.where(F.col("df") >= float(min_doc_frac) * n_docs).select("shingle")
    flagged = sh.join(
        F.broadcast(boiler.withColumn("_b", F.lit(1))), "shingle", "left_outer"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_b").alias("n_boiler"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias("boiler_ratio"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-N terms by TF-IDF — the IR ranking twin of the
    ATAC TF-IDF normalization (``scarf/assay.py:81-94``), over the
    corpus table: tf = in-doc term count, idf = ln(N / df).

    Scores are ROUND(6)-ed BEFORE ranking so the (score, term) order is
    engine-portable (ln is only 1-ulp reproducible across libms; the
    rounding collapses that under the tie-break). Two corpus-keyed
    aggregates + a per-doc top-N window — shuffle keys are term and
    doc, never a pair blowup."""
    n_docs = docs.select(id_col).distinct().count()
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
    ).alias("tfidf")
    scored = tf.join(F.broadcast(df_), "term").select(id_col, "term", score)
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select(id_col, F.col("rn").alias("rank"), "term", "tfidf")
    )


def quality_filter(
    docs: DataFrame,
    min_chars: int = 200,
    min_quality: float = 0.5,
    langs: tuple = ("en", "de"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Composite corpus admission filter — the decision layer every
    training-data pipeline ships on top of the individual signals:
    keep iff (length ≥ min_chars) ∧ (predicted language allowed) ∧
    (quality ≥ min_quality), with a reason bitmask (1 = too short,
    2 = language, 4 = quality) so rejected docs stay auditable.

    Pure composition of :func:`quality_score` and :func:`lang_id` —
    two codegen passes over the corpus joined on the doc key; the
    quality threshold compares the EXACT integer ppm score
    (``min_quality`` is converted to ppm), so the keep decision is
    boundary-stable in any engine."""
    qs = quality_score(docs, id_col=id_col).select(id_col, "quality_ppm")
    li = lang_id(docs, id_col=id_col).select(id_col, "pred_lang")
    base = docs.select(id_col, F.length("text").alias("_len"))
    j = base.join(qs, id_col).join(li, id_col)
    min_q_ppm = int(round(min_quality * 1_000_000))
    r_short = F.when(F.col("_len") < min_chars, 1).otherwise(0)
    r_lang = F.when(~F.col("pred_lang").isin(*langs), 2).otherwise(0)
    r_qual = F.when(F.col("quality_ppm") < min_q_ppm, 4).otherwise(0)
    reasons = r_short + r_lang + r_qual
    return j.select(
        id_col,
        F.col("_len").alias("n_chars"),
        "pred_lang",
        "quality_ppm",
        reasons.alias("reasons"),
        (reasons == 0).alias("keep"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram log-probability per document — the KenLM-style
    perplexity proxy used to score web text against a reference corpus
    (here the corpus itself): mean over the doc's tokens of
    ln(count(token)/total_tokens). Low scores flag gibberish and
    boilerplate-heavy docs.

    One corpus aggregate (token counts — map-side combined), broadcast
    back to the token stream, one per-doc mean. The LM table is
    vocabulary-sized, not corpus-sized, so the broadcast holds at any
    corpus scale."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    )
    lm = words.groupBy("term").agg(F.count("*").alias("c"))
    tot = words.agg(F.count("*").alias("_tot"))
    scored = (
        words.join(F.broadcast(lm), "term")
        .crossJoin(F.broadcast(tot))
        .select(id_col, F.log(F.col("c") / F.col("_tot")).alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob"),
    )


def collocation_pmi(
    docs: DataFrame,
    n_top: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information of the corpus's top bigrams —
    the collocation detector (Church & Hanks 1990) a corpus pipeline
    runs to find multiword units worth preserving through tokenization:
    PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) over bigram positions
    and p(x) over unigram positions.

    Two corpus aggregates (unigram and bigram counts, both map-side
    combined, vocabulary-sized results), the top-k bigram cut
    (TakeOrderedAndProject), then two BROADCAST joins of the k surviving
    bigrams against the unigram table — the corpus is scanned twice and
    never reshuffled. The PMI expression is one division inside ln, the
    same literal shape the oracle uses, so both engines run the same
    IEEE op sequence."""
    toks = docs.select(F.col(id_col), _words(text_col).alias("ws"))
    uni = (
        toks.select(F.explode("ws").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cu"))
    )
    grams = toks.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr(
                    "transform(sequence(0, size(ws) - 2), i -> "
                    "struct(ws[i] AS w1, ws[i + 1] AS w2))"
                ),
            ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
        ).alias("g")
    ).select("g.w1", "g.w2")
    top = (
        grams.groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .orderBy(F.col("cb").desc(), "w1", "w2")
        .limit(n_top)
    )
    n_uni = uni.agg(F.sum("cu").alias("nu"))
    n_bi = grams.agg(F.count("*").alias("nb"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("cu").alias("c2"))
    return (
        top.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("ngram"),
            F.col("cb").alias("n_occurrences"),
            F.round(
                F.log(
                    (F.col("cb").cast("double") * F.col("nu") * F.col("nu"))
                    / (F.col("nb").cast("double") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText
    repetition family (Rae et al. 2021 §A1.1: duplicate n-gram and
    top-n-gram fractions) used to kill templated/looping pages before
    training. Per doc: word count, distinct-word ratio, the fraction of
    bigrams taken by the single most frequent bigram, and the fraction
    of trigram occurrences that are repeats.

    Everything — including the modal-bigram count, via a run-length
    fold over the SORTED bigram array — is a per-row JVM expression:
    the whole operator is map-side with ZERO shuffles, so at corpus
    scale it fuses into the parquet scan like the other quality
    filters (cf. quality_score)."""
    tok = docs.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size("_w")

    def grams(k: int) -> F.Column:
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("_w", (i + j + 1).cast("int")) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    g = tok.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct("_w")).cast("long").alias("_uniq"),
        F.array_sort(grams(2)).alias("_bg"),
        F.size(F.array_distinct(grams(3))).cast("long").alias("_tu"),
        F.size(grams(3)).cast("long").alias("_tt"),
    )
    # modal bigram count = longest equal-run in the sorted array; words
    # are non-empty post-filter, so "" is a safe initial sentinel
    top = F.aggregate(
        "_bg",
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                a.best,
                F.when(x == a.prev, a.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda a: a.best,
    )
    nb = F.size("_bg").cast("long")
    return g.select(
        F.col(id_col),
        "n_words",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("_uniq") / F.col("n_words").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("uniq_word_ratio"),
        F.when(nb > 0, F.round(top / nb.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            F.col("_tt") > 0,
            F.round(1.0 - F.col("_tu") / F.col("_tt").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_trigram_frac"),
    )


def hashing_tf(
    docs: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al. 2009;
    Spark MLlib's HashingTF): map each term to one of ``n_features``
    buckets by hash and count occurrences — the fixed-width sparse
    vectorizer that needs NO vocabulary pass, which is why it is the
    standard first step of a corpus-scale text-ML pipeline (a
    vocabulary dictionary is a second full scan plus a giant broadcast;
    the hash needs neither).

    Uses the portable md5-based hash (engine-reproducible, unlike
    MLlib's murmur3 seed) and emits the sparse COO form
    (doc_id, feature, tf) — explode + one (doc, feature)-keyed
    map-side-combined aggregation; output rows ≤ distinct terms per
    doc regardless of n_features."""
    tok = docs.select(F.col(id_col), F.explode(_words(text_col)).alias("_t"))
    h = F.conv(F.substring(F.md5(F.col("_t")), 1, 15), 16, 10).cast("long")
    return (
        tok.select(F.col(id_col), F.pmod(h, F.lit(n_features)).alias("feature"))
        .groupBy(id_col, "feature")
        .agg(F.count("*").alias("tf"))
    )


def zipf_fit(
    docs: DataFrame,
    n_top: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf's-law diagnostic: OLS fit of ln(freq) against ln(rank) over
    the top ``n_top`` terms — the corpus-health check (natural text
    slopes ≈ −1; templated/boilerplate corpora deviate hard). The
    ranking is a TakeOrderedAndProject top-k (distributed, never a
    vocabulary-wide rank window) and the in-window ranking + OLS sums
    run over the constant-size top list; at 100 TB the only
    corpus-sized work is the one term-count aggregate.

    Returns one row (n_top, slope, intercept), ROUND(6)."""
    from pyspark.sql import Window

    cnt = (
        docs.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    top = cnt.orderBy(F.col("cnt").desc(), "term").limit(n_top)
    w = Window.orderBy(F.col("cnt").desc(), "term")  # over <= n_top rows
    pts = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_top"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


def segment_dedup(
    docs: DataFrame,
    seg_len: int = 8,
    max_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document segment deduplication (the CCNet/RefinedWeb
    paragraph-hash pass, adapted to word windows): split every doc into
    non-overlapping ``seg_len``-word segments, count how many DISTINCT
    documents each segment string occurs in, and mark segments seen in
    more than ``max_doc_freq`` docs as corpus boilerplate. Returns one
    row per doc: (doc_id, n_segments, n_dropped, kept_ppm) where
    kept_ppm is exact integer parts-per-million of retained segments
    (integer division — no float rounding to disagree on).

    Shape: segmenting is a narrow per-row transform (sequence + slice +
    posexplode, zero Python); the doc-frequency table is one hash agg
    on the segment string (map-side combined), joined back broadcast-
    free by segment — at 100 TB both sides shuffle on the segment key
    and the DF table stays vocabulary-of-segments sized. No stage
    holds a document's full text after the explode."""
    tok = docs.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("_w"),
    )
    n_seg = F.ceil(F.size("_w") / F.lit(float(seg_len))).cast("int")
    idx = F.when(
        F.size("_w") > 0, F.sequence(F.lit(0), n_seg - 1)
    ).otherwise(F.array().cast("array<int>"))
    segs = tok.select(
        F.col(id_col),
        F.explode(idx).alias("_i"),
        F.col("_w"),
    ).select(
        F.col(id_col),
        F.concat_ws(
            " ", F.slice("_w", F.col("_i") * seg_len + 1, seg_len)
        ).alias("seg"),
    )
    seg_df = segs.distinct().groupBy("seg").agg(
        F.count("*").alias("_df")
    )
    flagged = segs.join(seg_df, "seg").select(
        id_col, (F.col("_df") > max_doc_freq).alias("_drop")
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("_drop").cast("bigint")).alias("n_dropped"),
        F.expr(
            "(count(*) - sum(cast(_drop as bigint))) * 1000000 div count(*)"
        ).alias("kept_ppm"),
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-bigram conditional log-probability per document — one
    order up from :func:`unigram_logprob`, the cheap KenLM stand-in:
    mean over the doc's bigrams (w1, w2) of
    ln((c(w1 w2) + 1) / (c_left(w1) + V)) under add-1 smoothing, where
    c_left counts w1's occurrences as a bigram left context and V is
    the corpus vocabulary size. Repetitive docs score high, shuffled-
    word gibberish scores near the smoothing floor — the usual
    perplexity-filter signal without an external LM artifact.

    Shape: bigrams come from one self-zip of the token array (narrow,
    JVM-side); the bigram LM table is vocabulary²-bounded but in
    practice Zipf-sparse, and it joins back on the bigram key by
    shuffle (NOT broadcast — unlike the unigram table it can outgrow
    the driver); the unigram context table and the scalar V broadcast."""
    tok = docs.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("_w"),
    )
    idx = F.when(
        F.size("_w") >= 2, F.sequence(F.lit(0), F.size("_w") - 2)
    ).otherwise(F.array().cast("array<int>"))
    big = tok.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("_w", (i + 1).cast("int")),
                    F.element_at("_w", (i + 2).cast("int")),
                ),
            )
        ).alias("bg"),
    )
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term")
    )
    vocab = words.agg(F.countDistinct("term").alias("_v"))
    bg_cnt = big.groupBy("bg").agg(F.count("*").alias("_bc"))
    left_cnt = big.select(
        F.split_part("bg", F.lit(" "), F.lit(1)).alias("w1")
    ).groupBy("w1").agg(F.count("*").alias("_lc"))
    scored = (
        big.join(bg_cnt, "bg")
        .withColumn("w1", F.split_part("bg", F.lit(" "), F.lit(1)))
        .join(F.broadcast(left_cnt), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log((F.col("_bc") + 1.0) / (F.col("_lc") + F.col("_v"))).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob"),
    )


def readability(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document — the classic quality-scoring
    companion to length/punct ratios: 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words). Sentences are ``[.!?]+`` runs, syllables
    the standard vowel-group approximation (``[aeiouy]+`` runs in the
    lowercased text) — both single-pass JVM regex counts inside
    whole-stage codegen, one map-side projection, zero shuffles. Docs
    with no words are dropped (the ratio is undefined); sentence count
    floors at 1 so headline-like fragments still score."""
    n_words = F.size(F.filter(F.split(F.col(text_col), " "), lambda w: w != ""))
    n_sent = F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
    n_syll = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+"))
    out = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.greatest(n_sent, F.lit(1)).cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return out.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") / F.col("n_words")),
            6,
        ).alias("flesch"),
    )


def ccnet_buckets(
    docs: DataFrame,
    n_bins: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek 2020):
    score every document with the corpus bigram LM
    (:func:`bigram_logprob` — the KenLM stand-in), then split EACH
    language into exact ``n_bins`` quantile buckets by score,
    best-first (bucket 1 = "head" = highest mean log-probability =
    lowest perplexity). This is the routing gate real pretraining
    corpora apply per language before sampling.

    The per-language ntile runs on :func:`windows.grouped_ntile` — the
    distributed rank-arithmetic form — so one dominant language never
    collapses into a single sort task the way a naive
    ``PARTITION BY lang`` window would at corpus scale. Ordering is on
    the ROUNDED score with the doc id as tiebreak, so the cut replays
    exactly on any engine."""
    from scarf_spark.operators import windows

    scored = bigram_logprob(docs, text_col=text_col, id_col=id_col).join(
        docs.select(id_col, lang_col), id_col
    )
    neg = scored.withColumn("_neg_lp", -F.col("mean_logprob"))
    tiled = windows.grouped_ntile(
        neg, [lang_col], ["_neg_lp", id_col], n_bins, out="bucket"
    ).drop("_neg_lp")
    name = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == n_bins, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return tiled.select(
        id_col, lang_col, "mean_logprob", "bucket", name.alias("bucket_name")
    )


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY the trained BPE merges — the other half of the tokenizer
    loop (:func:`bpe_train_merges` learns the rules; this encodes the
    corpus with them and reports per-doc token counts + compression).
    Encoding is the same literal left-to-right ``replace`` the trainer
    used, unrolled over the ``n_merges`` learned rules on the
    char-spaced word form — all JVM string expressions; the learned
    rules are the only driver traffic (``n_merges`` rows, the same
    envelope as training).

    Scale shape: merges apply to the DISTINCT word vocabulary (Zipf-
    small), then one equi-join maps every corpus word to its token
    count — the corpus text itself is scanned once and never carries
    segmentation strings through a shuffle."""
    merges = [
        (r["pair"], r["merged"])
        for r in sorted(
            bpe_train_merges(docs, n_merges, text_col, id_col).collect(),
            key=lambda r: r["step"],
        )
    ]
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("word"),
    )
    vocab = words.select("word").distinct()
    seg = F.concat(
        F.regexp_replace(F.col("word"), "(.)", "$1 "), F.lit("</w>")
    )
    for pair, merged in merges:
        seg = F.replace(seg, F.lit(pair), F.lit(merged))
    seg_tbl = vocab.select(
        "word",
        (F.length("word") + 1).cast("long").alias("_n_char_tok"),
        F.size(F.split(seg, " ")).cast("long").alias("_n_tok"),
    )
    return (
        words.join(seg_tbl, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_n_char_tok").alias("n_char_tokens"),
            F.sum("_n_tok").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_char_tokens",
            "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000000 DIV n_char_tokens").alias(
                "compression_ppm"
            ),
        )
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense log-TF hash embedding per document — the vocabulary-free
    doc vector that turns any text corpus into ANN input without an
    external model: reuse :func:`hashing_tf`'s portable md5 buckets,
    weight each slot ln(1 + tf) (one integer count per slot, so the
    weight is a single exact expression — no accumulation-order
    drift), and assemble the fixed-``dim`` array with one conditional
    aggregate. Output: (doc_id, embedding double[dim])."""
    tf = hashing_tf(docs, n_features=dim, text_col=text_col, id_col=id_col)
    # one map per doc, then a dim-sized lookup transform — one pass,
    # instead of dim conditional aggregates each scanning every row
    m = tf.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("feature"), F.log1p(F.col("tf"))))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(F.element_at(F.col("_m"), b.cast("long")), F.lit(0.0)),
    )
    return m.select(F.col(id_col), vec.alias("embedding"))


def drift_terms(
    docs: DataFrame,
    split_col: str = "source",
    split_value: str = "src0",
    n_top: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Which words drive the distribution shift: unigram share in the
    ``split_value`` slice vs the rest, top ``n_top`` terms by absolute
    share difference — the interpretable companion to the scalar PSI /
    JS drift monitors (a number says THAT the mix moved; this says
    WHAT moved). Shares are single divisions of exact integer counts,
    the ranking key is ROUND(6)-stable with the term as tie-break, and
    the cut is a TakeOrderedAndProject — no global sort."""
    words = docs.select(
        F.col(split_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    )
    a = words.where(F.col(split_col) == split_value)
    b = words.where(F.col(split_col) != split_value)
    ca = a.groupBy("term").agg(F.count("*").alias("_ca"))
    cb = b.groupBy("term").agg(F.count("*").alias("_cb"))
    na = a.count()
    nb = b.count()
    if na == 0 or nb == 0:
        # An empty slice would make one share denominator 0 and every
        # share_diff null/NaN, silently corrupting the top-N ranking —
        # fail loudly instead (a drift comparison needs both sides).
        raise ValueError(
            f"drift_terms: empty comparison slice (n_a={na}, n_b={nb}); "
            f"check split_col={split_col!r} / split_value={split_value!r}"
        )
    j = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("_ca", F.lit(0)).alias("n_a"),
        F.coalesce("_cb", F.lit(0)).alias("n_b"),
    )
    diff = F.round(
        F.abs(
            F.col("n_a") / F.lit(float(na)) - F.col("n_b") / F.lit(float(nb))
        ),
        6,
    )
    return (
        j.select("term", "n_a", "n_b", diff.alias("share_diff"))
        .orderBy(F.desc("share_diff"), "term")
        .limit(n_top)
    )


def type_token_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Type-token ratio per document (distinct words / total words, in
    exact integer ppm) — the lexical-diversity quality feature next to
    the repetition rules (low TTR = template/spam-like text). One
    narrow projection: both counts come from the tokenized array
    (array_distinct is per-row, no shuffle at all)."""
    tok = docs.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size("_w")
    d = F.size(F.array_distinct("_w"))
    return tok.where(n > 0).select(
        id_col,
        n.cast("long").alias("n_tokens"),
        d.cast("long").alias("n_types"),
        F.expr(
            "CAST(size(array_distinct(_w)) AS BIGINT) * 1000000 "
            "DIV size(_w)"
        ).alias("ttr_ppm"),
    )


def shingle_novelty(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams that occur in NO other document (corpus document
    frequency 1) — high novelty separates genuinely new material from
    template/recombined text, the inverse signal of the boilerplate
    detector. Exact integer ppm.

    One distinct (doc, shingle) projection, one shingle-keyed document
    -frequency aggregate joined back, one per-doc rollup — the same
    shingle shuffle key as every dedup stage, nothing quadratic."""
    from scarf_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    sh = sh.localCheckpoint(eager=True)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    return (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            F.expr("n_novel * 1000000 div n_shingles").alias("novelty_ppm"),
        )
    )


def jsd_drift(
    docs: DataFrame,
    split_col: str = "source",
    split_value: str = "src0",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence between the ``split_value`` slice's
    unigram distribution and the rest — the bounded, symmetric scalar
    drift monitor next to the binned PSI (JSD works directly on the
    full vocabulary; PSI needs a binning). Returns one row
    (n_terms, jsd).

    Cross-engine determinism: each term's contribution
    ½(p·ln(p/m) + q·ln(q/m)) is the same double expression on both
    engines, ROUNDED to 12 decimals per term and accumulated as
    DECIMAL(38,18) — an ORDER-FREE exact sum, so vocabulary-sized
    summation never drifts (the same trick as the DECIMAL money
    sums). Terms absent from a side contribute only the present
    side's half (0·ln0 = 0 convention)."""
    words = docs.select(
        (F.col(split_col) == split_value).alias("_a"),
        F.explode(_words(text_col)).alias("term"),
    )
    counts = words.groupBy("term").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(~F.col("_a"), 1).otherwise(0)).cast("long").alias("cb"),
    ).localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count("*").alias("n_terms"),
    )
    trow = tot.first()
    if trow is None or not trow["na"] or not trow["nb"]:
        # An empty slice zeroes one denominator, making p or q NULL and
        # the whole divergence silently NULL — fail loudly instead,
        # exactly like drift_terms (same misconfiguration class).
        na_ = 0 if trow is None else (trow["na"] or 0)
        nb_ = 0 if trow is None else (trow["nb"] or 0)
        raise ValueError(
            f"jsd_drift: empty comparison slice (n_a={na_}, n_b={nb_}); "
            f"check split_col={split_col!r} / split_value={split_value!r}"
        )
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("ca") / F.col("na")
    qq = F.col("cb") / F.col("nb")
    m = (p + qq) / 2.0
    term = (
        F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, qq * F.log(qq / m)).otherwise(F.lit(0.0))
    ) / 2.0
    return (
        j.select(
            F.col("n_terms"),
            F.round(term, 12).cast("decimal(38,18)").alias("_t"),
        )
        .groupBy("n_terms")
        .agg(F.round(F.sum("_t").cast("double"), 6).alias("jsd"))
        .select("n_terms", "jsd")
    )
