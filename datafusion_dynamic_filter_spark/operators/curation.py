"""Corpus-curation operators over ``documents``: eval-set decontamination,
quality-rule filtering (Gopher-style), domain mixture reweighting, and
within-document repetition measurement.

These complete the training-data pipeline surface (with dedup.py and
pipeline.py): after near-dup removal a 100 TB pretraining corpus still needs
(1) benchmark decontamination — drop training docs that share n-grams with
the eval suite; (2) heuristic quality filters; (3) per-domain sampling
weights to hit a target mixture; (4) repetition stats to catch
degenerate/boilerplate documents.  SURVEY.md §2 Tier C admits any non-DDL
plan; all four are built-in column expressions + joins (JVM-side,
whole-stage codegen) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import (
    band_bucket_array,
    distinct_tokens,
    fan_out,
    h60,
    h60_sql,
    token_jaccard,
    tokens,
    word_shingles,
)
from ..registry import query, tables, track_persist
from .dedup import _RAWTOK_SQL, _SHINGLES_SQL, _TOK_SQL, _minhash_ctes, _minhash_sig

# Deterministic stand-in for "the benchmark suite": docs whose salted
# content hash lands in a 2% bucket.  Content-keyed (not row-order) so the
# eval membership is reproducible across engines and re-runs.
_EVAL_PCT = 2


@query(
    "decontam_eval_overlap",
    oracle=f"""
    WITH d AS (
    SELECT doc_id, lang, text,
    {h60_sql("'eval:' || text")} % 100 < {_EVAL_PCT} AS is_eval
    FROM documents
    ), sh AS (
    SELECT doc_id, lang, is_eval, unnest({_SHINGLES_SQL}) AS g
    FROM (SELECT doc_id, lang, is_eval, {_RAWTOK_SQL} AS tok FROM d)
    ), eg AS (
    SELECT DISTINCT g FROM sh WHERE is_eval
    )
    SELECT s.doc_id, s.lang, CAST(count(*) AS BIGINT) AS n_hits
    FROM sh s JOIN eg ON s.g = eg.g
    WHERE NOT s.is_eval
    GROUP BY s.doc_id, s.lang
    ORDER BY s.doc_id
    """,
)
def decontam_eval_overlap(spark, sf_dir):
    """Benchmark decontamination: for every training document, count its
    word-3-gram shingles that also occur anywhere in the eval set (a
    deterministic 2% content-hash slice standing in for a benchmark suite).
    Docs returned here are the contamination report a pipeline acts on
    (drop or redact before training).

    Shape at 100 TB: the eval side is a fixed benchmark — millions of
    n-grams, not a corpus fraction — so its distinct-shingle relation is
    broadcast and the train side is ONE scan + explode + broadcast-hash
    semi-ish join + groupBy(doc_id); no all-pairs anything.  If the eval
    n-gram set ever outgrows broadcast, dropping the hint leaves a plain
    equi-join on the shingle key (linear, well-distributed — shingle keys
    are near-unique).
    """
    # fan_out: the shingle explode is compute-dense and the compressed
    # documents file is one scan split even at ~sf1 (r7 probe); no-op on
    # real multi-split tables.
    d = fan_out(tables(spark, sf_dir)["documents"]).select(
        "doc_id",
        "lang",
        "text",
        (h60(F.concat(F.lit("eval:"), F.col("text"))) % 100 < _EVAL_PCT).alias(
            "is_eval"
        ),
    )
    # tok materialized in its own projection (multi-referenced alias) so the
    # interpreted transform() in word_shingles does not re-split the text
    # once per shingle position.
    sh = d.select("doc_id", "lang", "is_eval", tokens("text").alias("tok")).select(
        "doc_id",
        "lang",
        "is_eval",
        F.explode(word_shingles(F.col("tok"), 3)).alias("g"),
    )
    eval_grams = sh.filter("is_eval").select("g").distinct()
    return (
        sh.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("doc_id")
    )


# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language Models" —
# public DeepMind paper; thresholds adapted to the synthetic corpus).
_STOPWORDS = ["the", "a", "le", "la", "der", "die", "el", "y", "et", "und"]


@query(
    "quality_filter_rules",
    oracle=f"""
    WITH d AS (
    SELECT lang,
    {_RAWTOK_SQL} AS tok, {_TOK_SQL} AS utok, text, n_chars
    FROM documents WHERE n_chars > 0
    ), r AS (
    SELECT lang,
    len(tok) BETWEEN 5 AND 10000 AS r_len,
    (CAST(list_sum(list_transform(tok, t -> len(t))) AS DOUBLE) / len(tok))
      BETWEEN 2 AND 12 AS r_wordlen,
    (CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
      / n_chars) <= 0.1 AS r_symbol,
    len(list_intersect(utok, {_STOPWORDS!r})) >= 1 AS r_stop,
    (CAST(len(utok) AS DOUBLE) / len(tok)) >= 0.3 AS r_distinct
    FROM d
    )
    SELECT lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN NOT r_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
    CAST(sum(CASE WHEN NOT r_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
    CAST(sum(CASE WHEN NOT r_symbol THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol,
    CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
    CAST(sum(CASE WHEN NOT r_distinct THEN 1 ELSE 0 END) AS BIGINT) AS fail_distinct,
    CAST(sum(CASE WHEN r_len AND r_wordlen AND r_symbol AND r_stop AND r_distinct
      THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def quality_filter_rules(spark, sf_dir):
    """Heuristic quality filtering (Gopher-rule style): five boolean rules
    per document — token-count bounds, mean word length, symbol-to-char
    ratio, stopword presence, distinct-token ratio — rolled up per language
    as per-rule failure counts plus the final keep count.

    One scan, pure column expressions, one small groupBy — embarrassingly
    parallel at any scale; the per-rule counts are the observability a
    curation run needs (which rule is dropping the corpus)."""
    t = tables(spark, sf_dir)
    d = t["documents"].filter(F.col("n_chars") > 0)
    tok = tokens("text")
    utok = distinct_tokens("text")
    avg_wordlen = (
        F.aggregate(tok, F.lit(0.0), lambda acc, x: acc + F.length(x))
        / F.size(tok)
    )
    sym_ratio = (
        F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).cast("double")
        / F.col("n_chars")
    )
    rules = d.select(
        "lang",
        F.size(tok).between(5, 10000).alias("r_len"),
        avg_wordlen.between(2, 12).alias("r_wordlen"),
        (sym_ratio <= 0.1).alias("r_symbol"),
        (F.size(F.array_intersect(utok, F.array([F.lit(s) for s in _STOPWORDS]))) >= 1).alias(
            "r_stop"
        ),
        ((F.size(utok).cast("double") / F.size(tok)) >= 0.3).alias("r_distinct"),
    )
    fails = [
        F.sum(F.when(~F.col(r), 1).otherwise(0)).alias(f"fail_{r[2:]}")
        for r in ("r_len", "r_wordlen", "r_symbol", "r_stop", "r_distinct")
    ]
    keep = F.sum(
        F.when(
            F.col("r_len")
            & F.col("r_wordlen")
            & F.col("r_symbol")
            & F.col("r_stop")
            & F.col("r_distinct"),
            1,
        ).otherwise(0)
    ).alias("n_keep")
    return (
        rules.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), *fails, keep)
        .orderBy("lang")
    )


@query(
    "domain_mix_reweight",
    oracle="""
    WITH s AS (
    SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
      AS total_tokens
    FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_tokens,
    round(CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER (), 4)
      AS token_share,
    round(least(
      (1.0 / count(*) OVER ())
        / (CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()),
      3.0), 4) AS sample_weight
    FROM s ORDER BY source
    """,
)
def domain_mix_reweight(spark, sf_dir):
    """Domain mixture reweighting: per source, token share of the corpus and
    the resampling weight that moves it toward a uniform target mixture
    (capped at 3x upsampling — the standard guard against minority-domain
    over-repetition).

    The expensive part (per-source token totals) is one scan + one tiny
    groupBy; the window runs over #sources rows (a handful), so the
    unpartitioned window is a non-issue at any scale — it never sees more
    rows than there are domains."""
    t = tables(spark, sf_dir)
    s = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).alias("total_tokens"),
        )
    )
    w = Window.partitionBy()
    share = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return s.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(share, 4).alias("token_share"),
        F.round(F.least(target / share, F.lit(3.0)), 4).alias("sample_weight"),
    ).orderBy("source")


# 2-gram DuckDB twin of word_shingles(tokens(text), 2): raw token order,
# distinct-ed afterwards (same convention as _SHINGLES_SQL).
_BIGRAMS_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(tok)-2, 0)+2), "
    "i -> array_to_string(list_slice(tok, i, i+1), ' ')))"
)


@query(
    "repetition_dup_ngram",
    oracle=f"""
    WITH d AS (
    SELECT lang, {_RAWTOK_SQL} AS tok FROM documents WHERE n_chars > 0
    ), r AS (
    SELECT lang,
    1.0 - CAST(len({_BIGRAMS_SQL}) AS DOUBLE)
        / greatest(len(tok) - 1, 1) AS rep
    FROM d
    )
    SELECT lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    round(avg(rep), 4) AS avg_rep,
    round(max(rep), 4) AS max_rep,
    CAST(sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def repetition_dup_ngram(spark, sf_dir):
    """Within-document repetition: duplicate word-bigram fraction
    (1 - distinct/total bigrams) per document, aggregated per language with
    a count of highly repetitive docs (>20% duplicated bigrams) — the
    boilerplate/degenerate-text signal quality pipelines threshold on.

    One scan, per-row array expressions, one groupBy(lang) — no joins, no
    explode; the bigram arrays never leave the row, so memory per task is
    bounded by the longest document, not the corpus."""
    t = tables(spark, sf_dir)
    tok = F.col("tok")
    total = F.greatest(F.size(tok) - 1, F.lit(1))
    rep = F.lit(1.0) - F.size(word_shingles(tok, 2)).cast("double") / total
    return (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("lang", tokens("text").alias("tok"))
        .select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("rep"), 4).alias("avg_rep"),
            F.round(F.max("rep"), 4).alias("max_rep"),
            F.sum(F.when(F.col("rep") > 0.2, 1).otherwise(0)).alias("n_repetitive"),
        )
        .orderBy("lang")
    )


# --- Fuzzy decontamination -------------------------------------------------
# The exact-overlap operator above catches verbatim n-gram hits; real
# pipelines (GPT-3 appendix C, Llama 2 §2.1 — public papers) also drop
# training docs that are NEAR-duplicates of benchmark items (paraphrases,
# whitespace/punctuation edits).  Fuzzy decontam = the MinHash-LSH dedup
# machinery pointed across the train/eval boundary instead of within the
# corpus.  The eval slice is wider (5%) than the exact operator's 2% so the
# synthetic corpus' planted near-dup clusters straddle the boundary at the
# driver SFs (at 2% the sf0.01 report is empty — a vacuous gate).
_FUZZY_EVAL_PCT = 5
_FUZZY_TH = 0.5


def _fuzzy_decontam_oracle(
    num_hashes: int = 32, bands: int = 8, threshold: float = 0.5
) -> str:
    """SQL mirror of decontam_fuzzy_minhash: the shared MinHash CTEs (same
    signature family as the dedup oracles), candidates restricted to
    train x eval bucket collisions, exact hashed-set Jaccard verify, then
    one bounded row per contaminated training doc."""
    ctes, jac = _minhash_ctes(num_hashes, bands, "shingles")
    ev = f"{h60_sql(chr(39) + 'eval:' + chr(39) + ' || text')} % 100 < {_FUZZY_EVAL_PCT}"
    return f"""
    {ctes}, ev AS (
    SELECT doc_id, {ev} AS is_eval FROM documents
    ), tb AS (
    SELECT b.doc_id, b.band_idx, b.bucket
    FROM buckets b JOIN ev ON ev.doc_id = b.doc_id WHERE NOT ev.is_eval
    ), eb AS (
    SELECT b.doc_id, b.band_idx, b.bucket
    FROM buckets b JOIN ev ON ev.doc_id = b.doc_id WHERE ev.is_eval
    ), cand_te AS (
    SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
    FROM tb t JOIN eb e ON t.band_idx = e.band_idx AND t.bucket = e.bucket
    ), v AS (
    SELECT c.train_id, c.eval_id, {jac} AS j
    FROM cand_te c
    JOIN hdocs da ON da.doc_id = c.train_id
    JOIN hdocs db ON db.doc_id = c.eval_id
    WHERE {jac} >= {threshold}
    )
    SELECT train_id AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
    round(max(j), 4) AS max_jaccard
    FROM v GROUP BY train_id ORDER BY doc_id
    """


@query("decontam_fuzzy_minhash", oracle=_fuzzy_decontam_oracle())
def decontam_fuzzy_minhash(
    spark, sf_dir, *, num_hashes: int = 32, bands: int = 8, threshold: float = _FUZZY_TH
):
    """Fuzzy benchmark decontamination: for every training document, find
    eval-slice documents whose shingle-set Jaccard >= threshold via banded
    MinHash-LSH, and report one bounded row per contaminated train doc
    (match count + max similarity) — the report a pipeline drops on.

    Shape at 100 TB: the signature relation is built ONCE (shared persisted
    front end of every MinHash operator, see dedup._minhash_sig) and split
    by the content-keyed eval flag; candidates come from an equi-join of
    train buckets against EVAL buckets only.  The eval side is a fixed
    benchmark suite — thousands of docs, not a corpus fraction — so its
    bucket relation is tiny and AQE broadcasts it at runtime (no hint: the
    relation is data-dependent, and the bounded-broadcast lint bans hints
    on anything that grows with the corpus).  Verify touches only
    candidate pairs; output is one row per contaminated train doc (rows
    alpha ~ contamination rate, not pairs).
    """
    t = tables(spark, sf_dir)
    sig = _minhash_sig(spark, sf_dir, num_hashes=num_hashes)
    ev = t["documents"].select(
        "doc_id",
        (h60(F.concat(F.lit("eval:"), F.col("text"))) % 100 < _FUZZY_EVAL_PCT).alias(
            "is_eval"
        ),
    )
    buckets = sig.join(ev, "doc_id").select(
        "doc_id",
        "is_eval",
        F.posexplode(band_bucket_array(num_hashes, bands)).alias("band_idx", "bucket"),
    )
    tb = buckets.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_id"), "band_idx", "bucket"
    )
    eb = buckets.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_id"), "band_idx", "bucket"
    )
    cand = (
        tb.join(eb, ["band_idx", "bucket"])
        .select("train_id", "eval_id")
        .dropDuplicates(["train_id", "eval_id"])
    )
    el_t = sig.select(F.col("doc_id").alias("train_id"), F.col("elems").alias("el_t"))
    el_e = sig.select(F.col("doc_id").alias("eval_id"), F.col("elems").alias("el_e"))
    v = (
        cand.join(el_t, "train_id")
        .join(el_e, "eval_id")
        .withColumn("jaccard", F.round(token_jaccard(F.col("el_t"), F.col("el_e")), 4))
        .filter(F.col("jaccard") >= threshold)
    )
    return (
        v.groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.round(F.max("jaccard"), 4).alias("max_jaccard"),
        )
        .select(F.col("train_id").alias("doc_id"), "n_eval_matches", "max_jaccard")
        .orderBy("doc_id")
    )


# --- Token-budget corpus selection ----------------------------------------
# Shared integer quality score: round(5000*distinct-token ratio +
# 5000*alpha-char ratio) — quantized to [0, 10000] so (a) ordering and
# cumulative sums are EXACT integer arithmetic on both engines, and (b)
# downstream percentile state is bounded by 10001 distinct values.
_QSCORE_SQL = (
    "CAST(round((5000.0 * len(utok)) / len(tok) + "
    "(5000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) / length(text)) "
    "AS BIGINT)"
)
_QSCORE_CTE = f"""s AS (
    SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS n_tokens,
    {_QSCORE_SQL} AS quality_score
    FROM (SELECT doc_id, source, text, {_RAWTOK_SQL} AS tok, {_TOK_SQL} AS utok
          FROM documents WHERE n_chars > 0)
    )"""


def _quality_scored(spark, sf_dir):
    """(doc_id, source, n_tokens, quality_score) — the integer-quantized
    quality relation shared by the budget-select and adaptive-threshold
    operators.  One scan, pure column expressions."""
    d = (
        fan_out(tables(spark, sf_dir)["documents"])
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            "text",
            tokens("text").alias("tok"),
            distinct_tokens("text").alias("utok"),
        )
    )
    score = F.lit(5000.0) * F.size("utok") / F.size("tok") + F.lit(5000.0) * F.length(
        F.regexp_replace("text", "[^a-zA-Z]", "")
    ) / F.length("text")
    return d.select(
        "doc_id",
        "source",
        F.size("tok").cast("long").alias("n_tokens"),
        F.round(score).cast("long").alias("quality_score"),
    )


@query(
    "corpus_token_budget_select",
    oracle=f"""
    WITH {_QSCORE_CTE}, c AS (
    SELECT *, SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id) AS cum_tokens
    FROM s
    )
    SELECT doc_id, source, quality_score, n_tokens,
    CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens * 2 <= (SELECT SUM(n_tokens) FROM s)
    ORDER BY doc_id
    """,
)
def corpus_token_budget_select(spark, sf_dir):
    """Token-budget corpus selection: rank documents by quality (best
    first, doc_id tie-break), keep the quality-ranked prefix whose
    cumulative token count fits the training budget (here: half the
    corpus' tokens, computed declaratively — no driver-side scalar).
    This is "select the best N tokens" — the final step of a curation
    pipeline once scores exist.

    Shape at 100 TB: a naive SUM() OVER (ORDER BY ...) is a
    single-partition window — the classic global-prefix-sum trap.  This
    implementation is the distributed two-level form: the integer quality
    score is quantized (bounded range [0, 10000]), so (1) the within-
    bucket running sum partitions by score-decile bucket (parallel,
    skew-bounded by the score histogram), and (2) the cross-bucket offsets
    come from a FIXED-cardinality (<= 1001 rows regardless of corpus
    size) per-bucket aggregate whose tiny window is the same
    bounded-relation pattern as the semdedup centroid crossJoin.  Sums are
    over bigint token counts — exact on both engines, no float drift.
    """
    s = track_persist(_quality_scored(spark, sf_dir))
    s = s.withColumn("qb", F.floor(F.col("quality_score") / F.lit(10)))
    win_in = (
        Window.partitionBy("qb")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = s.withColumn("cum_in", F.sum("n_tokens").over(win_in))
    btot = s.groupBy("qb").agg(F.sum("n_tokens").alias("b_tokens"))
    # <= 1001 rows by construction (score range / 10): a bounded-cardinality
    # relation, so the unpartitioned window is a 1-task job over ~1 KB.
    win_b = Window.orderBy(F.desc("qb")).rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "qb", F.coalesce(F.sum("b_tokens").over(win_b), F.lit(0)).alias("b_offset")
    )
    tot = s.agg(F.sum("n_tokens").alias("tot_tokens"))
    return (
        within.join(offs, "qb")
        .withColumn("cum_tokens", (F.col("b_offset") + F.col("cum_in")).cast("long"))
        .crossJoin(tot)
        .filter(F.col("cum_tokens") * 2 <= F.col("tot_tokens"))
        .select("doc_id", "source", "quality_score", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


@query(
    "quality_adaptive_threshold",
    oracle=f"""
    WITH {_QSCORE_CTE}, th AS (
    SELECT source, quantile_cont(CAST(quality_score AS DOUBLE), 0.30) AS q30
    FROM s GROUP BY source
    )
    SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
    round(min(th.q30), 4) AS threshold_q30,
    CAST(sum(CASE WHEN s.quality_score >= th.q30 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_keep,
    round(CAST(sum(CASE WHEN s.quality_score >= th.q30 THEN 1 ELSE 0 END) AS DOUBLE)
      / count(*), 4) AS keep_ratio
    FROM s JOIN th ON s.source = th.source
    GROUP BY s.source ORDER BY s.source
    """,
)
def quality_adaptive_threshold(spark, sf_dir):
    """Per-domain adaptive quality filtering: instead of one global
    threshold (quality_filter_rules), each source keeps documents above
    its OWN 30th-percentile quality score — the per-domain calibration
    real pipelines use so a uniformly-noisy domain is not wholesale
    dropped and a uniformly-clean one is not wholesale kept.

    Shape at 100 TB: the percentile is EXACT yet map-side-combinable —
    the quality score is integer-quantized to <= 10001 distinct values, so
    Spark's exact percentile aggregation state is a bounded value->count
    map per group (never a per-row collect; this is why the score is
    quantized rather than a raw double).  One groupBy(source) agg produces
    the threshold relation (cardinality = #domains), which joins back for
    the keep verdict — AQE broadcasts it when small, shuffles when a
    100 TB crawl has millions of domains.
    """
    s = track_persist(_quality_scored(spark, sf_dir))
    th = s.groupBy("source").agg(F.expr("percentile(quality_score, 0.30)").alias("q30"))
    keep = (F.col("quality_score") >= F.col("q30")).cast("int")
    return (
        s.join(th, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("q30"), 4).alias("threshold_q30"),
            F.sum(keep).cast("long").alias("n_keep"),
            F.round(F.sum(keep).cast("double") / F.count(F.lit(1)), 4).alias(
                "keep_ratio"
            ),
        )
        .orderBy("source")
    )


# Illustrative linear quality-classifier weights (fastText-style quality
# scorers in public pipelines — e.g. CCNet/DCLM-shaped — reduce to a linear
# model over cheap doc statistics; these coefficients are synthetic but the
# FEATURE SET and the scoring plan shape are the real thing).  Bias chosen
# so the synthetic corpus splits into both classes (threshold 0.5 lands
# near the corpus median score).
_QC_BIAS = -3.0
_QC_W_LOGLEN = 0.35  # ln(1 + word count): longer docs mildly favored
_QC_W_WORDLEN = 0.20  # mean word length: penalizes char-soup
_QC_W_STOP = 3.00  # stopword token ratio: strong naturalness signal
_QC_W_DIGIT = -4.00  # digit char ratio: tables/IDs/logs penalized
_QC_W_DISTINCT = 1.00  # distinct-token ratio: penalizes repetition


@query(
    "quality_classifier_linear",
    oracle=f"""
    WITH d AS (
    SELECT doc_id, source, {_RAWTOK_SQL} AS tok, {_TOK_SQL} AS utok, text, n_chars
    FROM documents WHERE n_chars > 0
    ), f AS (
    SELECT doc_id, source,
    ln(1 + len(tok)) AS f_loglen,
    CAST(list_sum(list_transform(tok, t -> len(t))) AS DOUBLE) / len(tok)
      AS f_wordlen,
    CAST(len(list_filter(tok, t -> list_contains({_STOPWORDS!r}, t)))
      AS DOUBLE) / len(tok) AS f_stop,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / n_chars
      AS f_digit,
    CAST(len(utok) AS DOUBLE) / len(tok) AS f_distinct
    FROM d WHERE len(tok) > 0
    ), s AS (
    SELECT doc_id, source,
    1.0 / (1.0 + exp(-({_QC_BIAS}
    + {_QC_W_LOGLEN} * f_loglen + {_QC_W_WORDLEN} * f_wordlen
    + {_QC_W_STOP} * f_stop + {_QC_W_DIGIT} * f_digit
    + {_QC_W_DISTINCT} * f_distinct))) AS score
    FROM f
    )
    SELECT doc_id, round(score, 6) AS score,
    score >= 0.5 AS keep
    FROM s ORDER BY doc_id
    """,
)
def quality_classifier_linear(spark, sf_dir):
    """Linear (logistic) quality classifier over cheap document statistics
    — the model-scoring stage of a curation pipeline, run Spark-first:
    every feature is a JVM-side column expression (tokenize once, fold
    lengths, two regexp counts), the dot product + sigmoid is codegen'd
    arithmetic, and the whole operator is ONE scan with no shuffle until
    the output sort.  At 100 TB this is embarrassingly parallel scoring;
    swapping in real learned weights (or a quantized MLP via pandas_udf)
    changes the coefficients, not the plan."""
    t = tables(spark, sf_dir)
    d = (
        fan_out(t["documents"])
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "text",
            "n_chars",
            F.split(F.lower(F.trim("text")), r"\s+").alias("tok"),
        )
        .withColumn("utok", F.array_distinct("tok"))
        .filter(F.size("tok") > 0)
    )
    stop_arr = F.array([F.lit(s) for s in _STOPWORDS])
    feats = d.select(
        "doc_id",
        F.log(F.lit(1) + F.size("tok")).alias("f_loglen"),
        (
            F.aggregate("tok", F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.size("tok")
        ).alias("f_wordlen"),
        (
            F.size(F.filter("tok", lambda t: F.array_contains(stop_arr, t)))
            .cast("double")
            / F.size("tok")
        ).alias("f_stop"),
        (
            F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
            / F.col("n_chars")
        ).alias("f_digit"),
        (F.size("utok").cast("double") / F.size("tok")).alias("f_distinct"),
    )
    z = (
        F.lit(_QC_BIAS)
        + F.lit(_QC_W_LOGLEN) * F.col("f_loglen")
        + F.lit(_QC_W_WORDLEN) * F.col("f_wordlen")
        + F.lit(_QC_W_STOP) * F.col("f_stop")
        + F.lit(_QC_W_DIGIT) * F.col("f_digit")
        + F.lit(_QC_W_DISTINCT) * F.col("f_distinct")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        feats.select(
            "doc_id",
            F.round(score, 6).alias("score"),
            (score >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


_DECILE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


@query(
    "quality_score_decile_audit",
    oracle=f"""
    WITH s AS (
    SELECT doc_id,
    round(CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
    / len(string_split_regex(lower(trim(text)), '\\s+')), 4) AS score,
    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
    FROM documents WHERE n_chars > 0
    ), b AS (
    SELECT quantile_cont(score, {_DECILE_QS}) AS bounds FROM s
    )
    SELECT CAST(1 + len(list_filter(bounds, x -> score > x)) AS BIGINT) AS decile,
    CAST(count(*) AS BIGINT) AS n_docs,
    min(score) AS min_score,
    max(score) AS max_score,
    CAST(sum(CASE WHEN n_tokens >= 20 AND score >= 0.3
    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
    CAST(round(sum(CAST(score AS DECIMAL(8, 4))), 4) AS DOUBLE) AS sum_score
    FROM s CROSS JOIN b
    GROUP BY 1
    ORDER BY 1
    """,
)
def quality_score_decile_audit(spark, sf_dir):
    """Decile audit of the lexical-diversity quality score: exact decile
    boundaries over the corpus, then per-decile counts, score range,
    keep-rule hits, and score mass — the calibration table a curation
    team reads before choosing a quality threshold (where does the keep
    rule start binding?  how heavy is the tail?).

    Scale-safe decile assignment: NO global ntile window (that is a
    single-partition sort).  Instead one grouped reduction computes the
    nine exact interpolated boundaries (at 100 TB: approx_percentile
    with a documented error bound — same plan shape), the 1-row bounds
    relation broadcasts, and each row buckets itself with an in-row
    filter over the 9-element array.  Both engines interpolate the same
    sorted multiset, so the boundaries and every bucket assignment are
    bit-identical; the score mass accumulates in DECIMAL(8,4) so the
    sum is accumulation-order-independent."""
    t = tables(spark, sf_dir)
    d = t["documents"].filter(F.col("n_chars") > 0)
    tok = tokens("text")
    score = F.round(
        F.size(distinct_tokens("text")).cast("double") / F.size(tok), 4
    )
    s = d.select(
        score.alias("score"), F.size(tok).cast("long").alias("n_tokens")
    )
    bounds = s.agg(
        F.expr(
            f"percentile(score, array({', '.join(str(q) for q in _DECILE_QS)}))"
        ).alias("bounds")
    )
    bucketed = s.crossJoin(F.broadcast(bounds)).select(
        (
            F.size(F.filter("bounds", lambda x: F.col("score") > x)) + 1
        ).cast("long").alias("decile"),
        "score",
        "n_tokens",
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.sum(
                F.when(
                    (F.col("n_tokens") >= 20) & (F.col("score") >= 0.3), 1
                ).otherwise(0)
            ).alias("n_keep"),
            F.round(F.sum(F.col("score").cast("decimal(8,4)")), 4)
            .cast("double")
            .alias("sum_score"),
        )
        .orderBy("decile")
    )
