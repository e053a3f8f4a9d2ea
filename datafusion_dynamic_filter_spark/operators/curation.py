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

from ..functions import distinct_tokens, fan_out, h60, h60_sql, tokens, word_shingles
from ..registry import query, tables
from .dedup import _RAWTOK_SQL, _SHINGLES_SQL, _TOK_SQL

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
