"""Training-data pipeline operators: dedup, text analysis, similarity.

These extend the reference's surface with the operations a large-scale
(100 TB) training-data pipeline needs, as first-class inventory entries
over the driver's `documents` and `embeddings` tables.  Everything is
expressed with built-in JVM-side functions (split/explode/groupBy/md5/
bit ops) so the plans stay in whole-stage codegen; the only Python-side
math is intentionally avoided — even MinHash/SimHash use md5-derived
integers so the DuckDB oracle can reproduce them bit-for-bit.

Determinism conventions: hashes are md5-hex-prefix integers (identical
in Spark and DuckDB); floating point similarity values are computed by
sequential left-to-right folds in double precision on both sides; output
floats are rounded where they are derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from graphd_spark.inventory import q, _t

# words-as-tokens: the corpus is space-separated lowercase words; the
# tokenizer is shared by every query here and by the DuckDB oracles
# (regexp_split on whitespace).
_TOKEN_RE = r"\s+"


def _tokens(col):
    return F.split(F.trim(col), _TOKEN_RE)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@q(
    "text_token_count",
    """
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_distinct,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + vocabulary size per doc."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        "n_chars",
    )


@q(
    "text_quality_score",
    """
    SELECT doc_id, n_tokens, n_stop,
           round(n_stop / n_tokens, 4) AS stop_ratio,
           round(n_chars / n_tokens, 4) AS avg_tok_len
    FROM (
      SELECT doc_id, n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                  t -> t IN ('the', 'a', 'of', 'on', 'in', 'and'))) AS DOUBLE) AS n_stop
      FROM documents) t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + mean token length per doc.

    The heuristics a pretraining-data filter runs (C4/Gopher-style
    length and stopword signals), all with built-in array functions."""
    (docs,) = _t(spark, sf_dir, "documents")
    stop = ["the", "a", "of", "on", "in", "and"]
    toks = _tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda t: t.isin(*stop))
        ).cast("double").alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        F.round(F.col("n_stop") / F.col("n_tokens"), 4).alias("stop_ratio"),
        F.round(F.col("n_chars") / F.col("n_tokens"), 4).alias("avg_tok_len"),
    )


@q(
    "doc_fingerprint",
    """
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonicalize then hash."""
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )


@q(
    "text_lang_stats",
    """
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language profile (the reporting side of language-ID)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 2).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@q(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, count(*) AS dup_cnt, min(doc_id) AS keeper
    FROM documents GROUP BY text HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content; keep the lowest doc_id.

    Scale: groupBy(md5) shuffles 16-byte keys, not documents; the keeper
    choice (min id) is an order-independent aggregate."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.count("*").alias("dup_cnt"), F.min("doc_id").alias("keeper"))
        .filter(F.col("dup_cnt") > 1)
        .select(F.md5(F.col("text")).alias("text_hash"), "dup_cnt", "keeper")
    )


def _shingles(col, n: int = 3):
    """Word n-gram shingles of a text column as a deduplicated array."""
    toks = _tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )).otherwise(F.array().cast("array<string>"))


# word 3-grams; DuckDB list slicing is 1-based and end-inclusive
_SHINGLE_SQL = """
      SELECT doc_id, unnest(list_distinct([
               array_to_string(toks[i:i+2], ' ')
               for i in range(1, len(toks) - 1)])) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents) raw
"""


@q(
    "dedup_ngram_jaccard",
    f"""
    WITH shingled AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(shared / (sa.n + sb.n - shared), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE shared / (sa.n + sb.n - shared) >= 0.30
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: exact Jaccard over word-3-gram shingle sets.

    The shuffle key is the shingle, so identical content co-locates; the
    pair-count groupBy is the standard inverted-index self-join.  At
    100 TB the candidate generation step is replaced by MinHash-LSH
    (dedup_minhash_lsh below) and this exact Jaccard runs only on the
    surviving candidate pairs."""
    (docs,) = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard_raw",
            F.col("shared") / (F.col("sa.n") + F.col("sb.n") - F.col("shared")),
        )
        .filter(F.col("jaccard_raw") >= 0.30)
    )
    return jac.select(
        "doc_a", "doc_b", F.round(F.col("jaccard_raw"), 4).alias("jaccard")
    )


# MinHash: K independent hash functions h_k(shingle) = first 8 hex chars
# of md5(k || ':' || shingle) as an integer; the signature is the
# per-document minimum of each h_k.  md5 is identical in Spark and
# DuckDB, so the oracle reproduces the signature exactly.
_MINHASH_K = 16
_BANDS = 4  # 4 bands x 4 rows


@q(
    "dedup_minhash_lsh",
    f"""
    WITH shingled AS ({_SHINGLE_SQL}),
    hashed AS (
      SELECT doc_id, k,
             min(CAST(('0x' || substr(md5(k::VARCHAR || ':' || shingle), 1, 8))
                      AS BIGINT)) AS minhash
      FROM shingled CROSS JOIN (SELECT unnest(range({_MINHASH_K})) AS k) ks
      GROUP BY doc_id, k),
    bands AS (
      SELECT doc_id, k // {_MINHASH_K // _BANDS} AS band,
             string_agg(minhash::VARCHAR, ',' ORDER BY k) AS sig
      FROM hashed GROUP BY doc_id, band),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b FROM candidates
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs.

    shingle -> K minhashes -> band signatures -> bucket self-join.
    Scale: the only shuffles are groupBy(doc,k) on md5-sized rows and
    the band-signature self-join, which touches candidate buckets only —
    never the O(n^2) pair space.  K={_MINHASH_K}, bands={_BANDS}."""
    (docs,) = _t(spark, sf_dir, "documents")
    rows_per_band = _MINHASH_K // _BANDS
    sh = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    ks = spark.range(_MINHASH_K).select(F.col("id").cast("int").alias("k"))
    hashed = (
        sh.crossJoin(F.broadcast(ks))
        .select(
            "doc_id",
            "k",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("k").cast("string"), F.col("shingle"))),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("doc_id", "k")
        .agg(F.min("h").alias("minhash"))
    )
    bands = (
        hashed.withColumn("band", (F.col("k") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("k", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@q(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                            >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
      FROM toks CROSS JOIN (SELECT unnest(range(32)) AS bit) b
      GROUP BY doc_id, b.bit)
    SELECT doc_id,
           CAST(sum(CASE WHEN weight > 0 THEN 1::BIGINT << bit ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document sketches (32-bit, token-hash majority vote).

    Hamming-close simhashes => near-duplicate texts; downstream pairing
    groups on rotated prefixes.  Deterministic md5-derived token hashes
    so the oracle matches bit-for-bit."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    ).withColumn(
        "tok_hash",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint"),
    )
    bits = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    weighted = (
        toks.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "bit",
            F.expr(
                "CASE WHEN (shiftright(tok_hash, bit) & 1) = 1 THEN 1 ELSE -1 END"
            ).alias("contrib"),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("weight"))
    )
    return (
        weighted.groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN weight > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
                    "ELSE CAST(0 AS BIGINT) END"
                )
            )
            .cast("bigint")
            .alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

# Sequential left-to-right double-precision fold, identical on both
# sides: Spark F.aggregate over the array; DuckDB list_sum preserves
# order... we instead spell the fold with unnest ordinality to be safe.


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


@q(
    "ann_cosine_topk",
    """
    WITH sims AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
    SELECT q_id, n_id, rank FROM (
      SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY round(sim, 6) DESC, n_id) AS rank
      FROM sims) t
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline for ANN search.

    Scale: the query side (10 vectors) broadcasts; each executor scans
    its shard of the corpus and emits only its local top-k via the
    window — the TakeOrdered pattern per query id.  Similarities are
    rounded to 1e-6 before ranking so the rank order is insensitive to
    summation-order ulps; ties break on n_id."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cv = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
    sims = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_emb"), F.col("n_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("n_emb")))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.round(F.col("sim"), 6).desc(), "n_id")
    return (
        sims.select("q_id", "n_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 5)
    )


@q(
    "embedding_cluster_stats",
    """
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding statistics (norm profile by label)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(_norm(F.col("embedding"))), 4).alias("avg_norm"),
    )
