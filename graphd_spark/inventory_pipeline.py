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
from graphd_spark.jexpr import _c, _l

# words-as-tokens: the corpus is space-separated lowercase words; the
# tokenizer is shared by every query here and by the DuckDB oracles
# (regexp_split on whitespace).
_TOKEN_RE = r"\s+"


def _tokens(col):
    return F.split(F.trim(col), _TOKEN_RE)


from graphd_spark.session import scan_bytes as _scan_bytes  # noqa: E402

#: scan partition size assumed by _spread's width estimate; matches
#: spark.sql.files.maxPartitionBytes' default (128 MB)
_MAX_PARTITION_BYTES = 128 << 20


def _spread(df: DataFrame, mb_per_slot: float | None = None) -> DataFrame:
    """Widen a narrow scan before an explode-/Python-heavy stage.

    Toy-scale parquet (a single file below maxPartitionBytes) scans as
    ONE partition, so all the per-token/per-shingle hashing upstream of
    the first shuffle runs on one core.  At production scale the scan
    already has >= defaultParallelism splits and this returns the input
    unchanged — no shuffle is added where the data is already wide.

    The width is derived from the input size (guide: scale-adaptive
    partitioning, not a constant): by default CPU-heavy JVM stages
    (shingle/token hashing) widen to full core count; a stage whose
    per-row work is cheap but whose per-*partition* overhead is real
    (an Arrow Python worker per partition) passes ``mb_per_slot`` so a
    594 KB toy input keeps a single well-filled batch instead of
    fanning 32 near-empty Python workers (measured 2-4x slower than
    one worker at sf0.1), while anything cluster-sized still reaches
    every core.  File metadata replaces the old
    ``df.rdd.getNumPartitions()`` probe, which compiled the physical
    plan (~40 ms + codegen per call) just to count partitions."""
    par = df.sparkSession.sparkContext.defaultParallelism
    nbytes = _scan_bytes(df)
    if nbytes is None:
        # non-scan input (no file metadata): the old exact probe
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
        return df
    scan_parts = max(1, nbytes // _MAX_PARTITION_BYTES)
    if scan_parts >= par:
        return df  # already wide at the scan
    if mb_per_slot is None:
        width = par
    else:
        width = min(par, max(1, -(-nbytes // int(mb_per_slot * (1 << 20)))))
    if width > scan_parts:
        return df.repartition(width)
    return df


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
    toks = _tokens(_c("text"))
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
    toks = _tokens(_c("text"))
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
        F.round(_c("n_stop") / _c("n_tokens"), 4).alias("stop_ratio"),
        F.round(_c("n_chars") / _c("n_tokens"), 4).alias("avg_tok_len"),
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
        "doc_id", F.md5(F.lower(F.trim(_c("text")))).alias("fingerprint")
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
        F.round(F.avg(_c("n_chars").cast("double")), 2).alias("avg_chars"),
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

    Scale: the md5 is computed map-side BEFORE the groupBy, so the
    shuffle carries 32-byte keys, never the document text; the keeper
    choice (min id) is an order-independent aggregate."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(_c("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_cnt"), F.min("doc_id").alias("keeper"))
        .filter(_c("dup_cnt") > 1)
    )


@q(
    "dedup_exact_prefix",
    r"""
    SELECT md5(array_to_string(
             regexp_split_to_array(trim(text), '\s+')[1:10], ' '))
             AS prefix_hash,
           count(*) AS dup_cnt, min(doc_id) AS keeper
    FROM documents
    GROUP BY array_to_string(regexp_split_to_array(trim(text), '\s+')[1:10], ' ')
    HAVING count(*) > 1
    """,
)
def dedup_exact_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup: documents sharing their first 10
    tokens (boilerplate headers, templated pages, truncation
    artifacts) — the cheap first pass a web-corpus pipeline runs
    before the full near-dup machinery.

    Same scale shape as dedup_exact: the fingerprint md5 is computed
    map-side, the shuffle carries 32-byte keys."""
    (docs,) = _t(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(_tokens(_c("text")), 1, 10))
    return (
        docs.select(F.md5(prefix).alias("prefix_hash"), "doc_id")
        .groupBy("prefix_hash")
        .agg(F.count("*").alias("dup_cnt"), F.min("doc_id").alias("keeper"))
        .filter(_c("dup_cnt") > 1)
    )


def _shingles(col, n: int = 3):
    """Word 3-gram shingles of a text column as a deduplicated array.

    Formulated as a zip of three aligned token slices (one slice per
    offset, taken once) instead of a per-index F.slice inside
    transform — the per-element slice allocates an n-token array per
    shingle and is ~3.5x slower at sf0.1."""
    assert n == 3
    toks = _tokens(col)
    z = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 2),
        F.slice(toks, 2, F.size(toks) - 2),
        F.slice(toks, 3, F.size(toks) - 2),
    )
    return F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]))
        ),
    ).otherwise(F.array().cast("array<string>"))


# word 3-grams; DuckDB list slicing is 1-based and end-inclusive
_SHINGLE_SQL = """
      SELECT doc_id, unnest(list_distinct([
               array_to_string(toks[i:i+2], ' ')
               for i in range(1, len(toks) - 1)])) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents) raw
"""


# document-frequency cap: a shingle occurring in more than DF_CAP
# documents contributes O(df^2) candidate pairs and carries almost no
# dedup signal — the inverted-index join drops it up front.
_DF_CAP = 50


@q(
    "dedup_ngram_jaccard",
    f"""
    WITH shingled AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    rare AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
        FROM shingled) t
      WHERE df <= {_DF_CAP}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM rare a JOIN rare b
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

    The shuffle key is the shingle, so identical content co-locates.
    Hot shingles are capped by document frequency (df <= {_DF_CAP})
    before the self-join — an uncapped shingle in f docs yields f^2
    candidate pairs, the classic inverted-index blowup.  The df window
    partitions on the same key as the join, so the cap costs no extra
    shuffle.  At 100 TB candidate generation moves to MinHash-LSH
    (dedup_minhash_lsh below) and this exact Jaccard runs only on the
    surviving candidate pairs (the Jaccard denominator still uses the
    uncapped set sizes)."""
    (docs,) = _t(spark, sf_dir, "documents")
    sh = _spread(docs).select(
        "doc_id", F.explode(_shingles(_c("text"))).alias("shingle")
    )
    # per-doc set size == length of the (already-distinct) shingle
    # array, computed map-side on a second narrow scan — replaces a
    # groupBy over the exploded relation, i.e. drops one full
    # explode+shuffle pass (shuffle bytes: one row per shingle
    # instance -> one row per doc)
    sizes = docs.select(
        "doc_id", F.size(_shingles(_c("text"))).alias("n")
    )
    rare = sh.withColumn(
        "df", F.count("*").over(W.partitionBy("shingle"))
    ).filter(_c("df") <= _DF_CAP).drop("df")
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(
            b,
            (_c("a.shingle") == _c("b.shingle"))
            & (_c("a.doc_id") < _c("b.doc_id")),
        )
        .groupBy(
            _c("a.doc_id").alias("doc_a"), _c("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        pairs.join(sa, _c("doc_a") == _c("sa.doc_id"))
        .join(sb, _c("doc_b") == _c("sb.doc_id"))
        .withColumn(
            "jaccard_raw",
            _c("shared") / (_c("sa.n") + _c("sb.n") - _c("shared")),
        )
        .filter(_c("jaccard_raw") >= 0.30)
    )
    return jac.select(
        "doc_a", "doc_b", F.round(_c("jaccard_raw"), 4).alias("jaccard")
    )


# MinHash: ONE md5 per shingle supplies a 60-bit base hash; the K
# hash functions are affine transforms h_k = ((2k+1)*h0 + 12345k + 7)
# mod (2^31-1) of it — the classic a*h+b family, 16x fewer digest
# computations than hashing per-k (md5 dominates the signature cost).
# md5 and the modular arithmetic are identical in Spark and DuckDB, so
# the oracle reproduces signatures exactly.
_MINHASH_K = 16
_BANDS = 4  # 4 bands x 4 rows
_MH_MOD = 2147483647  # 2^31 - 1
# an LSH bucket bigger than this is an exact-duplicate cluster in
# disguise: its members pair O(size^2) and belong to dedup_exact, not
# the near-dup path.  The cap keeps the candidate join skew-free.
_BUCKET_CAP = 64


# LSH candidate-pair CTE chain, shared by the dedup_minhash_lsh oracle
# and the dedup_components oracle (which clusters the same pairs)
_LSH_CTES = f"""shingled AS ({_SHINGLE_SQL}),
    based AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
               % {_MH_MOD} AS h0
      FROM shingled),
    hashed AS (
      SELECT doc_id, k,
             min(((2 * k + 1) * h0 + 12345 * k + 7) % {_MH_MOD}) AS minhash
      FROM based CROSS JOIN (SELECT unnest(range({_MINHASH_K})) AS k) ks
      GROUP BY doc_id, k),
    bands AS (
      SELECT doc_id, k // {_MINHASH_K // _BANDS} AS band,
             string_agg(minhash::VARCHAR, ',' ORDER BY k) AS sig
      FROM hashed GROUP BY doc_id, band),
    capped AS (
      SELECT doc_id, band, sig FROM (
        SELECT doc_id, band, sig,
               count(*) OVER (PARTITION BY band, sig) AS bsize
        FROM bands) t
      WHERE bsize <= {_BUCKET_CAP}),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)"""


@q(
    "dedup_minhash_lsh",
    f"""
    WITH {_LSH_CTES}
    SELECT doc_a, doc_b FROM candidates
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs.

    shingle -> K-vector of hashes as ONE array column -> element-wise
    min aggregate -> band signatures -> bucket self-join.

    Scale: all K={_MINHASH_K} hashes ride one row per shingle (no K-way
    row multiplication anywhere), so the signature costs a single
    groupBy(doc_id) at 1x shingle rows; banding explodes to {_BANDS}
    rows per doc; the band-signature self-join touches candidate
    buckets only — the O(n^2) pair space is never materialized.
    Buckets larger than {_BUCKET_CAP} are dropped before the join
    (exact-dup clusters pair quadratically and belong to dedup_exact);
    the cap's window shares the join's partitioning key."""
    (docs,) = _t(spark, sf_dir, "documents")
    return _lsh_candidate_pairs(docs)


def _lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """MinHash-LSH candidate pairs (doc_a < doc_b) for a documents DF;
    the implementation behind dedup_minhash_lsh, shared with
    dedup_components."""
    rows_per_band = _MINHASH_K // _BANDS
    sh = _spread(docs).select(
        "doc_id", F.explode(_shingles(_c("text"))).alias("shingle")
    )
    # one md5 per shingle, then K affine transforms of it in the
    # aggregates.  No collapse barrier needed (r9): Spark 4's
    # CollapseProject refuses to duplicate the expensive md5 into the
    # K min-aggregates (verified on the optimized plan: one md5
    # occurrence, sf0.1 A/B a wash), so the old localCheckpoint here
    # only cost a persist of the exploded (doc_id, h0) relation —
    # the pipeline's biggest intermediate — for nothing.
    based = sh.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(_c("shingle")), 1, 15), 16, 10)
            .cast("bigint")
            % _MH_MOD
        ).alias("h0"),
    )
    # K affine transforms of the checkpointed h0 as direct aggregate
    # expressions — no per-row K-element array construction (the
    # transform+element_at form allocated one array per shingle row
    # just to index it back out in the K min-aggregates)
    def _affine(k: int):
        return (
            (2 * k + 1) * _c("h0") + _l(12345 * k + 7)
        ) % _MH_MOD

    sigs = based.groupBy("doc_id").agg(
        F.array(
            *[F.min(_affine(k)) for k in range(_MINHASH_K)]
        ).alias("sig")
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        _l(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(
                                    _c("sig"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda s: s.cast("string"),
                            ),
                            ",",
                        ).alias("sig"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", _c("bs.band").alias("band"), _c("bs.sig").alias("sig"))
    capped = bands.withColumn(
        "bsize", F.count("*").over(W.partitionBy("band", "sig"))
    ).filter(_c("bsize") <= _BUCKET_CAP).drop("bsize")
    # materialize once before the self-join: both branches read the
    # checkpointed buckets instead of recomputing the signature
    # pipeline (at cluster scale this is a persist of ~bands x docs
    # tiny rows)
    capped = capped.localCheckpoint(eager=False)
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (_c("a.band") == _c("b.band"))
            & (_c("a.sig") == _c("b.sig"))
            & (_c("a.doc_id") < _c("b.doc_id")),
        )
        .select(_c("a.doc_id").alias("doc_a"), _c("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _simhash_col(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """doc_id -> 32-bit simhash, computed with ONE row per token.

    The per-bit +-1 contributions aggregate as 32 direct sums in a
    single groupBy(doc_id) — no 32x row multiplication."""
    # no collapse barrier needed (r9): Spark 4's CollapseProject
    # refuses to duplicate the expensive md5 into the 32 sum-aggregate
    # expressions (verified on the optimized plan: one md5 occurrence,
    # sf0.1 A/B a wash), so the old localCheckpoint here only cost a
    # persist of the exploded (doc_id, tok_hash) relation — the
    # pipeline's biggest intermediate — for nothing
    toks = _spread(docs).select(
        "doc_id", F.explode(_tokens(_c("text"))).alias("tok")
    ).withColumn(
        "tok_hash",
        F.conv(F.substring(F.md5(_c("tok")), 1, 8), 16, 10).cast("bigint"),
    )
    # per-bit +-1 sums as 32 direct aggregate expressions — no per-row
    # 32-element array construction (the transform+element_at form
    # allocated one array per token row just to index it back out)
    weighted = toks.groupBy("doc_id").agg(
        F.array(
            *[
                F.sum(
                    F.when(
                        F.shiftright(_c("tok_hash"), i)
                        .bitwiseAND(_l(1)) == 1,
                        _l(1),
                    ).otherwise(_l(-1))
                )
                for i in range(32)
            ]
        ).alias("w")
    )
    sim = F.expr(
        "aggregate(zip_with(w, sequence(0, 31), (wt, bit) -> "
        "CASE WHEN wt > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
        "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), "
        "(acc, v) -> acc + v)"
    )
    return weighted.select("doc_id", sim.cast("bigint").alias("simhash"))


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

    Hamming-close simhashes => near-duplicate texts (pairing stage:
    dedup_simhash_pairs).  Deterministic md5-derived token hashes so
    the oracle matches bit-for-bit."""
    (docs,) = _t(spark, sf_dir, "documents")
    return _simhash_col(spark, docs)


_SIMHASH_PAIR_SQL = """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                            >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS weight
      FROM toks CROSS JOIN (SELECT unnest(range(32)) AS bit) b
      GROUP BY doc_id, b.bit),
    sketches AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN weight > 0 THEN 1::BIGINT << bit ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id),
    banded AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bkey
      FROM sketches CROSS JOIN (SELECT unnest(range(4)) AS band) b),
    capped AS (
      SELECT doc_id, simhash, band, bkey FROM (
        SELECT doc_id, simhash, band, bkey,
               count(*) OVER (PARTITION BY band, bkey) AS bsize
        FROM banded) t
      WHERE bsize <= 64),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) AS INTEGER)
             AS hamming
    FROM cands
    WHERE bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) <= 3
"""


@q("dedup_simhash_pairs", _SIMHASH_PAIR_SQL)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: Hamming-banded bucket join.

    By pigeonhole, two 32-bit sketches within Hamming distance 3 agree
    exactly on at least one of 4 disjoint 8-bit bands, so candidates
    come from equality joins on (band, band-bits) — never the O(n^2)
    pair space — and the exact popcount check runs per candidate.
    Oversized buckets (> {_BUCKET_CAP}) are exact-dup clusters and are
    dropped before the join, keeping it skew-free.
    This is the scale path the sketches exist for."""
    (docs,) = _t(spark, sf_dir, "documents")
    sk = _simhash_col(spark, docs)
    banded = sk.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[_l(b) for b in range(4)])
        ).alias("band"),
    ).withColumn(
        "bkey", F.expr("shiftright(simhash, band * 8) & 255")
    )
    banded = banded.withColumn(
        "bsize", F.count("*").over(W.partitionBy("band", "bkey"))
    ).filter(_c("bsize") <= _BUCKET_CAP).drop("bsize")
    # single materialization feeds both self-join branches
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (_c("a.band") == _c("b.band"))
            & (_c("a.bkey") == _c("b.bkey"))
            & (_c("a.doc_id") < _c("b.doc_id")),
        )
        .select(
            _c("a.doc_id").alias("doc_a"),
            _c("b.doc_id").alias("doc_b"),
            _c("a.simhash").alias("sim_a"),
            _c("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.expr("CAST(bit_count(sim_a ^ sim_b) AS INT)")
    return cands.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(_c("hamming") <= 3)


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

# Sequential left-to-right double-precision fold, identical on both
# sides: Spark F.aggregate over the array; DuckDB list_sum preserves
# order... we instead spell the fold with unnest ordinality to be safe.


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        _l(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            _l(0.0),
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
    emb = _spread(emb)
    qv = emb.filter(_c("vec_id") < 10).select(
        _c("vec_id").alias("q_id"), _c("embedding").alias("q_emb")
    )
    cv = emb.select(_c("vec_id").alias("n_id"), _c("embedding").alias("n_emb"))
    sims = (
        cv.crossJoin(F.broadcast(qv))
        .filter(_c("n_id") != _c("q_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(_c("q_emb"), _c("n_emb"))
                / (_norm(_c("q_emb")) * _norm(_c("n_emb")))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.round(_c("sim"), 6).desc(), "n_id")
    return (
        sims.select("q_id", "n_id", F.row_number().over(w).alias("rank"))
        .filter(_c("rank") <= 5)
    )


# Random-hyperplane LSH: P planes over the embedding dimension, each
# coefficient +-1 derived from md5(p:d) so Spark and DuckDB build the
# identical planes.  Two vectors in the same sign bucket are
# cosine-close with high probability.  4 bits suit the 500-vector test
# corpus (~2^4 buckets); a 100 TB corpus raises this to 16-24 bits and
# unions several plane tables for recall, exactly like MinHash bands.
_ANN_PLANES = 4
_EMB_DIM = 64  # TESTDATA.md embeddings dimension


def _plane_coeffs() -> list[list[float]]:
    import hashlib

    out = []
    for p in range(_ANN_PLANES):
        row = []
        for d in range(_EMB_DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8]
            row.append(1.0 if int(h, 16) % 2 == 1 else -1.0)
        out.append(row)
    return out


@q(
    "ann_lsh_topk",
    f"""
    WITH planes AS (
      SELECT p, [CASE WHEN CAST(('0x' || substr(md5(p::VARCHAR || ':' ||
                         d::VARCHAR), 1, 8)) AS BIGINT) % 2 = 1
                 THEN 1.0 ELSE -1.0 END
                 FOR d IN range({_EMB_DIM})] AS coeffs
      FROM (SELECT unnest(range({_ANN_PLANES})) AS p) ps),
    buckets AS (
      SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                                 pl.coeffs) > 0
                      THEN 1::BIGINT << pl.p ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding),
    capped AS (
      SELECT vec_id, embedding, bucket FROM (
        SELECT b.*, row_number() OVER (PARTITION BY bucket
                                       ORDER BY vec_id) AS __r
        FROM buckets b) t
      WHERE __r <= 64),
    sims AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[])) *
              sqrt(list_dot_product(c.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]))) AS sim
      FROM buckets q JOIN capped c
        ON q.bucket = c.bucket AND q.vec_id < 10 AND c.vec_id <> q.vec_id)
    SELECT q_id, n_id, rank FROM (
      SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY round(sim, 6) DESC, n_id) AS rank
      FROM sims) t
    WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (the ANN scale path).

    Random-hyperplane signatures ({_ANN_PLANES} bits) bucket the corpus;
    exact cosine runs only within a query's bucket.  Scale: the bucket
    id is computed map-side from broadcast plane literals (one pass,
    no shuffle), the candidate join is an equi-join on bucket — the
    brute-force scan of ann_cosine_topk becomes a hash lookup touching
    ~n/2^bits of the corpus per query.  Recall tunes with bands of
    planes exactly like MinHash banding."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    # NOT spread: the bucket ids compute map-side from broadcast
    # literals — a repartition shuffles the embedding arrays for
    # no parallelism gain (A/B at sf0.1: 2.1s vs 3.5s for IVF)
    planes = _plane_coeffs()
    plane_arr = F.array(
        *[F.array(*[_l(c) for c in row]) for row in planes]
    )
    # bit p contributes 2^p; doubles are exact for 16-bit buckets
    bucket = F.aggregate(
        F.transform(
            plane_arr,
            lambda row, p: F.when(
                _dot(_c("embedding"), row) > 0,
                F.pow(_l(2.0), p.cast("double")),
            ).otherwise(_l(0.0)),
        ),
        _l(0.0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    bucketed = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    # bucket cap: a degenerate bucket (e.g. a zero-vector cluster
    # hashing identically) would otherwise pair quadratically — cap
    # candidates per bucket like the dedup paths do; recall loss is
    # bounded and deterministic (lowest vec_ids kept)
    wcap = W.partitionBy("bucket").orderBy("vec_id")
    capped = (
        bucketed.withColumn("__r", F.row_number().over(wcap))
        .filter(_c("__r") <= 64)
        .drop("__r")
    )
    qv = bucketed.filter(_c("vec_id") < 10).select(
        _c("vec_id").alias("q_id"),
        _c("embedding").alias("q_emb"),
        _c("bucket").alias("q_bucket"),
    )
    sims = (
        capped.join(
            F.broadcast(qv), _c("bucket") == _c("q_bucket")
        )
        .filter(_c("vec_id") != _c("q_id"))
        .select(
            "q_id",
            _c("vec_id").alias("n_id"),
            (
                _dot(_c("q_emb"), _c("embedding"))
                / (_norm(_c("q_emb")) * _norm(_c("embedding")))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.round(_c("sim"), 6).desc(), "n_id")
    return sims.select(
        "q_id", "n_id", F.row_number().over(w).alias("rank")
    ).filter(_c("rank") <= 5)


#: embedding near-dup threshold: cosine at/above this marks a pair as
#: duplicate candidates (the synthetic corpus peaks near 0.51, so 0.4
#: yields a small positive set; production corpora with true
#: near-duplicates sit near 1.0 and raise this to ~0.95)
_EMB_DUP_TAU = 0.4


@q(
    "dedup_embedding_cosine",
    f"""
    WITH planes AS (
      SELECT p, [CASE WHEN CAST(('0x' || substr(md5(p::VARCHAR || ':' ||
                         d::VARCHAR), 1, 8)) AS BIGINT) % 2 = 1
                 THEN 1.0 ELSE -1.0 END
                 FOR d IN range({_EMB_DIM})] AS coeffs
      FROM (SELECT unnest(range({_ANN_PLANES})) AS p) ps),
    buckets AS (
      SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                                 pl.coeffs) > 0
                      THEN 1::BIGINT << pl.p ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding),
    capped AS (
      SELECT vec_id, embedding, bucket FROM (
        SELECT b.*, row_number() OVER (PARTITION BY bucket
                                       ORDER BY vec_id) AS __r
        FROM buckets b) t
      WHERE __r <= 64)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[],
                                  b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                    a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]))), 4) AS sim
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                   a.embedding::DOUBLE[])) *
             sqrt(list_dot_product(b.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]))), 4)
          >= {_EMB_DUP_TAU}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (semantic dedup).

    The same hyperplane sign buckets as :func:`ann_lsh_topk` generate
    candidate pairs; exact cosine >= {tau} confirms them.  Scale: the
    bucket id computes map-side from broadcast plane literals, the
    candidate join is an equi-join on bucket — never all-pairs — and
    the exact check touches only in-bucket pairs.  Recall tunes with
    the number of plane tables (bands) exactly like MinHash; the
    handoff from MinHash dedup is: shingles catch lexical
    near-duplicates, embeddings catch paraphrases.""".format(
        tau=_EMB_DUP_TAU
    )
    (emb,) = _t(spark, sf_dir, "embeddings")
    # spread REINSTATED (r10): r9 dropped it on the builder's host
    # A/B, but the driver's 32-core run measured the drop 16% slower
    # and the 8-vs-32 scaling ratio (1.26) showed the query lost
    # local parallelism — the 16-plane bucket + norm HOF arithmetic
    # (~1k flops/row) is real JVM CPU that otherwise runs at the
    # scan's width (ONE partition at sf0.1).  Same treatment as
    # ann_cosine_topk; at cluster scale the scan is already wide and
    # _spread is a no-op
    emb = _spread(emb)
    planes = _plane_coeffs()
    plane_arr = F.array(
        *[F.array(*[_l(c) for c in row]) for row in planes]
    )
    bucket = F.aggregate(
        F.transform(
            plane_arr,
            lambda row, p: F.when(
                _dot(_c("embedding"), row) > 0,
                F.pow(_l(2.0), p.cast("double")),
            ).otherwise(_l(0.0)),
        ),
        _l(0.0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    # normalize map-side so the pair join computes ONE dot product
    # per candidate instead of a dot plus two norms — the per-pair
    # cost is the scale driver here
    bucketed = (
        emb.select(
            "vec_id", "embedding", bucket.alias("bucket"),
            _norm(_c("embedding")).alias("__nrm"),
        )
        .select(
            "vec_id", "bucket",
            F.transform(
                "embedding",
                lambda x: x.cast("double") / _c("__nrm"),
            ).alias("nemb"),
        )
    )
    # bucket cap (same rationale as ann_lsh_topk): a degenerate bucket
    # would pair quadratically; keep the 64 lowest vec_ids per bucket —
    # deterministic, so the oracle mirrors it exactly
    wcap = W.partitionBy("bucket").orderBy("vec_id")
    bucketed = (
        bucketed.withColumn("__r", F.row_number().over(wcap))
        .filter(_c("__r") <= 64)
        .drop("__r")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = F.round(_dot(_c("a.nemb"), _c("b.nemb")), 4)
    return (
        a.join(
            b,
            (_c("a.bucket") == _c("b.bucket"))
            & (_c("a.vec_id") < _c("b.vec_id")),
        )
        .select(
            _c("a.vec_id").alias("id_a"),
            _c("b.vec_id").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(_c("sim") >= _EMB_DUP_TAU)
    )


#: IVF probe width: nearest coarse centroids searched per query
_IVF_NPROBE = 2


@q(
    "ann_ivf_topk",
    f"""
    WITH dims AS (
      SELECT e.label, d.pos, avg(CAST(e.embedding[d.pos + 1] AS DOUBLE)) AS c
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range({_EMB_DIM})) AS pos) d
      GROUP BY e.label, d.pos),
    centroids AS (
      SELECT label AS c_id, list(c ORDER BY pos) AS centroid
      FROM dims GROUP BY label),
    assign AS (
      SELECT vec_id, embedding, c_id FROM (
        SELECT e.vec_id, e.embedding, c.c_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(
                   list_dot_product(e.embedding::DOUBLE[], c.centroid) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(c.centroid, c.centroid))), 6)
                   DESC, c.c_id) AS rk
        FROM embeddings e CROSS JOIN centroids c) t
      WHERE rk = 1),
    probes AS (
      SELECT vec_id AS q_id, c_id FROM (
        SELECT e.vec_id, c.c_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(
                   list_dot_product(e.embedding::DOUBLE[], c.centroid) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(c.centroid, c.centroid))), 6)
                   DESC, c.c_id) AS rk
        FROM embeddings e CROSS JOIN centroids c
        WHERE e.vec_id < 10) t
      WHERE rk <= {_IVF_NPROBE}),
    sims AS (
      SELECT p.q_id, a.vec_id AS n_id,
             list_dot_product(q.embedding::DOUBLE[],
                              a.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[])) *
              sqrt(list_dot_product(a.embedding::DOUBLE[],
                                    a.embedding::DOUBLE[]))) AS sim
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.q_id
      JOIN assign a ON a.c_id = p.c_id AND a.vec_id <> p.q_id)
    SELECT q_id, n_id, rank FROM (
      SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY round(sim, 6) DESC, n_id) AS rank
      FROM sims) t
    WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    A coarse quantizer partitions the corpus into inverted lists;
    queries probe only the {n} nearest lists and run exact cosine
    inside them.  The quantizer here averages each label cluster (a
    deterministic stand-in for the k-means training step — the list
    assignment, probe and scan machinery is the real path).  Scale:
    the centroid table is tiny and broadcast, list assignment is one
    map-side argmax per vector, and the probe join is an equi-join on
    list id — a query touches ~nprobe/nlist of the corpus instead of
    all of it, the classic IVF trade.""".format(n=_IVF_NPROBE)
    (emb,) = _t(spark, sf_dir, "embeddings")
    # NOT spread: the bucket ids compute map-side from broadcast
    # literals — a repartition shuffles the embedding arrays for
    # no parallelism gain (A/B at sf0.1: 2.1s vs 3.5s for IVF)
    # per-dimension mean by label -> centroid arrays (tiny result).
    # Examined r9: a single groupBy with 64 avg(embedding[i])
    # expressions (1 Exchange instead of 2) measured ~2x SLOWER at
    # sf0.1 — 64 aggregate expressions push the generated aggregate
    # past codegen's method budget.  The posexplode form is also
    # scale-safe: the 64x row multiplication is map-side only (partial
    # aggregation reduces each partition to one row per (label, pos)
    # before the shuffle), so it stays.
    cent = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(F.avg(_c("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
        .select(_c("label").alias("c_id"), "centroid")
    )
    csim = F.round(
        _dot(_c("embedding"), _c("centroid"))
        / (_norm(_c("embedding")) * _norm(_c("centroid"))),
        6,
    )
    w_vec = W.partitionBy("vec_id").orderBy(
        csim.desc(), _c("c_id")
    )
    scored = emb.join(F.broadcast(cent)).withColumn(
        "rk", F.row_number().over(w_vec)
    )
    assign = scored.filter(_c("rk") == 1).select(
        "vec_id", "embedding", "c_id"
    )
    probes = (
        scored.filter(_c("vec_id") < 10)
        .filter(_c("rk") <= _IVF_NPROBE)
        .select(_c("vec_id").alias("q_id"), "c_id")
    )
    qv = emb.filter(_c("vec_id") < 10).select(
        _c("vec_id").alias("q_id"),
        _c("embedding").alias("q_emb"),
    )
    sims = (
        probes.join(F.broadcast(qv), "q_id")
        .join(assign, "c_id")
        .filter(_c("vec_id") != _c("q_id"))
        .select(
            "q_id",
            _c("vec_id").alias("n_id"),
            (
                _dot(_c("q_emb"), _c("embedding"))
                / (_norm(_c("q_emb")) * _norm(_c("embedding")))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(
        F.round(_c("sim"), 6).desc(), "n_id"
    )
    return sims.select(
        "q_id", "n_id", F.row_number().over(w).alias("rank")
    ).filter(_c("rank") <= 5)


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
    # NOT spread (r9): one HOF norm per row is trivial CPU; the
    # repartition shuffled the embedding arrays for no gain (at scale
    # the scan is already wide and _spread is a no-op anyway)
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(_norm(_c("embedding"))), 4).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# dedup clustering, corpus statistics, sampling
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, max_rounds: int = 50):
    """Distributed connected components by the alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC 2014): O(log n) rounds
    regardless of component diameter — a path graph that would take
    min-label propagation O(n) rounds converges in ~2*log2(n).

    ``edges``: (src, dst) long pairs, any orientation, self-loops ok.
    Returns ``(labels, rounds)`` where ``labels`` is (id, label) for
    every vertex incident to an edge, label = min id of its component.

    Each half-round is ONE shuffle (a window min per vertex — no
    self-join) over an edge set that never exceeds the input size
    after distinct(); ``localCheckpoint`` per round cuts lineage so
    the plan stays constant-size.  Skew note: the window buffers one
    vertex's neighbor list per frame, so per-vertex degree bounds the
    frame (LSH candidate graphs are cap-bounded by construction;
    unbounded-degree inputs would want the groupBy+join formulation).

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted before the
    fixpoint — partially-converged labels are never returned silently
    (the theoretical bound is ~2*log2(n)+2 rounds, so 50 covers any
    realistic n).
    """
    # canonicalize: oriented (big, small), no self-loops, distinct
    E = (
        edges.filter(_c("src") != _c("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    all_nodes = (
        E.select(_c("src").alias("id"))
        .unionByName(E.select(_c("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rounds = 0
    converged = False
    # prev_sig starts unknown: the first round's signature job doubles
    # as E's checkpoint materialization, so no separate warm-up action
    # is spent on the input signature (r9; one Spark job saved per
    # call).  An already-converged input just pays one confirming
    # round instead.
    prev_sig = None
    while rounds < max_rounds:
        rounds += 1
        # large-star: every neighbor bigger than u links to
        # m = min(N(u) + {u}); smaller neighbors re-emit from the
        # other endpoint's perspective (adjacency is symmetric here)
        nbr = E.unionByName(
            E.select(_c("dst").alias("src"), _c("src").alias("dst"))
        )
        m_ls = F.least(F.min("dst").over(W.partitionBy("src")), _c("src"))
        # no intermediate distinct here (r9): the small-star min is
        # insensitive to duplicate (src, m) rows (min over a multiset),
        # the row count stays bounded by 2|E|, and the round's final
        # distinct dedups — dropping it removes one exchange per round
        ls = (
            nbr.withColumn("m", m_ls)
            .filter(_c("dst") > _c("src"))
            .select(_c("dst").alias("src"), _c("m").alias("dst"))
        )
        # small-star on the oriented output (src > dst everywhere):
        # u and all its smaller neighbors link to m = min of them
        ss = ls.withColumn("m", F.min("dst").over(W.partitionBy("src")))
        new_E = (
            ss.select(_c("dst").alias("src"), _c("m").alias("dst"))
            .unionByName(ss.select("src", _c("m").alias("dst")))
            .filter(_c("src") != _c("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # fixpoint test, two tiers: a cheap (count, sum(src),
        # sum(dst)) signature in ONE agg action gates the exact
        # exceptAll confirmation, so non-final rounds pay one action
        # instead of a count + an anti-join
        sig_row = new_E.agg(
            F.count("*").alias("n"),
            F.sum("src").alias("ss"),
            F.sum("dst").alias("sd"),
        ).head()
        new_sig = (sig_row["n"], sig_row["ss"], sig_row["sd"])
        if new_sig[0] == 0:
            # empty edge set: trivially a fixpoint, no comparison job
            E = new_E
            converged = True
            break
        if (
            prev_sig is not None
            and new_sig == prev_sig
            and new_E.exceptAll(E).isEmpty()
        ):
            E = new_E
            converged = True
            break
        E, prev_sig = new_E, new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    labels = all_nodes.join(
        E.groupBy("src").agg(F.min("dst").alias("label")),
        all_nodes["id"] == _c("src"),
        "left",
    ).select("id", F.coalesce("label", _c("id")).alias("label"))
    return labels, rounds


@q(
    "dedup_components",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM candidates
      UNION ALL
      SELECT doc_b, doc_a FROM candidates),
    reach(id, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
    SELECT id AS doc_id, min(label) AS component
    FROM reach GROUP BY id
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    candidate graph; component id = smallest doc_id in the cluster
    (the canonical "keeper" a dedup pipeline retains).

    Uses :func:`connected_components` (large-star/small-star, O(log n)
    rounds — round count no longer depends on cluster diameter, so
    adversarial chain graphs cost the same as the dense cap-bounded
    clusters LSH normally emits).  The DuckDB oracle computes the same
    components independently via a recursive transitive closure.
    """
    (docs,) = _t(spark, sf_dir, "documents")
    pairs = _lsh_candidate_pairs(docs).localCheckpoint(eager=False)
    edges = pairs.select(
        _c("doc_a").alias("src"), _c("doc_b").alias("dst")
    )
    labels, _ = connected_components(edges)
    return labels.select(
        _c("id").alias("doc_id"), _c("label").alias("component")
    )


@q(
    "corpus_vocab_topk",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents),
    per AS (
      SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY doc_id, token),
    agg AS (
      SELECT token, count(*) AS df, CAST(sum(cnt) AS BIGINT) AS total
      FROM per GROUP BY token)
    SELECT token, df, total FROM agg
    ORDER BY total DESC, token LIMIT 100
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by total frequency with
    document frequency — the vocabulary-building scan of a tokenizer
    pipeline.

    Two-level aggregation: per-(doc, token) counts first (partial
    aggregation combines map-side, so the shuffle carries one row per
    distinct token per doc, not one per token occurrence), then the
    token-level rollup; ``orderBy().limit()`` compiles to
    TakeOrderedAndProject, so the full vocabulary is never sorted.
    The (total DESC, token) order is a total order — deterministic
    top-k on both engines.
    """
    (docs,) = _t(spark, sf_dir, "documents")
    per = (
        docs.select(
            "doc_id", F.explode(_tokens(_c("text"))).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    agg = per.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("cnt").alias("total")
    )
    return agg.orderBy(_c("total").desc(), _c("token")).limit(100)


# per-language keep-rates (percent) for stratified sampling; languages
# absent from the map fall back to the default.  In a real pipeline
# this is a small config dimension — broadcast-joined, never shuffled.
_SAMPLE_RATES = {"en": 35, "zh": 80}
_SAMPLE_DEFAULT = 60


@q(
    "sample_stratified",
    f"""
    WITH rates(lang, rate) AS (VALUES {", ".join(f"('{l}', {r})" for l, r in sorted(_SAMPLE_RATES.items()))})
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100
          < coalesce(r.rate, {_SAMPLE_DEFAULT})
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates
    applied by hashing the stable doc_id — the reproducible downsample
    every training-data pipeline needs (rerunning the job, or running
    it on another engine, keeps the SAME documents; ``rand()`` keeps
    different ones per attempt and per partition layout).

    The rate table is a broadcast-joined config dimension (no shuffle
    of the fact side); the keep decision is one md5 per row computed
    map-side, so the whole operator is a narrow scan -> filter.
    """
    (docs,) = _t(spark, sf_dir, "documents")
    spark_rates = spark.createDataFrame(
        sorted(_SAMPLE_RATES.items()), "lang: string, rate: int"
    )
    bucket = (
        F.conv(F.substring(F.md5(_c("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        docs.join(F.broadcast(spark_rates), "lang", "left")
        .filter(bucket < F.coalesce(_c("rate"), _l(_SAMPLE_DEFAULT)))
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# round 6: repetition quality, boilerplate removal, sequence packing
# ---------------------------------------------------------------------------


@q(
    "quality_repetition",
    """
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents),
    g AS (
      SELECT doc_id, words,
             CAST(len(words) AS DOUBLE) AS n_tokens,
             CAST(len(list_distinct(words)) AS DOUBLE) AS n_distinct,
             CAST(list_max(list_transform(list_distinct(words),
                  w -> len(list_filter(words, t -> t = w)))) AS DOUBLE)
               AS top_cnt,
             list_transform(generate_series(1, len(words) - 1),
                  i -> words[i] || ' ' || words[i + 1]) AS grams
      FROM w)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(1 - n_distinct / n_tokens, 4) AS dup_word_frac,
           round(top_cnt / n_tokens, 4) AS top_word_frac,
           CASE WHEN len(grams) > 0
                THEN round(1 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / len(grams), 4)
                ELSE 0.0 END AS dup_2gram_frac,
           (top_cnt / n_tokens <= 0.3
            AND (len(grams) = 0
                 OR 1 - CAST(len(list_distinct(grams)) AS DOUBLE)
                        / len(grams) <= 0.75)) AS keep
    FROM g
    """,
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-style filters):
    duplicate-word fraction, most-frequent-word fraction, and
    duplicate-2-gram fraction per document, plus the keep decision.

    100 TB scale: everything is per-row array math on built-in
    higher-order functions (transform/aggregate/array_distinct) — a
    narrow scan with zero shuffles; the top-word count is a sorted
    run-length scan (O(tokens log tokens) per document, vs the naive
    O(distinct x tokens) transform+filter, which is a per-row
    quadratic at 100k-token documents), never a groupBy."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = _tokens(_c("text"))
    base = docs.select(
        "doc_id",
        toks.alias("words"),
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("double").alias("n_distinct"),
    )

    # Most-frequent-word count = longest equal-run in the sorted token
    # array: one array_sort + a single linear aggregate() pass carrying
    # (current run, best run, previous word).  ``w == prev`` is NULL on
    # the first element, so when() falls through to run=1.
    def _run(acc, w):
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(_l(1))
        return F.struct(
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            w.alias("prev"),
        )

    top_cnt = F.aggregate(
        F.array_sort(_c("words")),
        F.struct(
            _l(0).alias("run"),
            _l(0).alias("best"),
            _l(None).cast("string").alias("prev"),
        ),
        _run,
        lambda acc: acc["best"],
    ).cast("double")
    n = F.size(_c("words"))
    grams = F.zip_with(
        F.slice(_c("words"), 1, n - 1),
        F.slice(_c("words"), 2, n - 1),
        lambda a, b: F.concat(a, _l(" "), b),
    )
    g = base.select(
        "doc_id", "n_tokens", "n_distinct",
        top_cnt.alias("top_cnt"), grams.alias("grams"),
    )
    ng = F.size(_c("grams")).cast("double")
    dup2 = _l(1.0) - F.size(F.array_distinct(_c("grams"))).cast(
        "double"
    ) / ng
    return g.select(
        "doc_id",
        _c("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            _l(1.0) - _c("n_distinct") / _c("n_tokens"), 4
        ).alias("dup_word_frac"),
        F.round(_c("top_cnt") / _c("n_tokens"), 4).alias(
            "top_word_frac"
        ),
        F.when(ng > 0, F.round(dup2, 4)).otherwise(_l(0.0)).alias(
            "dup_2gram_frac"
        ),
        (
            (_c("top_cnt") / _c("n_tokens") <= 0.3)
            & ((ng == 0) | (dup2 <= 0.75))
        ).alias("keep"),
    )


#: shingles appearing in >= this many distinct documents take the
#: broadcast heavy-hitter path in boilerplate_ngrams (tests lower it
#: to exercise the split on toy fixtures).
HH_NDOCS = 100_000

#: shuffle-spread factor for heavy-hitter shingle instances (see
#: boilerplate_ngrams): a hot key's rows split across this many
#: (sh, salt) shuffle keys instead of landing on one partition
_HH_SALT = 64


@q(
    "boilerplate_ngrams",
    """
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents),
    s AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(words) - 2),
                 i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]))
               AS sh
      FROM w),
    df AS (
      SELECT sh, count(DISTINCT doc_id) AS ndocs FROM s GROUP BY sh)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE df.ndocs >= 5) AS BIGINT)
             AS n_boiler,
           round(CAST(count(*) FILTER (WHERE df.ndocs >= 5) AS DOUBLE)
                 / count(*), 4) AS boiler_frac
    FROM s JOIN df USING (sh)
    GROUP BY s.doc_id
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (C4/CCNet-style): a word
    3-gram occurring in >= 5 distinct documents is boilerplate; each
    document reports its shingle count and boilerplate fraction — the
    signal used to strip headers/footers/navigation from web corpora.

    100 TB scale: the classic inverted-index shape — explode to
    (shingle, doc) pairs (spread first so toy-scale single-file scans
    parallelize), one shuffle to build the document-frequency table,
    one shuffle-join back on the shingle key, one aggregation by
    doc_id.  No all-pairs anything.  Ultra-hot shingles ("copyright
    all rights" in a billion pages) are handled by a deterministic
    heavy-hitter split, NOT by trusting AQE: the skew-join rule
    cannot fire on this shape (its pattern needs a bare shuffle stage
    under both sort children, and the document-frequency side has its
    final aggregation fused above the same-key shuffle — verified
    empirically, ``tests/test_plans.py::test_boilerplate_heavy_hitter_split``).
    Shingles in >= HH_NDOCS documents resolve their frequency from a
    BROADCAST dictionary and enter the one shuffle join under a
    doc-hash salt that spreads each hot key across _HH_SALT
    partitions; the residual (sh, salt=0) keys have per-key frequency
    < HH_NDOCS by construction, and the exploded instance relation
    feeds the join exactly once (it is still computed separately for
    the document-frequency aggregate — the unavoidable second pass of
    the inverted-index shape)."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = _tokens(_c("text"))
    n = F.size(_c("words"))
    sh = F.transform(
        F.sequence(_l(1), n - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(_c("words"), i),
            F.element_at(_c("words"), i + 1),
            F.element_at(_c("words"), i + 2),
        ),
    )
    inst = (
        _spread(docs.select("doc_id", toks.alias("words")))
        .select("doc_id", F.explode(sh).alias("sh"))
    )
    # document frequency = count over per-doc-DEDUPED shingle
    # instances: array_distinct runs map-side inside the explode, so
    # the aggregate is a plain two-phase count (1 Exchange) instead of
    # a distinct-aggregate (2 Exchanges + an extra hash phase), and
    # the exploded dfreq relation shrinks by each doc's internal
    # repetitions before it is shuffled
    dfreq = (
        _spread(docs.select("doc_id", toks.alias("words")))
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))
        .groupBy("sh")
        .agg(F.count("*").alias("ndocs"))
    )
    # heavy-hitter split, SINGLE instance scan: the hot dictionary is
    # tiny by definition (at most total_instances / HH_NDOCS rows), so
    # it broadcasts.  Every instance row picks up its hot ndocs
    # map-side; hot rows also get a doc-hash salt that spreads them
    # across _HH_SALT shuffle partitions, cold rows keep salt 0.  The
    # cold dictionary then LEFT-joins on (sh, salt): hot rows can't
    # match (their sh isn't in the cold dict) and keep their broadcast
    # ndocs, cold rows always match — one shuffle join with no hot
    # partition possible, and `inst` (the exploded 100 TB text scan)
    # feeds the join exactly once instead of once per hot/cold branch.
    hot = dfreq.filter(_c("ndocs") >= HH_NDOCS)
    cold = dfreq.filter(_c("ndocs") < HH_NDOCS)
    tagged = inst.join(
        F.broadcast(hot.withColumnRenamed("ndocs", "hot_ndocs")),
        "sh", "left",
    ).withColumn(
        "salt",
        F.when(
            _c("hot_ndocs").isNotNull(),
            F.pmod(F.hash("doc_id"), _l(_HH_SALT)),
        ).otherwise(_l(0)),
    )
    joined = tagged.join(
        cold.withColumn("salt", _l(0)), ["sh", "salt"], "left"
    ).withColumn("ndocs", F.coalesce("hot_ndocs", "ndocs"))
    boiler = F.sum(F.when(_c("ndocs") >= 5, 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        boiler.cast("bigint").alias("n_boiler"),
        F.round(
            boiler.cast("double") / F.count("*"), 4
        ).alias("boiler_frac"),
    )


_PACK_BUDGET = 2048


@q(
    "pack_token_budget",
    f"""
    WITH t AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t)
    SELECT source,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / {_PACK_BUDGET}, 4)
             AS fill_ratio
    FROM c
    GROUP BY source, floor(cum_before / {_PACK_BUDGET})
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed
    token-budget packs ({_PACK_BUDGET} tokens) by running token count
    in stable doc_id order — how a pretraining pipeline concatenates
    short documents into full context windows without a random shuffle
    (reproducible across reruns and engines).

    100 TB scale: the running sum is windowed PER SOURCE (the shard
    key a real corpus already has), so the cumulative-sum window
    parallelizes across sources instead of serializing on one global
    ordering — one shuffle on source, then map-side bucketing and one
    partial-aggregable rollup."""
    (docs,) = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id",
        F.size(_tokens(_c("text"))).alias("n_tokens"),
    )
    win = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(win), _l(0))
    )
    pack = F.floor(_c("cum_before") / _PACK_BUDGET)
    return c.groupBy("source", pack.alias("pack_id")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / _PACK_BUDGET, 4
        ).alias("fill_ratio"),
    )
