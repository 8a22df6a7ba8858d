"""Corpus-construction extensions, round 2: near-dup cluster
resolution (keep-one-per-component), PII redaction, Gopher-style
repetition filters, and int8 embedding quantization — the operators a
100 TB training-data build runs between raw scrape and tokenizer.

Oracle dialect notes: DuckDB SUM(BIGINT) returns HUGEINT — every
summed bigint is wrapped in CAST(... AS BIGINT); connected components
is expressed as a recursive transitive closure (exact, so it agrees
with the Spark side's exact label-propagation fixpoint); list indexing
is 1-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE, count_pii, scrub_pii
from ..operators.cluster import dup_clusters
from ..operators.dedup import lsh_verified_pairs
from ..operators.embeddings import quantize_stats
from ..operators.textstats import repetition_features
from ..sources.registry import load_table
from .llm import _JACCARD_THRESHOLD, _MH_CTE, _SHINGLE_HASHES, _TOKS
from .registry import register


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLE_HASHES},
    {_MH_CTE},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shs GROUP BY id),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shs a ON a.id = c.id_a
      JOIN shs b ON b.id = c.id_b AND b.h = a.h
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM common c
      JOIN sizes sa ON sa.id = c.id_a
      JOIN sizes sb ON sb.id = c.id_b
      WHERE CAST(c.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS lab FROM documents
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
    ),
    comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    csz AS (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
    )
    SELECT comp.id AS doc_id, comp.cluster_id, csz.cluster_size,
           comp.id = comp.cluster_id AS keep
    FROM comp JOIN csz ON csz.cluster_id = comp.cluster_id
    """,
    doc="near-dup cluster resolution: LSH-verified pairs -> connected components -> keep one per cluster",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(
        docs, "text", "doc_id", num_hashes=12, rows_per_band=3,
        threshold=_JACCARD_THRESHOLD,
    )
    return dup_clusters(docs, pairs, "doc_id")


# Deterministic PII injection: the synthetic corpus is PII-free word
# salad, so the query plants one email/phone/IP per doc (plus an extra
# email on doc_id % 3 == 0) derived from doc_id, making the redaction
# verifiable end-to-end instead of a no-op. SQL twin below builds the
# identical augmented text.
def _augmented_text():
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.concat(F.lit("user"), s(d), F.lit("@mail"), s(d % 7), F.lit(".example.com"))
    extra = F.when(
        d % 3 == 0, F.concat(F.lit(" cc admin"), s(d), F.lit("@example.org"))
    ).otherwise(F.lit(""))
    phone = F.concat(
        F.lit("(555) "), s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000)
    )
    ip = F.concat(
        F.lit("10."), s(d % 256), F.lit("."), s(d * 7 % 256), F.lit("."), s(d * 13 % 256)
    )
    return F.concat(
        F.col("text"), F.lit(" contact "), email, extra,
        F.lit(" call "), phone, F.lit(" from "), ip,
    )


_AUG_SQL = """
  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
       || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
       || CASE WHEN doc_id % 3 = 0
               THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@example.org'
               ELSE '' END
       || ' call (555) ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
       || CAST(doc_id % 9000 + 1000 AS VARCHAR)
       || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
       || CAST(doc_id * 7 % 256 AS VARCHAR) || '.'
       || CAST(doc_id * 13 % 256 AS VARCHAR)
"""


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS INTEGER) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
             '{IPV4_RE}', '<IP>', 'g') AS clean_text
    FROM aug
    """,
    doc="PII redaction: email/phone/IPv4 counts + scrub (deterministic injected PII)",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", _augmented_text().alias("t"))
    ne, np_, ni = count_pii(F.col("t"))
    return aug.select(
        "doc_id",
        ne.alias("n_emails"),
        np_.alias("n_phones"),
        ni.alias("n_ips"),
        scrub_pii(F.col("t")).alias("clean_text"),
    )


@register(
    "text_repetition",
    f"""
    WITH toks AS ({_TOKS}),
    t1 AS (SELECT doc_id AS id, tok.g AS g FROM toks, unnest(toks.t) AS tok(g)),
    g2 AS (
      SELECT doc_id AS id, t[i] || ' ' || t[i+1] AS g
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) s
      WHERE i <= len(t) - 1
    ),
    g3 AS (
      SELECT doc_id AS id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) s
      WHERE i <= len(t) - 2
    ),
    s1 AS (
      SELECT id, CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS dst,
             CAST(MAX(cnt) AS BIGINT) AS top
      FROM (SELECT id, g, COUNT(*) AS cnt FROM t1 GROUP BY 1, 2) GROUP BY id
    ),
    s2 AS (
      SELECT id, CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS dst,
             CAST(MAX(cnt) AS BIGINT) AS top
      FROM (SELECT id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2) GROUP BY id
    ),
    s3 AS (
      SELECT id, CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS dst,
             CAST(MAX(cnt) AS BIGINT) AS top
      FROM (SELECT id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2) GROUP BY id
    )
    SELECT toks.doc_id AS id,
           COALESCE(s1.total, 0) AS n_tokens,
           COALESCE(CAST(s1.top AS DOUBLE) / CAST(s1.total AS DOUBLE), 0.0)
             AS top_token_frac,
           COALESCE(CAST(s2.top AS DOUBLE) / CAST(s2.total AS DOUBLE), 0.0)
             AS top_2gram_frac,
           COALESCE(CAST(s3.total - s3.dst AS DOUBLE) / CAST(s3.total AS DOUBLE), 0.0)
             AS dup_3gram_frac
    FROM toks
    LEFT JOIN s1 ON s1.id = toks.doc_id
    LEFT JOIN s2 ON s2.id = toks.doc_id
    LEFT JOIN s3 ON s3.id = toks.doc_id
    """,
    doc="Gopher-style repetition filters: top-token/top-2gram/dup-3gram fractions",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_features(docs, "text", "doc_id")


@register(
    "emb_quantize_stats",
    """
    WITH el AS (
      SELECT vec_id, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    sc AS (
      SELECT vec_id, MAX(ABS(x)) / 127.0 AS s, SUM(x * x) AS ss
      FROM el GROUP BY vec_id
    ),
    q AS (
      SELECT el.vec_id,
             CASE WHEN sc.s = 0 THEN 0
                  ELSE CAST(ROUND(el.x / sc.s, 0) AS BIGINT) END AS qv
      FROM el JOIN sc ON sc.vec_id = el.vec_id
    )
    SELECT sc.vec_id AS id,
           CAST(64 AS INTEGER) AS dim,
           ROUND(sqrt(sc.ss), 6) AS l2_norm,
           ROUND(sc.s, 6) AS scale,
           CAST(SUM(q.qv) AS BIGINT) AS q_sum,
           CAST(SUM(ABS(q.qv)) AS BIGINT) AS q_l1,
           CAST(SUM(CASE WHEN ABS(q.qv) = 127 THEN 1 ELSE 0 END) AS INTEGER) AS n_sat
    FROM sc JOIN q ON q.vec_id = sc.vec_id
    GROUP BY sc.vec_id, sc.ss, sc.s
    """,
    doc="int8 embedding quantization summary: norm, scale, quantized sums, saturation",
)
def emb_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_stats(emb, "vec_id", "embedding", bits=8)


@register(
    "events_window_range_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
    FROM events c
    JOIN events p ON p.user_id = c.user_id
                 AND p.ts >= c.ts
                 AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    doc="event-time range join: every click x purchases by same user within 30 min (batch twin of the stream-stream join)",
)
def events_window_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import click_purchase_join

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within_minutes=30,
    )


@register(
    "corpus_quality_filter",
    f"""
    WITH RECURSIVE {_SHINGLE_HASHES},
    {_MH_CTE},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shs GROUP BY id),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shs a ON a.id = c.id_a
      JOIN shs b ON b.id = c.id_b AND b.h = a.h
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM common c
      JOIN sizes sa ON sa.id = c.id_a
      JOIN sizes sb ON sb.id = c.id_b
      WHERE CAST(c.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS lab FROM documents
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
    ),
    comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    t1 AS (SELECT doc_id AS id, tok.g AS g FROM toks, unnest(toks.t) AS tok(g)),
    rep AS (
      SELECT id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_token_frac
      FROM (SELECT id, g, COUNT(*) AS cnt FROM t1 GROUP BY 1, 2) GROUP BY id
    ),
    lang AS (
      SELECT doc_id AS id,
             len(list_intersect(list_distinct(t), ['the', 'a', 'of', 'and', 'is'])) AS s_en,
             len(list_intersect(list_distinct(t), ['le', 'la', 'et', 'les', 'une'])) AS s_fr,
             len(list_intersect(list_distinct(t), ['el', 'los', 'y', 'las', 'que'])) AS s_es,
             len(list_intersect(list_distinct(t), ['der', 'die', 'und', 'das', 'ist'])) AS s_de
      FROM toks
    )
    SELECT d.doc_id,
           CASE WHEN comp.id <> comp.cluster_id THEN 'duplicate'
                WHEN COALESCE(rep.n_tokens, 0) < 20 THEN 'too_short'
                WHEN rep.top_token_frac > 0.15 THEN 'repetitive'
                WHEN NOT (lang.s_en >= lang.s_fr AND lang.s_en >= lang.s_es
                          AND lang.s_en >= lang.s_de) THEN 'non_english'
                ELSE NULL END AS reject_reason,
           (comp.id = comp.cluster_id AND COALESCE(rep.n_tokens, 0) >= 20
            AND rep.top_token_frac <= 0.15
            AND lang.s_en >= lang.s_fr AND lang.s_en >= lang.s_es
            AND lang.s_en >= lang.s_de) AS keep
    FROM documents d
    JOIN comp ON comp.id = d.doc_id
    -- LEFT: the explode-based rep CTE has no rows for zero-token
    -- documents, but the filter must be TOTAL over the corpus — an
    -- empty doc is rejected as too_short, never silently dropped
    LEFT JOIN rep ON rep.id = d.doc_id
    JOIN lang ON lang.id = d.doc_id
    """,
    doc="flagship corpus filter: near-dup cluster keep + length + repetition + language, with per-doc reject reason",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the dedup-cluster, repetition, and language
    operators into the keep/drop decision a corpus build actually
    ships: reject priority duplicate > too_short > repetitive >
    non_english (deterministic, so the reason column is hashable).

    All three inputs are joined on doc_id — at scale each is a
    map-side-combined aggregation hash-partitioned on the same key, so
    the three-way join co-partitions with no extra exchange beyond the
    aggregations' own."""
    from ..operators.textstats import language_scores

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(
        docs, "text", "doc_id", num_hashes=12, rows_per_band=3,
        threshold=_JACCARD_THRESHOLD,
    )
    clusters = dup_clusters(docs, pairs, "doc_id").select(
        F.col("doc_id").alias("id"), (~F.col("keep")).alias("is_dup")
    )
    rep = repetition_features(docs, "text", "doc_id").select(
        "id", "n_tokens", "top_token_frac"
    )
    lang = language_scores(docs, "text", "doc_id").select(
        "id", (F.col("predicted_lang") == "en").alias("is_en")
    )
    reason = (
        F.when(F.col("is_dup"), "duplicate")
        .when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("top_token_frac") > 0.15, "repetitive")
        .when(~F.col("is_en"), "non_english")
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        clusters.join(rep, "id")
        .join(lang, "id")
        .select(
            F.col("id").alias("doc_id"),
            reason.alias("reject_reason"),
            reason.isNull().alias("keep"),
        )
    )


@register(
    "sketch_kmv_distinct",
    """
    WITH per AS (
      SELECT DISTINCT event_type AS g,
             CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
      FROM events
    ),
    ranked AS (
      SELECT g, u, ROW_NUMBER() OVER (PARTITION BY g ORDER BY u ASC) AS r FROM per
    ),
    agg AS (
      SELECT g, COUNT(*) AS n_kept, MAX(CASE WHEN r = 64 THEN u END) AS u_k
      FROM ranked WHERE r <= 64 GROUP BY g
    )
    SELECT g AS event_type, n_kept, ROUND(COALESCE(u_k, 0.0), 10) AS u_k,
           CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                ELSE ROUND(63.0 / u_k, 4) END AS kmv_est
    FROM agg
    """,
    doc="KMV distinct-count sketch per event_type: engine-portable approximate distinct (hash-checked even though approximate)",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(ev, "event_type", "user_id", k=64).select(
        "event_type", "n_kept", "u_k", "kmv_est"
    )


@register(
    "sketch_kmv_merge",
    """
    WITH per AS (
      SELECT DISTINCT
             CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
      FROM events
    ),
    ranked AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u ASC) AS r FROM per)
    SELECT COUNT(*) AS n_kept,
           ROUND(COALESCE(MAX(CASE WHEN r = 64 THEN u END), 0.0), 10) AS u_k,
           CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ROUND(63.0 / MAX(CASE WHEN r = 64 THEN u END), 4) END AS kmv_est
    FROM ranked WHERE r <= 64
    """,
    doc="KMV sketch mergeability: union of per-group sketches == sketch of the union (checked exactly)",
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle builds the global sketch DIRECTLY; the Spark side
    builds per-event-type sketches and merges them — the algebraic
    identity that lets KMV run as a two-level distributed aggregate
    (map-side partials, bounded merge) must hold bit-for-bit."""
    from ..operators.sketch import kmv_merged_global

    ev = load_table(spark, sf_dir, "events")
    return kmv_merged_global(ev, "event_type", "user_id", k=64)


_CMS_D = 4
_CMS_W = 256
_CMS_WORDS = ("scan", "window", "join", "merge", "shuffle")


def _cms_bucket_sql(d: str, tok: str) -> str:
    return (
        f"CAST(CAST(concat('0x', substr(md5(CAST({d} AS VARCHAR) || ':' || {tok}), 1, 8)) "
        f"AS BIGINT) % {_CMS_W} AS INTEGER)"
    )


@register(
    "sketch_cms_wordcounts",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    tagged AS (
      SELECT d.d, {_cms_bucket_sql('d.d', 'tok')} AS bucket
      FROM toks, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
    ),
    counters AS (
      SELECT d, bucket, COUNT(*) AS c FROM tagged GROUP BY d, bucket
    ),
    queries AS (
      SELECT w.w, d.d, {_cms_bucket_sql('d.d', 'w.w')} AS bucket
      FROM (SELECT unnest({list(_CMS_WORDS)}) AS w) w,
           (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
    ),
    est AS (
      SELECT q.w AS word, MIN(c.c) AS cms_est
      FROM queries q JOIN counters c ON c.d = q.d AND c.bucket = q.bucket
      GROUP BY q.w
    ),
    exact AS (
      SELECT tok AS word, COUNT(*) AS exact_count FROM toks
      WHERE tok IN {_CMS_WORDS} GROUP BY tok
    )
    SELECT e.word, x.exact_count, e.cms_est
    FROM est e JOIN exact x ON x.word = e.word
    """,
    doc="count-min sketch word counts: d x w integer counters, min-over-rows estimate vs exact",
)
def sketch_cms_wordcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch — the bounded-memory frequency sketch
    (d=4 x w=256 integer counters regardless of vocabulary size),
    md5-bucketed so both engines build bit-identical counters and the
    estimate itself hash-checks. The d-row tagging rides the SAME
    token explode (stack fan-out, no re-scan); counters are one
    map-side-combined shuffle of (d, bucket) pairs. CMS guarantees
    estimate >= exact; collisions only inflate."""
    from ..operators.spread import spread

    docs = load_table(spark, sf_dir, "documents")
    # spread (r12, guide §2.5): both token passes below (the d x md5
    # counter tagging and the exact recount) are md5/regex compute
    # rooted at a byte-sized scan that splits into one task locally;
    # the round-robin of the raw text is linear and negligible against
    # the _CMS_D digests per token occurrence it parallelizes
    toks = spread(docs).select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok")
    )
    def bucket(d, tok):
        key = F.concat(d.cast("string"), F.lit(":"), tok)
        return (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % _CMS_W
        ).cast("int")

    tagged = toks.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), bucket(F.lit(d), F.col("tok")).alias("bucket"))
                for d in range(_CMS_D)
            ])
        ).alias("s")
    ).select("s.d", "s.bucket")
    counters = tagged.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    queries = spark.createDataFrame(
        [(w, d) for w in _CMS_WORDS for d in range(_CMS_D)], "w string, d int"
    ).withColumn("bucket", bucket(F.col("d"), F.col("w")).alias("bucket"))
    est = (
        queries.join(counters, ["d", "bucket"])
        .groupBy(F.col("w").alias("word"))
        .agg(F.min("c").alias("cms_est"))
    )
    exact = (
        toks.filter(F.col("tok").isin(*_CMS_WORDS))
        .groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(exact, "word").select("word", "exact_count", "cms_est")


@register(
    "text_tfidf_topterms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks)
      GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON df.tok = tf.tok, n
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok ASC) AS rnk
      FROM scored WHERE doc_id % 20 = 0
    )
    SELECT doc_id, rnk, tok, tfidf FROM ranked WHERE rnk <= 3
    """,
    doc="TF-IDF top terms per document: tf x corpus-idf, windowed top-3",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The term-relevance score behind every keyword dashboard
    (reference: sentiment_dashboard word-frequency panels, upgraded
    from raw counts). One token explode feeds BOTH the per-doc tf and
    the corpus df (distinct-pair aggregate); idf joins back on the
    term key — the df table is vocabulary-sized, broadcast at scale.
    ln() on one deterministic double ratio, rounded; top-3 per doc via
    the standard tiebroken window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok"),
    )
    from pyspark.storagelevel import StorageLevel

    # persisted (r12): df derives from tf AND tf feeds the score join,
    # and without a cache Catalyst plans the tokenize+explode+tf
    # aggregation once per consumer (runtime-audited: 3 documents
    # scans, zero ReusedExchange — the old comment's "explode runs
    # exactly once" assumed subtree sharing that never happens). The
    # cache holds the POST-aggregation (doc, term, tf) rows — the same
    # bytes the tf shuffle already materializes — so one full-corpus
    # regex pass and one corpus-scale shuffle are removed at any scale.
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a 1-row broadcast, not a driver-side count() —
    # the plan stays fully lazy/distributed
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(df, "tok").join(F.broadcast(n_docs)).select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.row_number().over(w).alias("rnk"), "tok", "tfidf")
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tfidf")
    )


@register(
    "text_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
    ),
    vocab AS (
      SELECT COUNT(DISTINCT tok.g) AS v
      FROM toks, unnest(toks.t) AS tok(g)
    ),
    uni AS (
      SELECT tok.g AS w1, COUNT(*) AS c1
      FROM toks, unnest(toks.t) AS tok(g) GROUP BY 1
    ),
    bi AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) g
      WHERE i <= len(t) - 1
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
    scored AS (
      SELECT b.doc_id,
             CAST(ROUND(ln((bc.c2 + 1.0) / (uni.c1 + vocab.v)), 9)
                  AS DECIMAL(18,9)) AS logp
      FROM bi b
      JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
      JOIN uni ON uni.w1 = b.w1, vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(logp) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="corpus bigram LM scoring: add-1-smoothed avg log-prob per doc (perplexity-proxy quality signal)",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM-score quality filter real pipelines run (KenLM-style):
    train bigram counts on the corpus itself, score each document by
    its average smoothed log-probability — gibberish and boilerplate
    land in the tails. Train = two grouped counts off one bigram
    explode; score = join the model back (vocabulary-sized tables,
    broadcast at scale). Each bigram's log-prob is ROUNDED to 9 dp and
    summed as exact DECIMAL, so per-doc totals are identical under any
    partitioning/engine (raw double summation would drift); one IEEE
    division at the end, UNROUNDED — the inputs are bit-identical
    across engines, and a final ROUND would reintroduce the string-vs-
    binary boundary flip on decimal-terminating averages (n = 2^a5^b
    bigram counts).

    Scale shape (re-measured round 5, twin x30): the round-4
    per-(doc, bigram) occurrence-collapse was REMOVED — on this corpus
    96.5% of (doc, bigram) occurrences are already unique (7.97M
    occurrences -> 7.69M groups at x30), so the collapse saved nothing
    downstream while its occurrence-scale string-keyed groupBy cost
    ~10 s of cold shuffle at x30 (hashing the bigram to a 64-bit key
    first still cost 10.2 s AND is not provably exact — collisions
    within a doc would merge distinct bigrams' counts; measured and
    rejected, SCALE.md §Round-5). What remains:

    - the bigram stream is built once via posexplode + element_at
      (4.0 s at x30 vs 5.4 s for the zip_with/struct HOF explode —
      measured) and persisted: it feeds the model counts AND the
      scoring join (ContextCleaner reclaims it);
    - the model groupBy (w1, w2) is map-side combinable: each
      partition emits its distinct bigrams (vocabulary-bounded, 931
      here), so the occurrence stream never shuffles to build it;
    - the scoring join is left to AQE: on a vocabulary-bounded model
      it converts to broadcast at runtime; on a genuinely fat model
      (real web corpora) it stays a shuffle join — a hard
      F.broadcast() would be wrong there;
    - per-occurrence logp is summed as DECIMAL(18,9), bit-identical
      under any partitioning/engine, and the only occurrence-scale
      shuffle left is the final groupBy(doc_id), whose map-side
      partials collapse to ~one row per (doc, partition)."""
    from pyspark.storagelevel import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0).alias("t"),
    )
    flat = toks.select("doc_id", F.explode("t").alias("g"))
    # persisted (r12 optimization): uni feeds BOTH the model join and
    # the vocab count below. Unpersisted, Catalyst plans two separate
    # subtrees, so the corpus was tokenized+exploded a third time just
    # to count distinct terms (plan-verified: 3 'Scan parquet
    # documents' branches). The cache is vocabulary-bounded — one
    # (term, count) row per distinct token — so it stays negligible at
    # any corpus scale while cutting the full-corpus regex passes from
    # 3 to 2 (bi + uni). Local bench: wash (single-row-group inputs
    # serialize the passes anyway); the win is the removed corpus pass
    # at scale.
    uni = (
        flat.groupBy(F.col("g").alias("w1"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vocabulary size derives from uni (1 row per term) — a 1-row
    # broadcast with no second explode and no driver-side action
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bi = (
        toks.select("doc_id", "t", F.posexplode("t").alias("i", "w1"))
        .filter(F.col("i") < F.size("t") - 1)
        .select("doc_id", "w1", F.element_at("t", F.col("i") + 2).alias("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    logp = F.round(
        F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))), 9
    ).cast("decimal(18,9)")
    model = (
        bc.join(uni, "w1")
        .join(F.broadcast(vocab))
        .select("w1", "w2", logp.alias("logp"))
    )
    scored = bi.join(model, ["w1", "w2"]).select("doc_id", "logp")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("logp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
    )


# 10-token shingles: long enough that sharing even one window implies
# a copied run (Lee et al.-style exact-substring policy), short enough
# that sf0.001's 120-token docs produce candidates.
_SUBSTR_N = 10


def _substr_hash_sql(n: int) -> str:
    gram = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    return f"""
    toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
    shs AS (
      SELECT DISTINCT doc_id AS id,
             CAST(concat('0x', substr(md5({gram}), 1, 15)) AS BIGINT)
               % 2147483647 AS h
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) g
      WHERE i <= len(t) - {n - 1}
    )"""


@register(
    "dedup_exact_substring",
    f"""
    WITH {_substr_hash_sql(_SUBSTR_N)}
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared_windows
    FROM shs a JOIN shs b ON a.h = b.h AND a.id < b.id
    GROUP BY 1, 2
    """,
    doc=f"exact-substring dedup: doc pairs sharing >= 1 exact {_SUBSTR_N}-token run (memorization-mitigation policy)",
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of Jaccard near-dup: verbatim RUN overlap. A
    shared 10-token window almost surely means copied text (quotes,
    boilerplate, syndication) even when whole-doc similarity is low —
    the policy knob train-set decontamination and memorization audits
    use. Same machinery as MinHash (hashed shingle sets, equi-join on
    the 8-byte hash), different n and no threshold: the join IS the
    detector. At 100 TB the hash join is bucketed by h; a frequency
    clamp on promiscuous windows (boilerplate) bounds fan-out exactly
    like the LSH band clamp."""
    from pyspark.storagelevel import StorageLevel

    from ..operators.dedup import shingle_hash_set
    from ..operators.spread import spread

    docs = load_table(spark, sf_dir, "documents")
    # r12 (guide §2.2/§2.5, measured 4.8x at sf0.1): the 10-token
    # window hashing runs one md5 per window per document — the
    # heaviest per-row text work in the corpus family — and both sides
    # of the self-join consume it, so (a) the input is spread (the
    # byte-sized scan otherwise serializes the digest pass on one
    # task) and (b) the (id, h) frame is persisted so the pass runs
    # once, not once per join side (8-byte hashes + ids — a small
    # fraction of the text it digests at any scale)
    sh = shingle_hash_set(spread(docs), "text", "doc_id", n=_SUBSTR_N).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


@register(
    "text_ngram_novelty",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
    ),
    sh3 AS (
      SELECT DISTINCT doc_id AS id,
             CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15))
                  AS BIGINT) % 2147483647 AS h
      FROM toks, (SELECT unnest(generate_series(1, 200)) AS i) g
      WHERE i <= len(t) - 2
    ),
    df AS (SELECT h, COUNT(*) AS df FROM sh3 GROUP BY h)
    SELECT s.id AS doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_frac
    FROM sh3 s JOIN df ON df.h = s.h
    GROUP BY s.id
    """,
    doc="n-gram novelty: fraction of a doc's distinct 3-grams unique to it in the corpus",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty = share of the document's distinct 3-gram hashes with
    corpus document-frequency 1 — low novelty flags templated or
    syndicated text that per-doc repetition filters miss. The df table
    derives from the SAME distinct shingle frame that scores the docs
    (explode once), joined back on the 8-byte hash."""
    from pyspark.storagelevel import StorageLevel

    from ..operators.dedup import shingle_hash_set

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hash_set(docs, "text", "doc_id", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    df = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint")
    return (
        sh.join(df, "h")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty_frac"),
        )
    )


_CHUNK_SIZE = 256
_CHUNK_STEP = 224  # size - 32 overlap
# Both the Spark sequence and the oracle's generate_series stop at this
# chunk index, so the pair stays equivalent by construction even for
# documents longer than (_CHUNK_MAX_IDX+1)*step chars (they are simply
# truncated identically on both sides). tests/test_corpus_ops.py guards
# that the test corpora never actually hit the cap.
_CHUNK_MAX_IDX = 40


@register(
    "text_chunk_overlap",
    f"""
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           substr(text, i * {_CHUNK_STEP} + 1, {_CHUNK_SIZE}) AS chunk,
           CAST(length(substr(text, i * {_CHUNK_STEP} + 1, {_CHUNK_SIZE})) AS INTEGER)
             AS chunk_len
    FROM documents, (SELECT unnest(generate_series(0, {_CHUNK_MAX_IDX})) AS i) g
    WHERE doc_id % 10 = 0 AND i * {_CHUNK_STEP} < length(text)
    """,
    doc="overlapping text chunking (256/32) for RAG/training windows — pure SQL, bounded fan-out",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the context-window prep for RAG
    indexing and training-sequence assembly. The chunk index sequence
    is computed per row BEFORE the explode (bounded fan-out =
    ceil(len/step), clamped to the shared _CHUNK_MAX_IDX bound), all in
    codegen; the same logic is mirrored by a Python UDTF in
    tests/test_operators.py as the extension seam for tokenizer-aware
    chunkers SQL can't express."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    n_chunks = F.least(
        F.ceil(F.length("text") / F.lit(_CHUNK_STEP)).cast("int"),
        F.lit(_CHUNK_MAX_IDX + 1),
    )
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    exploded = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.substring(
                    F.col("text"), i * _CHUNK_STEP + 1, _CHUNK_SIZE
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk",
        F.length("chunk").cast("int").alias("chunk_len"),
    )


@register(
    "f_variant_ops",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
           json_extract(props, '$.k') IS NOT NULL AS has_k
    FROM events WHERE event_id % 40 = 0
    """,
    doc="VARIANT semi-structured path: parse_json once, typed variant_get probes",
)
def f_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Variant encoding: parse the JSON once into the
    binary variant form, then typed ``variant_get`` probes — for hot
    paths with repeated access this beats re-parsing per
    get_json_object call (f_json_path_ops is the string-API twin).
    The oracle reads the same values through DuckDB's JSON extract."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 40 == 0)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.k', 'double')").alias("k_dbl"),
        F.expr("variant_get(parse_json(props), '$.k', 'string') IS NOT NULL").alias(
            "has_k"
        ),
    )
