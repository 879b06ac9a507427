"""Driver-parity registry: Spark queries + matching DuckDB oracle SQL.

One entry per operator family from SURVEY.md §2, exercised over the driver's
read-only corpus (TESTDATA.md). Every aggregate/computed column is aliased
IDENTICALLY in the Spark plan and the SQL string; float outputs are rounded on
both sides so the driver's order-insensitive value-hash matches.

Entries without an oracle (the LSH/UDF stages — not SQL-expressible) are
registered in ``ROWS_ONLY_QUERIES``; their correctness is pinned by the pytest
oracles instead (tests/test_pipeline.py, tests/test_kernels.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# --------------------------------------------------------------------------


def q_predicate_filter(spark, sf_dir):
    """Conjunctive predicate + projection; pushdown-eligible (SURVEY §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 30) & (F.col("l_returnflag") == "R"))
        .filter(F.abs(F.col("l_discount") - F.col("l_tax")) >= 0.02)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


SQL_predicate_filter = """
SELECT l_linestatus,
       count(*) AS cnt,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_quantity >= 30 AND l_returnflag = 'R'
  AND abs(l_discount - l_tax) >= 0.02
GROUP BY l_linestatus
"""


def q_min_activity_filter(spark, sf_dir):
    """Min-activity semi-join filter — the reference's <2-ratings user drop
    (src/Triplet.h:147-149) over customers/orders."""
    o = _t(spark, sf_dir, "orders")
    active = o.groupBy("o_custkey").agg(F.count("*").alias("n")).filter(F.col("n") >= 5)
    return (
        o.join(active.select("o_custkey"), "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


SQL_min_activity_filter = """
SELECT o_orderpriority, count(*) AS cnt
FROM orders
WHERE o_custkey IN (
    SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 5)
GROUP BY o_orderpriority
"""


def q_preference_orientation(spark, sf_dir):
    """Pair orientation by value comparison — the reference's (i,j)→(pos,neg)
    projection with the |Δ| ≥ threshold predicate (src/Triplet.h:159-165)."""
    li = _t(spark, sf_dir, "lineitem").alias("x")
    lj = _t(spark, sf_dir, "lineitem").alias("y")
    pairs = li.join(
        lj,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_linenumber") < F.col("y.l_linenumber")),
    ).filter(F.abs(F.col("x.l_quantity") - F.col("y.l_quantity")) >= 5)
    oriented = pairs.select(
        F.col("x.l_orderkey").alias("okey"),
        F.when(F.col("x.l_quantity") > F.col("y.l_quantity"), F.col("x.l_linenumber"))
        .otherwise(F.col("y.l_linenumber"))
        .alias("pos_line"),
    )
    return oriented.groupBy("pos_line").agg(F.count("*").alias("cnt"))


SQL_preference_orientation = """
SELECT CASE WHEN x.l_quantity > y.l_quantity THEN x.l_linenumber
            ELSE y.l_linenumber END AS pos_line,
       count(*) AS cnt
FROM lineitem x JOIN lineitem y
  ON x.l_orderkey = y.l_orderkey AND x.l_linenumber < y.l_linenumber
WHERE abs(x.l_quantity - y.l_quantity) >= 5
GROUP BY 1
"""


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------


def q_join_dims(spark, sf_dir):
    """3-way equi-join with broadcast-able dimensions (id-remap pattern,
    src/DataManager.h:222-233)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


SQL_join_dims = """
SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_left_anti(spark, sf_dir):
    """Anti-join — the resume-skip primitive (SURVEY §2.6). Anti-joins against
    the high-value-order subset so the result is non-trivial at every sf
    (every customer has *some* order in this corpus)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


SQL_left_anti = """
SELECT c_mktsegment, count(*) AS cnt
FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
GROUP BY c_mktsegment
"""


def q_bucket_probe_join(spark, sf_dir):
    """The core LSH-shaped join: group rows into buckets, join the bucket key
    back (lsh.h:34-44 analogue over parts by (brand, size))."""
    p = _t(spark, sf_dir, "part")
    buckets = p.groupBy("p_brand", "p_size").agg(F.count("*").alias("bucket_n"))
    return (
        p.join(buckets, ["p_brand", "p_size"])
        .filter(F.col("bucket_n") >= 2)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), F.sum("bucket_n").alias("sum_bucket_n"))
    )


SQL_bucket_probe_join = """
WITH buckets AS (
  SELECT p_brand, p_size, count(*) AS bucket_n FROM part GROUP BY p_brand, p_size)
SELECT p.p_brand, count(*) AS cnt, CAST(sum(b.bucket_n) AS BIGINT) AS sum_bucket_n
FROM part p JOIN buckets b ON p.p_brand = b.p_brand AND p.p_size = b.p_size
WHERE b.bucket_n >= 2
GROUP BY p.p_brand
"""


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped partial+final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


SQL_pricing_summary = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_conditional_avg(spark, sf_dir):
    """Conditional aggregation — the reference's nRecall 'only users with
    max-rated items' average (src/MetricsCalculator.h:245-258)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(F.when(F.col("value") > 50, F.col("value"))), 4).alias(
            "avg_big_value"
        ),
        F.count_if(F.col("value") > 50).alias("n_big"),
    )


SQL_conditional_avg = """
SELECT event_type, count(*) AS cnt,
       round(avg(CASE WHEN value > 50 THEN value END), 4) AS avg_big_value,
       count(*) FILTER (WHERE value > 50) AS n_big
FROM events GROUP BY event_type
"""


def q_hourly_rollup(spark, sf_dir):
    """Time-bucketed aggregation over the events table (batch, no streaming —
    SURVEY §2.8). Buckets on epoch-hours (a long) so the query is
    timezone-independent — no session-conf mutation inside a query builder."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).alias("epoch_hour"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


SQL_hourly_rollup = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS epoch_hour, event_type,
       count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# §2.5 windows / top-k
# --------------------------------------------------------------------------


def q_topk_per_group(spark, sf_dir):
    """Brute-force top-k with total-order tie-break (score desc, id desc) —
    the reference's ranked retrieval discipline (main.cpp:36).

    Plan shape (r6): one aggregation + posexplode instead of sort → exchange
    → sort → window → filter (same restructure as q_dcg; groups are ~10
    orders/customer, so the per-group sorted array is tiny). row_number over
    (totalprice desc, orderkey desc) ≡ 1 + position in the desc-sorted
    (totalprice, orderkey) array — a total order, orderkey unique — so the
    output is row-identical."""
    o = _t(spark, sf_dir, "orders")
    top = F.slice(
        F.sort_array(F.collect_list(F.struct("o_totalprice", "o_orderkey")), False),
        1,
        3,
    )
    return (
        o.groupBy("o_custkey")
        .agg(top.alias("top"))
        .select("o_custkey", F.posexplode("top").alias("pos", "s"))
        .select(
            "o_custkey",
            F.col("s.o_orderkey").alias("o_orderkey"),
            (F.col("pos") + 1).cast("long").alias("rnk"),
        )
    )


SQL_topk_per_group = """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rnk
  FROM orders)
WHERE rnk <= 3
"""


def q_nrecall(spark, sf_dir):
    """The reference's nRecall metric (src/MetricsCalculator.h:89-138,245-258)
    oracle-checked end-to-end: orders quantized to 1..5 "ratings"
    (MAX_RATING_VALUE=5.0 as in main.cpp:68), retrieval = brute top-10 per
    customer, per-user nRecall@k = hits / min(n_retrieved, n_max_rated) over
    ONLY the users having max-rated items (the Umax conditional). The ideal
    uses the ACTUAL retrieved count (MetricsCalculator.h:121 sets
    k = lsh_results.size()), so customers with fewer than 10 orders are
    normalized by what retrieval could actually return."""
    from srpr_lsh_spark.functions.metrics import nrecall_at_k

    o = _t(spark, sf_dir, "orders")
    ratings = o.select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("item_id"),
        F.least(
            F.lit(5), F.greatest(F.lit(1), F.ceil(F.col("o_totalprice") / 60000))
        ).cast("double").alias("rating"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    results = (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("o_custkey").alias("query_id"),
            F.col("o_orderkey").alias("item_id"),
            "rnk",
        )
    )
    nr = nrecall_at_k(results, ratings, max_rating_value=5.0, k=10)
    return nr.select(
        "query_id", "n_max_rated", "hits",
        F.round("n_recall_at_k", 6).alias("n_recall_at_k"),
    )


SQL_nrecall = """
WITH ratings AS (
  SELECT o_custkey AS query_id, o_orderkey AS item_id,
         CAST(least(5, greatest(1, ceil(o_totalprice / 60000))) AS DOUBLE) AS rating
  FROM orders),
results AS (
  SELECT o_custkey AS query_id, o_orderkey AS item_id,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rnk
  FROM orders),
maxr AS (SELECT query_id, item_id FROM ratings WHERE rating = 5.0),
sizes AS (SELECT query_id, count(*) AS n_max_rated FROM maxr GROUP BY query_id),
retr AS (SELECT query_id, count(*) AS n_retrieved
         FROM results WHERE rnk <= 10 GROUP BY query_id),
hits AS (
  SELECT r.query_id, count(*) AS hits
  FROM results r JOIN maxr m ON r.query_id = m.query_id AND r.item_id = m.item_id
  WHERE r.rnk <= 10 GROUP BY r.query_id)
SELECT s.query_id, s.n_max_rated, coalesce(h.hits, 0) AS hits,
       CASE WHEN least(coalesce(t.n_retrieved, 0), s.n_max_rated) > 0
            THEN round(coalesce(h.hits, 0)
                       / least(coalesce(t.n_retrieved, 0), s.n_max_rated), 6)
            ELSE 0.0 END AS n_recall_at_k
FROM sizes s
LEFT JOIN hits h ON s.query_id = h.query_id
LEFT JOIN retr t ON s.query_id = t.query_id
"""


def q_dcg(spark, sf_dir):
    """DCG@k: Σ rel / log2(rank+1) over a ranked window —
    src/MetricsCalculator.h:81-88.

    Plan shape (r6): ONE aggregation instead of sort → exchange → sort →
    window → filter → regroup. Groups are tiny (≤7 lines/order), so per-group
    ``sort_array`` desc of (price, linenumber, qty) structs + a slice-5
    in-codegen fold replaces two full 6M-row sorts and the window machinery
    (guide §2.4 "remove shuffles outright" — here the removed work is the
    sort+window pass; the one exchange that remains is the groupBy's).
    Row-identical and bit-identical: (price, linenumber) is a total order
    within an order (linenumber unique), and the fold sums rank-ascending —
    the same float additions in the same sequence as the window plan's
    post-window aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    top = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct("l_extendedprice", "l_linenumber", "l_quantity")
            ),
            False,
        ),
        1,
        5,
    )
    terms = F.transform(
        top, lambda x, i: x["l_quantity"] / F.log2(i.cast("double") + F.lit(2.0))
    )
    return li.groupBy("l_orderkey").agg(
        F.round(
            F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v), 4
        ).alias("dcg")
    )


SQL_dcg = """
SELECT l_orderkey, round(sum(l_quantity / log2(rnk + 1)), 4) AS dcg FROM (
  SELECT l_orderkey, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rnk
  FROM lineitem)
WHERE rnk <= 5 GROUP BY l_orderkey
"""


def q_cumulative_hits(spark, sf_dir):
    """Running sum over a ranked window — the cumulative-precision loop of
    src/MetricsCalculator.h:153-172."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("running_value", F.round(F.sum("value").over(w), 2))
        .select("user_id", "event_id", "running_value")
    )


SQL_cumulative_hits = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM events
"""


# --------------------------------------------------------------------------
# §2.6 set operations
# --------------------------------------------------------------------------


def q_set_ops(spark, sf_dir):
    """Union + distinct — the candidate-set union across L tables
    (src/lsh.h:36-43)."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return (
        o.unionByName(c)
        .distinct()
        .groupBy((F.col("k") % 10).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


SQL_set_ops = """
SELECT k % 10 AS bucket, count(*) AS cnt FROM (
  SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# dedup / text-analysis operators over documents (training-data ops)
# --------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash (groupBy md5) — the content-key
    short-circuit, SQL-expressible flavor."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("rep_doc"))
        .groupBy("n_copies")
        .agg(F.count("*").alias("n_groups"), F.min("rep_doc").alias("min_rep"))
    )


SQL_exact_dedup = """
WITH g AS (
  SELECT md5(text) AS content_md5, count(*) AS n_copies, min(doc_id) AS rep_doc
  FROM documents GROUP BY 1)
SELECT n_copies, count(*) AS n_groups, min(rep_doc) AS min_rep
FROM g GROUP BY n_copies
"""


def q_token_count(spark, sf_dir):
    """Whitespace token counting per document (training-data text op)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("n_chars"),
    )


SQL_token_count = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, n_chars FROM documents
"""


def q_token_count_regex(spark, sf_dir):
    """BPE-ish regex tokenization (training-data text op): alpha runs, digit
    runs, and single punctuation marks each count as one token — the
    class-boundary split rule BPE pre-tokenizers share."""
    d = _t(spark, sf_dir, "documents")
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    toks = F.regexp_extract_all(F.lower("text"), F.lit(pat), 0)
    return (
        d.select("source", F.size(toks).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
    )


SQL_token_count_regex = """
SELECT source,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
         AS total_tokens,
       round(avg(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 4)
         AS avg_tokens
FROM documents GROUP BY source
"""


def q_quality_score(spark, sf_dir):
    """Quality scoring: mean word length + uppercase-free ratio per source."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return (
        d.select(
            "source",
            (F.length("text") / n_tok).alias("chars_per_token"),
        )
        .groupBy("source")
        .agg(
            F.round(F.avg("chars_per_token"), 4).alias("avg_cpt"),
            F.count("*").alias("cnt"),
        )
    )


SQL_quality_score = """
SELECT source,
       round(avg(length(text) * 1.0 / len(string_split(text, ' '))), 4) AS avg_cpt,
       count(*) AS cnt
FROM documents GROUP BY source
"""


def q_ngram_jaccard(spark, sf_dir):
    """Word-set Jaccard of nearby same-source doc pairs — the exact-verify
    kernel in its SQL-expressible form. The 20-id window bounds the pair count
    at O(n·20) while producing non-trivial output at every sf (same-source
    docs are never id-adjacent in this corpus).

    Plan shape (r6): the range predicate is turned into an equi-join on a
    20-wide ``doc_id`` bucket (the a-side covers buckets ⌊a/20⌋ and ⌊a/20⌋+1,
    which together contain every b in (a, a+20]) — joining on ``source``
    alone makes every probe scan an entire source group, O(n²/|sources|)
    condition evaluations (measured 14-15 s at sf1.0; guide §3.1/§2.5 "hot
    keys"). |A∪B| is computed as |A|+|B|-|A∩B| (sides are distinct sets), so
    no union array is materialized per pair. Row-identical output."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("words")
    )
    bkt = lambda c: F.floor(c / F.lit(20))
    a = d.select(
        "doc_id", "source", "words",
        F.explode(F.array(bkt(F.col("doc_id")), bkt(F.col("doc_id")) + 1)).alias("bkt"),
    ).alias("a")
    b = d.withColumn("bkt", bkt(F.col("doc_id"))).alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("b.doc_id") > F.col("a.doc_id"))
        & (F.col("b.doc_id") <= F.col("a.doc_id") + 20),
    )
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.col("a.words")) + F.size(F.col("b.words")) - inter
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"),
    )


SQL_ngram_jaccard = """
WITH w AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS words
           FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.words, b.words)) * 1.0 /
             (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))), 4)
         AS jaccard
FROM w a JOIN w b ON a.source = b.source
  AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 20
"""


def q_language_id(spark, sf_dir):
    """Heuristic language-ID-style scoring: stop-token hit count per doc,
    compared to the labeled lang column."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ("the", "a", "of")])))
    return (
        d.select("lang", hits.cast("long").alias("stop_hits"))
        .groupBy("lang", "stop_hits")
        .agg(F.count("*").alias("cnt"))
    )


SQL_language_id = """
SELECT lang,
       len(list_intersect(list_distinct(string_split(text, ' ')),
                          ['the', 'a', 'of'])) AS stop_hits,
       count(*) AS cnt
FROM documents GROUP BY 1, 2
"""


def q_doc_fingerprint(spark, sf_dir):
    """Deterministic content fingerprint prefix histogram (rolling-hash
    stand-in that both engines share: md5 hex prefix)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.substring(F.md5("text"), 1, 1).alias("fp_nibble"))
        .groupBy("fp_nibble")
        .agg(F.count("*").alias("cnt"))
    )


SQL_doc_fingerprint = """
SELECT substr(md5(text), 1, 1) AS fp_nibble, count(*) AS cnt
FROM documents GROUP BY 1
"""


def q_embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k over embeddings (the reference's oracle path,
    main.cpp:29-44): queries = vec_id < 5, k = 10, tie-break (sim desc, id)."""
    e = _t(spark, sf_dir, "embeddings")
    # norms are per-VECTOR, so compute each side's norm once in a projection
    # BEFORE the cross join (r6): the join used to re-evaluate the candidate
    # norm fold for every one of the |q|×|c| pairs — ~3× the per-pair
    # higher-order-function work for identical values (guide §1.2 "don't
    # compute things you throw away"). Same expression on the same input ⇒
    # bit-identical cosine.
    _norm = lambda col: F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _norm("embedding").alias("nq"),
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        _norm("embedding").alias("nc"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot / (F.col("nq") * F.col("nc")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return sims.withColumn("rnk", F.row_number().over(w).cast("long")).filter(F.col("rnk") <= 10)


SQL_embedding_cosine_topk = """
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         round(list_dot_product(q.embedding, c.embedding) /
               (sqrt(list_dot_product(q.embedding, q.embedding)) *
                sqrt(list_dot_product(c.embedding, c.embedding))), 4) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND q.vec_id != c.vec_id)
SELECT query_id, cand_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rnk
FROM sims QUALIFY rnk <= 10
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (training-data dedup op):
    all pairs with cosine ≥ 0.2 among the first 100 vectors."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0), lambda acc, v: acc + v)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot / (nrm("va") * nrm("vb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= 0.2)
    )


SQL_embedding_near_dup = """
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.embedding, b.embedding) /
               (sqrt(list_dot_product(a.embedding, a.embedding)) *
                sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 100 AND b.vec_id < 100)
WHERE cosine >= 0.2
"""


def q_id_remap(spark, sf_dir):
    """Dense-id dictionary build + probe — the reference's user/item remap
    (src/DataManager.h:79-105) done deterministically with row_number over
    sorted distinct ids instead of first-sight order."""
    o = _t(spark, sf_dir, "orders")
    dim = (
        o.select("o_custkey").distinct()
        .withColumn("dense_id", (F.row_number().over(Window.orderBy("o_custkey")) - 1).cast("long"))
    )
    return (
        o.join(dim, "o_custkey")
        .groupBy((F.col("dense_id") % 7).alias("bucket"))
        .agg(F.count("*").alias("cnt"), F.min("dense_id").alias("min_id"))
    )


SQL_id_remap = """
WITH dim AS (
  SELECT o_custkey, row_number() OVER (ORDER BY o_custkey) - 1 AS dense_id
  FROM (SELECT DISTINCT o_custkey FROM orders))
SELECT dense_id % 7 AS bucket, count(*) AS cnt, min(dense_id) AS min_id
FROM orders JOIN dim USING (o_custkey)
GROUP BY 1
"""


def q_per_group_cap(spark, sf_dir):
    """Deterministic per-group cap — the reference's max-triplets-per-user
    sampling (src/Triplet.h:168-200) with a total-order rank instead of RNG."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    capped = li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return capped.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


SQL_per_group_cap = """
SELECT l_returnflag, count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
FROM (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
  FROM lineitem)
WHERE rn <= 3
GROUP BY l_returnflag
"""


def q_triplet_gen(spark, sf_dir):
    """Uncapped preference-triplet generation (src/Triplet.h:125-167) over
    orders-as-ratings: per customer, orient order pairs by totalprice with a
    minimum-difference predicate."""
    from srpr_lsh_spark.operators.triplets import generate_triplets

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    t = generate_triplets(
        o, user_col="o_custkey", item_col="o_orderkey", rating_col="o_totalprice",
        min_rating_diff=1000.0, max_per_user=None,
    )
    return t.groupBy("user_id").agg(
        F.count("*").alias("n_triplets"),
        F.min("pos_item").alias("min_pos"),
        F.max("neg_item").alias("max_neg"),
    )


SQL_triplet_gen = """
WITH r AS (SELECT o_custkey AS u, o_orderkey AS i, o_totalprice AS p
           FROM orders WHERE o_custkey % 20 = 0)
SELECT a.u AS user_id, count(*) AS n_triplets,
       min(CASE WHEN a.p > b.p THEN a.i ELSE b.i END) AS min_pos,
       max(CASE WHEN a.p > b.p THEN b.i ELSE a.i END) AS max_neg
FROM r a JOIN r b ON a.u = b.u AND a.i < b.i
WHERE abs(a.p - b.p) >= 1000.0
GROUP BY a.u
"""


def q_epoch_loglik(spark, sf_dir):
    """Epoch log-likelihood aggregation — Σ ln σ(x) over a score column
    (src/SRPRModel.h:80,133 / MatrixFactorization sigmoid), the SQL-expressible
    core of the per-epoch training metric. ln σ(x) = −ln(1 + e^(−x))."""
    o = _t(spark, sf_dir, "orders")
    x = (F.col("o_totalprice") - 150000.0) / 50000.0
    return o.groupBy("o_orderpriority").agg(
        F.round(F.sum(-F.log1p(F.exp(-x))), 4).alias("loglik"),
        F.count("*").alias("n"),
    )


SQL_epoch_loglik = """
SELECT o_orderpriority,
       round(sum(-ln(1 + exp(-((o_totalprice - 150000.0) / 50000.0)))), 4) AS loglik,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_shingle_count(spark, sf_dir):
    """The signature stage's ``n_shingles`` column, oracle-checked: distinct
    char 5-grams of the NORMALIZED text, computed by the ACTUAL production
    kernel (``kernels/hashing.py::shingle_hashes`` — the distinct-hash count
    equals the distinct-shingle count barring a 64-bit collision, ~1e-13 per
    doc). Moves one more LSH-adjacent column from rows-only to hash-checked
    (VERDICT r3 #5); reference analogue: the per-item hashing loop input size
    (src/lsh.h:27-32)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from srpr_lsh_spark.kernels.hashing import shingle_hashes
    from srpr_lsh_spark.kernels.text import normalize_transcript

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_shingles", LongType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            texts = normalize_transcript(pdf["text"].tolist())
            _, off = shingle_hashes(texts, k=5, seed=42)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_shingles": (off[1:] - off[:-1]).astype("int64"),
                }
            )

    return d.mapInPandas(gen, schema=schema)


# The whitespace class matches Python ``str.split()`` exactly (ASCII ws +
# \x1c-\x1f + NEL + NBSP + the Unicode space separators) — RE2's ``\s`` is
# ASCII-only, which diverges on e.g. NBSP. The final LEFT JOIN + coalesce
# keeps doc_ids whose normalized text is shorter than k (or null/empty): the
# Spark kernel emits n_shingles=0 for those, while a bare
# unnest(generate_series(1,0)) would drop the row (ADVICE r4 #1).
SQL_shingle_count = r"""
WITH nt AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text,
           '[\t\n\x0b\f\r \x1c-\x1f\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+',
           ' ', 'g'))) AS t
  FROM documents),
ex AS (SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - 4, 0))) AS i
       FROM nt),
sc AS (SELECT doc_id, count(DISTINCT substring(t, i, 5)) AS n_shingles
       FROM ex GROUP BY doc_id)
SELECT d.doc_id, coalesce(sc.n_shingles, 0) AS n_shingles
FROM documents d LEFT JOIN sc USING (doc_id)
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

ORACLE_QUERIES = {
    "predicate_filter": (q_predicate_filter, SQL_predicate_filter),
    "min_activity_filter": (q_min_activity_filter, SQL_min_activity_filter),
    "preference_orientation": (q_preference_orientation, SQL_preference_orientation),
    "join_dims": (q_join_dims, SQL_join_dims),
    "left_anti": (q_left_anti, SQL_left_anti),
    "bucket_probe_join": (q_bucket_probe_join, SQL_bucket_probe_join),
    "pricing_summary": (q_pricing_summary, SQL_pricing_summary),
    "conditional_avg": (q_conditional_avg, SQL_conditional_avg),
    "hourly_rollup": (q_hourly_rollup, SQL_hourly_rollup),
    "topk_per_group": (q_topk_per_group, SQL_topk_per_group),
    "nrecall": (q_nrecall, SQL_nrecall),
    "dcg": (q_dcg, SQL_dcg),
    "cumulative_hits": (q_cumulative_hits, SQL_cumulative_hits),
    "set_ops": (q_set_ops, SQL_set_ops),
    "exact_dedup": (q_exact_dedup, SQL_exact_dedup),
    "token_count": (q_token_count, SQL_token_count),
    "token_count_regex": (q_token_count_regex, SQL_token_count_regex),
    "quality_score": (q_quality_score, SQL_quality_score),
    "ngram_jaccard": (q_ngram_jaccard, SQL_ngram_jaccard),
    "language_id": (q_language_id, SQL_language_id),
    "doc_fingerprint": (q_doc_fingerprint, SQL_doc_fingerprint),
    "embedding_cosine_topk": (q_embedding_cosine_topk, SQL_embedding_cosine_topk),
    "embedding_near_dup": (q_embedding_near_dup, SQL_embedding_near_dup),
    "id_remap": (q_id_remap, SQL_id_remap),
    "per_group_cap": (q_per_group_cap, SQL_per_group_cap),
    "triplet_gen": (q_triplet_gen, SQL_triplet_gen),
    "epoch_loglik": (q_epoch_loglik, SQL_epoch_loglik),
    "shingle_count": (q_shingle_count, SQL_shingle_count),
}
