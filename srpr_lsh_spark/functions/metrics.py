"""Retrieval-quality metrics — the reference's ``MetricsCalculator``
(``src/MetricsCalculator.h:81-258``) as DataFrame aggregations.

Given a ranked result list and a ground-truth list per query, computes
precision@k, recall@k, AP@k, nDCG@k and macro-averages over queries — the
accumulate-then-average loops of ``print_average_metrics`` become one
``groupBy().avg()``.

Reference-parity notes:

- queries with an EMPTY result list still count (zero metrics), matching the
  reference's push of a zero entry per test user (``MetricsCalculator.h:142-145``)
  — the per-query frame is left-joined back onto the full truth query set;
- AP divides by the number of hits, the reference's denominator
  (``MetricsCalculator.h:168``), not by min(n_truth, k);
- relevance is binary (membership in the truth set) unless ``truth`` carries a
  ``rel`` column, in which case DCG/IDCG use graded relevance like the
  reference's rating-graded ``calculate_dcg`` (``MetricsCalculator.h:89-113``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics.

    ``results``: (query_id, item_id, rnk) — ranked retrieval output (rnk 1-based)
    ``truth``:   (query_id, item_id[, rel]) — ground-truth set (e.g. brute-force
                 top-k), optionally with a graded-relevance column ``rel``
    Returns one row per TRUTH query (queries with no retrieved rows score 0):
    precision_at_k, recall_at_k, ap_at_k, ndcg_at_k.
    """
    graded = "rel" in truth.columns
    rel_col = F.col("rel").cast("double") if graded else F.lit(1.0)
    t = truth.select("query_id", "item_id", rel_col.alias("rel"))

    res = results.filter(F.col("rnk") <= k)
    hit = res.join(t, ["query_id", "item_id"], "left").select(
        "query_id",
        "rnk",
        F.coalesce("rel", F.lit(0.0)).alias("rel"),
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cumulative hits → precision@i at every rank (MetricsCalculator.h:153-172);
    # hit/precision counting stays binary even under graded DCG, matching the
    # reference (relevance grades only enter the DCG terms)
    is_hit = F.when(F.col("rel") > 0, 1).otherwise(0)
    cum = hit.withColumn("is_hit", is_hit).withColumn(
        "cum_hits", F.sum("is_hit").over(w)
    )
    per_rank = cum.select(
        "query_id",
        "rnk",
        "is_hit",
        (F.col("cum_hits") / F.col("rnk")).alias("prec_at_i"),
        (F.col("rel") / F.log2(F.col("rnk") + 1)).alias("dcg_term"),
    )
    truth_sizes = t.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    # ideal DCG: truth items sorted by relevance desc, Σ_{i=1..min(n,k)} rel_i/log2(i+1).
    # INTENTIONAL DIVERGENCE from the reference: MetricsCalculator.h:175
    # computes IDCG over the ground-truth list in its given (score-ranked)
    # order, which is not the relevance-sorted ideal — its graded nDCG can
    # exceed 1 when ratings disagree with the truth ranking. We use the
    # standard definition (relevance-desc ideal), so nDCG ∈ [0, 1] always;
    # values coincide whenever the truth list is already relevance-sorted
    # (the binary-relevance case, which is what the oracle queries exercise).
    wt = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("item_id"))
    idcg = (
        t.withColumn("pos", F.row_number().over(wt))
        .filter(F.col("pos") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("pos") + 1)).alias("idcg"))
    )
    agg = per_rank.groupBy("query_id").agg(
        F.sum("is_hit").alias("hits"),
        F.sum(F.when(F.col("is_hit") == 1, F.col("prec_at_i"))).alias("sum_prec_at_hits"),
        F.sum("dcg_term").alias("dcg"),
    )
    per_query = (
        agg.select(
            "query_id",
            (F.col("hits") / F.lit(k)).alias("precision_at_k"),
            F.col("hits").alias("hits"),
            # AP = Σ prec@hit / hits — the reference's denominator
            # (MetricsCalculator.h:168); 0 when nothing relevant was retrieved
            F.when(
                F.col("hits") > 0,
                F.coalesce(F.col("sum_prec_at_hits"), F.lit(0.0)) / F.col("hits"),
            )
            .otherwise(0.0)
            .alias("ap_at_k"),
            F.col("dcg"),
        )
    )
    # left-join back onto the FULL truth query set: a query whose retrieval
    # came back empty contributes zeros to the macro averages
    # (MetricsCalculator.h:142-145), it is not silently dropped
    return (
        truth_sizes.join(idcg, "query_id")
        .join(per_query, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("precision_at_k", F.lit(0.0)).alias("precision_at_k"),
            (F.coalesce("hits", F.lit(0)) / F.col("n_truth")).alias("recall_at_k"),
            F.coalesce("ap_at_k", F.lit(0.0)).alias("ap_at_k"),
            F.when(F.col("idcg") > 0, F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"))
            .otherwise(0.0)
            .alias("ndcg_at_k"),
        )
    )


def nrecall_at_k(
    results: DataFrame,
    ratings: DataFrame,
    max_rating_value: float,
    k: int = 10,
) -> DataFrame:
    """The reference's nRecall (``MetricsCalculator.h:89-138``): recall of a
    user's MAX-RATED items, normalized by the best achievable at k.

    ``results``: (query_id, item_id, rnk) ranked retrieval output.
    ``ratings``: (query_id, item_id, rating).
    Per user: max_rated = items with rating == ``max_rating_value`` (a GLOBAL
    constant — main.cpp:68 uses 5.0); users with none are EXCLUDED (the
    reference's early return + Umax-count conditional average,
    ``MetricsCalculator.h:104-107,245-258``);
    nRecall@k = hits / ideal = (hits/n_max) / (min(k_ret, n_max)/n_max)
              = hits / min(k_ret, n_max),
    where ``k_ret`` is the ACTUAL retrieved-list length (the reference sets
    ``k = lsh_results.size()`` at ``MetricsCalculator.h:121``, NOT the nominal
    k) — they differ when retrieval returns fewer than k candidates. A user
    with zero retrieved rows scores 0.0 (the reference's ideal>0 guard).
    Returns (query_id, n_max_rated, hits, n_recall_at_k), one row per Umax
    user — so ``avg(n_recall_at_k)`` over this frame IS the reference's
    ``get_average_nrecall``."""
    maxr = ratings.filter(F.col("rating") == max_rating_value).select(
        "query_id", "item_id"
    )
    sizes = maxr.groupBy("query_id").agg(F.count("*").alias("n_max_rated"))
    topk = results.filter(F.col("rnk") <= k)
    retrieved = topk.groupBy("query_id").agg(F.count("*").alias("n_retrieved"))
    hits = (
        topk.join(maxr, ["query_id", "item_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    ideal = F.least(F.coalesce("n_retrieved", F.lit(0)), F.col("n_max_rated"))
    return (
        sizes.join(hits, "query_id", "left")
        .join(retrieved, "query_id", "left")
        .select(
            "query_id",
            "n_max_rated",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.when(ideal > 0, F.coalesce("hits", F.lit(0)) / ideal)
            .otherwise(F.lit(0.0))
            .alias("n_recall_at_k"),
        )
    )


def average_metrics(per_query: DataFrame) -> DataFrame:
    """Macro averages — MetricsCalculator.h:186-216 as one agg."""
    return per_query.agg(
        F.round(F.avg("precision_at_k"), 4).alias("avg_precision"),
        F.round(F.avg("recall_at_k"), 4).alias("avg_recall"),
        F.round(F.avg("ap_at_k"), 4).alias("map_at_k"),
        F.round(F.avg("ndcg_at_k"), 4).alias("avg_ndcg"),
        F.count("*").alias("n_queries"),
    )
