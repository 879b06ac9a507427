"""Retrieval-quality metrics — the reference's ``MetricsCalculator``
(``src/MetricsCalculator.h:81-258``) as DataFrame aggregations.

Given a ranked result list and a ranked ground-truth list per query, computes
precision@k, recall@k, AP@k, nDCG@k (binary relevance = membership in the
truth set, the reference's convention) and macro-averages over queries — the
accumulate-then-average loops of ``print_average_metrics`` become one
``groupBy().avg()``.
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
    ``truth``:   (query_id, item_id) — ground-truth set (e.g. brute-force top-k)
    Returns one row per query: precision_at_k, recall_at_k, ap_at_k, ndcg_at_k.
    """
    res = results.filter(F.col("rnk") <= k)
    hit = res.join(
        truth.withColumn("is_rel", F.lit(1)), ["query_id", "item_id"], "left"
    ).select(
        "query_id", "rnk", F.coalesce("is_rel", F.lit(0)).alias("rel")
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cumulative hits → precision@i at every rank (MetricsCalculator.h:153-172)
    cum = hit.withColumn("cum_hits", F.sum("rel").over(w))
    per_rank = cum.select(
        "query_id",
        "rnk",
        "rel",
        (F.col("cum_hits") / F.col("rnk")).alias("prec_at_i"),
        (F.col("rel") / F.log2(F.col("rnk") + 1)).alias("dcg_term"),
    )
    truth_sizes = truth.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    # ideal DCG for n relevant docs: Σ_{i=1..min(n,k)} 1/log2(i+1)
    idcg = truth_sizes.select(
        "query_id",
        "n_truth",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_truth"), F.lit(k))),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
        ).alias("idcg"),
    )
    agg = per_rank.groupBy("query_id").agg(
        F.sum("rel").alias("hits"),
        F.count("*").alias("n_ret"),
        F.sum(F.when(F.col("rel") == 1, F.col("prec_at_i"))).alias("sum_prec_at_hits"),
        F.sum("dcg_term").alias("dcg"),
    )
    return (
        agg.join(idcg, "query_id")
        .select(
            "query_id",
            (F.col("hits") / F.lit(k)).alias("precision_at_k"),
            (F.col("hits") / F.col("n_truth")).alias("recall_at_k"),
            (
                F.coalesce(F.col("sum_prec_at_hits"), F.lit(0.0))
                / F.greatest(F.least(F.col("n_truth"), F.lit(k)), F.lit(1))
            ).alias("ap_at_k"),
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(0.0)
            .alias("ndcg_at_k"),
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
