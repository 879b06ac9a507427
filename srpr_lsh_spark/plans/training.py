"""Driver-facing training queries: triplets from the orders table → BPR /
SRPR models → per-epoch curves and hashing-robustness sweeps.

These power the ``queries()`` entries for the reference's model-training half
(``main.cpp:84-120``): training itself is not SQL-expressible (iterative), so
the curves are rows-only driver checks whose math is pinned by
``tests/test_ml.py`` (hand computation + finite differences).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from srpr_lsh_spark.config import DedupConfig
from srpr_lsh_spark.kernels.hashing import srp_planes
from srpr_lsh_spark.ml.trainer import FactorModel, train_bpr, train_srpr
from srpr_lsh_spark.operators.triplets import generate_triplets


def orders_triplets(spark: SparkSession, sf_dir: str, modulus: int = 50) -> DataFrame:
    """Deterministic small triplet set from the orders table (the ratings
    stand-in, as in parity.q_triplet_gen): per customer, orient order pairs by
    totalprice with a minimum-difference predicate (src/Triplet.h:125-167)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") % modulus == 0
    )
    return generate_triplets(
        o, user_col="o_custkey", item_col="o_orderkey", rating_col="o_totalprice",
        min_rating_diff=1000.0, max_per_user=50,
    )


def embedding_triplets(
    spark: SparkSession,
    sf_dir: str,
    n_users: int = 25,
    n_items: int = 300,
    margin: float = 0.15,
    cap: int = 120,
) -> DataFrame:
    """Angle-graded preference triplets from the embeddings table: the HARD
    geometry for hashing robustness. Preference strength is the COSINE of a
    user vector to an item vector (computed JVM-side), so ranking information
    lives entirely in angles — exactly what b-bit SRP hashing quantizes.
    On these triplets the paper's core claim is measurable: BPR's dot-product
    objective can park ranking signal in magnitudes that hashing destroys,
    while SRPR's Eq.9 objective optimizes the angles the hash preserves
    (main.cpp:122-166 is the reference's version of this experiment).

    Bounded regardless of sf: ``n_users`` × ``n_items`` rows pre-pair-join."""
    from srpr_lsh_spark.operators.ann import dot_expr, norm_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # per-vector norms hoisted out of the cross join (r6, bit-identical)
    users = emb.filter(F.col("vec_id") < n_users).select(
        F.col("vec_id").alias("user_id"), F.col("embedding").alias("ue")
    ).withColumn("nu", norm_expr("ue"))
    items = emb.filter(
        (F.col("vec_id") >= n_users) & (F.col("vec_id") < n_users + n_items)
    ).select(F.col("vec_id").alias("item_id"), F.col("embedding").alias("ie")
    ).withColumn("ni", norm_expr("ie"))
    ratings = (
        F.broadcast(users)
        .crossJoin(items)
        .select(
            "user_id", "item_id",
            (dot_expr("ue", "ie") / (F.col("nu") * F.col("ni"))).alias("rating"),
        )
    )
    return generate_triplets(
        ratings, min_rating_diff=margin, max_per_user=cap,
    )


def embedding_hash_sweep(
    spark: SparkSession,
    sf_dir: str,
    cfg: DedupConfig,
    bits_grid: "tuple[tuple[int, int], ...]" = ((2, 4), (4, 8), (8, 8)),
    epochs: int = 30,
) -> DataFrame:
    """``model_hash_sweep`` on the angle-graded embedding triplets. SRPR is
    trained at b=4 (the aggressive deployment budget) — at the (2,4) grid
    point its hash_degradation comes out BELOW BPR's, the ordering the paper
    predicts and ``tests/test_ml.py::test_srpr_beats_bpr_on_angle_geometry``
    pins."""
    trip = embedding_triplets(spark, sf_dir).localCheckpoint(eager=True)
    models = {
        "bpr": train_bpr(spark, trip, d=8, epochs=epochs, learning_rate=0.05,
                         lam=0.01, seed=cfg.seed),
        "srpr": train_srpr(spark, trip, d=8, b=4, epochs=epochs,
                           learning_rate=0.05, lam=0.001, seed=cfg.seed),
    }
    return hash_sweep_over_models(spark, models, trip, bits_grid, cfg.seed)


def bpr_training_curve(
    spark: SparkSession, sf_dir: str, cfg: DedupConfig, epochs: int = 5
) -> DataFrame:
    """(epoch, loglik, avg_loglik, n_triplets) for a short BPR run —
    MatrixFactorization.h:58-98 on orders-derived triplets."""
    trip = orders_triplets(spark, sf_dir)
    m = train_bpr(spark, trip, d=8, epochs=epochs, learning_rate=0.05,
                  lam=0.01, seed=cfg.seed)
    from srpr_lsh_spark.ml.trainer import epoch_history_df

    return epoch_history_df(spark, m).select(
        "epoch", F.round("avg_loglik", 6).alias("avg_loglik"), "n_triplets"
    )


def srpr_training_curve(
    spark: SparkSession, sf_dir: str, cfg: DedupConfig, epochs: int = 5, b: int = 8
) -> DataFrame:
    """(epoch, loglik, avg_loglik, n_triplets) for a short SRPR run —
    SRPRModel.h:60-133 (loglik = Σ ln(Φ(√b γ)+1e-12), the reference's
    per-epoch console metric)."""
    trip = orders_triplets(spark, sf_dir)
    m = train_srpr(spark, trip, d=8, b=b, epochs=epochs, learning_rate=0.05,
                   lam=0.001, seed=cfg.seed)
    from srpr_lsh_spark.ml.trainer import epoch_history_df

    return epoch_history_df(spark, m).select(
        "epoch", F.round("avg_loglik", 6).alias("avg_loglik"), "n_triplets"
    )


def hash_sweep_over_models(
    spark: SparkSession,
    models: "dict[str, FactorModel]",
    triplets: DataFrame,
    bits_grid: "tuple[tuple[int, int], ...]",
    seed: int,
) -> DataFrame:
    """Pairwise-accuracy hashing-robustness sweep, fully distributed: NO
    driver collect of triplet rows. Factors are broadcast once; ONE
    mapInPandas pass over the triplets emits per-batch hit COUNTS for every
    (model, tables, bits) grid point; accuracies reduce JVM-side
    (``groupBy().sum()`` — map-side combinable). Counts are integers, so the
    result is bit-identical to the former driver-side ``.mean()``.

    Hashed similarity = SRP bit-agreement fraction — the quantity Eq.9 says
    estimates the angle; this is the reference's hashing-robustness
    experiment (main.cpp:122-166) reduced to its pairwise core."""
    import pandas as pd

    payload = {
        name: (m.user_ids, m.item_ids, m.U, m.V, m.d) for name, m in models.items()
    }
    bc = spark.sparkContext.broadcast((payload, tuple(bits_grid), seed))
    schema = (
        "model string, tables int, bits int, n long, exact_hits long, hashed_hits long"
    )

    def gen(batches):
        pl, grid, sd = bc.value
        # planes are deterministic from (seed, tables, bits) — regenerate per
        # worker instead of shipping them
        for pdf in batches:
            if not len(pdf):
                continue
            u = pdf["user_id"].to_numpy()
            i = pdf["pos_item"].to_numpy()
            j = pdf["neg_item"].to_numpy()
            rows = {"model": [], "tables": [], "bits": [],
                    "n": [], "exact_hits": [], "hashed_hits": []}
            for name, (user_ids, item_ids, U, V, d) in pl.items():
                ui = np.searchsorted(user_ids, u)
                ii = np.searchsorted(item_ids, i)
                ji = np.searchsorted(item_ids, j)

                def cosm(a, b_):
                    return np.einsum("md,md->m", a, b_) / np.maximum(
                        np.linalg.norm(a, axis=1) * np.linalg.norm(b_, axis=1),
                        1e-12,
                    )

                exact_hits = int(
                    np.count_nonzero(cosm(U[ui], V[ii]) > cosm(U[ui], V[ji]))
                )
                for tables, bits in grid:
                    planes = srp_planes(d, tables, bits, sd)
                    bu = (U[ui] @ planes.T) >= 0
                    bv_i = (V[ii] @ planes.T) >= 0
                    bv_j = (V[ji] @ planes.T) >= 0
                    sim_pos = (bu == bv_i).mean(axis=1)
                    sim_neg = (bu == bv_j).mean(axis=1)
                    rows["model"].append(name)
                    rows["tables"].append(tables)
                    rows["bits"].append(bits)
                    rows["n"].append(len(pdf))
                    rows["exact_hits"].append(exact_hits)
                    rows["hashed_hits"].append(
                        int(np.count_nonzero(sim_pos > sim_neg))
                    )
            yield pd.DataFrame(rows)

    counts = (
        triplets.select(
            F.col("user_id").cast("long"),
            F.col("pos_item").cast("long"),
            F.col("neg_item").cast("long"),
        )
        .mapInPandas(gen, schema=schema)
        .groupBy("model", "tables", "bits")
        .agg(
            F.sum("n").alias("n"),
            F.sum("exact_hits").alias("eh"),
            F.sum("hashed_hits").alias("hh"),
        )
    )
    acc_e = F.round(F.col("eh") / F.col("n"), 4)
    acc_h = F.round(F.col("hh") / F.col("n"), 4)
    return counts.select(
        "model", "tables", "bits",
        acc_e.alias("acc_exact"), acc_h.alias("acc_hashed"),
        F.round(acc_e - acc_h, 4).alias("hash_degradation"),
    )


def model_hash_sweep(
    spark: SparkSession,
    sf_dir: str,
    cfg: DedupConfig,
    bits_grid: "tuple[tuple[int, int], ...]" = ((2, 4), (4, 8), (8, 8)),
    epochs: int = 8,
) -> DataFrame:
    """Train BPR and SRPR on the same triplets, then measure how much pairwise
    ranking accuracy each survives b-bit SRP hashing with — the reference's
    core experimental question (``data_collection/speedup.cpp`` /
    ``recall.cpp`` over trained models). One row per (model, tables, bits).
    The accuracy evaluation is distributed (``hash_sweep_over_models``): no
    driver-side collect of data rows at any triplet volume."""
    trip = orders_triplets(spark, sf_dir).localCheckpoint(eager=True)
    models = {
        "bpr": train_bpr(spark, trip, d=8, epochs=epochs, learning_rate=0.05,
                         lam=0.01, seed=cfg.seed),
        "srpr": train_srpr(spark, trip, d=8, b=8, epochs=epochs,
                           learning_rate=0.05, lam=0.001, seed=cfg.seed),
    }
    return hash_sweep_over_models(spark, models, trip, bits_grid, cfg.seed)
