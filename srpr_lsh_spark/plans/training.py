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


def _hashed_pairwise_acc(
    model: FactorModel, trip_rows: np.ndarray, tables: int, bits: int, seed: int
) -> "tuple[float, float]":
    """(exact-cosine acc, b-bit-hashed acc) of the model on its triplets.

    Hashed similarity = SRP bit-agreement fraction — the quantity Eq.9 says
    estimates the angle; this is the reference's hashing-robustness experiment
    (main.cpp:122-166) reduced to its pairwise core."""
    planes = srp_planes(model.d, tables, bits, seed)
    bu = (model.U @ planes.T) >= 0
    bv = (model.V @ planes.T) >= 0
    ui = np.searchsorted(model.user_ids, trip_rows[:, 0])
    ii = np.searchsorted(model.item_ids, trip_rows[:, 1])
    ji = np.searchsorted(model.item_ids, trip_rows[:, 2])

    def cosm(a, b_):
        return np.einsum("md,md->m", a, b_) / np.maximum(
            np.linalg.norm(a, axis=1) * np.linalg.norm(b_, axis=1), 1e-12
        )

    exact = float(
        (cosm(model.U[ui], model.V[ii]) > cosm(model.U[ui], model.V[ji])).mean()
    )
    sim_pos = (bu[ui] == bv[ii]).mean(axis=1)
    sim_neg = (bu[ui] == bv[ji]).mean(axis=1)
    hashed = float((sim_pos > sim_neg).mean())
    return exact, hashed


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
    ``recall.cpp`` over trained models). One row per (model, tables, bits)."""
    trip = orders_triplets(spark, sf_dir)
    rows_np = np.array(
        trip.select("user_id", "pos_item", "neg_item").collect(), dtype=np.int64
    )
    models = {
        "bpr": train_bpr(spark, trip, d=8, epochs=epochs, learning_rate=0.05,
                         lam=0.01, seed=cfg.seed),
        "srpr": train_srpr(spark, trip, d=8, b=8, epochs=epochs,
                           learning_rate=0.05, lam=0.001, seed=cfg.seed),
    }
    out = []
    for name, m in models.items():
        for tables, bits in bits_grid:
            exact, hashed = _hashed_pairwise_acc(m, rows_np, tables, bits, cfg.seed)
            out.append(
                (name, tables, bits, round(exact, 4), round(hashed, 4),
                 round(exact - hashed, 4))
            )
    return spark.createDataFrame(
        out,
        "model string, tables int, bits int, acc_exact double, acc_hashed double, "
        "hash_degradation double",
    )
