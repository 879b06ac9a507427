"""Model training: distributed BPR and SRPR over triplet DataFrames."""

from srpr_lsh_spark.ml.trainer import FactorModel, train_bpr, train_srpr  # noqa: F401
from srpr_lsh_spark.ml.vectors_io import load_vectors, save_vectors  # noqa: F401
