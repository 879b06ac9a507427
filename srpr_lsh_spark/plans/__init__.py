"""Plans: pipeline orchestration, checkpoint/resume warehouse, lineage."""

from srpr_lsh_spark.plans.checkpoint import Warehouse
from srpr_lsh_spark.plans.pipeline import run_dedup

__all__ = ["Warehouse", "run_dedup"]
