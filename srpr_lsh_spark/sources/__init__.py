"""Sources: deterministic synthetic clips corpus + parquet readers."""

from srpr_lsh_spark.sources.synth import SynthParams, synthesize_clips, plan_block, generate_block
from srpr_lsh_spark.sources.readers import read_table, clips_schema

__all__ = [
    "SynthParams",
    "clips_schema",
    "generate_block",
    "plan_block",
    "read_table",
    "synthesize_clips",
]
