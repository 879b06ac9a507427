#!/usr/bin/env python
"""Capture .explain('formatted') for the bench queries (guide §1.4/§7.2).

    python tools/explain_queries.py before   # writes plans/r06/<q>_before.txt
    python tools/explain_queries.py after    # writes plans/r06/<q>_after.txt

Separate from the frozen bench.py (round-6 brief): plan capture only, no
timing. Uses the same session shape as bench.py so plans match what the
driver's bench would execute.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

QUERIES = (
    "pricing_summary",
    "join_dims",
    "topk_per_group",
    "dcg",
    "exact_dedup",
    "ngram_jaccard",
    "embedding_cosine_topk",
    "near_dup_pairs_documents",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from bench import DEFAULT_CPUS, _session

    spark = _session(DEFAULT_CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import __spark_entry__ as em

        qs = em.queries()
        for name in QUERIES:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
