"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Optimization-round evidence artifact (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python eval nodes — before and after every change).

Usage:
    python tools/dump_plans.py before [query ...]
    python tools/dump_plans.py after  [query ...]
    PLANS_TAG=r10 SF_DIR=/root/testdata/sf0.1 python tools/dump_plans.py before

With no query list, dumps every bench.py HEADLINE query. Files land at
plans/$PLANS_TAG/<query>_<suffix>.txt. Plan capture is mostly
driver-side, but queries with eager plan-BUILD work do run jobs
(winnow_overlap_pairs' n_docs count — which also materializes the lazy
fingerprint checkpoint — the kmeans driver loop in _ivf_kmeans_cells,
bpe merge collection), so a full dump can perturb a concurrent bench;
run them separately.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLANS_TAG", "r10")


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit("usage: dump_plans.py before|after [query ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:]

    import bench
    from gene_level_metadata_pipeline_spark.plans import driver_queries as dq
    from gene_level_metadata_pipeline_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        TAG,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = dq.QUERIES[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
