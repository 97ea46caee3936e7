"""Capture .explain('formatted') for declared queries into plans/r06/.

Usage: python scripts/capture_plans.py SUFFIX [QUERY,...]

Writes plans/r06/<query>_<SUFFIX>.txt for each query (default: all except
stream_dedup_digests, which executes a streaming job inside the builder).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from manga_translator_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    names = (
        [n.strip() for n in sys.argv[2].split(",") if n.strip()]
        if len(sys.argv) > 2
        else [n for n in qs if n != "stream_dedup_digests"]
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="capture_plans", master=f"local[{cpus}]")
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {n}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
