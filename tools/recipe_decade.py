"""Document-scale decade for the composed dedup recipe (q576) and the
betweenness carrier (q168) with peak JVM RSS recorded (VERDICT r06
task 5 — the two iterative carriers the 12M-vertex table didn't cover).

Runs each query once warm (best of 2 passes, noop sink — bench.py's
protocol) per sf dir, sampling peak RSS across the run.  Compare
WITHIN one invocation; ratios cancel ambient load.

Usage: python tools/recipe_decade.py [--queries q576_dedup_corpus,...]
         [sf_dir ...]   (default: /tmp/gmr_sf1 /tmp/gmr_sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphmapreduce_spark.session import get_spark  # noqa: E402
from tools.graph_decade import PeakRss  # noqa: E402

DEFAULT_QUERIES = ["q576_dedup_corpus", "q168_betweenness"]


def main() -> int:
    argv = sys.argv[1:]
    queries = DEFAULT_QUERIES
    if "--queries" in argv:
        i = argv.index("--queries")
        argv.pop(i)
        queries = argv.pop(i).split(",")
    sf_dirs = argv or ["/tmp/gmr_sf1", "/tmp/gmr_sf10"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gmr-recipe-decade",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from graphmapreduce_spark.plans import workload

    qs = workload.queries()
    for sf_dir in sf_dirs:
        out: dict = {"sf_dir": sf_dir}
        for name in queries:
            rss = PeakRss()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            out[name + "_s"] = round(min(runs), 1)
            out[name + "_peak_rss_mib"] = rss.stop()
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
