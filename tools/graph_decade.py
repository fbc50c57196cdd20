"""Second-decade rehearsal for the iterative graph family (VERDICT r05
task 6): the in-plan small-world generator (ring + one xxhash64 chord
per vertex — O(log n) diameter, one component) at 1.2M and 12M
vertices, run through pagerank / wcc / triangle_count on local[32],
with wall time AND peak JVM RSS recorded per stage.

Usage: SPARK_DRIVER_MEMORY=48g python tools/graph_decade.py [N ...]
Prints one JSON line per N.  Compare WITHIN one session/run (ratios
cancel ambient load — BASELINE.md measurement protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphmapreduce_spark.session import get_spark  # noqa: E402
from graphmapreduce_spark.graph import algorithms as alg  # noqa: E402
from graphmapreduce_spark.graph.property_graph import PropertyGraph  # noqa: E402


class PeakRss:
    """Samples max RSS (MiB) of every java child of this process."""

    def __init__(self, interval: float = 0.5):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(
            target=self._run, args=(interval,), daemon=True
        )
        self._t.start()

    def _sample(self) -> int:
        try:
            out = subprocess.run(
                ["ps", "-o", "rss=,comm=", "--ppid", str(os.getpid())],
                capture_output=True, text=True, timeout=5,
            ).stdout
            return sum(
                int(line.split()[0])
                for line in out.splitlines()
                if line.strip() and "java" in line
            ) // 1024
        except Exception:
            return 0

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, self._sample())
            self._stop.wait(interval)

    def stop(self) -> int:
        self._stop.set()
        self._t.join(timeout=5)
        return self.peak


def small_world(spark, n: int) -> PropertyGraph:
    base = spark.range(1, n + 1).select(F.col("id").alias("src"))
    ring = base.select("src", (F.col("src") % n + 1).alias("dst"))
    chords = base.select(
        "src", (F.pmod(F.xxhash64("src"), F.lit(n)) + 1).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    edges = ring.unionByName(chords).withColumn("weight", F.lit(1.0))
    return PropertyGraph.from_edges(edges)


def main() -> int:
    argv = sys.argv[1:]
    stages = {"pagerank", "wcc", "triangles"}
    if "--stages" in argv:
        i = argv.index("--stages")
        argv.pop(i)
        stages = set(argv.pop(i).split(","))
    sizes = [int(a) for a in argv] or [1_200_000, 12_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gmr-graph-decade",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    for n in sizes:
        g = small_world(spark, n)
        out: dict = {"n_vertices": n}
        rss = PeakRss()
        t0 = time.perf_counter()
        nv = g.vertices.count()
        out["build_s"] = round(time.perf_counter() - t0, 1)
        assert nv == n, (nv, n)

        if "pagerank" in stages:
            t0 = time.perf_counter()
            pr = alg.pagerank(g, max_iter=5)
            mass = pr.agg(F.sum("rank")).first()[0]
            out["pagerank5_s"] = round(time.perf_counter() - t0, 1)
            out["pagerank_mass"] = round(float(mass), 4)

        if "wcc" in stages:
            t0 = time.perf_counter()
            comp = alg.connected_components(g)
            ncomp = comp.select("component").distinct().count()
            out["wcc_s"] = round(time.perf_counter() - t0, 1)
            out["n_components"] = int(ncomp)

        if "wcc_contract" in stages:
            # q590's engine path on the SAME small-world generator the
            # min-label row uses (BASELINE.md previously had ring
            # numbers only for contraction — VERDICT r06 task 4)
            t0 = time.perf_counter()
            st: dict = {}
            comp = alg.connected_components_contract(g, stats=st)
            ncomp = comp.select("component").distinct().count()
            out["wcc_contract_s"] = round(time.perf_counter() - t0, 1)
            out["wcc_contract_rounds"] = st.get("rounds")
            out["n_components_contract"] = int(ncomp)

        if "triangles" in stages:
            t0 = time.perf_counter()
            tri = alg.triangle_count(g)
            out["triangles_s"] = round(time.perf_counter() - t0, 1)
            out["n_triangles"] = int(tri)

        if "betweenness" in stages:
            # sampled-source Brandes (q168's operator): FIXED 8-source
            # panel so the decade ratio isolates graph volume — the
            # estimator's cost is 2·max_depth supersteps regardless of
            # |V|, so the expectation is floor-bound scaling
            t0 = time.perf_counter()
            sources = [1 + (n // 8) * i for i in range(8)]
            bc = alg.betweenness_centrality(g, sources, max_depth=40)
            out["betweenness_nnz"] = int(
                bc.filter(F.col("betweenness") > 0).count()
            )
            out["betweenness8_s"] = round(time.perf_counter() - t0, 1)

        out["peak_jvm_rss_mib"] = rss.stop()
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
