"""Multi-executor smoke: run the engine under ``local-cluster[2,8,4096]``
— real executor JVMs, real serialization boundaries, NO shared driver
heap — the cheapest test of the 100 TB posture's only axis a plain
``local[n]`` session can never exercise (VERDICT r06 task 3; reference
analog: the MPI multi-rank execution model, gmr.cpp:42-44,267-268).

What local[n] hides and this catches:

- closures that capture something unserializable or driver-local;
- accidental reliance on driver-side state (a dict mutated in a UDF,
  a file path that only exists in the driver's cwd);
- broadcast joins whose build side only fit because driver == executor
  heap (here each executor gets 4 GiB, period);
- Python-worker environment propagation (PYTHONPATH must reach worker
  processes spawned by executor JVMs, not the driver).

Two modes:

  correctness (default): run the BSP family + recipe + a pandas-UDF
      carrier at sf0.01 under local-cluster, strict-compare vs DuckDB
      (same comparator as the driver gate).
  bench: run bench.py's HEADLINE list at sf0.1 with the noop sink,
      best-of-2 per query — directly comparable to BENCH_r{N}.json's
      local[32] numbers.

Usage:
  python tools/cluster_smoke.py [--mode correctness|bench]
         [--sf-dir DIR] [--names q1 q2 ...] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER = os.environ.get("SMOKE_MASTER", "local-cluster[2,8,4096]")

# correctness targets: the BSP/iterative family (driver-loop heavy, the
# most likely place for accidental driver-side state), the composed
# dedup recipe (multi-stage, localCheckpoint blocks live on EXECUTORS
# here), and the pandas-UDF/UDTF carriers (Python workers spawned by
# executor JVMs, not the driver).
CORRECTNESS_TARGETS = [
    "q31_triangle_count",
    "q32_pagerank",
    "q33_sssp",
    "q34_wcc",
    "q35_bfs",
    "q36_scc",
    "q37_mst",
    "q38_matmul",
    "q576_dedup_corpus",
    "q25_pandas_udaf_median",
    "q91_python_udtf",
    "q63_streaming_tumbling",
]


def get_session():
    from graphmapreduce_spark.session import get_spark

    return get_spark(
        master=MASTER,
        shuffle_partitions=16,
        app_name="cluster-smoke",
        extra_conf={
            # worker slot is 4096 MB; leave headroom for the shell
            "spark.executor.memory": "3g",
            "spark.driver.memory": "8g",
            "spark.driver.maxResultSize": "4g",
        },
    )


def run_correctness(sf_dir: str, names: list[str]) -> dict:
    import duckdb

    from tools.check_oracle import TABLES, compare_results, duck_describe
    import __spark_entry__ as entrymod

    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                ok, msg = compare_results(
                    df.columns, rows, ocols, res.fetchall()
                )
                status = "PASS" if ok else f"FAIL {msg}"
            else:
                status = f"rows-only {len(rows)} rows"
        except Exception as ex:
            status = f"FAIL {type(ex).__name__}: {ex}"
        secs = round(time.time() - t0, 1)
        results[name] = {"status": status[:300], "secs": secs}
        print(f"{name}: {status[:120]} ({secs}s)", flush=True)
    spark.stop()
    return results


def run_bench(sf_dir: str, names: list[str]) -> dict:
    import bench as benchmod
    from graphmapreduce_spark.plans import workload

    spark = get_session()
    qs = workload.queries()
    names = names or benchmod.HEADLINE
    # warmup mirrors bench.py
    try:
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:
        print(f"# warmup failed: {exc}", file=sys.stderr)
    times = {}
    for name in names:
        runs = []
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            times[name] = round(min(runs), 3)
        except Exception as ex:
            times[name] = None
            print(f"# {name}: FAILED {type(ex).__name__}: {ex}",
                  file=sys.stderr)
        print(f"# {name}: {times[name]}", flush=True)
    total = round(sum(t for t in times.values() if t), 3)
    print(json.dumps({"metric": "cluster_smoke_wall", "value": total,
                      "master": MASTER, "queries": times}))
    spark.stop()
    return times


def main() -> int:
    argv = sys.argv[1:]

    def opt(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            argv.pop(i)
            return argv.pop(i)
        return default

    mode = opt("--mode", "correctness")
    out_json = opt("--json")
    if mode == "bench":
        sf_dir = opt("--sf-dir", "/root/testdata/sf0.1")
        res = run_bench(sf_dir, argv)
    else:
        sf_dir = opt("--sf-dir", "/root/testdata/sf0.01")
        res = run_correctness(sf_dir, argv or CORRECTNESS_TARGETS)
        bad = [k for k, v in res.items() if v["status"].startswith("FAIL")]
        print(f"== {len(res) - len(bad)}/{len(res)} ok; fails: {bad} ==")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"master": MASTER, "mode": mode, "sf_dir": sf_dir,
                       "results": res}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
