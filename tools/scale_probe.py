"""Scale rehearsal probe: time queries at two scale factors and report
per-query wall ratios, flagging super-linear growth.

Institutionalizes the per-round decade rehearsal (BASELINE.md): one
command instead of an ad-hoc driver script per session.

Usage:
    python tools/scale_probe.py [--small DIR] [--big DIR] [--factor N]
                                [--repeat K] [query ...]

Defaults: small=/root/testdata/sf0.1, big=/tmp/gmr_sf1 (auto-built via
tools/make_scale.py at --factor 10 if missing), queries=bench HEADLINE.
A query is flagged SUPER-LINEAR when ratio > 1.5 x factor; ratios well
under the factor usually mean the fixture caps make it sf-invariant
(the documented scale contract for df-capped / mod-N queries).
Prints one JSON line at the end for machine consumption.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/gmr_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if not os.path.isdir(args.big):
        print(f"# building {args.big} ({args.factor}x of {args.small})",
              file=sys.stderr)
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_scale.py"),
             "--factor", str(args.factor), "--src", args.small,
             "--dst", args.big],
            check=True,
        )

    from graphmapreduce_spark.session import get_spark
    from graphmapreduce_spark.plans import workload

    names = args.queries
    if not names:
        import bench

        names = bench.HEADLINE
    qs = workload.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="gmr-scale-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    # warm the session (codegen, parquet footers) so the first timed
    # scale doesn't absorb startup costs
    try:
        qs[names[0]](spark, args.small).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # pragma: no cover - warmup is best-effort
        print(f"# warmup failed: {exc}", file=sys.stderr)

    out = {}
    for sf_dir, tag in [(args.small, "small"), (args.big, "big")]:
        for n in names:
            best = None
            for _ in range(max(1, args.repeat)):
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(n, {})[tag] = round(best, 3)
    spark.stop()

    rows = []
    for n in names:
        s, b = out[n]["small"], out[n]["big"]
        ratio = b / max(s, 1e-9)
        flag = "SUPER-LINEAR" if ratio > 1.5 * args.factor else ""
        rows.append((n, s, b, ratio, flag))
        print(f"{n:40s} {s:8.2f}s {b:8.2f}s  {ratio:5.1f}x  {flag}")
    payload = {
        "factor": args.factor,
        "queries": {
            n: {"small_s": s, "big_s": b, "ratio": round(r, 2)}
            for n, s, b, r, _ in rows
        },
        "super_linear": [n for n, _, _, r, f in rows if f],
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
