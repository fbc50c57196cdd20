"""Driver-protocol perf validation: alternating COLD bench.py runs of two
repo trees (e.g. the previous round's close commit in a git worktree vs
HEAD), so the round-over-round comparison has a same-window noise floor
a judge can check (VERDICT r07 item 4).

Each run is a fresh subprocess (cold JVM, cold codegen) executing the
tree's OWN bench.py under the driver's env contract
($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS) — bench.py itself is not
modified.  Trees alternate A,B,A,B,… so monotone ambient drift cancels
out of the pairwise deltas.

Usage:
  python tools/perf_protocol.py --a /tmp/r07tree --b /root/repo -n 3 \
      --out perf_protocol_r08.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_bench(tree: str, sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = cpus
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    parsed = json.loads(line[-1]) if line else None
    return {
        "tree": tree,
        "rc": proc.returncode,
        "wall": round(time.time() - t0, 1),
        "parsed": parsed,
    }


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="baseline tree (prev round)")
    ap.add_argument("--b", required=True, help="candidate tree (HEAD)")
    ap.add_argument("-n", type=int, default=3, help="pairs to run")
    ap.add_argument("--out", default="perf_protocol.json")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()
    runs = []
    for i in range(args.n):
        order = [("a", args.a), ("b", args.b)]
        if i % 2:
            order.reverse()
        for tag, tree in order:
            s0 = steal()
            r = run_bench(tree, args.sf, args.cpus)
            r["tag"] = tag
            r["pair"] = i
            r["steal_delta"] = steal() - s0
            total = r["parsed"]["value"] if r["parsed"] else None
            print(
                f"pair {i} {tag} ({tree}): total={total} "
                f"steal+={r['steal_delta']}",
                flush=True,
            )
            runs.append(r)
    a_tot = [r["parsed"]["value"] for r in runs if r["tag"] == "a" and r["parsed"]]
    b_tot = [r["parsed"]["value"] for r in runs if r["tag"] == "b" and r["parsed"]]
    per_q: dict[str, dict[str, list[float]]] = {}
    for r in runs:
        if not r["parsed"]:
            continue
        for q, v in r["parsed"]["queries"].items():
            if v is not None:
                per_q.setdefault(q, {"a": [], "b": []})[r["tag"]].append(v)
    summary = {
        "a_tree": args.a,
        "b_tree": args.b,
        "pairs": args.n,
        "a_totals": a_tot,
        "b_totals": b_tot,
        "a_min": min(a_tot) if a_tot else None,
        "b_min": min(b_tot) if b_tot else None,
        "per_query_min": {
            q: {
                "a": round(min(v["a"]), 3) if v["a"] else None,
                "b": round(min(v["b"]), 3) if v["b"] else None,
            }
            for q, v in sorted(per_q.items())
        },
        "runs": runs,
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"a_min={summary['a_min']} b_min={summary['b_min']} -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
