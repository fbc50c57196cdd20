"""Campaign runner for the cross-scale strict-verification sweeps
(VERDICT r06 task 1: close the sf10 frontier).

Wraps tools/check_oracle.py's strict comparator with what a multi-hour
campaign needs and the one-shot checker doesn't have:

- a RESUMABLE JSONL log (--log): each query appends one line
  {name, status, secs, msg}; re-running with the same log skips
  everything already attempted, so an OOM/kill loses one query, not
  the batch;
- target selection: --missing runs only the value-oracled queries NOT
  yet in tools/sf10_verified.json (hash-valid entries only — an edited
  oracle re-enters the missing set automatically);
- --update-verified: every PASS is recorded in sf10_verified.json as
  {name: sha256(oracle sql)} — the hash-keyed waiver oracle_lint.py
  consumes (ADVICE r06: a name-only waiver can never catch a
  regression edited into an already-verified query);
- periodic cache/view hygiene so a 300-query session doesn't
  accumulate executor-side state.

Usage:
  python tools/sweep_oracles.py SF_DIR [--missing] [--limit N]
         [--names q1 q2 ...] [--log sweep.jsonl] [--update-verified]
         [--shuffle-seed N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.check_oracle import (  # noqa: E402
    TABLES,
    compare_results,
    duck_describe,
    type_surface_diff,
)
from tools.oracle_lint import oracle_sha  # noqa: E402

VERIFIED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sf10_verified.json"
)

# Documented output-contract exceptions at sf10 (VERDICT r05/r06):
# q46's uncapped pair table grows 27.6x/decade and q186's sf1 pair
# table already breaks the harness's single-task collect — both are
# *output contracts* (the scale-safe production paths are q576/q580's
# banded recipe and the bucketed equi-join); their strictness ceiling
# is sf0.1 (q186) / sf1 (q46), recorded in BASELINE.md.  q165's oracle
# is the textbook O(n²) NOT-EXISTS — deliberately independent of the
# Spark cummax plan, and intractable for DUCKDB at 20M parts (hours);
# its strictness ceiling is sf1 (BASELINE.md Round-8 addendum).
SF10_CONTRACT_EXCEPTIONS = {
    "q46_minhash_lsh",
    "q186_band_join",
    "q165_skyline",
    # q34's oracle unrolls min-label propagation past the diameter;
    # at sf10 DuckDB's CTE-level materialization needs >58 GiB RAM and
    # >70 GiB spill before dying — measured, twice.  Ceiling sf1; the
    # WCC semantics themselves ARE sf10-verified through q590 (star
    # contraction, gaps-islands oracle, 14.8M rows strict PASS).
    "q34_wcc",
}


def load_verified() -> dict[str, str]:
    if not os.path.exists(VERIFIED_PATH):
        return {}
    with open(VERIFIED_PATH) as f:
        v = json.load(f)
    if isinstance(v, list):  # legacy name-only format
        return {name: "" for name in v}
    return v


def main() -> int:
    argv = sys.argv[1:]

    def opt(flag, default=None, has_val=True):
        if flag in argv:
            i = argv.index(flag)
            argv.pop(i)
            return argv.pop(i) if has_val else True
        return default

    log_path = opt("--log", "/tmp/sweep_oracles.jsonl")
    update_verified = bool(opt("--update-verified", False, has_val=False))
    missing_only = bool(opt("--missing", False, has_val=False))
    limit = int(opt("--limit", "0"))
    shuffle_seed = opt("--shuffle-seed")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:]

    from graphmapreduce_spark.session import get_spark
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    targets = [n for n in qs if n in oracles]
    if names:
        targets = [n for n in targets if n in set(names)]
    if missing_only:
        verified = load_verified()
        targets = [
            n
            for n in targets
            if verified.get(n) != oracle_sha(oracles[n])
            and n not in SF10_CONTRACT_EXCEPTIONS
        ]
    done: set[str] = set()
    if log_path and os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass
    targets = [n for n in targets if n not in done]
    if shuffle_seed is not None:
        import random

        random.Random(int(shuffle_seed)).shuffle(targets)
    if limit:
        targets = targets[:limit]
    print(f"sweep: {len(targets)} targets at {sf_dir} "
          f"({len(done)} already in log)", flush=True)
    if not targets:
        return 0

    spark = get_spark(
        master=os.environ.get("SWEEP_MASTER", "local[16]"),
        shuffle_partitions=int(os.environ.get("SWEEP_SHUFFLE", "16")),
        app_name="oracle-sweep",
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get(
                "SWEEP_MAX_RESULT", "8g"
            ),
            "spark.driver.memory": os.environ.get("SWEEP_DRIVER_MEM", "48g"),
        },
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SWEEP_DUCK_THREADS', '16')}")
    # unbounded DuckDB materialization OOM-killed the first sf10 A-half
    # sweeper at 58 GiB anon RSS (q34's unrolled min-label CTE levels):
    # cap the allocator and let heavy oracles SPILL instead of dying
    con.execute(
        f"SET memory_limit='{os.environ.get('SWEEP_DUCK_MEM', '28GB')}'"
    )
    spill = os.environ.get("SWEEP_DUCK_SPILL", "/tmp/duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    logf = open(log_path, "a") if log_path else None

    def record(name, status, secs, msg=""):
        print(f"{status:<5} {name}: {msg} ({secs:.1f}s)", flush=True)
        if logf:
            logf.write(
                json.dumps(
                    {"name": name, "status": status, "secs": round(secs, 1),
                     "msg": msg[:400], "sf_dir": sf_dir}
                )
                + "\n"
            )
            logf.flush()

    n_pass = n_fail = 0
    for i, name in enumerate(targets):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            sfields = [
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
            ]
            dfields = duck_describe(con, oracles[name])
            tdiff = type_surface_diff(sfields, dfields)
            if tdiff:
                record(
                    name, "FAIL", time.time() - t0,
                    "type-surface: " + "; ".join(
                        f"{c}: spark={st} duckdb={dt}" for c, st, dt in tdiff
                    ),
                )
                n_fail += 1
                continue
            rows = [tuple(r) for r in df.collect()]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok, msg = compare_results(df.columns, rows, ocols, orows)
        except Exception as ex:
            record(
                name, "FAIL", time.time() - t0,
                f"{type(ex).__name__}: {ex}",
            )
            n_fail += 1
            continue
        if ok:
            record(name, "PASS", time.time() - t0, f"{len(rows)} rows")
            n_pass += 1
            if update_verified:
                v = load_verified()
                v[name] = oracle_sha(oracles[name])
                with open(VERIFIED_PATH, "w") as f:
                    json.dump(v, f, indent=0, sort_keys=True)
        else:
            record(name, "FAIL", time.time() - t0, msg)
            n_fail += 1
        if (i + 1) % 25 == 0:
            spark.catalog.clearCache()
    print(f"\n== sweep done: {n_pass} pass, {n_fail} fail, "
          f"{len(targets)} attempted ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
