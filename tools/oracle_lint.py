"""Static lint for the q01/q411 class of scale-revealed oracle bugs:
money sums accumulated as DOUBLE and emitted at a fixed decimal
precision.

At sf10 (60M lineitem rows) a grouped double SUM of
``l_extendedprice``-family columns reaches 1e12+ magnitude, where the
accumulated summation-order noise (~n·ulp) crosses the emitted cent
precision — Spark and DuckDB then round the SAME quantity to DIFFERENT
cents and the byte-exact value hash diverges (q01/q411/q341/q370/q376,
all found by the sf10 strict sample, all fixed with bounded DECIMAL
casts: (12,2) money, (3,2) disc/tax).

This lint walks every ``oracle_sql()`` string and flags:

  WARN  double-money-sum    SUM( over l_extendedprice / o_totalprice /
                            l_extendedprice*... without a DECIMAL cast
                            inside the argument.  Not every hit diverges
                            (per-group magnitude decides), so WARN, not
                            ERROR — but every sf10 divergence to date
                            sat in this set.

Whitelist: a query may carry a justification (small groups, ratio-only
consumption, threshold already decimal-guarded) in WHITELIST below.
Exit 1 iff an un-whitelisted WARN remains, so the round-close gate can
enforce an empty (or fully justified) residue.

Usage: python tools/oracle_lint.py [--json out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys


def oracle_sha(sql: str) -> str:
    """Whitespace-insensitive fingerprint of an oracle SQL string —
    reformatting must not drop a waiver, any token change must."""
    return hashlib.sha256(" ".join(sql.split()).encode()).hexdigest()[:16]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> justification for keeping a double money SUM.
# Two sanctioned shapes:
#   ratio-only:   the sum is consumed ONLY in a ratio/share of sums at
#                 >= 4 significant digits of slack — relative noise is
#                 ~1e-12, invisible at 6dp.
#   small-groups: the grouping keys bound every group to a size where
#                 n·ulp stays far below the emitted precision, at ANY
#                 scale factor (per-entity groups whose size is data-
#                 model-bounded, e.g. lines per order <= 7).
WHITELIST: dict[str, str] = {
    # per-order groups are bounded by the order's own line count;
    # magnitude stays ~1e5-1e6 at every sf
    "q09_window_running_sum": "small-groups: per-customer-order window",
    "q16_date_funcs": "ratio-only + per-day groups (~1e8 max, noise ~1e-6 << .01)",
    "q26_higher_order_array": "small-groups: per-order array of line prices",
    "q59_window_range_frame": "small-groups: per-customer 30-day range frame",
}

MONEY = r"(?:l_extendedprice|o_totalprice)"
# SUM( ... money ... ) with no DECIMAL anywhere inside the argument.
# Parenthesis-aware scan: find SUM(, take the balanced argument, test.
SUM_OPEN = re.compile(r"\bSUM\s*\(", re.I)


def _sum_args(sql: str):
    for m in SUM_OPEN.finditer(sql):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        yield sql[m.end(): i - 1]


def main() -> None:
    import __spark_entry__ as entrymod

    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    oracles = entrymod.oracle_sql()
    # queries whose oracle/Spark pair has been verified byte-exact at
    # sf10 (100x the driver's scale, 1000x its sf0.01 gate) — the
    # empirical waiver: a double money sum that survives the strict
    # comparator at sf10 is below the noise floor by measurement.
    # The waiver is keyed on (name, sha256 of the oracle SQL at the
    # time it was verified): editing a verified oracle drops its
    # waiver automatically, forcing re-verification — a name-only
    # waiver could never catch a regression re-introduced into an
    # already-verified query.  Legacy list-format files (name only)
    # are honored hashlessly until the next campaign rewrites them.
    # Written by tools/sweep_oracles.py --update-verified.
    verified_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf10_verified.json"
    )
    sf10_verified: set[str] = set()
    if os.path.exists(verified_path):
        with open(verified_path) as f:
            v = json.load(f)
        if isinstance(v, dict):
            sf10_verified = {
                name
                for name, sha in v.items()
                if name in oracles and oracle_sha(oracles[name]) == sha
            }
        else:  # legacy list format (pre-round-7)
            sf10_verified = set(v)

    warns, waived = [], []
    for name, sql in oracles.items():
        hits = [
            a.strip()[:80]
            for a in _sum_args(sql)
            if re.search(MONEY, a, re.I) and "DECIMAL" not in a.upper()
        ]
        if not hits:
            continue
        if name in WHITELIST:
            waived.append({"query": name, "why": WHITELIST[name]})
            continue
        if name in sf10_verified:
            waived.append({"query": name, "why": "sf10-verified"})
            continue
        warns.append({"query": name, "sums": hits})
        print(f"WARN  {name}: double money sum x{len(hits)}: {hits[0]}")

    print(
        f"== {len(warns)} unwaived double-money-sum, "
        f"{len(waived)} whitelisted/sf10-verified, "
        f"{len(oracles)} oracles =="
    )
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"warns": warns, "whitelisted": waived}, f, indent=1)
    sys.exit(1 if warns else 0)


if __name__ == "__main__":
    main()
