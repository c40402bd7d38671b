#!/usr/bin/env python3
"""Mechanized matched-set bench comparison (BASELINE.md's prose rule as
a checked tool).

Usage: python3 tools/bench_compare.py <anchor.json> <run.json> [--markdown]

Both inputs are graft.Bench outputs (bench_full.json /
bench_last_run.json): {"queries": {key: min_sec}, "queries_med": {...},
"queries_max": {...}, "builds": {...}, "errors": [...], ...}.

The rule, exactly as BASELINE.md states it:
  - matched set = keys present in BOTH runs, minus any key that errored
    in EITHER run (errors never count as speed);
  - ratios are reported on BOTH bases: min-of-3 (the headline — it
    converges on real cost under container contention) and median (the
    round-over-round comparison basis — single-number deltas on
    swing-prone queries are unreadable, the med/max spread is the noise
    band);
  - artifact builds are metered separately and never mixed into query
    ratios;
  - every matched key whose median ratio exceeds REGRESSION_X (1.3) is
    listed, with its med/max spread so a noise-band regression is
    distinguishable from a plan change;
  - new and removed keys are listed with their cost, so "faster by
    dropping work" can't hide.

Exit status: 0 always (reporting tool, not a gate — the driver's 2x
gate is separate); --check makes a >REGRESSION_X median-basis ratio on
the matched-set SUM exit 1.
"""
import json
import sys

REGRESSION_X = 1.3


def load(path):
    with open(path) as f:
        d = json.load(f)
    med = d.get("queries_med") or d.get("queries") or {}
    return {
        "min": d.get("queries") or {},
        "med": med,
        "max": d.get("queries_max") or med,
        "builds": d.get("builds") or {},
        "errors": set(d.get("errors") or []),
        "sf": d.get("sf"),
        "value": d.get("value"),
    }


def compare(anchor, run):
    a, r = load(anchor), load(run)
    matched = sorted((set(a["min"]) & set(r["min"])) - a["errors"] - r["errors"])
    # Bench excludes errored keys from the queries maps entirely, so a
    # key absent from one side may be a BREAKAGE, not an addition or a
    # deliberate removal — classify by the other side's errors list
    # first (regression-to-error must read as an error, never as
    # "REMOVED (check this is intentional)").
    new = sorted(set(r["min"]) - set(a["min"]) - a["errors"])
    removed = sorted(set(a["min"]) - set(r["min"]) - r["errors"])
    broke_in_run = sorted(set(a["min"]) & r["errors"])
    fixed_in_run = sorted(set(r["min"]) & a["errors"])

    def ratio(basis):
        sa = sum(a[basis][k] for k in matched)
        sr = sum(r[basis][k] for k in matched)
        return sa, sr, (sr / sa if sa > 0 else float("nan"))

    amin, rmin, min_ratio = ratio("min")
    amed, rmed, med_ratio = ratio("med")
    regressions = []
    for k in matched:
        if a["med"][k] <= 0:
            continue
        x = r["med"][k] / a["med"][k]
        if x > REGRESSION_X:
            regressions.append({
                "key": k,
                "ratio": round(x, 2),
                "anchor_med": a["med"][k],
                "run_med": r["med"][k],
                "run_min": r["min"].get(k),
                "run_max": r["max"].get(k),
            })
    regressions.sort(key=lambda e: -e["ratio"])
    return {
        "anchor": anchor,
        "run": run,
        "n_matched": len(matched),
        "n_anchor": len(a["min"]),
        "n_run": len(r["min"]),
        "excluded_errored": sorted((a["errors"] | r["errors"])
                                   & (set(a["min"]) | set(r["min"]))),
        "min_basis": {"anchor_sec": round(amin, 1), "run_sec": round(rmin, 1),
                      "ratio": round(min_ratio, 3)},
        "med_basis": {"anchor_sec": round(amed, 1), "run_sec": round(rmed, 1),
                      "ratio": round(med_ratio, 3)},
        "regressions_over_1p3_med": regressions,
        "new_keys": {k: r["min"][k] for k in new},
        "new_keys_sec": round(sum(r["min"][k] for k in new), 1),
        "removed_keys": {k: a["min"][k] for k in removed},
        "broke_in_run": broke_in_run,
        "fixed_in_run": fixed_in_run,
        "builds": {"anchor_sec": round(sum(a["builds"].values()), 1),
                   "run_sec": round(sum(r["builds"].values()), 1),
                   "anchor_n": len(a["builds"]), "run_n": len(r["builds"])},
    }


def markdown(c):
    lines = [
        f"Matched-set vs `{c['anchor']}` over the {c['n_matched']} shared "
        f"keys ({c['n_anchor']} anchor / {c['n_run']} run keys"
        + (f"; errored excluded: {', '.join(c['excluded_errored'])}"
           if c["excluded_errored"] else "") + "):",
        f"**{c['min_basis']['ratio']}x (min basis, "
        f"{c['min_basis']['run_sec']} vs {c['min_basis']['anchor_sec']} s), "
        f"{c['med_basis']['ratio']}x (median basis, "
        f"{c['med_basis']['run_sec']} vs {c['med_basis']['anchor_sec']} s)**.",
    ]
    if c["new_keys"]:
        lines.append(
            f"{len(c['new_keys'])} new key(s) cost {c['new_keys_sec']} s "
            f"combined: " + ", ".join(
                f"`{k}` {v:.2f}s" for k, v in
                sorted(c["new_keys"].items(), key=lambda e: -e[1])) + ".")
    if c["removed_keys"]:
        lines.append("REMOVED keys (check this is intentional): " +
                     ", ".join(f"`{k}`" for k in c["removed_keys"]) + ".")
    if c["broke_in_run"]:
        lines.append("**BROKE in this run (passed in the anchor, errored "
                     "now): " + ", ".join(f"`{k}`" for k in c["broke_in_run"])
                     + ".**")
    if c["fixed_in_run"]:
        lines.append("Fixed in this run (errored in the anchor): " +
                     ", ".join(f"`{k}`" for k in c["fixed_in_run"]) + ".")
    if c["regressions_over_1p3_med"]:
        lines.append(f"Median-basis regressions > {REGRESSION_X}x:")
        for e in c["regressions_over_1p3_med"]:
            lines.append(
                f"  - `{e['key']}` {e['ratio']}x "
                f"({e['anchor_med']:.2f} -> {e['run_med']:.2f} s med; "
                f"run min/max {e['run_min']:.2f}/{e['run_max']:.2f} s)")
    else:
        lines.append(f"No matched key regressed > {REGRESSION_X}x "
                     "on the median basis.")
    lines.append(
        f"Builds metered separately: {c['builds']['run_n']} artifacts, "
        f"{c['builds']['run_sec']} s (anchor: {c['builds']['anchor_n']}, "
        f"{c['builds']['anchor_sec']} s).")
    return "\n".join(lines)


def main(argv):
    args = [a for a in argv[1:] if not a.startswith("--")]
    flags = {a for a in argv[1:] if a.startswith("--")}
    if len(args) != 2:
        print(__doc__)
        return 2
    c = compare(args[0], args[1])
    if "--markdown" in flags:
        print(markdown(c))
    else:
        print(json.dumps(c, indent=2))
    if "--check" in flags and c["med_basis"]["ratio"] > REGRESSION_X:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
