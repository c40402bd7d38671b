#!/usr/bin/env python3
"""Mechanized drift-attribution A/B (the worktree playbook BASELINE.md
has now run by hand three times — ANN r15, LM r16, pagerank r16 — as a
checked tool, the bench_compare.py precedent).

Usage:
  python3 tools/ab_bench.py --keys k1,k2 [--control c1,c2] \
      --commit-a HEAD --commit-b <sha> [--draws 3] \
      [--sf-dir /root/testdata/sf0.1] [--markdown] [--keep-worktrees]

The playbook, exactly as BASELINE.md's prose sections state it:
  - each side runs the SAME key set (targets + untouched-plan CONTROL
    keys) through graft.Bench (SPARK_GRAFT_ONLY), same box, same sf;
  - draws INTERLEAVE A,B,A,B,... back-to-back, so slow box-state drift
    hits both sides equally instead of biasing whichever ran last;
  - per key, the statistic is min over draws of Bench's own min-of-
    rounds (min converges on real cost under container contention);
  - the verdict is drawn per target key from the ratio B/A *relative to
    the controls' ratio band*:
      * parity        — ratio within [1/PARITY_X, PARITY_X];
      * environmental — ratio outside parity but the CONTROLS co-move
        (|log ratio - median control log ratio| < CO_MOVE_LOG): the
        whole family moved, including plans neither commit touched;
      * code          — ratio outside parity while controls sit at
        parity: only the touched keys moved.
    No controls ⇒ no co-move evidence ⇒ verdicts degrade to
    parity / "code (no control — rerun with one)".

Output: one markdown attribution table on stdout (--markdown, made to
be pasted into BASELINE.md verbatim) and/or the raw JSON. Exit 0 always
(attribution tool, not a gate).

Each side that is not the CURRENT clean HEAD runs from a disposable
`git worktree` under .ab_bench/ (removed afterwards unless
--keep-worktrees); a side equal to the current HEAD of a clean tree
runs in place, so the common HEAD-vs-old case costs one worktree.
"""
import argparse
import json
import math
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

PARITY_X = 1.10       # within ±10%: parity, no attribution needed
CO_MOVE_LOG = 0.10    # |log r_key - median log r_control| < this: co-move


def sh(cmd, cwd=None, env=None, check=True):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if check and r.returncode != 0:
        sys.exit(f"FATAL: {' '.join(cmd)} (cwd={cwd}) rc={r.returncode}\n"
                 f"{r.stdout[-4000:]}\n{r.stderr[-4000:]}")
    return r


def rev(repo, ref):
    return sh(["git", "rev-parse", ref], cwd=repo).stdout.strip()


def tree_clean(repo):
    # -uno: untracked files (bench outputs, .ab_bench worktrees) don't
    # change what HEAD's code computes — only modified tracked files do
    return sh(["git", "status", "--porcelain", "-uno"],
              cwd=repo).stdout.strip() == ""


def side_dir(repo, commit, keep):
    """Directory to run `commit` from: the repo itself when it IS the
    current clean HEAD, else a fresh worktree under .ab_bench/."""
    if commit == rev(repo, "HEAD") and tree_clean(repo):
        return repo, None
    wt = os.path.join(repo, ".ab_bench", commit[:12])
    if os.path.exists(wt):
        shutil.rmtree(wt, ignore_errors=True)
        sh(["git", "worktree", "prune"], cwd=repo)
    sh(["git", "worktree", "add", "--detach", wt, commit], cwd=repo)
    return wt, (None if keep else wt)


def bench_once(cwd, keys, sf_dir, tag):
    out = os.path.join(tempfile.gettempdir(), f"ab_bench_{tag}.json")
    if os.path.exists(out):
        os.remove(out)
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_ONLY": ",".join(keys),
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_OUT": out,
    })
    sh(["sbt", "-batch", "runMain graft.Bench"], cwd=cwd, env=env)
    with open(out) as f:
        d = json.load(f)
    errs = set(d.get("errors") or [])
    return {k: v for k, v in (d.get("queries") or {}).items()}, errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True,
                    help="comma-separated target query keys")
    ap.add_argument("--control", default="",
                    help="comma-separated untouched-plan control keys")
    ap.add_argument("--commit-a", default="HEAD",
                    help="side A (the 'new' side; ratios are A/B)")
    ap.add_argument("--commit-b", required=True,
                    help="side B (the reference commit)")
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--keep-worktrees", action="store_true")
    args = ap.parse_args()

    repo = sh(["git", "rev-parse", "--show-toplevel"]).stdout.strip()
    targets = [k for k in args.keys.split(",") if k]
    controls = [k for k in args.control.split(",") if k]
    all_keys = targets + [c for c in controls if c not in targets]
    a_sha, b_sha = rev(repo, args.commit_a), rev(repo, args.commit_b)
    if a_sha == b_sha:
        sys.exit("FATAL: both sides resolve to the same commit")

    dir_a, rm_a = side_dir(repo, a_sha, args.keep_worktrees)
    dir_b, rm_b = side_dir(repo, b_sha, args.keep_worktrees)
    try:
        # warm both sides' compiles OUTSIDE the timed draws
        for d in (dir_a, dir_b):
            sh(["sbt", "-batch", "compile"], cwd=d)

        draws = {"a": [], "b": []}
        errors = set()
        for i in range(args.draws):
            # interleaved, back-to-back: A then B each round
            for side, d in (("a", dir_a), ("b", dir_b)):
                q, errs = bench_once(d, all_keys, args.sf_dir,
                                     f"{side}{i}")
                draws[side].append(q)
                errors |= {f"{side}:{e}" for e in errs}

        def stat(side, key):
            vals = [d[key] for d in draws[side] if key in d]
            return (min(vals), statistics.median(vals)) if vals else (None, None)

        ctl_logs = []
        rows = []
        for k in all_keys:
            (amin, amed), (bmin, bmed) = stat("a", k), stat("b", k)
            ratio = (amin / bmin) if amin and bmin else None
            if ratio and k in controls:
                ctl_logs.append(math.log(ratio))
            rows.append({"key": k, "role": "control" if k in controls
                         else "target", "a_min": amin, "a_med": amed,
                         "b_min": bmin, "b_med": bmed, "ratio": ratio})

        ctl_med_log = statistics.median(ctl_logs) if ctl_logs else None
        for r in rows:
            if r["ratio"] is None:
                r["verdict"] = "errored"
            elif r["role"] == "control":
                r["verdict"] = "-"
            elif 1 / PARITY_X <= r["ratio"] <= PARITY_X:
                r["verdict"] = "parity"
            elif ctl_med_log is not None and \
                    abs(math.log(r["ratio"]) - ctl_med_log) < CO_MOVE_LOG:
                r["verdict"] = "environmental (co-moves with control)"
            elif ctl_med_log is not None:
                r["verdict"] = ("code regression" if r["ratio"] > 1
                                else "code improvement")
            else:
                r["verdict"] = "code (no control — rerun with one)"

        result = {
            "commit_a": a_sha, "commit_b": b_sha, "draws": args.draws,
            "sf_dir": args.sf_dir, "keys": targets, "controls": controls,
            "control_median_ratio":
                math.exp(ctl_med_log) if ctl_med_log is not None else None,
            "rows": rows, "errors": sorted(errors),
        }
        if args.markdown:
            print(f"A/B: `{a_sha[:12]}` (A) vs `{b_sha[:12]}` (B), "
                  f"{args.draws} interleaved draws, min-of-draws basis, "
                  f"sf dir `{args.sf_dir}` (generated by tools/ab_bench.py)")
            print()
            print("| key | role | A min | B min | A/B | verdict |")
            print("|---|---|---|---|---|---|")
            for r in rows:
                f = lambda v: "-" if v is None else f"{v:.3f} s"
                rt = "-" if r["ratio"] is None else f"{r['ratio']:.2f}x"
                print(f"| `{r['key']}` | {r['role']} | {f(r['a_min'])} | "
                      f"{f(r['b_min'])} | {rt} | {r['verdict']} |")
            if ctl_med_log is not None:
                print(f"\nControl median ratio: "
                      f"{math.exp(ctl_med_log):.2f}x")
            if errors:
                print(f"\nErrored draws: {sorted(errors)}")
        else:
            print(json.dumps(result, indent=2))
    finally:
        for rm in (rm_a, rm_b):
            if rm:
                sh(["git", "worktree", "remove", "--force", rm],
                   cwd=repo, check=False)
        sh(["git", "worktree", "prune"], cwd=repo, check=False)


if __name__ == "__main__":
    main()
