#!/usr/bin/env python3
"""Tests for tools/freshness.py against a scratch git repo.

Round 15: the fixtures now use the REAL two formats — Bench writes
BENCH_LAST.json as a full dict (headline + per-query maps), while the
round driver's BENCH_rNN.json is a {n, rc, tail} WRAPPER whose tail
carries only the truncated stdout (mid-JSON full-dict print, then the
compact summary line). The round-14 twin rule compared raw bytes between
those two formats, which can never be equal; its test passed only
because it fabricated a byte-equal twin the real driver never produces.

Covered behaviors:
  1. the judge-session state — drifted BENCH_LAST.json (full dict) plus
     an UNTRACKED driver wrapper whose tail records the same run —
     PASSES (parsed-headline twin);
  2. the same state with the wrapper COMMITTED (post drop) also passes;
  3. a twin artifact under a SUFFIXED newest-round name
     (BENCH_rNN_judge.json) counts — not just the lexicographically
     latest name;
  4. a drift matching only an OLD round's artifact still FAILS;
  5. a genuine drift (matches no artifact of the newest round) FAILS;
  6. a BENCH_LAST.json whose every touching commit is a driver drop
     FAILS loudly instead of vacuously skipping rules 3-4.

Usage: python3 tools/test_freshness.py   (exit 0 = all pass)
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(TOOLS, "freshness.py")


def full_bench(value, queries, failed=()):
    """Bench's BENCH_LAST.json format (per-query maps, no nQueries)."""
    return json.dumps({
        "metric": "total", "value": value, "unit": "sec", "runs": 3,
        "sf": "/root/testdata/sf0.1", "contended": False,
        "busySiblings": {"start": 0, "end": 0}, "loadNoisy": False,
        "loadClimbQueries": [], "failed": list(failed),
        "queries_min": queries, "queries": queries, "queries_med": queries,
        "queries_runs": {k: [v] for k, v in queries.items()},
        "diag": {k: {"compiles": 1} for k in queries},
    }) + "\n"


def driver_wrapper(value, n_queries, failed=()):
    """The driver's BENCH_rNN.json format: an {n, rc, tail} wrapper whose
    tail ends with Bench's compact last stdout line (the full-dict print
    before it survives only truncated — mid-JSON, unparseable)."""
    compact = json.dumps({
        "metric": "total", "value": value, "unit": "sec", "runs": 3,
        "sf": "/root/testdata/sf0.1", "contended": False,
        "nQueries": n_queries, "failed": list(failed),
        "full": "BENCH_LAST.json", "slowest": {"q1": 1.0},
    }, separators=(",", ":"))  # Bench prints compact JSON
    tail = ('Runs":[4,0,0]}}}\n[info] {"metric":"total","value":truncated-mid\n'
            "[info] " + compact + "\n[success] Total time: 934 s\n")
    return json.dumps({"n": 14, "rc": 0, "cpus": 32, "sf": 0.1,
                       "tail": tail, "parsed": None}) + "\n"


IDLE_QUERIES = {"q1": 0.4, "q2": 0.6}
IDLE_BENCH = full_bench(1.0, IDLE_QUERIES)


def sh(cwd, *args):
    r = subprocess.run(list(args), cwd=cwd, capture_output=True, text=True)
    assert r.returncode == 0, f"{args} failed: {r.stderr}"
    return r.stdout


def gate(root):
    return subprocess.run([sys.executable, GATE, root],
                          capture_output=True, text=True)


def scratch_repo(builder_commits_bench):
    root = tempfile.mkdtemp(prefix="freshness_test_")
    sh(root, "git", "init", "-q")
    sh(root, "git", "config", "user.email", "t@t")
    sh(root, "git", "config", "user.name", "t")
    os.makedirs(os.path.join(root, "src/main"))
    with open(os.path.join(root, "src/main/x.scala"), "w") as f:
        f.write("object X\n")
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "add source")
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(IDLE_BENCH)
    sh(root, "git", "add", "-A")
    subject = ("round 14: verdict/advice/correctness/bench"
               if not builder_commits_bench else "close bench: idle run")
    sh(root, "git", "commit", "-qm", subject)
    # the driver's own per-round artifact, committed in its drop
    with open(os.path.join(root, "BENCH_r14.json"), "w") as f:
        f.write(driver_wrapper(1.0, len(IDLE_QUERIES)))
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "round 14: verdict/advice/correctness/bench")
    return root


def driver_reruns_bench(root, value, n=2, name="BENCH_r15.json"):
    """Simulate the driver re-running Bench over the committed tree: it
    overwrites BENCH_LAST.json (full dict, NEW numbers) and writes its
    wrapper artifact — initially untracked — recording the same run."""
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(full_bench(value, {f"q{i}": value / n for i in range(n)}))
    with open(os.path.join(root, name), "w") as f:
        f.write(driver_wrapper(value, n))


def expect(name, result, ok, needle=None):
    out = result.stdout + result.stderr
    if (result.returncode == 0) != ok or (needle and needle not in out):
        print(f"FAIL {name}: exit={result.returncode} expected ok={ok}\n{out}")
        return False
    print(f"ok   {name}")
    return True


def main():
    passed = True

    root = scratch_repo(builder_commits_bench=True)
    passed &= expect("clean tree passes", gate(root), ok=True)
    shutil.rmtree(root)

    # 1. THE judge-session state: M BENCH_LAST.json (driver's re-run, new
    # numbers) + its wrapper still UNTRACKED (written before the drop
    # commit) -> pass via the parsed-headline twin
    root = scratch_repo(builder_commits_bench=True)
    driver_reruns_bench(root, value=2.5)
    passed &= expect("driver overwrite + untracked wrapper passes",
                     gate(root), ok=True, needle="driver overwrite")
    shutil.rmtree(root)

    # 2. same drifted BENCH_LAST but the wrapper is already COMMITTED
    # (e.g. the judge added the driver's artifact first) -> pass too
    root = scratch_repo(builder_commits_bench=True)
    driver_reruns_bench(root, value=2.5)
    sh(root, "git", "add", "BENCH_r15.json")
    sh(root, "git", "commit", "-qm",
       "round 15: verdict/advice/correctness/bench")
    passed &= expect("driver overwrite + committed wrapper passes",
                     gate(root), ok=True, needle="driver overwrite")
    shutil.rmtree(root)

    # 3. the twin may live under a SUFFIXED newest-round name
    root = scratch_repo(builder_commits_bench=True)
    driver_reruns_bench(root, value=2.5, name="BENCH_r14_judge.json")
    passed &= expect("suffixed newest-round twin passes", gate(root),
                     ok=True, needle="driver overwrite")
    shutil.rmtree(root)

    # 4. drift matching only an OLD round's artifact is a stale leftover
    root = scratch_repo(builder_commits_bench=True)
    with open(os.path.join(root, "BENCH_r05.json"), "w") as f:
        f.write(driver_wrapper(7.7, 2))
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "round 5: verdict/advice/correctness/bench")
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(full_bench(7.7, {"q0": 3.85, "q1": 3.85}))
    passed &= expect("old-round twin fails", gate(root), ok=False,
                     needle="differs from HEAD")
    shutil.rmtree(root)

    # 5. genuine drift: matches NO newest-round artifact -> fail
    root = scratch_repo(builder_commits_bench=True)
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(full_bench(5.5, {"q0": 5.5}))
    passed &= expect("genuine drift fails", gate(root), ok=False,
                     needle="differs from HEAD")
    shutil.rmtree(root)

    # 6. bench exists but every touching commit is a driver drop -> fail
    root = scratch_repo(builder_commits_bench=False)
    passed &= expect("driver-only bench fails", gate(root), ok=False,
                     needle="NO builder commit")
    shutil.rmtree(root)

    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
