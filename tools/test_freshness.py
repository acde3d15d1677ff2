#!/usr/bin/env python3
"""Tests for tools/freshness.py against a scratch git repo.

Covers the three rule-1/rule-4 behaviors the round-13 verdict asked to
pin down:
  1. a driver overwrite of BENCH_LAST.json (working tree bytes == a
     committed BENCH_rNN.json) PASSES — it is driver provenance, not
     builder staleness;
  2. a genuinely drifted BENCH_LAST.json (matches no committed artifact)
     still FAILS;
  3. a BENCH_LAST.json whose every touching commit is a driver drop
     FAILS loudly instead of vacuously skipping rules 3-4.

Usage: python3 tools/test_freshness.py   (exit 0 = all pass)
"""
import os
import shutil
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(TOOLS, "freshness.py")

IDLE_BENCH = '{"metric":"total","value":1.0,"contended":false}\n'
STALE_BENCH = '{"metric":"total","value":9.9,"contended":false}\n'


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
        f.write(IDLE_BENCH)
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "round 14: verdict/advice/correctness/bench")
    return root


def expect(name, result, ok, needle=None):
    out = result.stdout + result.stderr
    if (result.returncode == 0) != ok or (needle and needle not in out):
        print(f"FAIL {name}: exit={result.returncode} expected ok={ok}\n{out}")
        return False
    print(f"ok   {name}")
    return True


def main():
    passed = True

    # 1. driver overwrite: drift bytes == committed BENCH_r14.json -> pass
    root = scratch_repo(builder_commits_bench=True)
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(IDLE_BENCH)  # identical bytes, but simulate the overwrite
    passed &= expect("clean tree passes", gate(root), ok=True)
    shutil.rmtree(root)

    root = scratch_repo(builder_commits_bench=True)
    with open(os.path.join(root, "BENCH_r14.json"), "w") as f:
        f.write(STALE_BENCH)
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "round 14: verdict/advice/correctness/bench")
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(STALE_BENCH)  # drifted from HEAD, == committed BENCH_r14.json
    passed &= expect("driver overwrite passes", gate(root), ok=True,
                     needle="driver overwrite")
    shutil.rmtree(root)

    # 1b. drift matching an OLD round's artifact (not the latest) is a
    # stale leftover, not a driver overwrite -> fail
    root = scratch_repo(builder_commits_bench=True)
    old_bench = '{"metric":"total","value":7.7,"contended":false}\n'
    with open(os.path.join(root, "BENCH_r05.json"), "w") as f:
        f.write(old_bench)
    sh(root, "git", "add", "-A")
    sh(root, "git", "commit", "-qm", "round 5: verdict/advice/correctness/bench")
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write(old_bench)  # == committed BENCH_r05.json, != latest r14
    passed &= expect("old-round twin fails", gate(root), ok=False,
                     needle="differs from HEAD")
    shutil.rmtree(root)

    # 2. genuine drift (matches no committed artifact) -> fail
    root = scratch_repo(builder_commits_bench=True)
    with open(os.path.join(root, "BENCH_LAST.json"), "w") as f:
        f.write('{"metric":"total","value":5.5,"contended":false}\n')
    passed &= expect("genuine drift fails", gate(root), ok=False,
                     needle="differs from HEAD")
    shutil.rmtree(root)

    # 3. bench exists but every touching commit is a driver drop -> fail
    root = scratch_repo(builder_commits_bench=False)
    passed &= expect("driver-only bench fails", gate(root), ok=False,
                     needle="NO builder commit")
    shutil.rmtree(root)

    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
