#!/usr/bin/env python3
"""Round-close artifact freshness gate.

Round 9 committed a bench artifact that was generated under sbt load;
round 10 closed with an uncommitted NEWER BENCH_LAST.json shadowing the
committed one — both times the ambiguity had to be untangled by hand.
This check makes artifact drift loud at round close:

  1. every measurement artifact in the working tree must be byte-equal
     to its committed (HEAD) version — an uncommitted artifact is either
     a forgotten re-run (commit it) or a stale leftover (regenerate it);
  2. the source tree (src/main, tools) must be clean — artifacts cannot
     vouch for uncommitted code;
  3. the last commit touching src/main must be no newer than the last
     commit touching BENCH_LAST.json — source changes after the bench
     run stale the artifact (re-run the idle bench, then commit);
  4. the committed bench artifact must self-report an uncontended run
     ("contended": false).

Round 13: the gate is DRIVER-AWARE. The round driver commits its own
post-round artifact drop ("round NN: verdict/advice/correctness/bench"),
which may include ITS bench run of the builder's HEAD — ambient-load
numbers the builder neither produced nor vouches for. Rules 3 and 4
therefore anchor on the newest BUILDER commit touching BENCH_LAST.json
(any commit whose subject does not match the driver-drop pattern), so a
round can never open failed because of a driver artifact, while a
genuinely stale builder bench still fails.

Round 14 closed one driver hole and round 15 fixed the other:
  - an existing BENCH_LAST.json with NO builder commit at all FAILS
    instead of vacuously skipping rules 3-4 (nothing vouches for it);
  - rule 1 also passes when a drifted BENCH_LAST.json is the round
    driver's own overwrite. The round-14 version required byte-equality
    to a committed BENCH_rNN.json, which can NEVER fire: the driver
    writes BENCH_LAST.json in Bench's full-dict format but its
    BENCH_rNN.json is a {n, rc, tail} wrapper around the run's stdout
    tail (the round-14 judge reproduced the exit-1 in exactly the state
    the rule was meant to accept). The twin test is now PARSED equality:
    the drifted BENCH_LAST's headline (value, query count, sf, runs,
    failed) must match the compact bench line embedded in the newest
    round's BENCH_rNN.json tail — committed OR still untracked in the
    working tree, since the driver writes the wrapper before its drop
    commit. Only the newest round counts, and ALL of its artifacts
    (suffixed names like BENCH_rNN_judge.json included) are candidates.

Usage: python3 tools/freshness.py [repo_root]   (exit 0 = fresh)
"""
import json
import os
import re
import subprocess
import sys

ARTIFACTS = ["BENCH_LAST.json", "SCALE10.json", "SCALE100.json",
             "BENCH_AB.json"]

# the driver's artifact-drop commits: "round 12: verdict/advice/..."
DRIVER_DROP_RE = re.compile(r"^round\s+\d+\b")


REPO_ROOT = (os.path.abspath(sys.argv[1]) if len(sys.argv) > 1
             else os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def git(*args):
    return subprocess.run(["git"] + list(args), capture_output=True,
                          text=True, cwd=REPO_ROOT)


def last_builder_commit(path):
    """(unix time, sha) of the newest commit touching `path` whose subject
    is not a driver artifact drop; (0, None) if none exists."""
    r = git("log", "--format=%ct %H %s", "--", path)
    for line in r.stdout.splitlines():
        # an empty subject yields only two fields — treat it as a builder
        # commit (it is certainly not a driver drop) rather than crash
        parts = line.split(" ", 2)
        if len(parts) < 2:
            continue
        subject = parts[2] if len(parts) > 2 else ""
        if not DRIVER_DROP_RE.match(subject):
            return int(parts[0]), parts[1]
    return 0, None


def bench_headline(parsed):
    """The identity of a bench run as carried by BOTH formats: Bench's
    full dict (BENCH_LAST.json — per-query maps, no nQueries key) and its
    compact last-stdout-line (what survives in the driver wrapper's tail
    — nQueries, no per-query maps)."""
    if not isinstance(parsed, dict) or parsed.get("metric") != "total":
        return None
    qs = parsed.get("queries")
    n = len(qs) if isinstance(qs, dict) else parsed.get("nQueries")
    return (parsed.get("value"), n, parsed.get("sf"), parsed.get("runs"),
            json.dumps(parsed.get("failed")))


def compact_lines(tail):
    """Every parseable compact bench line in a driver wrapper's stdout
    tail. The tail keeps only the LAST ~2 kB, so the full-dict print is
    truncated mid-JSON (unparseable) while the compact summary line —
    printed last for exactly this reason — survives whole."""
    found = []
    for m in re.finditer(r'\{"metric":\s*"total"', tail):
        line = tail[m.start():].splitlines()[0]
        try:
            found.append(json.loads(line))
        except ValueError:
            continue
    return found


def driver_drop_twin(tree_text):
    """Name of a newest-round BENCH_rNN.json artifact that identifies
    `tree_text` (the drifted working-tree BENCH_LAST.json) as the round
    driver's own bench overwrite rather than builder staleness.

    Candidates are every artifact of the NEWEST round number — suffixed
    names included, committed at HEAD or still untracked in the working
    tree (the driver writes its wrapper before the drop commit that adds
    it). A match is byte-equality (legacy full-dict drops) or parsed
    headline equality against the compact bench line in the wrapper's
    tail. Only the newest round counts: a drift matching a months-old
    BENCH_r5.json is a stale leftover and must still fail rule 1."""
    candidates = {}  # name -> list of contents (HEAD and/or worktree)
    ls = git("ls-tree", "--name-only", "HEAD")
    for name in ls.stdout.splitlines():
        if re.fullmatch(r"BENCH_r(\d+)(_\w+)?\.json", name):
            shown = git("show", f"HEAD:{name}")
            if shown.returncode == 0:
                candidates.setdefault(name, []).append(shown.stdout)
    try:
        tree_names = os.listdir(REPO_ROOT)
    except OSError:
        tree_names = []
    for name in tree_names:
        if re.fullmatch(r"BENCH_r(\d+)(_\w+)?\.json", name):
            try:
                with open(os.path.join(REPO_ROOT, name), "rb") as f:
                    candidates.setdefault(name, []).append(
                        f.read().decode("utf-8", "replace"))
            except OSError:
                continue
    if not candidates:
        return None
    newest = max(int(re.match(r"BENCH_r(\d+)", n).group(1)) for n in candidates)
    try:
        tree_head = bench_headline(json.loads(tree_text))
    except ValueError:
        tree_head = None
    for name, texts in sorted(candidates.items()):
        if int(re.match(r"BENCH_r(\d+)", name).group(1)) != newest:
            continue
        for text in texts:
            if text == tree_text:
                return name
            if tree_head is None:
                continue
            try:
                wrapper = json.loads(text)
            except ValueError:
                continue
            lines = compact_lines(wrapper.get("tail", "")) \
                if isinstance(wrapper, dict) else []
            if isinstance(wrapper, dict) and wrapper.get("metric") == "total":
                lines.append(wrapper)  # a full-dict drop artifact
            if any(bench_headline(l) == tree_head for l in lines):
                return name
    return None


def main():
    failures = []
    repo_root = REPO_ROOT

    # 1. working tree artifact == HEAD artifact
    for a in ARTIFACTS:
        head = git("show", f"HEAD:{a}")
        # same absolute path for exists() and open(): git commands run at
        # the repo root, so a CWD-relative open() from any other directory
        # would crash after the absolute exists() check passed
        apath = os.path.join(repo_root, a)
        exists = os.path.exists(apath)
        if head.returncode != 0:
            if exists:
                failures.append(f"{a}: present in working tree but not in HEAD "
                                "(commit it with the round or delete it)")
            continue
        if not exists:
            failures.append(f"{a}: committed but missing from the working tree")
            continue
        with open(apath, "rb") as f:
            tree = f.read()
        tree_text = tree.decode("utf-8", "replace")
        if tree_text != head.stdout:
            # the driver's post-round overwrite: BENCH_LAST.json replaced
            # with bytes identical to a committed BENCH_rNN.json — driver
            # provenance, not builder staleness (rules 3-4 still anchor on
            # the builder's own committed bench)
            twin = driver_drop_twin(tree_text) if a == "BENCH_LAST.json" else None
            if twin:
                print(f"note: {a} drifted from HEAD but matches the bench "
                      f"run recorded in {twin} — driver overwrite, not "
                      "staleness")
            else:
                failures.append(f"{a}: working tree differs from HEAD — either a "
                                "forgotten re-run (commit it) or stale (regenerate)")

    # 2. clean source tree
    dirty = git("status", "--porcelain", "src/main", "tools").stdout.strip()
    if dirty:
        failures.append("uncommitted source changes — artifacts cannot vouch "
                        "for them:\n  " + dirty.replace("\n", "\n  "))

    # 3. the last BUILDER-committed bench must be newer than the last
    # src/main commit (the driver's own post-round drop commits a bench of
    # ambient provenance — it can neither freshen nor stale the builder's)
    def last_commit_time(path):
        r = git("log", "-1", "--format=%ct", "--", path)
        out = r.stdout.strip()
        return int(out) if out else 0

    src_t = last_commit_time("src/main")
    bench_t, bench_sha = last_builder_commit("BENCH_LAST.json")
    if bench_t and src_t > bench_t:
        failures.append("src/main was committed after the last BUILDER "
                        "BENCH_LAST.json commit — the committed bench predates "
                        "the source; re-run the idle bench and commit the "
                        "artifact")

    # 4. the last BUILDER-committed bench self-reports idle (a driver drop
    # with contended/ambient numbers is the driver's evidence, not ours)
    if bench_sha is None and git("show", "HEAD:BENCH_LAST.json").returncode == 0:
        failures.append("BENCH_LAST.json is committed but NO builder commit "
                        "touches it (every touching commit is a driver drop) — "
                        "nothing vouches for the bench; run the idle bench and "
                        "commit it")
    if bench_sha:
        head_bench = git("show", f"{bench_sha}:BENCH_LAST.json")
        try:
            b = json.loads(head_bench.stdout)
            if b.get("contended") is True:
                failures.append("builder-committed BENCH_LAST.json says "
                                "contended:true — regenerate on an idle box")
            if b.get("failed"):
                failures.append(f"builder-committed BENCH_LAST.json has failed "
                                f"queries: {b['failed']}")
        except ValueError:
            failures.append("builder-committed BENCH_LAST.json is not valid JSON")

    if failures:
        print("FRESHNESS GATE FAILED:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("freshness: OK (artifacts match HEAD, source clean, bench is newest and idle)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
