#!/bin/bash
# Paired-binaries bench A/B — the round-15 regression instrument.
#
# Two consecutive rounds (r13, r14) read "+13%/+27%" against older
# committed bench floors; a manual same-host same-hour A/B then proved
# HEAD binaries ~2.4% FASTER than the r12 code on the very queries that
# "regressed" — the cross-week floor comparison measures the HOST, not
# the code. This script institutionalizes that A/B: it checks out the
# previous round's close commit into a worktree, compiles it, and runs
# the same query subset ALTERNATING old/new binaries (each pass pairs
# the two sides inside the same minutes of host weather), then emits
# per-query paired min ratios to BENCH_AB.json. Judge regressions on
# these ratios (<= 1.05 = clean), never on floors from other weeks.
#
# Usage: tools/bench_ab.sh [OLD_SHA]
#   OLD_SHA defaults to the parent of the newest driver drop commit
#   ("round NN: verdict/..."), i.e. the previous round's close.
# Env:
#   QUERIES  comma list; default = top-15 by the committed bench's
#            queries_min UNION every query whose committed floor moved
#            >20% between OLD_SHA's bench artifact and HEAD's
#   PASSES   alternating passes per binary (default 3)
#   RUNS     Bench runs per query per pass (default 2)
#   OUT      output artifact (default BENCH_AB.json)
set -euo pipefail
cd "$(dirname "$0")/.."

# awk reads the whole stream (no early exit): an exit here SIGPIPEs
# git log, which pipefail+set -e turns into a silent 141 abort
OLD_SHA=${1:-$(git log --format='%H %s' |
  awk '!found && /^[0-9a-f]+ round [0-9]+/ { print $1; found = 1 }')}
if [[ -z "$OLD_SHA" ]]; then
  echo "[bench_ab] no driver drop commit found and no OLD_SHA given" >&2
  exit 1
fi
OLD_SHA=$(git rev-parse "${OLD_SHA}^")   # the close commit the drop graded
NEW_SHA=$(git rev-parse HEAD)
PASSES=${PASSES:-3}
RUNS=${RUNS:-2}
OUT=${OUT:-BENCH_AB.json}
WT=/tmp/graft_ab_old

QUERIES=${QUERIES:-$(python3 - "$OLD_SHA" <<'EOF'
import json, subprocess, sys
old_sha = sys.argv[1]
def bench_at(ref):
    r = subprocess.run(["git", "show", f"{ref}:BENCH_LAST.json"],
                       capture_output=True, text=True)
    return json.loads(r.stdout) if r.returncode == 0 else {}
new = bench_at("HEAD").get("queries_min") or {}
old = bench_at(old_sha).get("queries_min") or {}
import math
top = sorted((q for q, v in new.items() if v is not None),
             key=lambda q: -new[q])[:15]
moved = [q for q in new if q in old and new[q] and old[q]
         and (new[q] / old[q] > 1.2 or new[q] / old[q] < 0.8)]
# the two committed artifacts may have different provenance (builder idle
# close vs driver ambient re-run) — then "moved >20%" sweeps up half the
# suite and measures the hosts, not the code. Keep the 10 biggest movers;
# the paired run itself is the instrument that settles them.
moved = sorted(moved, key=lambda q: -abs(math.log(new[q] / old[q])))[:10]
print(",".join(sorted(set(top) | set(moved))))
EOF
)}
if [[ -z "$QUERIES" ]]; then
  echo "[bench_ab] empty query subset (no committed BENCH_LAST.json?)" >&2
  exit 1
fi
echo "[bench_ab] old=$OLD_SHA new=$NEW_SHA"
echo "[bench_ab] subset: $QUERIES"

cleanup() { git worktree remove --force "$WT" 2>/dev/null || true; }
trap cleanup EXIT
cleanup
git worktree add --detach "$WT" "$OLD_SHA" >/dev/null

echo "[bench_ab] compiling both binaries"
sbt -batch compile >/dev/null
(cd "$WT" && sbt -batch compile >/dev/null)

JAVA_OPTS=(
  -Xmx32g -XX:+UseG1GC
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
)

run_side() {  # side classes_root pass
  local side=$1 root=$2 pass=$3
  local out="/tmp/bench_ab_${side}_${pass}.json"
  rm -f "$out"
  # a query name the old binary does not know is silently absent from its
  # JSON — the merge intersects, so mixed subsets are safe
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_RUNS="$RUNS" \
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_OUT="$out" \
    java "${JAVA_OPTS[@]}" -cp "$root/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench >/dev/null 2>&1
  if [[ ! -s "$out" ]]; then
    echo "[bench_ab] FAILED: $side pass $pass produced no $out" >&2
    exit 1
  fi
}

for pass in $(seq 1 "$PASSES"); do
  echo "[bench_ab] pass $pass/$PASSES: old"
  run_side old "$WT" "$pass"
  echo "[bench_ab] pass $pass/$PASSES: new"
  run_side new "$PWD" "$pass"
done

python3 - "$OUT" "$OLD_SHA" "$NEW_SHA" "$PASSES" <<'EOF'
import json, sys
out, old_sha, new_sha, passes = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
def mins(side):
    acc = {}
    for p in range(1, passes + 1):
        d = json.load(open(f"/tmp/bench_ab_{side}_{p}.json"))
        for q, v in (d.get("queries_min") or {}).items():
            if v is not None:
                acc.setdefault(q, []).append(v)
    return {q: min(vs) for q, vs in acc.items()}
old, new = mins("old"), mins("new")
common = sorted(set(old) & set(new))
qs = {q: {"old_min": old[q], "new_min": new[q],
          "ratio": round(new[q] / old[q], 3)} for q in common}
minsum_old = sum(old[q] for q in common)
minsum_new = sum(new[q] for q in common)
ratio = round(minsum_new / minsum_old, 3) if minsum_old else None
result = {
    "metric": "bench_ab", "old_sha": old_sha, "new_sha": new_sha,
    "passes": passes, "paired": "alternating old/new per pass, same host",
    "minsum_old": round(minsum_old, 3), "minsum_new": round(minsum_new, 3),
    "ratio_minsum": ratio, "clean": ratio is not None and ratio <= 1.05,
    "new_only": sorted(set(new) - set(old)),
    "queries": qs,
}
with open(out, "w") as f:
    json.dump(result, f, separators=(",", ":"))
    f.write("\n")
flagged = {q: v["ratio"] for q, v in qs.items() if v["ratio"] > 1.2}
print(f"[bench_ab] wrote {out}: minsum {minsum_old:.2f} -> {minsum_new:.2f} "
      f"(ratio {ratio}, clean={ratio is not None and ratio <= 1.05})")
if flagged:
    print(f"[bench_ab] per-query ratios > 1.2: {flagged}")
EOF
