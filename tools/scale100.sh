#!/bin/bash
# Second-decade scale probe with per-query JVM isolation: one fresh JVM
# per SF10_PROBE query (five cache-heavy queries sharing a JVM
# contaminate each other's absolute times — a 3x base inflation was
# measured mid-sequence), then merge the per-query JSONs into
# SCALE100.json. Run from the repo root on an IDLE box, after
# `sbt compile` and after the pseudo-sf1/sf10 dirs exist (any
# `Scale10 sf10` run synthesizes them).
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES=${QUERIES:-pagerank,fuzzy_join2,salted_join,dedup_minhash_incremental,triangle_count,dedup_canonical,entity_resolution,ssjoin_prefix,masterjoin,substring_clean,substring_spans,stream_upsert,stream_left_join,boilerplate_strip,url_blocklist,gopher_repetition,gopher_dup_ngrams,bitext_mine,bitext_mine_incremental,gopher_repetition_gate,dedup_lines_in_doc,gopher_dup_lines,stream_url_blocklist,stream_repetition_gate,stream_dedup_lines,c4_filter,search_hybrid_rrf,cluster_prune,stream_c4_filter,stream_ann_topk,search_rm3}
OUT=${OUT:-SCALE100.json}
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

IFS=',' read -ra QS <<< "$QUERIES"
parts=()
for q in "${QS[@]}"; do
  part="/tmp/scale100_${q}.json"
  # delete any stale part BEFORE the run: a swallowed JVM failure must not
  # let the merge silently pick up numbers from a previous invocation and
  # present them as fresh
  rm -f "$part"
  echo "[scale100] $q (fresh JVM)"
  if ! SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_SCALE100_OUT="$part" \
    java "${JAVA_OPTS[@]}" -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.Scale10 sf10 2>/dev/null | grep '\[scale10\]'; then
    echo "[scale100] FAILED: $q (JVM exit or no output)" >&2
    exit 1
  fi
  if [[ ! -s "$part" ]]; then
    echo "[scale100] FAILED: $q produced no $part" >&2
    exit 1
  fi
  parts+=("$part")
done

python3 - "$OUT" "${parts[@]}" <<'EOF'
import json, sys
out, parts = sys.argv[1], sys.argv[2:]
merged = None
for p in parts:
    d = json.load(open(p))
    if merged is None:
        merged = d
        merged["isolation"] = "one JVM per query (tools/scale100.sh)"
    else:
        merged["queries"].update(d["queries"])
json.dump(merged, open(out, "w"), separators=(",", ":"))
open(out, "a").write("\n")
print(f"[scale100] wrote {out}: " + ", ".join(
    f"{q} {v['ratio']}x" for q, v in merged["queries"].items()))
EOF
