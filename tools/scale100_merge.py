#!/usr/bin/env python3
"""Merge multiple per-query SCALE100 passes into one artifact.

The scale probes run one query per JVM on a box that r12/r13 both caught
taking host-external contention bursts: a single 2-run pass can land
entirely inside a burst and inflate a decade ratio 2x. This merger takes
a BASE artifact plus any number of extra pass files (same schema) and,
per query, concatenates the run arrays and recomputes mins and the
ratio — min-of-all-passes, the same one-sided-noise discipline the
bench's queries_min uses. Run provenance stays visible: the merged run
arrays keep every pass's runs in order.

Usage: python3 tools/scale100_merge.py OUT BASE.json EXTRA.json...
"""
import json
import sys


def main():
    out, base_path, extras = sys.argv[1], sys.argv[2], sys.argv[3:]
    merged = json.load(open(base_path))
    passes = [json.load(open(p)) for p in extras]
    for p in passes:
        for q, v in p["queries"].items():
            if q not in merged["queries"]:
                merged["queries"][q] = v
                continue
            m = merged["queries"][q]
            for side in ("sf1", "sf10"):
                # older artifact schemas carry only sfX_min: seed the runs
                # list from it so a missing runs array neither raises on
                # min([]) nor silently discards the committed minimum
                def runs_of(d):
                    r = d.get(f"{side}_runs")
                    if r:
                        return list(r)
                    if f"{side}_min" in d:
                        return [d[f"{side}_min"]]
                    return []
                runs = runs_of(m) + runs_of(v)
                if not runs:
                    raise SystemExit(
                        f"scale100_merge: {q}/{side} has neither runs nor min "
                        "in any input artifact — schema mismatch, not noise")
                m[f"{side}_runs"] = runs
                m[f"{side}_min"] = min(runs)
            m["ratio"] = round(m["sf10_min"] / max(m["sf1_min"], 1e-9), 3)
    merged["passes"] = 1 + len(extras)
    json.dump(merged, open(out, "w"), separators=(",", ":"))
    open(out, "a").write("\n")
    for q, v in merged["queries"].items():
        print(f"{q:30s} ratio={v['ratio']} sf1_min={v['sf1_min']} sf10_min={v['sf10_min']}")


if __name__ == "__main__":
    main()
