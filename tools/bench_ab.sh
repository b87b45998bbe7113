#!/usr/bin/env bash
# Automated worktree A/B for BenchBand CREEP flags (r12 verdict #1:
# "two rounds in a row needed a manual worktree A/B to adjudicate").
#
# A sustained container shift can hit one kernel family 1.5-2x while the
# suite median moves 5-10% — no single-run statistic can tell that apart
# from real code creep. The only honest adjudicator is running the SAME
# queries from the PREVIOUS close SHA on the SAME box. This script does
# the whole loop:
#
#   1. graft.tools.BenchBand over the committed history+diag
#      -> surviving CREEP flags (drift/noise already filtered)
#   2. graft.tools.BenchProbe on those queries in a worktree at the
#      previous close SHA, then in THIS tree (fresh JVM each, best-of-3,
#      identical methodology)
#   3. per-query verdict: CODE (this tree >15%+0.05s slower than the old
#      code on this box) or BOX (old code equal-or-worse -> container)
#
# Usage: tools/bench_ab.sh <prev-close-sha> [history.tsv] [diag.json]
set -euo pipefail
sha="${1:?usage: tools/bench_ab.sh <prev-close-sha> [history] [diag]}"
hist="${2:-bench_history_sf0.1.tsv}"
diag="${3:-bench_diag.json}"
repo="$(cd "$(dirname "$0")/.." && pwd)"
cd "$repo"

band_out=$(sbt -batch "runMain graft.tools.BenchBand $hist $diag" 2>/dev/null \
  | grep '^BAND ' || true)
echo "$band_out"
creeps=$(echo "$band_out" | awk '/-> CREEP/{print $2}' | paste -sd, -)
if [ -z "$creeps" ]; then
  echo "AB VERDICT: no surviving CREEP flags — nothing to adjudicate"
  exit 0
fi
echo "AB probing surviving CREEP flags: $creeps"

wt="/tmp/graft_ab_${sha}"
if [ ! -d "$wt" ]; then
  git worktree add "$wt" "$sha" >/dev/null
fi
old_log="/tmp/graft_ab_old_${sha}.log"
new_log="/tmp/graft_ab_new_${sha}.log"
(cd "$wt" && sbt -batch "runMain graft.tools.BenchProbe $creeps" 2>&1) \
  | tee "$old_log" | grep -F 'PROBE ' || true
sbt -batch "runMain graft.tools.BenchProbe $creeps" 2>&1 \
  | tee "$new_log" | grep -F 'PROBE ' || true

python3 - "$old_log" "$new_log" <<'EOF'
import re, sys
def walls(path):
    out = {}
    for line in open(path):
        m = re.search(r'PROBE (\S+)\s+best_wall=([0-9.]+)', line)
        if m: out[m.group(1)] = float(m.group(2))
    return out
old, new = walls(sys.argv[1]), walls(sys.argv[2])
code = []
for q in sorted(new):
    if q not in old:
        print(f"AB {q:32s} old=MISSING new={new[q]:.2f} -> NEW-QUERY (no old face to compare)")
        continue
    verdict = "CODE" if new[q] > old[q] * 1.15 + 0.05 else "BOX"
    if verdict == "CODE": code.append(q)
    print(f"AB {q:32s} old={old[q]:.2f} new={new[q]:.2f} ratio={new[q]/old[q]:.2f} -> {verdict}")
print(f"AB VERDICT: {len(code)} code regression(s)"
      + (": " + ",".join(code) if code else " — all surviving flags are the BOX"))
EOF
