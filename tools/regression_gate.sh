#!/usr/bin/env bash
# tools/regression_gate.sh — one-command merge gate, the twin of the
# reference's benchmark-on-PR workflow (benchmark-on-pr.yaml builds the
# pipeline, runs the frozen train+eval arms, and posts the stats table;
# read_stats.bash extracts the table). Here the "post" step is a DIFF
# against the pinned ledger (BENCH/regression_ledger.json):
#
#   1. frozen-model quality — deterministic driver fits, so EXACT within
#      print tolerance: DDI perceptron test F1 (DebugDdi FROZEN TEST)
#      and NER CRF test F1 (DebugCrf 30 FROZEN);
#   2. benchmark timings — must stay inside the recorded host noise
#      band: sf0.1 catalog total and the kg docs/s floor (graft.Bench).
#
# Exit 0 = gate green; nonzero = drift, with every offending metric
# named on stderr. Override the ledger with GATE_LEDGER=... (that is
# also how the deliberately-broken dry run is recorded: point it at a
# ledger with an impossible band and watch the gate fail loud).
#
# Usage: tools/regression_gate.sh [--skip-bench]
#   --skip-bench  quality arms only (~6 min); full gate ~15 min.
set -euo pipefail
cd "$(dirname "$0")/.."

LEDGER=${GATE_LEDGER:-BENCH/regression_ledger.json}
SKIP_BENCH=0
[[ "${1:-}" == "--skip-bench" ]] && SKIP_BENCH=1

if [[ -n "${GATE_REUSE:-}" ]]; then
  # Re-judge existing logs against a (possibly different) ledger without
  # re-running the arms — this is how the deliberately-broken dry run is
  # produced: GATE_REUSE=<workdir of a green run> GATE_LEDGER=<broken>.
  OUT=$GATE_REUSE
  echo "[gate] ledger=$LEDGER REUSING logs in $OUT (no arms re-run)"
else
  OUT=$(mktemp -d /tmp/graft-gate.XXXXXX)
  echo "[gate] ledger=$LEDGER workdir=$OUT"

  [[ -d /root/reference/data/test ]] || { echo "[gate] reference corpus missing" >&2; exit 2; }

  echo "[gate] 1/3 frozen DDI arm (DebugDdi FROZEN TEST)"
  sbt -batch "runMain graft.tools.DebugDdi FROZEN TEST" 2>&1 | tee "$OUT/ddi.log" | grep -E "^(start|TEST)" || true
  echo "[gate] 2/3 frozen CRF arm (DebugCrf 30 FROZEN)"
  sbt -batch "runMain graft.tools.DebugCrf 30 FROZEN" 2>&1 | tee "$OUT/crf.log" | grep -E "^crf " || true

  if [[ $SKIP_BENCH -eq 0 ]]; then
    echo "[gate] 3/3 sf0.1 bench (graft.Bench)"
    # stale-state guard: the judged metrics must come from THIS run —
    # the python below reads the JSON line from $OUT/bench.log, never
    # from repo state, and the gate FAILS on a nonzero bench exit
    # instead of swallowing it. (An earlier rm -f of
    # BENCH/last_bench.json bought nothing on top of that — round-7
    # ADVICE item.)
    if ! SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
        sbt -batch "runMain graft.Bench" > "$OUT/bench.log" 2>&1; then
      tail -5 "$OUT/bench.log" >&2
      echo "[gate] RED: bench arm exited nonzero (see $OUT/bench.log)" >&2
      exit 1
    fi
  else
    echo "[gate] 3/3 bench skipped (--skip-bench)"
  fi
fi

python3 - "$LEDGER" "$OUT" "$SKIP_BENCH" <<'EOF'
import json, re, sys
ledger_path, out, skip_bench = sys.argv[1], sys.argv[2], sys.argv[3] == "1"
ledger = json.load(open(ledger_path))
fails = []

def check(name, got, ok, detail):
    status = "OK  " if ok else "FAIL"
    print(f"[gate] {status} {name}: {detail}")
    if not ok:
        fails.append(name)

# 1) DDI frozen arm: the typed TEST line printed at the shipped margins
m = re.search(r"^TEST\s+P=([\d.]+) R=([\d.]+) F1=([\d.]+)", open(f"{out}/ddi.log").read(), re.M)
if not m:
    check("ddi_test_f1", None, False, "no TEST line in ddi.log")
else:
    got, want, tol = float(m.group(3)), ledger["ddi_test_f1"], ledger["quality_tol"]
    check("ddi_test_f1", got, abs(got - want) <= tol, f"got {got} want {want} ±{tol}")

# 2) CRF frozen arm: the 'crf epochs=30 ... | test ... F1=x' line
m = re.search(r"^crf epochs=\d+ .*\| test P=([\d.]+) R=([\d.]+) F1=([\d.]+)",
              open(f"{out}/crf.log").read(), re.M)
if not m:
    check("crf_test_f1", None, False, "no crf test line in crf.log")
else:
    got, want, tol = float(m.group(3)), ledger["crf_test_f1"], ledger["quality_tol"]
    check("crf_test_f1", got, abs(got - want) <= tol, f"got {got} want {want} ±{tol}")

# 3) bench band — parsed from THIS run's (or the reused workdir's) log,
#    never from repo state, so stale BENCH/last_bench.json can't score
#    a crashed run green; works identically under GATE_REUSE.
if not skip_bench:
    import os
    lines = [] if not os.path.exists(f"{out}/bench.log") else \
        [l for l in open(f"{out}/bench.log") if l.startswith('{"metric"')]
    if not lines:
        check("bench_json", None, False, "no bench JSON line in bench.log")
    else:
        b = json.loads(lines[-1])
        if b.get("errors"):
            check("bench_errors", b["errors"], False, f"failed queries: {b['errors']}")
        tot, lo, hi = b["value"], ledger["bench_total_lo"], ledger["bench_total_hi"]
        check("bench_total", tot, lo <= tot <= hi, f"got {tot}s band [{lo},{hi}]")
        dps, floor = b["kg_docs_per_sec"], ledger["kg_docs_per_sec_min"]
        check("kg_docs_per_sec", dps, dps >= floor, f"got {dps} floor {floor}")

if fails:
    print(f"[gate] RED: drift in {', '.join(fails)}", file=sys.stderr)
    sys.exit(1)
print("[gate] GREEN: all pinned metrics inside the ledger bands")
EOF
