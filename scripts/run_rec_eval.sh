#!/usr/bin/env bash
# One-command REC readiness kit: HF checkpoint directory -> the 8-row
# RefCOCO/+/g table + average, matching the reference's published table
# (reference: README.md:106-114, target avg 86.52; BASELINE.md).
#
# Usage:
#   scripts/run_rec_eval.sh <ckpt_dir> <data_root> [limit]
#
# <data_root> layout (the reference's EVAL.md data layout):
#   annotations/: refcoco_val.json refcoco_testA.json refcoco_testB.json
#                 refcoco+_val.json refcoco+_testA.json refcoco+_testB.json
#                 refcocog_val.json refcocog_test.json
#   train2014/ (COCO train2014 images; RefCOCO images all come from it)
# Splits whose annotation file is missing are skipped with a note.
# [limit] evaluates only the first N expressions per split (smoke mode).
set -u
CKPT=${1:?usage: run_rec_eval.sh <ckpt_dir> <data_root> [limit]}
DATA=${2:?usage: run_rec_eval.sh <ckpt_dir> <data_root> [limit]}
LIMIT=${3:-0}
HERE=$(cd "$(dirname "$0")/.." && pwd)
OUT=${REC_OUT:-/tmp/groma_rec_eval}
mkdir -p "$OUT"

SPLITS="refcoco_val refcoco_testA refcoco_testB \
refcoco+_val refcoco+_testA refcoco+_testB refcocog_val refcocog_test"

for s in $SPLITS; do
  ann="$DATA/annotations/$s.json"
  if [ ! -f "$ann" ]; then
    echo "SKIP $s: $ann not found" | tee "$OUT/$s.skip"
    continue
  fi
  echo "=== $s ==="
  # one retry per split: a transient failure (host OOM under parallel
  # CI, tunnel hiccup) should not hole the 8-row table
  for attempt in 1 2; do
    PYTHONPATH="$HERE:${PYTHONPATH:-}" python -m groma_tpu.eval.eval_rec \
      --model-dir "$CKPT" --img-prefix "$DATA/train2014" \
      --ann-file "$ann" --limit "$LIMIT" \
      ${REC_TOKENIZER:+--tokenizer "$REC_TOKENIZER"} \
      | tee "$OUT/$s.log"
    grep -q '"acc@0.5"' "$OUT/$s.log" && break
    echo "retrying $s (attempt $attempt produced no metric)" >&2
  done
done

python - "$OUT" <<'EOF'
import json, os, re, sys
out = sys.argv[1]
rows, accs = [], []
order = ["refcoco_val", "refcoco_testA", "refcoco_testB",
         "refcoco+_val", "refcoco+_testA", "refcoco+_testB",
         "refcocog_val", "refcocog_test"]
ref = {  # reference README.md:106-114
    "refcoco_val": 89.53, "refcoco_testA": 92.09, "refcoco_testB": 86.26,
    "refcoco+_val": 83.90, "refcoco+_testA": 88.91,
    "refcoco+_testB": 78.05, "refcocog_val": 86.37, "refcocog_test": 87.01}
print("\n| split | acc@0.5 | reference | delta |")
print("|---|---|---|---|")
for s in order:
    p = os.path.join(out, s + ".log")
    if not os.path.exists(p):
        print(f"| {s} | (skipped) | {ref[s]} | — |")
        continue
    m = None
    for line in open(p):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "acc@0.5" in d:
                    m = d
            except json.JSONDecodeError:
                pass
    if m is None:
        print(f"| {s} | (no metric) | {ref[s]} | — |")
        continue
    acc = 100 * m["acc@0.5"] if m["acc@0.5"] <= 1 else m["acc@0.5"]
    accs.append(acc)
    print(f"| {s} | {acc:.2f} | {ref[s]} | {acc - ref[s]:+.2f} |")
if accs:
    avg = sum(accs) / len(accs)
    print(f"| **avg ({len(accs)} splits)** | **{avg:.2f}** | 86.52 "
          f"| {avg - 86.52:+.2f} |")
EOF
