#!/bin/bash
# Round-3 on-chip measurement runbook for the int8-KV-cache feature and
# the DAgger stream-count knob. Run on the real TPU chip, ONE process at
# a time (two concurrent jax processes deadlock on the compile-cache
# file lock — docs/PERFORMANCE.md "Environment caveats").
#
# Produces /tmp/kv8_sweep/<name>.json one per point; eyeball with
#   grep -h value /tmp/kv8_sweep/*.json
#
# Decision rules (then update bench.py defaults + docs):
#   - rollout: adopt --kv8 into the headline anchor iff the best kv8
#     point beats 2x16 bf16-cache (9.10 eps/s era); sweep slots
#     16/20/24 — the bf16 sweep's regression past 16 was HBM pressure.
#   - decode: adopt kv8 iff b=32 improves or a larger batch beats
#     b=32's 707 tok/s; sweep b=32/48/64.
#   - train_e2e: adopt dagger_streams=N iff it beats 2 at batch 32.
set -u
OUT=/tmp/kv8_sweep
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: bench.py $*"
  timeout 2400 python bench.py "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  tail -1 "$OUT/$name.json" || true
}

# --- 7B streaming rollout: kv8 A/B + slot sweep -----------------------
run rollout_7b_base    --mode rollout --model 7b --prefix_cache --a8 --iters 20
run rollout_7b_kv8_16  --mode rollout --model 7b --prefix_cache --a8 --kv8 --iters 20
run rollout_7b_kv8_20  --mode rollout --model 7b --prefix_cache --a8 --kv8 --batch 20 --iters 20
run rollout_7b_kv8_24  --mode rollout --model 7b --prefix_cache --a8 --kv8 --batch 24 --iters 20

# --- 7B streaming rollout: int4 weights (capacity A/B) ----------------
# w4 frees ~3.5 GB vs int8 -> try the slot counts HBM pressure denied;
# accuracy contract is looser (tests/test_quant4.py) so adopt only as
# a documented capacity option, never as the accuracy headline.
run rollout_7b_w4_16   --mode rollout --model 7b --prefix_cache --a8 --w4 --iters 20
run rollout_7b_w4_24   --mode rollout --model 7b --prefix_cache --a8 --w4 --batch 24 --iters 20
run rollout_7b_w4_32   --mode rollout --model 7b --prefix_cache --a8 --w4 --batch 32 --iters 20

# --- 7B decode: kv8 A/B + batch sweep ---------------------------------
run decode_7b_base     --mode decode --model 7b --a8
run decode_7b_kv8_32   --mode decode --model 7b --a8 --kv8
run decode_7b_kv8_48   --mode decode --model 7b --a8 --kv8 --batch 48
run decode_7b_kv8_64   --mode decode --model 7b --a8 --kv8 --batch 64

# --- 7B decode: int4 weights (HBM-bound weight reads halve again) ------
run decode_7b_w4_8     --mode decode --model 7b --a8 --w4 --batch 8
run decode_7b_w4_32    --mode decode --model 7b --a8 --w4
run decode_7b_w4_64    --mode decode --model 7b --a8 --w4 --kv8 --batch 64

# --- proxy train_e2e: DAgger stream count -----------------------------
run train_e2e_s1       --mode train_e2e --streams 1 --iters 20
run train_e2e_s2       --mode train_e2e --iters 20
run train_e2e_s3       --mode train_e2e --streams 3 --iters 20
run train_e2e_s4       --mode train_e2e --streams 4 --iters 20

echo; echo "=== summary ==="
for f in "$OUT"/*.json; do
  printf "%-22s " "$(basename "$f" .json)"; tail -1 "$f"
done
