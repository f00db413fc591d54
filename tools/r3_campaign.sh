#!/bin/bash
# Round-3 measurement campaign: run everything the moment the TPU tunnel is
# back. Outputs under /tmp/r3_campaign/. Each step bounded; failures don't
# stop later steps.
set -u
OUT=/tmp/r3_campaign
mkdir -p $OUT
cd /root/repo

echo "== $(date) kernel compile probe (Mosaic reality check) =="
timeout 900 python tools/r3_kernel_probe.py > $OUT/kernel_probe.jsonl 2> $OUT/kernel_probe.err
KP_RC=$?
echo "rc=$KP_RC"; cat $OUT/kernel_probe.jsonl 2>/dev/null
# if the fused aggregation kernel fails on real hardware, run the rest of
# the campaign on the XLA path so every number is still recorded
if [ $KP_RC -ne 0 ]; then export UNCR_AGG_KERNEL=0; echo "kernel probe FAILED: UNCR_AGG_KERNEL=0 for the rest of the campaign"; fi

echo "== $(date) bench eval (default B=8, fused aggregation kernel) =="
timeout 900 python bench.py > $OUT/bench_eval.json 2> $OUT/bench_eval.err
echo "rc=$? $(cat $OUT/bench_eval.json 2>/dev/null)"

echo "== $(date) bench eval, kernel OFF (A/B) =="
UNCR_AGG_KERNEL=0 timeout 900 python bench.py > $OUT/bench_eval_nokernel.json 2> $OUT/bench_eval_nokernel.err
echo "rc=$? $(cat $OUT/bench_eval_nokernel.json 2>/dev/null)"

echo "== $(date) bench train (B=4) =="
timeout 900 python bench.py --train > $OUT/bench_train.json 2> $OUT/bench_train.err
echo "rc=$? $(cat $OUT/bench_train.json 2>/dev/null)"

echo "== $(date) train dw-grad kernel A/B =="
UNCR_DW_GW=1 timeout 900 python bench.py --train > $OUT/bench_train_dwgw.json 2> $OUT/bench_train_dwgw.err
echo "rc=$? $(cat $OUT/bench_train_dwgw.json 2>/dev/null)"

echo "== $(date) full sweep =="
timeout 7200 python tools/r3_sweep.py > $OUT/sweep.jsonl 2> $OUT/sweep.err
echo "rc=$?"; cat $OUT/sweep.jsonl 2>/dev/null

echo "== $(date) e2e bench =="
timeout 1800 python bench.py --e2e > $OUT/bench_e2e.json 2> $OUT/bench_e2e.err
echo "rc=$? $(cat $OUT/bench_e2e.json 2>/dev/null)"

echo "== $(date) campaign done =="

echo "== $(date) scene serving bench =="
timeout 1200 python bench.py --scene > $OUT/bench_scene.json 2> $OUT/bench_scene.err
echo "rc=$? $(cat $OUT/bench_scene.json 2>/dev/null)"
