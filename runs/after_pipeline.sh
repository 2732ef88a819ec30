#!/bin/bash
# Runs after runs/pretrain_pipeline.sh completes (single-TPU-client rule:
# the axon tunnel hangs when two jax processes contend for the chip).
# Phase D: the reference evaluate.py metric battery with the trained
# posed_probe checkpoint (paper metrics on the 15 mapped complexes),
# then a bench.py validation pass.
set -u
cd /root/repo
LOG=runs/pretrain_pipeline.log
PIPE_PID=$(cat /tmp/pipeline.pid 2>/dev/null || echo 0)
while [ "$PIPE_PID" != "0" ] && kill -0 "$PIPE_PID" 2>/dev/null; do sleep 30; done

echo "[after] phase D: evaluate battery on posed_probe" >>$LOG
python -m diffphore_tpu.cli.evaluate \
  --test_csv runs/posed/task.csv \
  --model_dir runs/posed_probe \
  --out_dir runs/posed_probe/eval \
  --sample_per_complex 40 --use_symmetry_rmsd true \
  >> runs/posed_probe/eval.launch.log 2>&1
echo "[after] evaluate rc=$?" >>$LOG
git add -A runs/posed_probe/eval 2>>$LOG
git commit -m "Evaluation-battery artifact: cli/evaluate with the trained posed_probe checkpoint on the 15 mapped complexes (performance_metrics.json, rmsds/fitscore arrays, symmetry RMSD)" >>$LOG 2>&1

echo "[after] bench validation" >>$LOG
python bench.py > /tmp/bench_validate.json 2>/tmp/bench_validate.err
echo "[after] bench rc=$?: $(cat /tmp/bench_validate.json)" >>$LOG
echo "[after] done" >>$LOG
