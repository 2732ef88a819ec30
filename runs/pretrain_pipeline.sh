#!/bin/bash
# Pretrain -> finetune -> screen pipeline (round 3, data-scale arm).
#
# Arm design: identical to runs/heldout_aug2 (12 train / 3 held-out ligands,
# --phore_augment 3 --conf_augment 3) EXCEPT the score model is initialized
# from a ligand-only pretrain on the 594-ligand synthetic library
# (runs/pretrain_synth/train594.csv) via --pretrain_model_pt.  Measures
# whether synthetic-library pretraining (the reference's ChEMBL/ZINC mode,
# src/datasets/pdbbind_phore.py ligandOnly_preprocessing) moves the held-out
# tail (STL582276, 3.94 A best-of-40 in heldout_aug2) below 2 A.
#
# Survivability: sessions are recycled every ~1h, so each phase (a) resumes
# from its own committed last_model.msgpack via --restart_dir when present,
# and (b) a watcher commits metrics + the force-added checkpoint every 10
# minutes so mid-phase progress survives a container recycle.
set -u
cd /root/repo
LOG=runs/pretrain_pipeline.log
commit_phase () {
  git add -A "$@" runs/pretrain_pipeline.sh 2>>$LOG
  for d in "$@"; do git add -f "$d"/*.msgpack 2>>$LOG; done
  git commit -m "$PHASE_MSG" >>$LOG 2>&1 || echo "[pipeline] commit skipped for: $PHASE_MSG" >>$LOG
}

# Background watcher: periodic progress commits for the active run dir.
watch_commit () {  # $1 = run dir, $2 = label
  while true; do
    sleep 600
    [ -f /tmp/pipeline_watch_stop ] && exit 0
    git add -A "$1" 2>>$LOG
    git add -f "$1"/*.msgpack 2>>$LOG
    git commit -m "pipeline progress snapshot: $2 (periodic)" >>$LOG 2>&1 || true
  done
}
rm -f /tmp/pipeline_watch_stop

if [ ! -f runs/pretrain_synth/full/last_model.msgpack ]; then
  echo "[pipeline] phase A: ligand-only pretrain (594 synthetic ligands)" >>$LOG
  watch_commit runs/pretrain_synth/full "ligand-only pretrain" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --train_csv runs/pretrain_synth/train594.csv \
    --val_csv runs/pretrain_synth/val6.csv \
    --ligand_only \
    --batch_size 24 --lr 1e-3 --n_epochs 350 \
    --val_inference_freq 100 --inference_samples 8 \
    --val_loss_freq 10 --ckpt_freq 25 \
    --run_dir runs/pretrain_synth/full \
    >> runs/pretrain_synth/full.launch.log 2>&1
  rcA=$?
  kill $WPID 2>/dev/null
  echo "[pipeline] phase A rc=$rcA" >>$LOG
  PHASE_MSG="Ligand-only pretrain on the 594-ligand synthetic library (350 epochs, bs 24): committed metrics/config/checkpoint for the pretrain->finetune data-scale arm"
  commit_phase runs/pretrain_synth/full
  [ $rcA -ne 0 ] && exit $rcA
else
  echo "[pipeline] phase A checkpoint present, skipping" >>$LOG
fi

echo "[pipeline] phase B: heldout finetune from pretrained init" >>$LOG
INIT_ARGS="--pretrain_model_pt runs/pretrain_synth/full/last_model.msgpack"
if [ -f runs/heldout_pre/last_model.msgpack ]; then
  INIT_ARGS="--restart_dir runs/heldout_pre"
  echo "[pipeline] phase B resuming from runs/heldout_pre" >>$LOG
fi
watch_commit runs/heldout_pre "heldout finetune from pretrained init" & WPID=$!
python -m diffphore_tpu.cli.train \
  --train_csv runs/heldout_aug2/train15x.csv \
  --val_csv runs/heldout/val3.csv \
  --phore_augment 3 --conf_augment 3 \
  --batch_size 6 --lr 1e-3 --n_epochs 2000 \
  $INIT_ARGS \
  --val_inference_freq 100 --inference_samples 8 \
  --val_loss_freq 10 --ckpt_freq 25 \
  --run_dir runs/heldout_pre \
  >> runs/heldout_pre.launch.log 2>&1
rcB=$?
kill $WPID 2>/dev/null
echo "[pipeline] phase B rc=$rcB" >>$LOG
PHASE_MSG="Held-out fine-tune from the synthetic pretrain (heldout_aug2 recipe + --pretrain_model_pt): committed metrics/config/checkpoints"
commit_phase runs/heldout_pre
[ $rcB -ne 0 ] && exit $rcB

echo "[pipeline] phase C: 40-pose screen of the 3 held-out ligands" >>$LOG
python -m diffphore_tpu.cli.inference \
  --phore_ligand_csv runs/heldout/val3.csv \
  --model_dir runs/heldout_pre \
  --out_dir runs/heldout_pre/screen \
  --sample_per_complex 40 --batch_complexes 3 \
  >> runs/heldout_pre.launch.log 2>&1
rcC=$?
python analysis/heldout_screen_eval.py --screen runs/heldout_pre/screen \
  --csv runs/heldout/val3.csv > runs/heldout_pre/screen_eval.txt 2>&1
cat runs/heldout_pre/screen_eval.txt >>$LOG
echo "[pipeline] phase C rc=$rcC" >>$LOG
PHASE_MSG="Held-out screen for the pretrain->finetune arm (40 poses, best-EMA): ranked results + RMSD eval vs heldout_aug2"
commit_phase runs/heldout_pre

echo "[pipeline] phase E: matched-epoch A/B vs heldout_aug2" >>$LOG
python analysis/pretrain_ab.py --a runs/heldout_aug2 --b runs/heldout_pre \
  > runs/heldout_pre/ab_vs_heldout_aug2.txt 2>&1
cat runs/heldout_pre/ab_vs_heldout_aug2.txt >>$LOG
PHASE_MSG="Matched-epoch A/B result: heldout_aug2 (random init) vs heldout_pre (synthetic-library pretrained init)"
commit_phase runs/heldout_pre
echo "[pipeline] done" >>$LOG
