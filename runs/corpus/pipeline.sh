#!/bin/bash
# Round-4 pipeline: synthetic PDBbind-surrogate corpus at scale
# (VERDICT r3 item 1).  350 never-before-trained synthetic ligands + the 15
# sQC example complexes train the full reference recipe - ligand-only
# pretrain -> fine-tune with warmup + CCSampler (weights/.../
# model_parameters.yml:44-154 semantics) - then the cli.evaluate battery on
# 60 NEVER-SEEN test ligands proves generalization at scale, plus the 3
# held-out sQC ligands as the item-2 readout.
#
# Survivability (ADVICE r3 fixes): each phase writes an explicit .done
# marker on success and is SKIPPED only on that marker; an existing
# last_model.msgpack resumes via --restart_dir (never silently truncates a
# phase).  The watcher creates its stop file before being killed, retries
# once on git index contention, and checkpoint writes are atomic
# (temp+rename) so snapshots never commit a torn file.
set -u
cd /root/repo
LOG=runs/corpus/pipeline.log
STOP=/tmp/corpus_watch_stop

commit_phase () {
  local msg=$1; shift
  git add -A "$@" runs/corpus/pipeline.sh 2>>$LOG
  for d in "$@"; do git add -f "$d"/*.msgpack 2>>$LOG; done
  git commit -m "$msg" >>$LOG 2>&1 || echo "[pipeline] commit skipped: $msg" >>$LOG
}

watch_commit () {  # $1 = run dir, $2 = label
  while true; do
    sleep 600
    [ -f $STOP ] && exit 0
    git add -A "$1" 2>>$LOG
    git add -f "$1"/*.msgpack 2>>$LOG
    if ! git commit -m "pipeline progress snapshot: $2 (periodic)" >>$LOG 2>&1; then
      sleep 7   # index contention with a foreground commit: retry once
      git add -A "$1" 2>>$LOG && git add -f "$1"/*.msgpack 2>>$LOG
      git commit -m "pipeline progress snapshot: $2 (periodic)" >>$LOG 2>&1 \
        || echo "[pipeline] watcher commit skipped" >>$LOG
    fi
  done
}
stop_watcher () { touch $STOP; sleep 1; kill $WPID 2>/dev/null; rm -f $STOP; }
rm -f $STOP

# warm host caches (SO(3)/torus tables + XLA compile cache) from the orphan
# snapshot ref, and snapshot them back after each phase
bash runs/host_cache_sync.sh pull >>$LOG 2>&1

# ---------------------------------------------------------------- phase A
PRE=runs/corpus/pretrain
if [ ! -f $PRE/.done ]; then
  RESUME=""
  [ -f $PRE/last_model.msgpack ] && RESUME="--restart_dir $PRE"
  echo "[pipeline] phase A: ligand-only pretrain (594 synth ligands) $RESUME" >>$LOG
  watch_commit $PRE "ligand-only pretrain" & WPID=$!
  # bucket floors match phase B exactly: the 594-ligand set collapses from
  # 19 (A,P,T) buckets (19 multi-minute XLA compiles on this 1-core host -
  # the silent killer of round 3's phase A) to ~4, all SHARED with phase
  # B's train-step compiles
  python -m diffphore_tpu.cli.train \
    --train_csv runs/pretrain_synth/train594.csv \
    --val_csv runs/pretrain_synth/val6.csv \
    --ligand_only \
    --bucket_a_min 24 --bucket_a_step 8 \
    --bucket_p_min 48 --bucket_p_step 32 \
    --bucket_t_min 8 --bucket_t_step 4 \
    --batch_size 24 --lr 1e-3 --n_epochs 300 \
    --val_inference_freq 100 --inference_samples 8 \
    --val_loss_freq 10 --ckpt_freq 25 \
    $RESUME \
    --run_dir $PRE >> $PRE.launch.log 2>&1
  rcA=$?
  stop_watcher
  echo "[pipeline] phase A rc=$rcA" >>$LOG
  [ $rcA -eq 0 ] && touch $PRE/.done
  bash runs/host_cache_sync.sh push >>$LOG 2>&1
  commit_phase "Corpus pipeline A: ligand-only pretrain (594 synthetic ligands, 300 epochs)" $PRE
  [ $rcA -ne 0 ] && exit $rcA
else
  echo "[pipeline] phase A done marker present, skipping" >>$LOG
fi

# ---------------------------------------------------------------- phase B
MAIN=runs/corpus/main
if [ ! -f $MAIN/.done ]; then
  INIT="--pretrain_model_pt $PRE/last_model.msgpack"
  [ -f $MAIN/last_model.msgpack ] && INIT="--restart_dir $MAIN"
  echo "[pipeline] phase B: corpus fine-tune (365 train / 30 val) $INIT" >>$LOG
  watch_commit $MAIN "corpus main train" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --train_csv runs/corpus/train365.csv \
    --val_csv runs/corpus/val30.csv \
    --phore_augment 3 --conf_augment 3 --phore_augment_ex 3 \
    --bucket_a_min 24 --bucket_a_step 8 \
    --bucket_p_min 48 --bucket_p_step 32 \
    --bucket_t_min 8 --bucket_t_step 4 \
    --batch_size 24 --lr 1e-3 --n_epochs 800 \
    --warmup_epochs 50 --warmup_number 600 \
    --rate_from_infer 0.6 --epoch_from_infer 300 --dynamic_coeff 6.0 \
    --val_inference_freq 25 --inference_samples 8 \
    --num_inference_complexes 30 \
    --val_loss_freq 10 --ckpt_freq 25 \
    $INIT \
    --run_dir $MAIN >> $MAIN.launch.log 2>&1
  rcB=$?
  stop_watcher
  echo "[pipeline] phase B rc=$rcB" >>$LOG
  [ $rcB -eq 0 ] && touch $MAIN/.done
  bash runs/host_cache_sync.sh push >>$LOG 2>&1
  commit_phase "Corpus pipeline B: 365-ligand corpus train (phore/conf augment x3, warmup + CCSampler recipe, pretrained init)" $MAIN
  [ $rcB -ne 0 ] && exit $rcB
else
  echo "[pipeline] phase B done marker present, skipping" >>$LOG
fi

# ---------------------------------------------------------------- phase B2
# Trained confidence head (VERDICT r3 item 4): regress pose fitness of
# on-device-noised poses (the validated --by_total mode,
# tests/test_confidence_validation.py) on the corpus records; the committed
# checkpoint then feeds --confidence_model_dir in phase C so the battery
# carries rankbyConfidence_* next to rankbyFitscore_* (reference
# evaluate.py:66-67).
CONF=runs/corpus/confidence
if [ ! -f $CONF/.done ]; then
  RESUME=""
  [ -f $CONF/last_model.msgpack ] && RESUME="--restart_dir $CONF"
  echo "[pipeline] phase B2: confidence-head training $RESUME" >>$LOG
  watch_commit $CONF "confidence head" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --confidence_mode --by_total \
    --train_csv runs/corpus/train365.csv \
    --val_csv runs/corpus/val30.csv \
    --bucket_a_min 24 --bucket_a_step 8 \
    --bucket_p_min 48 --bucket_p_step 32 \
    --bucket_t_min 8 --bucket_t_step 4 \
    --batch_size 24 --lr 1e-3 --n_epochs 300 \
    --val_loss_freq 10 --ckpt_freq 25 --val_inference_freq 0 \
    $RESUME \
    --run_dir $CONF >> $CONF.launch.log 2>&1
  rcB2=$?
  stop_watcher
  echo "[pipeline] phase B2 rc=$rcB2" >>$LOG
  [ $rcB2 -eq 0 ] && touch $CONF/.done
  commit_phase "Corpus pipeline B2: trained confidence head (by_total fitness regression) on the corpus records" $CONF
fi
CONF_ARGS=""
[ -f $CONF/.done ] && CONF_ARGS="--confidence_model_dir $CONF"

# ---------------------------------------------------------------- phase C
EVAL=$MAIN/eval_test60
if [ ! -f $EVAL/.done ]; then
  echo "[pipeline] phase C: evaluate battery on 60 never-seen test ligands" >>$LOG
  python -m diffphore_tpu.cli.evaluate \
    --test_csv runs/corpus/test60.csv \
    --model_dir $MAIN \
    --out_dir $EVAL \
    --sample_per_complex 40 \
    --bucket_a_min 24 --bucket_a_step 8 \
    --bucket_p_min 48 --bucket_p_step 32 \
    --bucket_t_min 8 --bucket_t_step 4 \
    $CONF_ARGS \
    >> $MAIN.launch.log 2>&1
  rcC=$?
  echo "[pipeline] phase C rc=$rcC" >>$LOG
  [ $rcC -eq 0 ] && touch $EVAL/.done
  commit_phase "Corpus pipeline C: evaluate battery on the 60-ligand never-seen test split (fitscore + confidence ranking)" $EVAL
fi

# ---------------------------------------------------------------- phase D
SCREEN=$MAIN/heldout_screen
if [ ! -f $SCREEN/.done ]; then
  echo "[pipeline] phase D: 40-pose screen of the 3 held-out sQC ligands" >>$LOG
  python -m diffphore_tpu.cli.inference \
    --phore_ligand_csv runs/heldout/val3.csv \
    --model_dir $MAIN \
    --out_dir $SCREEN \
    --sample_per_complex 40 --batch_complexes 3 \
    >> $MAIN.launch.log 2>&1
  rcD=$?
  python analysis/heldout_screen_eval.py --screen $SCREEN \
    --csv runs/heldout/val3.csv > $MAIN/heldout_screen_eval.txt 2>&1
  cat $MAIN/heldout_screen_eval.txt >>$LOG
  echo "[pipeline] phase D rc=$rcD" >>$LOG
  [ $rcD -eq 0 ] && touch $SCREEN/.done
  commit_phase "Corpus pipeline D: held-out sQC screen (3 never-seen ligands) with the corpus-trained model" $SCREEN $MAIN
fi
echo "[pipeline] done" >>$LOG
