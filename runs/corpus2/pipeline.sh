#!/bin/bash
# Round-5 pipeline: corpus v2 - scaffold-held-out split at reference scale
# (VERDICT r4 items 1/2/4/8).  275 train ligands (220 flexible 20-41 heavy /
# 6-15 torsions, 40 v1-small, 15 sQC with DELIVERED-pose targets) train the
# full reference recipe; the battery then runs on 60 ligands built ONLY
# from held-out ring systems (torsion-stratified 20 semi-rigid / 40
# flexible), plus an actives-vs-decoys enrichment screen and the sQC
# transfer readout.
#
# Single shape bucket by design: floors (A=48, P=160, T=16) put EVERY
# complex of every phase in one (48,160,16) bucket, so the multi-minute
# tunneled-TPU train-step compile is paid ONCE and shared across phases
# via the persistent XLA cache.
#
# Featurization (~8 s/complex on this 1-core host) overlaps training:
# phase A featurizes its own 330 pretrain ligands, then the main-corpus
# featurizer (1,405 complexes) runs as a nice'd CPU process WHILE phase A
# trains on the TPU; phase B waits on it.
set -u
cd /root/repo
LOG=runs/corpus2/pipeline.log
STOP=/tmp/corpus2_watch_stop

BUCKETS="--bucket_a_min 48 --bucket_a_step 8 --bucket_p_min 160 --bucket_p_step 32 --bucket_t_min 16 --bucket_t_step 4"
AUG="--phore_augment 2 --conf_augment 2 --phore_augment_ex 3"

commit_phase () {
  local msg=$1; shift
  git add -A "$@" runs/corpus2/pipeline.sh 2>>$LOG
  for d in "$@"; do git add -f "$d"/*.msgpack 2>>$LOG; done
  git commit -m "$msg" >>$LOG 2>&1 || echo "[pipeline] commit skipped: $msg" >>$LOG
}

watch_commit () {  # $1 = run dir, $2 = label
  while true; do
    sleep 600
    [ -f $STOP ] && exit 0
    git add -A "$1" 2>>$LOG
    git add -f "$1"/*.msgpack 2>>$LOG
    if ! git commit -m "corpus2 progress snapshot: $2 (periodic)" >>$LOG 2>&1; then
      sleep 7
      git add -A "$1" 2>>$LOG && git add -f "$1"/*.msgpack 2>>$LOG
      git commit -m "corpus2 progress snapshot: $2 (periodic)" >>$LOG 2>&1 \
        || echo "[pipeline] watcher commit skipped" >>$LOG
    fi
  done
}
stop_watcher () { touch $STOP; sleep 1; kill $WPID 2>/dev/null; rm -f $STOP; }
rm -f $STOP

bash runs/host_cache_sync.sh pull >>$LOG 2>&1

# ------------------------------------------------- background featurizer
# (pure CPU: JAX_PLATFORMS=cpu + empty PYTHONPATH keeps it off the TPU
# tunnel; nice so the training host loop keeps CPU priority)
FEAT=runs/corpus2/featurize
if [ ! -f $FEAT.done ]; then
  echo "[pipeline] launching background main-corpus featurizer" >>$LOG
  ( PYTHONPATH= JAX_PLATFORMS=cpu nice -n 10 python -m diffphore_tpu.cli.train \
      --featurize_only \
      --train_csv runs/corpus2/train.csv --val_csv runs/corpus2/val.csv \
      $AUG $BUCKETS --run_dir $FEAT.tmp > $FEAT.log 2>&1 \
    && touch $FEAT.done ) &
  FPID=$!
  echo $FPID > /tmp/corpus2_feat.pid
else
  FPID=""
fi

# ---------------------------------------------------------------- phase A
PRE=runs/corpus2/pretrain
if [ ! -f $PRE/.done ]; then
  RESUME=""
  [ -f $PRE/last_model.msgpack ] && RESUME="--restart_dir $PRE"
  echo "[pipeline] phase A: ligand-only pretrain (330 ligands) $RESUME" >>$LOG
  watch_commit $PRE "v2 ligand-only pretrain" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --train_csv runs/corpus2/pretrain.csv \
    --val_csv runs/corpus2/val6.csv \
    --ligand_only \
    $BUCKETS \
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
  commit_phase "Corpus2 pipeline A: ligand-only pretrain (330 ligands incl. reference-scale flexible chemistry)" $PRE
  [ $rcA -ne 0 ] && exit $rcA
else
  echo "[pipeline] phase A done marker present, skipping" >>$LOG
fi

# wait for the featurizer before phase B touches the same cache dir
if [ -n "${FPID:-}" ]; then
  echo "[pipeline] waiting for main-corpus featurizer (pid $FPID)" >>$LOG
  wait $FPID 2>/dev/null
  echo "[pipeline] featurizer done ($(date +%H:%M))" >>$LOG
fi

# ---------------------------------------------------------------- phase B
MAIN=runs/corpus2/main
if [ ! -f $MAIN/.done ]; then
  INIT="--pretrain_model_pt $PRE/last_model.msgpack"
  [ -f $MAIN/last_model.msgpack ] && INIT="--restart_dir $MAIN"
  echo "[pipeline] phase B: corpus2 fine-tune (275 train / 30 val) $INIT" >>$LOG
  watch_commit $MAIN "corpus2 main train" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --train_csv runs/corpus2/train.csv \
    --val_csv runs/corpus2/val.csv \
    $AUG $BUCKETS \
    --batch_size 24 --lr 1e-3 --n_epochs 640 \
    --warmup_epochs 50 --warmup_number 600 \
    --rate_from_infer 0.6 --epoch_from_infer 300 --dynamic_coeff 6.0 \
    --val_inference_freq 40 --inference_samples 8 \
    --num_inference_complexes 16 \
    --val_loss_freq 10 --ckpt_freq 25 \
    $INIT \
    --run_dir $MAIN >> $MAIN.launch.log 2>&1
  rcB=$?
  stop_watcher
  echo "[pipeline] phase B rc=$rcB" >>$LOG
  [ $rcB -eq 0 ] && touch $MAIN/.done
  bash runs/host_cache_sync.sh push >>$LOG 2>&1
  commit_phase "Corpus2 pipeline B: scaffold-split corpus train (flexible ligands, warmup + CCSampler recipe, pretrained init)" $MAIN
  [ $rcB -ne 0 ] && exit $rcB
else
  echo "[pipeline] phase B done marker present, skipping" >>$LOG
fi

# ---------------------------------------------------------------- phase B2
# rmsd_lt2 pose-correctness classifier (now the default --confidence_label;
# the round-4 A/B winner, VERDICT r4 item 4)
CONF=runs/corpus2/confidence
if [ ! -f $CONF/.done ]; then
  RESUME=""
  [ -f $CONF/last_model.msgpack ] && RESUME="--restart_dir $CONF"
  echo "[pipeline] phase B2: rmsd_lt2 confidence classifier $RESUME" >>$LOG
  watch_commit $CONF "v2 confidence classifier" & WPID=$!
  python -m diffphore_tpu.cli.train \
    --confidence_mode \
    --train_csv runs/corpus2/train.csv \
    --val_csv runs/corpus2/val.csv \
    $BUCKETS \
    --batch_size 24 --lr 1e-3 --n_epochs 300 \
    --val_loss_freq 10 --ckpt_freq 25 --val_inference_freq 0 \
    $RESUME \
    --run_dir $CONF >> $CONF.launch.log 2>&1
  rcB2=$?
  stop_watcher
  echo "[pipeline] phase B2 rc=$rcB2" >>$LOG
  [ $rcB2 -eq 0 ] && touch $CONF/.done
  commit_phase "Corpus2 pipeline B2: rmsd_lt2 pose-correctness classifier on the scaffold-split corpus" $CONF
fi
CONF_ARGS=""
[ -f $CONF/.done ] && CONF_ARGS="--confidence_model_dir $CONF"

# ---------------------------------------------------------------- phase C
EVAL=$MAIN/eval_ood60
if [ ! -f $EVAL/.done ]; then
  echo "[pipeline] phase C: battery on 60 scaffold-held-out ligands" >>$LOG
  python -m diffphore_tpu.cli.evaluate \
    --test_csv runs/corpus2/test.csv \
    --model_dir $MAIN \
    --out_dir $EVAL \
    --sample_per_complex 40 \
    $BUCKETS \
    $CONF_ARGS \
    >> $MAIN.launch.log 2>&1
  rcC=$?
  PYTHONPATH= JAX_PLATFORMS=cpu python analysis/stratify_battery.py \
    --eval_dir $EVAL --manifest runs/corpus2/manifest.json \
    > $EVAL/stratified.json 2>>$LOG
  echo "[pipeline] phase C rc=$rcC" >>$LOG
  [ $rcC -eq 0 ] && touch $EVAL/.done
  commit_phase "Corpus2 pipeline C: battery on the 60-ligand scaffold-held-out test split (fitscore + rmsd_lt2 confidence ranking, torsion-stratified)" $EVAL
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
    $CONF_ARGS \
    >> $MAIN.launch.log 2>&1
  rcD=$?
  PYTHONPATH= JAX_PLATFORMS=cpu python analysis/heldout_screen_eval.py \
    --screen $SCREEN \
    --csv runs/heldout/val3.csv > $MAIN/heldout_screen_eval.txt 2>&1
  cat $MAIN/heldout_screen_eval.txt >>$LOG
  echo "[pipeline] phase D rc=$rcD" >>$LOG
  [ $rcD -eq 0 ] && touch $SCREEN/.done
  commit_phase "Corpus2 pipeline D: held-out sQC screen with the scaffold-split model" $SCREEN $MAIN
fi

# ---------------------------------------------------------------- phase E
# actives-vs-decoys enrichment: the first discrimination evidence
# (VERDICT r4 item 2; reference use case inference.py:321-350 +
# baselines/run_phore.py get_dude/get_ifptarget)
ENR=$MAIN/enrichment
if [ ! -f $ENR/.done ] && [ -f analysis/enrichment_screen.py ]; then
  echo "[pipeline] phase E: actives-vs-decoys enrichment screen" >>$LOG
  python analysis/enrichment_screen.py \
    --test_csv runs/corpus2/test.csv \
    --model_dir $MAIN \
    $CONF_ARGS \
    --out_dir $ENR >> $MAIN.launch.log 2>&1
  rcE=$?
  echo "[pipeline] phase E rc=$rcE" >>$LOG
  [ $rcE -eq 0 ] && touch $ENR/.done
  commit_phase "Corpus2 pipeline E: actives-vs-decoys enrichment screen (ROC-AUC / EF) on the scaffold-held-out phores" $ENR
fi
echo "[pipeline] done" >>$LOG
