#!/usr/bin/env bash
# Experiment driver: the TPU-native equivalent of the reference's
# do_main_msnet.sh (task types, dataset blocks, experiment naming, epoch
# chaining). Unlike the reference, loop-train does NOT need per-epoch
# process restarts (our input pipeline has no epoch-1 hang), but the
# epoch-granular resume chain is kept so interrupted runs restart cleanly.
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data}
#----------------------------
#--- DATA TYPES -------------
#----------------------------
KT2012=${KT2012:-0} KT2015=${KT2015:-0} ETH3D=${ETH3D:-0} MIDDLEBURY=${MIDDLEBURY:-0}

if [ "$KT2012" -eq 1 ]; then
  DATA_PATH="${DATA_ROOT}/datasets/KITTI-2012/training/"
  TRAINING_LIST="lists/kitti2012_train170.list"
  TEST_LIST="lists/kitti2012_val24.list"
elif [ "$KT2015" -eq 1 ]; then
  DATA_PATH="${DATA_ROOT}/datasets/KITTI-2015/training/"
  TRAINING_LIST="lists/kitti2015_train170.list"
  TEST_LIST="lists/kitti2015_val30.list"
elif [ "$ETH3D" -eq 1 ]; then
  DATA_PATH="${DATA_ROOT}/datasets/ETH3D/two_view_training/"
  TRAINING_LIST="lists/eth3d_train.list"
  TEST_LIST="lists/eth3d_train.list"
elif [ "$MIDDLEBURY" -eq 1 ]; then
  DATA_PATH="${DATA_ROOT}/datasets/MiddleburyV3/trainingH/"
  TRAINING_LIST="lists/middleburyV3H_train.list"
  TEST_LIST="lists/middleburyV3H_train.list"
else
  DATA_PATH="${DATA_ROOT}/datasets/SceneFlowDataset/"
  TRAINING_LIST="lists/sceneflow_train.list"
  TEST_LIST="lists/sceneflow_test_small.list"
fi

CROP_HEIGHT=${CROP_HEIGHT:-256}
CROP_WIDTH=${CROP_WIDTH:-512}
MAX_DISP=${MAX_DISP:-192}
START_EPOCH=${START_EPOCH:-0}
NUM_EPOCHS=${NUM_EPOCHS:-10}
NUM_WORKERS=${NUM_WORKERS:-8}
BATCHSIZE=${BATCHSIZE:-2}
LOG_SUMMARY_STEP=${LOG_SUMMARY_STEP:-50}
MESH=${MESH:-}            # e.g. "2,2,2" for (data, spatial, disp)
SF_FRAME=${SF_FRAME:-frames_finalpass}

#----------------------------
#--- TASK / MODEL -----------
#----------------------------
TASK_TYPE=${TASK_TYPE:-loop-train}   # loop-train | train | val-30 | cross-val | eval-badx
MODEL_NAME=${MODEL_NAME:-MS-GCNet}   # MS-GCNet | MS-PSMNet

if [ "$KT2012" -eq 1 ]; then SUF="kt12epo${NUM_EPOCHS}";
elif [ "$KT2015" -eq 1 ]; then SUF="kt15epo${NUM_EPOCHS}";
else SUF="sfepo${NUM_EPOCHS}"; fi
MODEL_STR=$(echo "$MODEL_NAME" | tr 'A-Z-' 'a-z_' | tr -d '_')
EXP_NAME="${MODEL_STR}-D${MAX_DISP}-${SUF}"
TRAIN_LOGDIR="./logs/${EXP_NAME}"
CHECKPOINT_DIR="./checkpoints/${EXP_NAME}"
RESULTDIR="./results/${EXP_NAME}"
RESUME=${RESUME:-}
echo "EXP_NAME=$EXP_NAME TASK=$TASK_TYPE"

COMMON_ARGS=(--crop_height="$CROP_HEIGHT" --crop_width="$CROP_WIDTH"
  --max_disp="$MAX_DISP" --data_path="$DATA_PATH"
  --training_list="$TRAINING_LIST" --test_list="$TEST_LIST"
  --checkpoint_dir="$CHECKPOINT_DIR" --train_logdir="$TRAIN_LOGDIR"
  --kitti2012="$KT2012" --kitti2015="$KT2015" --eth3d="$ETH3D"
  --middlebury="$MIDDLEBURY" --model_name="$MODEL_NAME"
  --resultDir="$RESULTDIR" --sf_frames="$SF_FRAME" --mesh="$MESH")
# optional knobs (forwarded only when set): REMAT=1/0, REMAT_SCOPE=all|hourglass,
# QUANT_EVAL=1 (+QUANT_MODE=dynamic|static, QUANT_SCOPE=all|stem) for int8
# eval. QUANT_MODE default matches the CLI default (dynamic) so the same
# flags mean the same run through either launch path.
[ -n "${REMAT:-}" ] && { [ "$REMAT" -eq 1 ] && COMMON_ARGS+=(--remat) || COMMON_ARGS+=(--no_remat); }
[ -n "${REMAT_SCOPE:-}" ] && COMMON_ARGS+=(--remat_scope="$REMAT_SCOPE")
[ -n "${QUANT_EVAL:-}" ] && COMMON_ARGS+=(--quant_eval="$QUANT_EVAL" --quant_mode="${QUANT_MODE:-dynamic}")
[ -n "${QUANT_SCOPE:-}" ] && COMMON_ARGS+=(--quant_scope="$QUANT_SCOPE")

case "$TASK_TYPE" in
  loop-train)
    # epoch chain with per-epoch resume (reference do_main_msnet.sh:143-192)
    for epo_idx in $(seq "$START_EPOCH" $((START_EPOCH + NUM_EPOCHS - 1))); do
      if [ "$epo_idx" -gt 0 ]; then
        RESUME="${CHECKPOINT_DIR}/${MODEL_NAME}/model_epoch_$(printf '%05d' "$epo_idx").msgpack"
      fi
      python -m msnets_tpu.cli "${COMMON_ARGS[@]}" --mode=train \
        --batchSize="$BATCHSIZE" --threads="$NUM_WORKERS" \
        --log_summary_step="$LOG_SUMMARY_STEP" --nEpochs=1 \
        --startEpoch="$epo_idx" --resume="$RESUME"
    done
    ;;
  train)
    python -m msnets_tpu.cli "${COMMON_ARGS[@]}" --mode=train \
      --batchSize="$BATCHSIZE" --threads="$NUM_WORKERS" \
      --log_summary_step="$LOG_SUMMARY_STEP" --nEpochs="$NUM_EPOCHS" \
      --startEpoch="$START_EPOCH" --resume="$RESUME"
    ;;
  val-30|cross-val)
    python -m msnets_tpu.cli "${COMMON_ARGS[@]}" --mode=test --resume="$RESUME"
    mkdir -p "$RESULTDIR/disp-pfm"
    find "$RESULTDIR" -maxdepth 1 -name '*.pfm' -exec mv {} "$RESULTDIR/disp-pfm/" \;
    ;;
  eval-badx)
    python -m msnets_tpu.cli "${COMMON_ARGS[@]}" --mode=eval-badx \
      --threshold="${THRESHOLD:-3.0}"
    ;;
  *)
    echo "unknown TASK_TYPE=$TASK_TYPE"; exit 1;;
esac
