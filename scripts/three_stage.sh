#!/usr/bin/env bash
# The reference's full three-stage workflow with TRAINED artifacts at every
# stage (VERDICT r4 item 2), on the synthetic visual world from
# scripts/make_world.py:
#
#   stage 1  train_detector.py  (frcnn/trainval_net.py)   from scratch
#   gate     extract val detections -> eval_detections.py  mAP@0.5 gate
#   stage 2  extract_features.py (frcnn/test_net.py --feat_extract)
#            from the TRAINED detector checkpoint -> features_{train,test}.h5
#   stage 3  train.py            (var_updown/scripts/train.py)  mode-1
#            Style-SeqCVAE on the EXTRACTED features
#   stage 4  inference.py        sentiment-conditioned decodes (pos/neg/
#            neutral beams + a CBS leg constrained by the detector's own
#            test-split detections)
#   stage 5  eval.py + eval_baselines.py + style_report.py  -> the full
#            metric battery incl. sentiment precision/recall/has-ANP,
#            crossover, and model-vs-random-vs-retrieval comparison
#
# Reference chain: frcnn/test_net.py:297-306 -> var_updown/scripts/
# train.py:76-188 -> inference.py:53-191 -> eval/eval.py.
#
# Usage: bash scripts/three_stage.sh [stage...]   (default: all)
# Env knobs: W (world dir), RUN (output dir), DET_EPOCHS, CAP_ITERS, MAP_GATE.
set -euo pipefail
cd "$(dirname "$0")/.."

W=${W:-worlds/quality}
RUN=${RUN:-runs/pipeline3}
DET_EPOCHS=${DET_EPOCHS:-16}
DET_DEPTH=${DET_DEPTH:-50}
DET_LR=${DET_LR:-0.004}
DET_LR_DECAY_EPOCHS=${DET_LR_DECAY_EPOCHS:-12}
CAP_ITERS=${CAP_ITERS:-20000}
MAP_GATE=${MAP_GATE:-0.5}
DET_OVERRIDES=(DET.TRAIN.SCALES "[384]" DET.TRAIN.MAX_SIZE 512
               DET.TEST.SCALES "[384]" DET.TEST.MAX_SIZE 512
               DET.TRAIN.CLIP_GRADIENTS 10.0)
STAGES=${*:-1 gate 2 3 4 5}
mkdir -p "$RUN"

run_stage() { case " $STAGES " in *" $1 "*) return 0;; *) return 1;; esac; }

if run_stage 1; then
  echo "=== stage 1: detector training (from scratch) ==="
  python scripts/train_detector.py \
    --instances-json "$W/instances_train.json" --image-root "$W/images" \
    --senticap-json "$W/senticap_dataset.json" --attribs-dir "$W/attribs" \
    --serialization-dir "$RUN/detector" --epochs "$DET_EPOCHS" \
    --depth "$DET_DEPTH" --lr-decay-epochs "$DET_LR_DECAY_EPOCHS" \
    --unfreeze-backbone \
    --ims-per-batch 8 --steps-per-dispatch 4 --bf16-compute \
    --canvas 384 512 \
    --config-override DET.TRAIN.LEARNING_RATE "$DET_LR" "${DET_OVERRIDES[@]}" \
    2>&1 | tee "$RUN/stage1_detector.log"
fi

if run_stage gate; then
  echo "=== gate: held-out detection mAP ==="
  python scripts/extract_features.py \
    --instances-json "$W/instances_val.json" --image-root "$W/images" \
    --attribs-dir "$W/attribs" \
    --checkpoint-path "$RUN/detector" --checkpoint-name "detector_epoch_$DET_EPOCHS" \
    --output "$RUN/features_val.h5" --detections-output "$RUN/detections_val.json" \
    --depth "$DET_DEPTH" --canvas 384 512 --batch-size 16 --thresh 0.05 \
    --config-override "${DET_OVERRIDES[@]}" \
    2>&1 | tee "$RUN/gate_extract_val.log"
  python scripts/eval_detections.py --detections "$RUN/detections_val.json" \
    --instances-json "$W/instances_val.json" --output "$RUN/detection_map.json" \
    2>&1 | tee "$RUN/gate_map.log"
  python - "$RUN/detection_map.json" "$MAP_GATE" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1]))
gate = float(sys.argv[2])
assert m["AP50"] >= gate, f"mAP gate FAILED: AP50={m['AP50']:.3f} < {gate}"
print(f"mAP gate PASSED: AP50={m['AP50']:.3f} mAP={m['mAP']:.3f} >= {gate}")
EOF
fi

if run_stage 2; then
  echo "=== stage 2: feature extraction from the trained checkpoint ==="
  for split in train test; do
    python scripts/extract_features.py \
      --instances-json "$W/instances_$split.json" --image-root "$W/images" \
      --attribs-dir "$W/attribs" \
      --checkpoint-path "$RUN/detector" --checkpoint-name "detector_epoch_$DET_EPOCHS" \
      --output "$RUN/features_$split.h5" \
      --detections-output "$RUN/detections_$split.json" \
      --depth "$DET_DEPTH" --canvas 384 512 --batch-size 16 --thresh 0.5 \
      --config-override "${DET_OVERRIDES[@]}" \
      2>&1 | tee "$RUN/stage2_extract_$split.log"
  done
fi

if run_stage 3; then
  echo "=== stage 3: captioner config + training on extracted features ==="
  cat > "$RUN/captioner_config.yml" <<EOF
RANDOM_SEED: 42
PRINT_EVERY_N_BATCHES: 100
DATA:
  VOCABULARY: $W/vocabulary
  TRAIN_FEATURES: $RUN/features_train.h5
  INFER_FEATURES: $RUN/features_test.h5
  TRAIN_CAPTIONS: $W/captions_train.json
  INFER_CAPTIONS: $W/captions_test.json
  SENTICAP_CAPTIONS: $W/senticap_dataset.json
  DO_LOAD_COCO: true
  DO_LOAD_SENTICAP: true
  MAX_CAPTION_LENGTH: 20
  MAX_BOXES: 24
  CBS:
    INFER_BOXES: $RUN/detections_test.json
    CLASS_HIERARCHY: $W/class_hierarchy.json
    WORDFORMS: $W/wordforms_objects.tsv
    WORDFORMS_ATTRIBS: $W/wordforms_attribs.tsv
    MAX_GIVEN_OBJECTS: 2
    MAX_GIVEN_CONSTRAINTS: 3
MODEL:
  IMAGE_FEATURE_SIZE: 2048
  EMBEDDING_SIZE: 600
  HIDDEN_SIZE: 900
  ATTENTION_PROJECTION_SIZE: 768
  BEAM_SIZE: 5
  USE_CBS: false
  CBS_SIMPLE: true
  MIN_CONSTRAINTS_TO_SATISFY: 2
  Z_SPACE: 150
  KLD_WEIGHT: 750
  SENTIMENT_VAE: 1
  SENTI_PRIOR_MULTIP: 0.5
  SIMPLE_VAE: false
  PRIOR_STD: 1.0
  N_Z_SAMPLES: 20
  STATE_MACHINE_PER_Z_SAMPLE: true
OPTIM:
  BATCH_SIZE: 150
  NUM_ITERATIONS: $CAP_ITERS
  LR: 0.015
  # the reference's two-phase decoder-freeze schedule (decoder updates
  # every 30th step until iteration EPOCH_START_DECODER_TRAINING) is
  # implemented + tested (test_training.py) and was exercised by the
  # r4 70k run; on THIS small-vocab world it let an encoder collapse at
  # ~5k steps go unrecovered (reconstr 37 -> 230 with the decoder
  # frozen), so the pipeline trains both phases jointly
  EPOCH_START_DECODER_TRAINING: 0
  BEFORE_UPDATE_DECODER_EVERY: 30
EOF
  python scripts/train.py --config "$RUN/captioner_config.yml" \
    --serialization-dir "$RUN/captioner" --checkpoint-every 5000 \
    --steps-per-dispatch 10 --bf16-compute --device-corpus \
    2>&1 | tee "$RUN/stage3_train.log"
fi

if run_stage 4; then
  echo "=== stage 4: sentiment-conditioned decodes ==="
  for senti in pos neg neutral; do
    OV=(DATA.SENTICAP_SENTIMENT "$([ "$senti" = neutral ] && echo "" || echo "$senti")")
    python scripts/inference.py --config "$RUN/captioner_config.yml" \
      --config-override "${OV[@]}" \
      --checkpoint-path "$RUN/captioner" --checkpoint-name "checkpoint_$CAP_ITERS" \
      --output-path "$RUN/preds_$senti.json" --batch-images 8 --bf16 \
      2>&1 | tee "$RUN/stage4_decode_$senti.log"
  done
  echo "--- CBS leg: constraints from the detector's own detections ---"
  python - "$RUN" "$W" <<'EOF'
import json, sys
run, w = sys.argv[1], sys.argv[2]
# COCO-results list -> ConstraintBoxesReader's {annotations, categories}
dets = json.load(open(f"{run}/detections_test.json"))
cats = json.load(open(f"{w}/instances_test.json"))["categories"]
json.dump({"annotations": dets, "categories": cats},
          open(f"{run}/constraint_boxes_test.json", "w"))
print(f"constraint boxes: {len(dets)} detections")
EOF
  python scripts/inference.py --config "$RUN/captioner_config.yml" \
    --config-override MODEL.USE_CBS true DATA.SENTICAP_SENTIMENT "pos" \
    DATA.CBS.INFER_BOXES "$RUN/constraint_boxes_test.json" \
    --checkpoint-path "$RUN/captioner" --checkpoint-name "checkpoint_$CAP_ITERS" \
    --output-path "$RUN/preds_cbs_pos.json" --batch-images 8 --bf16 \
    2>&1 | tee "$RUN/stage4_decode_cbs.log"
fi

if run_stage 5; then
  echo "=== stage 5: metric battery + baselines + style report ==="
  python scripts/eval.py --predictions "$RUN/preds_neutral.json" \
    --references "$W/captions_test.json" --wordforms "$W/wordforms_senti.tsv" \
    --output "$RUN/eval_neutral.json" | tee "$RUN/stage5_eval_neutral.log"
  python scripts/eval.py --predictions "$RUN/preds_pos.json" \
    --references "$W/captions_test_pos.json" --wordforms "$W/wordforms_senti.tsv" \
    --output "$RUN/eval_pos.json" | tee "$RUN/stage5_eval_pos.log"
  python scripts/eval.py --predictions "$RUN/preds_neg.json" \
    --references "$W/captions_test_neg.json" --wordforms "$W/wordforms_senti.tsv" \
    --output "$RUN/eval_neg.json" | tee "$RUN/stage5_eval_neg.log"
  python scripts/eval_baselines.py --world "$W" --run "$RUN" \
    --output "$RUN/eval_baselines.json" | tee "$RUN/stage5_baselines.log"
  python scripts/style_report.py --world "$W" --run "$RUN" \
    --output "$RUN/style_report.json" | tee "$RUN/stage5_style.log"
fi
echo "three-stage pipeline complete: artifacts under $RUN"
