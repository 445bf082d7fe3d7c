#!/usr/bin/env bash
# The reference's full 6-phase training recipe (reference README.md:117-259),
# expressed with this framework's CLIs. Hyperparameters mirror the reference's
# published commands; paths are parameterized.
#
#   DATA=/path/to/data SAVES=./saves bash scripts/six_phase_recipe.sh
#
# Expects under $DATA: dataset_coco.json (Karpathy split), MS_COCO_2014/ images,
# swin_large_patch4_window12_384_22k.pth (Swin-official backbone).
set -euo pipefail

DATA=${DATA:-./data}
SAVES=${SAVES:-./saves}
PKG=on_device_image_captioning_tpu
# per-phase save dirs: recipe phases alternate model kinds (features-only vs
# end-to-end), so each phase resumes only from ITS OWN checkpoints and the
# cross-phase handoffs below are explicit (reference README.md:117-259)
COMMON="--dataset coco --annotations $DATA/dataset_coco.json --seed 775533 \
  --optim_type radam --sched_type custom_warmup_anneal \
  --save_every_minutes 60 --how_many_checkpoints 1 \
  --eval_every_iter 999999"
latest() { ls -t "$1"/checkpoint_* | head -1; }

phase1_features() {  # reference README step 1: Swin features for XE
  python -m $PKG.cli.generate_features \
    --annotations "$DATA/dataset_coco.json" --images_path "$DATA/MS_COCO_2014/" \
    --backbone_checkpoint "$DATA/swin_large_patch4_window12_384_22k.pth" \
    --output "$DATA/features.hdf5" --batch_size 32 --bf16
}

phase2_xe_partial() {  # step 2: XE on features
  python -m $PKG.cli.train $COMMON --save_path "$SAVES/p2/" \
    --features_path "$DATA/features.hdf5" \
    --warmup_iters 10000 --lr 2e-4 --anneal_coeff 0.8 --anneal_every_epoch 2 \
    --enc_drop 0.3 --dec_drop 0.3 --enc_input_drop 0.3 --dec_input_drop 0.3 \
    --drop_other 0.3 --batch_size 48 --num_accum 1 \
    --print_every_iter 11807 --num_epochs 8
}

phase3_xe_end_to_end() {  # step 3: XE end-to-end (backbone + body warm start)
  python -m $PKG.cli.train $COMMON --save_path "$SAVES/p3/" \
    --is_end_to_end --images_path "$DATA/MS_COCO_2014/" --bf16 --prefetch 2 \
    --warmup_iters 1 --lr 3e-5 --anneal_coeff 0.55 --anneal_every_epoch 1 \
    --enc_drop 0.3 --dec_drop 0.3 --enc_input_drop 0.3 --dec_input_drop 0.3 \
    --drop_other 0.3 --batch_size 16 --num_accum 3 \
    --backbone_save_path "$DATA/swin_large_patch4_window12_384_22k.pth" \
    --body_save_path "$(latest "$SAVES/p2")" \
    --print_every_iter 15000 --num_epochs 2
}

phase4_features() {  # step 4: regenerate features with the tuned backbone
  python -m $PKG.cli.generate_features \
    --annotations "$DATA/dataset_coco.json" --images_path "$DATA/MS_COCO_2014/" \
    --backbone_checkpoint "$(latest "$SAVES/p3")" \
    --output "$DATA/features.hdf5" --batch_size 32 --bf16
}

phase5_scst_partial() {  # step 5: SCST on features (~139.5 CIDEr-D at the end)
  python -m $PKG.cli.train $COMMON --save_path "$SAVES/p5/" \
    --body_save_path "$(latest "$SAVES/p3")" \
    --features_path "$DATA/features.hdf5" --reinforce --scst_max_len 20 \
    --warmup_iters 1 --lr 1e-4 --anneal_coeff 0.8 --anneal_every_epoch 1 \
    --enc_drop 0.1 --dec_drop 0.1 --enc_input_drop 0.1 --dec_input_drop 0.1 \
    --drop_other 0.1 --batch_size 24 --num_accum 2 \
    --print_every_iter 4000 --num_epochs 9
}

phase6_scst_end_to_end() {  # step 6 (optional): SCST end-to-end
  python -m $PKG.cli.train $COMMON --save_path "$SAVES/p6/" \
    --backbone_save_path "$(latest "$SAVES/p3")" \
    --body_save_path "$(latest "$SAVES/p5")" \
    --is_end_to_end --images_path "$DATA/MS_COCO_2014/" --bf16 --prefetch 2 \
    --reinforce --scst_max_len 20 \
    --warmup_iters 1 --lr 2e-6 --anneal_coeff 1.0 --anneal_every_epoch 1 \
    --enc_drop 0.1 --dec_drop 0.1 --enc_input_drop 0.1 --dec_input_drop 0.1 \
    --drop_other 0.1 --batch_size 24 --num_accum 2 \
    --print_every_iter 15000 --num_epochs 1
}

for phase in phase1_features phase2_xe_partial phase3_xe_end_to_end \
             phase4_features phase5_scst_partial phase6_scst_end_to_end; do
  echo "=== $phase ==="
  "$phase" 2>&1 | tee "output_${phase}.txt"
done
