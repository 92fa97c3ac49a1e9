#!/bin/bash
# Round-5 TPU measurement session (run when the chip is free).
# Produces the artifacts VERDICT r4 asked for:
#   0. the KITTI soak test+eval -> soak_summary.json (training done separately)
#   1. trained-checkpoint DCN offset distributions (per-layer radius choice)
#   2. per-layer DCN kernel sweep (impl x regime x radius) -> STATUS table
#   3. whole-model bench A/Bs: per-layer radii, chunk_batched, device_warp,
#      profiler trace
# Everything tees into exp/r5_measurements/.
set -x
cd "$(dirname "$0")/.."
OUT=exp/r5_measurements
mkdir -p $OUT

# 0. soak test+eval against the trained model_last (VERDICT #3)
timeout 3600 python tools/soak_kitti.py --keep_data --skip_train \
  2>&1 | tee $OUT/soak_eval.log

# 1. offsets of the trained soak checkpoint (384x1280 KITTI, 40 epochs)
#    (forward-only -- also runnable on CPU while the chip is busy)
timeout 1800 python tools/measure_dcn_offsets.py \
  --load_model exp/tracking/kitti_soak/model_last \
  --input_h 384 --input_w 1280 --frames 4 \
  2>&1 | tee $OUT/dcn_offsets.log

# 2. per-layer kernel sweep
timeout 3600 python tools/bench_dcn.py --iters 30 \
  --impls pallas_cm,pallas_cm_ungated,onehot,conv \
  --regimes zero,trained,uniform --radius 4 2 \
  2>&1 | tee $OUT/dcn_sweep.log

# 3. whole-model bench: baseline config
timeout 2400 python bench.py 2>&1 | tee $OUT/bench_base.log

# 4. A/B: per-layer radii (paste the --dcn_layer_radii JSON that step 1
#    printed; r=2 everywhere is the a-priori expectation for trained DEFT)
timeout 2400 python bench.py --dcn-layer-radii \
  "$(grep -o "'{.*}'" $OUT/dcn_offsets.log | tail -1 | tr -d "'")" \
  2>&1 | tee $OUT/bench_radii.log

# 5. A/B: chunk_batched
timeout 2400 python bench.py --chunk-batched 2>&1 | tee $OUT/bench_chunkbatched.log

# 6. A/B: device_warp
timeout 2400 python bench.py --device-warp 2>&1 | tee $OUT/bench_devicewarp.log

# 7. profiler trace attempt (VERDICT #4, three rounds outstanding)
timeout 2400 python bench.py --frames 60 --profile $OUT/trace \
  2>&1 | tee $OUT/bench_profile.log
ls -la $OUT/trace 2>/dev/null || echo "NO TRACE PRODUCED" | tee -a $OUT/bench_profile.log
