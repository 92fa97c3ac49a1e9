#!/bin/bash
# KITTI 2D vehicle tracking recipe (reference experiments/kitti_tracking.sh).
# Data prep: python tools/convert_kittitrack_to_coco.py --data_dir data/kitti_tracking

python train.py tracking --exp_id kitti_train --dataset kitti_tracking \
    --dataset_version train --same_aug_pre --hm_disturb 0.05 \
    --lost_disturb 0.2 --fp_disturb 0.1 --compute_dtype bfloat16

python train_prediction.py tracking --exp_id kitti_motion_model \
    --dataset kitti_tracking --dataset_version train

python test.py tracking --exp_id kitti_train --dataset kitti_tracking \
    --dataset_version val_half --track_thresh 0.4 \
    --load_model exp/tracking/kitti_train/model_last \
    --load_model_traj exp/tracking/kitti_motion_model/model_last \
    --compute_dtype bfloat16
