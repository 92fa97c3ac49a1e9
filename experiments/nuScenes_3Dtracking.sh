#!/bin/bash
# nuScenes monocular 3D tracking, 6-camera rig (reference
# experiments/nuScenes_3Dtracking.sh).
# Data prep: python tools/convert_nuscenes.py --data_root data/nuscenes \
#     --version v1.0-trainval --train_scenes splits/train.txt --val_scenes splits/val.txt

python train.py tracking,ddd --exp_id nuScenes_3Dtracking --dataset nuscenes \
    --nuscenes_att --velocity --shift 0.01 --scale 0.05 --lost_disturb 0.4 \
    --fp_disturb 0.1 --hm_disturb 0.05 --lr 2.5e-4 --save_point 80 \
    --compute_dtype bfloat16

python train_prediction.py tracking,ddd --exp_id nuScenes_motion_model \
    --dataset nuscenes --lr 2.5e-4

python test.py tracking,ddd --exp_id nuScenes_3Dtracking --dataset nuscenes \
    --nuscenes_att --velocity --track_thresh 0.1 --nms \
    --load_model exp/tracking,ddd/nuScenes_3Dtracking/model_last \
    --load_model_traj exp/tracking,ddd/nuScenes_motion_model/model_last \
    --compute_dtype bfloat16
