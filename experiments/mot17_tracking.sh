#!/bin/bash
# MOT17 recipe (reference experiments/mot17_tracking.sh, adapted to this CLI).
# Data prep: python tools/convert_mot_to_coco.py --data_dir data/mot17

# train (published checkpoints load directly: --load_model models/model_mot.pth)
python train.py tracking --exp_id mot17_train --dataset mot \
    --dataset_version 17trainval --ltrb_amodal --same_aug_pre \
    --hm_disturb 0.05 --lost_disturb 0.4 --fp_disturb 0.1 \
    --compute_dtype bfloat16

# train the motion model
python train_prediction.py tracking --exp_id mot17_motion_model \
    --dataset mot --dataset_version 17trainval

# test (half-val protocol; use 17test for the server submission)
python test.py tracking --exp_id mot17_train --dataset mot \
    --dataset_version 17halfval --ltrb_amodal --track_thresh 0.4 \
    --pre_thresh 0.5 --load_model exp/tracking/mot17_train/model_last \
    --compute_dtype bfloat16

# public-detection mode:
# python tools/convert_mot_det_to_results.py --data_dir data/mot17
# python test.py tracking ... --public_det --load_results data/mot17/annotations/public_dets.json
