#!/usr/bin/env python
"""Sequence tracking evaluation entry point.

Equivalent of ``/root/reference/src/test.py``: iterate dataset images grouped
by video in frame order, reset the tracker at sequence boundaries, run the
per-frame pipeline (the pipelined fused program for 2-D datasets; the
per-class 3-D branch for nuScenes), collect submission-format results, and
run the bundled evaluator.  Supports the MOTChallenge public-detection mode
(--public_det --load_results <json>, test.py:204-211 semantics).

Usage mirrors the reference:
  python test.py tracking --dataset mot --dataset_version 17halfval \
      --load_model exp/tracking/default/model_last --track_thresh 0.4 ...
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict

import numpy as np


def group_videos(dataset, sample_major=False):
    """video_id -> image infos sorted by frame_id (sensor-aware).

    ``sample_major`` orders all sensors of frame t before frame t+1 -- the
    reference's nuScenes ordering (convert_nuScenes.py iterates samples,
    then sensors; test.py consumes the json order)."""
    videos = defaultdict(list)
    for info in dataset.coco.dataset["images"]:
        videos[info["video_id"]].append(info)
    for infos in videos.values():
        if sample_major:
            infos.sort(key=lambda ii: (ii["frame_id"], ii.get("sensor_id", 1)))
        else:
            infos.sort(key=lambda ii: (ii.get("sensor_id", 1), ii["frame_id"]))
    return videos


def tracks_to_results(online, cls_default=1):
    out = []
    for t in online:
        tlbr = t.tlbr
        item = {
            "bbox": np.asarray(tlbr, np.float32),
            "score": float(t.score),
            "class": int(t.classe) if isinstance(t.classe, (int, np.integer))
            else cls_default,
            "tracking_id": int(t.track_id),
            "active": 1 if t.is_activated else 0,
        }
        if t.ddd_submission is not None:
            sub = np.asarray(t.ddd_submission, np.float64)
            item.update({
                "translation": sub[0:3].tolist(),
                "size": sub[3:6].tolist(),
                "rotation": sub[6:10].tolist(),
                "detection_name": t.classe,
                "velocity": [0, 0],
            })
        out.append(item)
    return out


def main(argv=None):
    from deft_tpu.cli import parse_config

    cfg, extras = parse_config(argv)
    cfg = cfg.replace(dataset=cfg.test_dataset or cfg.dataset)

    from deft_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import cv2

    from deft_tpu.data.datasets import get_dataset
    from deft_tpu.inference.detector import Detector
    from deft_tpu.inference.runner import PipelinedRunner
    from deft_tpu.utils.logger import Logger

    logger = Logger(cfg)
    dataset = get_dataset(cfg.dataset)(
        cfg, "val",
        data_dir=os.path.join(extras["data_dir"], _dataset_dirname(cfg)),
    )
    detector = Detector(cfg)

    loaded_results = {}
    if cfg.load_results:
        with open(cfg.load_results) as f:
            loaded_results = {int(k): v for k, v in json.load(f).items()}

    # --debug boards are produced by Detector.run (reference
    # detector.py:585-668); the pipelined fused program skips them
    use_pipeline = cfg.dataset != "nuscenes" and cfg.debug <= 0
    runner = PipelinedRunner(detector) if use_pipeline else None

    from deft_tpu.utils.visualize import VideoWriter, plot_tracking

    import contextlib

    results = {}
    # nuScenes: sample-major order (reference json order) + the 6-camera rig
    # batched through one device program per sample (SURVEY §5 / §7-10)
    batch_rig = cfg.dataset == "nuscenes" and cfg.debug <= 0
    videos = group_videos(dataset, sample_major=(cfg.dataset == "nuscenes"))
    t_start = time.time()
    n_frames = 0
    if cfg.profile:
        import jax

        prof_ctx = jax.profiler.trace(cfg.profile)
    else:
        prof_ctx = contextlib.nullcontext()
    prof_ctx.__enter__()
    for video_id, infos in videos.items():
        if runner is not None:
            runner.reset()
        else:
            detector.reset_tracking()
        writer = None
        frame_cache = {}
        if cfg.save_video:
            writer = VideoWriter(os.path.join(
                cfg.save_dir, f"video_{video_id}.mp4"))
        first = dataset.coco.load_img(infos[0]["id"])
        probe = cv2.imread(os.path.join(dataset.img_dir, first["file_name"]))
        if probe is not None:
            detector.img_height, detector.img_width = probe.shape[:2]

        if batch_rig:
            from itertools import groupby

            cls_default = 1
            for fid, group in groupby(infos, key=lambda ii: ii["frame_id"]):
                group = list(group)
                imgs, g_metas, kept = [], [], []
                for info in group:
                    image = cv2.imread(
                        os.path.join(dataset.img_dir, info["file_name"]))
                    if image is None:
                        continue
                    g_metas.append({"calib": info["calib"]}
                                   if "calib" in info else {})
                    imgs.append(image)
                    kept.append(info)
                    n_frames += 1
                    if writer is not None:
                        frame_cache[info["id"]] = image
                if not imgs:
                    continue
                online_list = detector.run_multi(
                    imgs, g_metas, kept,
                    materialize=lambda online: (
                        tracks_to_results(online, cls_default), list(online)))
                for info, (res, online) in zip(kept, online_list):
                    results[info["id"]] = res
                    if writer is not None:
                        writer.write(plot_tracking(
                            frame_cache.pop(info["id"]), online,
                            frame_id=info["id"]))
            if writer is not None:
                writer.release()
                writer = None
            logger.write(f"video {video_id}: {len(infos)} frames done "
                         f"(batched rig)")
            continue

        pending_ids = []
        for info in infos:
            img_path = os.path.join(dataset.img_dir, info["file_name"])
            image = cv2.imread(img_path)
            if image is None:
                continue
            meta = {}
            if "calib" in info:
                meta["calib"] = info["calib"]
            if cfg.public_det and info["id"] in loaded_results:
                meta["cur_dets"] = loaded_results[info["id"]]
            n_frames += 1
            cls_default = 2 if cfg.dataset == "kitti_tracking" else 1
            if writer is not None:
                frame_cache[info["id"]] = image
            if runner is not None:
                pending_ids.append(info["id"])
                done = runner.submit(image, meta)
                if done is not None:
                    fid = pending_ids.pop(0)
                    results[fid] = tracks_to_results(done, cls_default)
                    if writer is not None:
                        writer.write(plot_tracking(
                            frame_cache.pop(fid), done, frame_id=fid))
            else:
                online = detector.run(image, meta, image_info=info)
                results[info["id"]] = tracks_to_results(online, cls_default)
                if writer is not None:
                    writer.write(plot_tracking(
                        frame_cache.pop(info["id"]), online,
                        frame_id=info["id"]))
        if runner is not None:
            cls_default = 2 if cfg.dataset == "kitti_tracking" else 1
            for done in runner.flush():
                fid = pending_ids.pop(0)
                results[fid] = tracks_to_results(done, cls_default)
                if writer is not None:
                    writer.write(plot_tracking(
                        frame_cache.pop(fid), done, frame_id=fid))
        if writer is not None:
            writer.release()
        logger.write(f"video {video_id}: {len(infos)} frames done")

    prof_ctx.__exit__(None, None, None)
    fps = n_frames / max(time.time() - t_start, 1e-6)
    logger.write(f"tracked {n_frames} frames at {fps:.2f} FPS")

    os.makedirs(cfg.save_dir, exist_ok=True)
    if cfg.save_results:
        with open(os.path.join(cfg.save_dir,
                               f"save_results_{cfg.dataset}.json"), "w") as f:
            json.dump({str(k): _jsonable(v) for k, v in results.items()}, f)
    eval_kw = {}
    if cfg.dataset == "mot":
        eval_kw["gt_dir"] = os.path.join(
            extras["data_dir"], _dataset_dirname(cfg), "train"
        )
    elif cfg.dataset == "kitti_tracking":
        eval_kw["gt_dir"] = os.path.join(
            extras["data_dir"], _dataset_dirname(cfg), "label_02"
        )
    metrics = dataset.run_eval(results, cfg.save_dir, **eval_kw)
    logger.close()
    return metrics


def _jsonable(items):
    out = []
    for it in items:
        out.append({k: (v.tolist() if isinstance(v, np.ndarray) else v)
                    for k, v in it.items()})
    return out


def _dataset_dirname(cfg):
    if cfg.dataset == "mot":
        year = int(cfg.dataset_version[:2]) if cfg.dataset_version else 17
        return f"mot{year}"
    return cfg.dataset


if __name__ == "__main__":
    main()
