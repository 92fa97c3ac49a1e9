"""Per-frame inference runtime.

Rebuild of ``/root/reference/src/lib/detector.py`` around ONE jitted device
program per frame: forward -> sigmoid -> decode(top-K) -> embedding gather
(the reference makes >= 3 separate GPU round trips per frame,
detector.py:530-551 + tracker.py:776-831 + the per-buffered-frame similarity
loop; see SURVEY.md §3.2).  The second and last device call each frame is the
batched ring-buffer similarity inside the tracker's recorder.

Host keeps: preprocessing (affine warp via cv2), inverse-affine
post-processing, thresholding/NMS, the association cascade, and writers.

Note on embedding sampling: the reference samples AFE embeddings at
detection centers normalized by the ORIGINAL image dims while the feature
maps live in the warped INPUT frame (tracker.py:818, test.py:163-164) -- a
close approximation under fix_res crops.  We sample at the decoded centers in
the input frame (exactly where the features are), which is the same thing up
to the crop's aspect mismatch.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from deft_tpu.config import Config
from deft_tpu.data.datasets import (
    NUSCENES_TRACKING_CLASSES,
    get_dataset_info,
)
from deft_tpu.inference.ddd import nms_greedy
from deft_tpu.inference.geometry import Quaternion, camera_box_to_global
from deft_tpu.inference.post_process import generic_post_process
from deft_tpu.models.afe import selector_out_channels
from deft_tpu.ops.affine import get_affine_transform
from deft_tpu.tracking.basetrack import IdAllocator
from deft_tpu.tracking.motion_lstm import LSTMMotion
from deft_tpu.tracking.tracker import Tracker
from deft_tpu.utils.timer import StageTimers

MEAN = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
STD = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)


def public_det_centers(cur_dets, meta, max_object: int,
                       embed_parity: bool = False):
    """Normalized AFE sample centers for externally-provided detections.

    The --public_det path (reference detector.py:193-198) discards model
    detections and extracts embeddings at the PUBLIC boxes' centers
    (utils/tracker.py:776-831 via convert_detection, image.py:391-412).

    Default mode maps the original-pixel box centers through the input
    affine warp and normalizes by the INPUT dims (sampling exactly where the
    feature maps live).  ``embed_parity`` reproduces the reference's
    normalization by the ORIGINAL image dims instead (tracker.py:818).

    Returns ([max_object, 2] float32 centers in [-1, 1], n valid).
    """
    n = min(len(cur_dets), max_object)
    centers = np.zeros((max_object, 2), np.float32)
    for i in range(n):
        b = np.asarray(cur_dets[i]["bbox"], np.float64)
        cx, cy = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
        if embed_parity:
            centers[i] = (2.0 * cx / meta["width"] - 1.0,
                          2.0 * cy / meta["height"] - 1.0)
        else:
            pt = meta["trans_input"] @ np.array([cx, cy, 1.0])
            centers[i] = (2.0 * pt[0] / meta["inp_width"] - 1.0,
                          2.0 * pt[1] / meta["inp_height"] - 1.0)
    return centers, n


class Detector:
    def __init__(self, cfg: Config, model=None, variables=None,
                 motion: Optional[LSTMMotion] = None):
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.dataset = cfg.dataset
        self.info = get_dataset_info(cfg.test_dataset or cfg.dataset)
        self.rest_focal_length = (
            self.info.focal_length if cfg.test_focal_length < 0
            else cfg.test_focal_length
        )
        self.embed_dim = int(sum(selector_out_channels(cfg.dataset)))

        if model is None:
            from deft_tpu.models import create_model, init_model

            model = create_model(cfg.arch, cfg)
            if variables is None:
                if cfg.load_model:
                    from deft_tpu.train.checkpoint import load_checkpoint

                    variables = load_checkpoint(cfg.load_model, model, cfg)
                else:
                    params, bstats = init_model(model, cfg)
                    variables = {"params": params, "batch_stats": bstats}
        self.model = model
        self.variables = variables
        self.motion = motion
        if cfg.lstm and motion is None:
            self.motion = LSTMMotion(cfg.dataset)
            if cfg.load_model_traj:
                from deft_tpu.train.checkpoint import load_motion_checkpoint

                self.motion.variables = load_motion_checkpoint(
                    cfg.load_model_traj, self.motion
                )

        self._jax = jax
        self._jnp = jnp
        self._detect = jax.jit(
            lambda v, img, ptf: model.apply(v, img, k=cfg.K,
                                            flip_test=cfg.flip_test,
                                            parity_tf=ptf, method="detect")
        )
        self._winsim = jax.jit(
            lambda v, w, c, e, n: model.apply(v, w, c, e, n,
                                              method="window_similarity")
        )
        self._embed = jax.jit(
            lambda v, img, c: model.apply(v, img, c, method="embed_image")
        )
        self.ids = IdAllocator()
        self.img_height = 100
        self.img_width = 100
        self.debugger = None
        self._debug_cnt = 0
        self._pre_image_ori = None
        if cfg.debug >= 2:
            # raw sigmoided heatmap for the pred_hm board (the fused detect
            # program only ships decoded top-K; debug mode pays one extra
            # forward, mirroring detector.py:175-184)
            self._debug_hm = jax.jit(
                lambda v, img: jax.nn.sigmoid(model.apply(v, img)[0]["hm"])
            )
        self.timers = StageTimers(
            ["load", "pre", "net", "post", "merge", "track", "tot"]
        )
        self.reset_tracking()

    # ---- lifecycle -----------------------------------------------------------

    def _make_tracker(self) -> Tracker:
        return Tracker(
            self.dataset, self.cfg.max_object, self.embed_dim,
            similarity_fn=lambda w, c, e, n: self._winsim(
                self.variables, w, c, e, n
            ),
            use_lstm=self.cfg.lstm, motion=self.motion, ids=self.ids,
            track_buffer=self.cfg.track_buffer,
        )

    def reset_tracking(self):
        """Fresh trackers for a new sequence (detector.py:677-689)."""
        if self.dataset == "nuscenes":
            self.tracker = {c: self._make_tracker()
                            for c in NUSCENES_TRACKING_CLASSES}
        else:
            self.tracker = self._make_tracker()

    # ---- preprocessing (detector.py:346-422) ---------------------------------

    def _transform_scale(self, image, scale=1.0):
        import cv2

        height, width = image.shape[:2]
        new_height = int(height * scale)
        new_width = int(width * scale)
        if self.cfg.fix_short > 0:
            if height < width:
                inp_h = self.cfg.fix_short
                inp_w = (int(width / height * inp_h) + 63) // 64 * 64
            else:
                inp_w = self.cfg.fix_short
                inp_h = (int(height / width * inp_w) + 63) // 64 * 64
            c = np.array([width / 2, height / 2], np.float32)
            s = np.array([width, height], np.float32)
        elif not self.cfg.keep_res:  # fix_res
            inp_h, inp_w = self.cfg.input_h, self.cfg.input_w
            c = np.array([new_width / 2.0, new_height / 2.0], np.float32)
            s = max(height, width) * 1.0
        else:
            inp_h = (new_height | self.cfg.pad) + 1
            inp_w = (new_width | self.cfg.pad) + 1
            c = np.array([new_width // 2, new_height // 2], np.float32)
            s = np.array([inp_w, inp_h], np.float32)
        if new_width == width and new_height == height:
            resized = image
        else:
            resized = cv2.resize(image, (new_width, new_height))
        return resized, c, s, inp_w, inp_h, height, width

    def _default_calib(self, width, height):
        return np.array(
            [[self.rest_focal_length, 0, width / 2, 0],
             [0, self.rest_focal_length, height / 2, 0],
             [0, 0, 1, 0]], np.float32,
        )

    def pre_process(self, image, scale=1.0, input_meta=None):
        import cv2

        input_meta = input_meta or {}
        resized, c, s, inp_w, inp_h, height, width = self._transform_scale(
            image, scale
        )
        trans_input = get_affine_transform(c, s, 0, [inp_w, inp_h])
        out_h, out_w = inp_h // self.cfg.down_ratio, inp_w // self.cfg.down_ratio
        inp = cv2.warpAffine(resized, trans_input, (inp_w, inp_h),
                             flags=cv2.INTER_LINEAR)
        inp = ((inp.astype(np.float32) / 255.0 - MEAN) / STD)
        images = inp[None]  # [1, H, W, 3]
        meta = {
            "calib": np.array(input_meta["calib"], np.float32)
            if "calib" in input_meta else self._default_calib(width, height),
            "c": c, "s": s, "height": height, "width": width,
            "out_height": out_h, "out_width": out_w,
            "inp_height": inp_h, "inp_width": inp_w,
            "trans_input": trans_input,
        }
        for k in ("pre_dets", "cur_dets"):
            if k in input_meta:
                meta[k] = input_meta[k]
        return images, meta

    # ---- the per-frame program -----------------------------------------------

    def process(self, images: np.ndarray, meta: Optional[dict] = None):
        """Device step: returns (dets dict of np arrays, embeddings np)."""
        jnp = self._jnp
        ptf = None
        if self.cfg.embed_parity and meta is not None:
            ptf = np.concatenate([
                np.asarray(get_affine_transform(
                    meta["c"], meta["s"], 0,
                    [meta["inp_width"], meta["inp_height"]], inv=True,
                ), np.float32).reshape(-1),
                np.asarray([meta["width"], meta["height"]], np.float32),
            ])
        dets, emb = self._detect(self.variables, jnp.asarray(images), ptf)
        dets = {k: np.asarray(v) for k, v in dets.items()}
        return dets, np.asarray(emb)

    def post_process(self, dets, meta):
        return generic_post_process(
            dets, [meta["c"]], [meta["s"]], meta["out_height"],
            meta["out_width"], self.cfg.out_thresh, [meta["calib"]],
        )[0]

    def run(self, image_or_path, meta=None, image_info=None):
        """Full frame step -> list of online tracks (detector.py:112-344)."""
        import cv2

        t0 = time.time()
        meta = meta or {}
        if isinstance(image_or_path, str):
            image = cv2.imread(image_or_path)
        elif isinstance(image_or_path, dict):
            # prefetched: {"images": [1,H,W,3], "meta": {...}}
            image = None
            images = image_or_path["images"]
            meta = image_or_path["meta"]
        else:
            image = image_or_path
        self.timers.add("load", time.time() - t0)

        t1 = time.time()
        if image is not None:
            images, meta = self.pre_process(image, 1.0, meta)
        self.timers.add("pre", time.time() - t1)

        if self.cfg.public_det and "cur_dets" in meta:
            # public-detection mode: the model's detections are discarded;
            # embeddings are sampled at the PUBLIC boxes' centers
            # (detector.py:193-198 + utils/tracker.py:776-831)
            t2 = time.time()
            results = list(meta["cur_dets"])[: self.cfg.max_object]
            centers, n = public_det_centers(
                results, meta, self.cfg.max_object, self.cfg.embed_parity
            )
            emb = np.asarray(self._embed(
                self.variables, self._jnp.asarray(images),
                self._jnp.asarray(centers[None]),
            ))[0][:n]
            self.timers.add("net", time.time() - t2)
            t4 = time.time()
            online = self.tracker.update(results, emb)
            self.timers.add("track", time.time() - t4)
            self.timers.add("tot", time.time() - t0)
            return online

        t2 = time.time()
        dets, emb = self.process(images, meta)
        self.timers.add("net", time.time() - t2)

        t3 = time.time()
        results = self.post_process(dets, meta)
        emb = emb[0][: len(results)]
        self.timers.add("post", time.time() - t3)

        t4 = time.time()

        if self.dataset == "nuscenes":
            online = self._update_nuscenes(results, emb, image_info)
        elif self.dataset == "kitti_tracking":
            keep = [i for i, d in enumerate(results) if d["class"] == 2]
            online = self.tracker.update(
                [results[i] for i in keep], emb[keep] if keep else emb[:0]
            )
        else:
            online = self.tracker.update(results, emb)
        self.timers.add("track", time.time() - t4)
        if self.cfg.debug >= 1:
            self.show_debug(image, images, results, online)
        self.timers.add("tot", time.time() - t0)
        return online

    def run_multi(self, images_or_paths, metas=None, image_infos=None,
                  materialize=None):
        """Batched multi-camera step: run N same-shape frames (the nuScenes
        6-sensor rig of one sample, nuscenes.py:26-59 / SURVEY §5) through
        ONE device program, then the host branch per camera in order.

        Semantically identical to N sequential ``run`` calls -- the
        detect+embed program is batched over the camera axis (one dispatch,
        one MXU-friendly [6, H, W, 3] batch) while tracker updates stay
        ordered.  Returns the list of per-camera online-track lists.

        ``materialize``: optional fn applied to each camera's online list
        IMMEDIATELY after that camera's tracker update.  Track objects are
        live and mutated by later cameras' updates (exactly as they would be
        by later sequential ``run`` calls), so callers that serialize tracks
        must do it per camera through this hook, not after return.
        """
        import cv2

        n = len(images_or_paths)
        metas = metas or [{}] * n
        image_infos = image_infos or [None] * n
        batch, b_metas = [], []
        for img, meta in zip(images_or_paths, metas):
            if isinstance(img, str):
                img = cv2.imread(img)
            images, meta = self.pre_process(img, 1.0, dict(meta or {}))
            batch.append(images[0])
            b_metas.append(meta)
        t2 = time.time()
        dets, emb = self.process(np.stack(batch), b_metas[0])
        self.timers.add("net", time.time() - t2)

        online_per_cam = []
        for b in range(n):
            dets_b = {k: v[b: b + 1] for k, v in dets.items()}
            results = self.post_process(dets_b, b_metas[b])
            emb_b = emb[b][: len(results)]
            if self.dataset == "nuscenes":
                online = self._update_nuscenes(results, emb_b, image_infos[b])
            else:
                online = self.tracker.update(results, emb_b)
            online_per_cam.append(materialize(online) if materialize
                                  else online)
        return online_per_cam

    # ---- --debug board (detector.py:585-668 semantics, headless save) -----

    def show_debug(self, image, images, results, online):
        """Build + save the debug board: 'generic' = detections, arrows and
        track ids on the frame; 'previous' = last frame; debug >= 2 adds the
        per-class 'pred_hm' blend (gen_colormap over the model heatmap)."""
        from deft_tpu.utils.visualize import Debugger

        if self.debugger is None:
            self.debugger = Debugger(self.cfg, self.info)
        dbg = self.debugger
        dbg.clear()
        if image is None:
            image = np.clip(
                (np.asarray(images)[0] * STD + MEAN) * 255.0, 0, 255
            ).astype(np.uint8)
        dbg.add_img(image, "generic")
        dbg.add_img(self._pre_image_ori if self._pre_image_ori is not None
                    else image, "previous")
        self._pre_image_ori = image
        for item in results:
            if item.get("score", 0.0) < self.cfg.vis_thresh:
                continue
            if "bbox" in item:
                dbg.add_coco_bbox(item["bbox"], item["class"] - 1,
                                  item.get("score", 0.0), img_id="generic")
            if "tracking" in item and "ct" in item:
                ct = np.asarray(item["ct"], np.float64)
                dbg.add_arrow(ct, ct + np.asarray(item["tracking"]),
                              img_id="generic")
            if "hps" in item:
                dbg.add_coco_hp(item["hps"], img_id="generic")
        for t in online:
            tl = t.tlwh
            dbg.add_tracking_id((tl[0] + tl[2] / 2, tl[1] + tl[3] / 2),
                                t.track_id, img_id="generic")
        if self.cfg.debug >= 2:
            hm = np.asarray(self._debug_hm(
                self.variables, self._jnp.asarray(images)))[0]
            warped = np.clip(
                (np.asarray(images)[0] * STD + MEAN) * 255.0, 0, 255
            ).astype(np.uint8)
            dbg.add_blend_img(warped, dbg.gen_colormap(hm), "pred_hm")
        self._debug_cnt += 1
        dbg.save_all_imgs(os.path.join(self.cfg.save_dir, "debug"),
                          prefix=f"{self._debug_cnt:05d}_")

    # ---- nuScenes per-class branch (detector.py:200-341) ---------------------

    def _update_nuscenes(self, results, emb, image_info):
        trans_matrix = np.array(image_info["trans_matrix"], np.float64)
        by_class: Dict[str, dict] = {
            c: {"dets": [], "emb": [], "ddd": [], "depth": [], "org": [],
                "sub": []}
            for c in NUSCENES_TRACKING_CLASSES
        }
        class_names = self.info.class_name
        for i, det in enumerate(results):
            cname = class_names[det["class"] - 1]
            if cname not in NUSCENES_TRACKING_CLASSES:
                continue
            if det["score"] < 0.3 or (cname == "pedestrian" and det["score"] < 0.35):
                continue
            size = [float(det["dim"][1]), float(det["dim"][2]),
                    float(det["dim"][0])]
            translation1 = trans_matrix @ np.array(
                [det["loc"][0], det["loc"][1] - size[2], det["loc"][2], 1],
                np.float64,
            )
            box = camera_box_to_global(
                det["loc"], size, det["rot_y"],
                image_info["cs_record_rot"], image_info["cs_record_trans"],
                image_info["pose_record_rot"], image_info["pose_record_trans"],
            )
            q = box.orientation
            rotation = [float(q.w), float(q.x), float(q.y), float(q.z)]
            angle = q.angle if q.axis[2] > 0 else -q.angle

            slot = by_class[cname]
            slot["dets"].append({"bbox": det["bbox"], "score": det["score"]})
            slot["emb"].append(emb[i])
            slot["ddd"].append([size[2], size[0], size[1],
                                box.center[0], box.center[1], box.center[2],
                                angle])
            slot["depth"].append([float(det["loc"][2])])
            slot["org"].append(
                [float(det["dim"][0]), float(det["dim"][1]), float(det["dim"][2])]
                + list(det["loc"]) + [det["rot_y"]]
            )
            slot["sub"].append(
                [float(translation1[0]), float(translation1[1]),
                 float(translation1[2])] + size + rotation
            )

        online = []
        for cname in NUSCENES_TRACKING_CLASSES:
            slot = by_class[cname]
            if slot["dets"] and self.cfg.nms:
                boxes = np.array([d["bbox"] for d in slot["dets"]])
                scores = np.array([d["score"] for d in slot["dets"]])
                ovr = 0.7 if cname in ("bus", "truck") else 0.8
                keep, _ = nms_greedy(boxes, scores, overlap=ovr)
                keep = sorted(set(keep.tolist()))
                for key in ("dets", "emb", "ddd", "depth", "org", "sub"):
                    slot[key] = [slot[key][i] for i in keep]
            embs = (np.stack(slot["emb"]) if slot["emb"]
                    else np.zeros((0, self.embed_dim), np.float32))
            online += self.tracker[cname].update(
                slot["dets"], embs,
                ddd_boxes=slot["ddd"], depths=slot["depth"],
                ddd_org_boxes=slot["org"], submission=slot["sub"],
                classe=cname,
            )
        return online
