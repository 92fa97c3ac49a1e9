"""Detection post-processing: output-grid -> original-image coordinates.

Mirror of ``/root/reference/src/lib/utils/post_process.py:29-134``
(``generic_post_process``): inverse-affine back-transform of centers/boxes,
alpha from the 2-bin rot head, 3-D location via unprojection.  Host-side
numpy over the K decoded detections.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from deft_tpu.inference.ddd import ddd2locrot, get_alpha
from deft_tpu.ops.affine import get_affine_transform, transform_preds_with_trans


def generic_post_process(dets: Dict[str, np.ndarray], centers, scales,
                         out_h: int, out_w: int, out_thresh: float,
                         calibs: Optional[List[np.ndarray]] = None
                         ) -> List[List[dict]]:
    """dets: batched decode outputs ([B, K, ...], numpy); centers/scales: the
    pre-process crop spec per image.  Returns per-image lists of detection
    dicts in original-image pixels, score-ordered, cut at ``out_thresh``.
    """
    if "scores" not in dets:
        return [[]]
    ret = []
    for i in range(len(dets["scores"])):
        preds = []
        trans = get_affine_transform(
            centers[i], scales[i], 0, (out_w, out_h), inv=True
        ).astype(np.float32)
        for j in range(len(dets["scores"][i])):
            if dets["scores"][i][j] < out_thresh:
                break
            item = {
                "score": float(dets["scores"][i][j]),
                "class": int(dets["clses"][i][j]) + 1,
                "ct": transform_preds_with_trans(
                    dets["cts"][i][j].reshape(1, 2), trans
                ).reshape(2),
            }
            if "tracking" in dets:
                tracking = transform_preds_with_trans(
                    (dets["tracking"][i][j] + dets["cts"][i][j]).reshape(1, 2),
                    trans,
                ).reshape(2)
                item["tracking"] = tracking - item["ct"]
            if "bboxes" in dets:
                item["bbox"] = transform_preds_with_trans(
                    dets["bboxes"][i][j].reshape(2, 2), trans
                ).reshape(4)
            if "dep" in dets and len(dets["dep"][i]) > j:
                item["dep"] = dets["dep"][i][j]
            if "dim" in dets and len(dets["dim"][i]) > j:
                item["dim"] = dets["dim"][i][j]
            if "rot" in dets and len(dets["rot"][i]) > j:
                item["alpha"] = float(get_alpha(dets["rot"][i][j: j + 1])[0])
            if ("rot" in dets and "dep" in dets and "dim" in dets
                    and len(dets["dep"][i]) > j and calibs is not None):
                if "amodel_offset" in dets and len(dets["amodel_offset"][i]) > j:
                    ct_output = dets["bboxes"][i][j].reshape(2, 2).mean(axis=0)
                    amodel_ct = ct_output + dets["amodel_offset"][i][j]
                    ct = transform_preds_with_trans(
                        amodel_ct.reshape(1, 2), trans
                    ).reshape(2).tolist()
                else:
                    bbox = item["bbox"]
                    ct = [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2]
                item["ct"] = ct
                dep = float(np.ravel(item["dep"])[0])
                item["loc"], item["rot_y"] = ddd2locrot(
                    ct, item["alpha"], item["dim"], dep, calibs[i]
                )
            preds.append(item)

        for extra in ("nuscenes_att", "velocity"):
            if extra in dets:
                for j in range(len(preds)):
                    preds[j][extra] = dets[extra][i][j]
        ret.append(preds)
    return ret
