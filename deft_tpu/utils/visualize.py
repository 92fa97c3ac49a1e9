"""Visual debugging board.

Compact rebuild of ``/root/reference/src/lib/utils/debugger.py`` (899 LoC of
cv2 drawing): heatmap colormap blending, detection/track overlays with stable
per-id colors, 3-D box projection and bird's-eye-view panels, and the
per-frame tracking plots ``test.py`` writes to overlay videos
(``plot_tracking`` / ``plot_tracking_ddd``, image.py:422-526).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def get_color(idx: int):
    """Stable id -> BGR color (image.py:415-419)."""
    idx = int(idx) * 3
    return ((37 * idx) % 255, (17 * idx) % 255, (29 * idx) % 255)


def blend_heatmap(img: np.ndarray, hm: np.ndarray, alpha: float = 0.5):
    """Overlay a [h, w] or [h, w, C] heatmap on a uint8 image."""
    import cv2

    if hm.ndim == 3:
        hm = hm.max(axis=-1)
    hm8 = np.clip(hm * 255, 0, 255).astype(np.uint8)
    hm8 = cv2.resize(hm8, (img.shape[1], img.shape[0]))
    color = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)
    return cv2.addWeighted(img, 1 - alpha, color, alpha, 0)


def draw_detections(img: np.ndarray, dets: List[dict], thresh: float = 0.3,
                    class_names=None):
    import cv2

    out = img.copy()
    for d in dets:
        if d.get("score", 1.0) < thresh:
            continue
        b = np.asarray(d["bbox"], int)
        cls = int(d.get("class", 1))
        color = get_color(cls)
        cv2.rectangle(out, (b[0], b[1]), (b[2], b[3]), color, 2)
        label = (f"{class_names[cls - 1]}" if class_names else f"c{cls}")
        cv2.putText(out, f"{label} {d.get('score', 0):.2f}",
                    (b[0], max(b[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.4, color, 1, cv2.LINE_AA)
    return out


def plot_tracking(img: np.ndarray, tracks, frame_id: int = 0,
                  fps: float = 0.0, show_ids: bool = True):
    """Per-frame track overlay (image.py:422-470 equivalent).

    ``tracks``: iterable with .tlwh / .track_id (STrack) or dicts with
    'bbox' (tlbr) + 'tracking_id'.
    """
    import cv2

    out = np.ascontiguousarray(img.copy())
    cv2.putText(out, f"frame {frame_id} fps {fps:.1f} n {len(tracks)}",
                (4, 14), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 255), 1)
    for t in tracks:
        if hasattr(t, "tlwh"):
            x, y, w, h = t.tlwh
            tid = t.track_id
        else:
            bx = t["bbox"]
            x, y, w, h = bx[0], bx[1], bx[2] - bx[0], bx[3] - bx[1]
            tid = t.get("tracking_id", 0)
        color = get_color(tid)
        p1 = (int(x), int(y))
        p2 = (int(x + w), int(y + h))
        cv2.rectangle(out, p1, p2, color, 2)
        if show_ids:
            cv2.putText(out, str(int(tid)), (p1[0], max(p1[1] - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2, cv2.LINE_AA)
    return out


def draw_box_3d(img: np.ndarray, corners_2d: np.ndarray, color=(0, 255, 0)):
    """Project-drawn 3-D box (ddd_utils.py:71-117): corners_2d [8, 2]."""
    import cv2

    c = corners_2d.astype(int)
    face_idx = [[0, 1, 5, 4], [1, 2, 6, 5], [3, 0, 4, 7], [2, 3, 7, 6]]
    out = img
    for ind, face in enumerate(face_idx):
        for j in range(4):
            p0, p1 = c[face[j]], c[face[(j + 1) % 4]]
            cv2.line(out, tuple(p0), tuple(p1), color,
                     2 if ind == 0 else 1, cv2.LINE_AA)
    return out


def plot_tracking_ddd(img: np.ndarray, tracks, calib: np.ndarray,
                      frame_id: int = 0):
    """3-D track overlay: projected boxes colored by id (image.py:473-526)."""
    from deft_tpu.inference.ddd import compute_box_3d, project_to_image

    out = np.ascontiguousarray(img.copy())
    for t in tracks:
        box = getattr(t, "org_ddd_box", None)
        if box is None:
            continue
        box = np.asarray(box, np.float64)   # [h, w, l, x, y, z, rot]
        corners = compute_box_3d(box[:3], box[3:6], box[6])
        pts = project_to_image(corners.astype(np.float32), calib)
        draw_box_3d(out, pts, get_color(t.track_id))
    return out


def bird_eye_view(tracks, size: int = 384, max_range: float = 60.0):
    """BEV panel of 3-D tracks (debugger's bird-view board)."""
    import cv2

    canvas = np.full((size, size, 3), 230, np.uint8)
    cv2.line(canvas, (size // 2, size), (size // 2, 0), (180, 180, 180), 1)
    for t in tracks:
        box = getattr(t, "org_ddd_box", None) or getattr(t, "ddd_bbox", None)
        if box is None:
            continue
        box = np.asarray(box, np.float64)
        x, z = box[3], box[5]
        px = int(size / 2 + x / max_range * size / 2)
        pz = int(size - z / max_range * size)
        if 0 <= px < size and 0 <= pz < size:
            cv2.circle(canvas, (px, pz), 4, get_color(t.track_id), -1)
    return canvas


class VideoWriter:
    """Overlay video sink (test.py:200-292 cv2.VideoWriter usage)."""

    def __init__(self, path: str, fps: int = 10):
        self.path = path
        self.fps = fps
        self._writer = None

    def write(self, frame: np.ndarray):
        import cv2

        if self._writer is None:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps,
                (frame.shape[1], frame.shape[0]),
            )
        self._writer.write(frame)

    def release(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None


class Debugger:
    """Named-image board with save-all (debugger.py:21-899 core surface)."""

    def __init__(self, cfg=None, dataset=None, theme: str = "white"):
        self.imgs: Dict[str, np.ndarray] = {}
        self.theme = theme
        self.class_names = list(getattr(dataset, "class_name", []) or [])

    def clear(self):
        self.imgs = {}

    def add_img(self, img, img_id="default"):
        self.imgs[img_id] = np.ascontiguousarray(img.copy())

    def add_blend_img(self, back, fore, img_id="blend", trans=0.7):
        self.imgs[img_id] = blend_heatmap(
            np.ascontiguousarray(back), fore, alpha=1 - trans
        )

    def add_coco_bbox(self, bbox, cat, conf=1.0, img_id="default"):
        import cv2

        b = np.asarray(bbox, int)
        color = get_color(int(cat) + 1)
        cv2.rectangle(self.imgs[img_id], (b[0], b[1]), (b[2], b[3]), color, 2)
        name = (self.class_names[int(cat)] if int(cat) < len(self.class_names)
                else str(int(cat)))
        cv2.putText(self.imgs[img_id], f"{name} {conf:.2f}",
                    (b[0], max(b[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    color, 1, cv2.LINE_AA)

    def add_arrow(self, start, end, img_id="default"):
        import cv2

        cv2.arrowedLine(
            self.imgs[img_id], tuple(int(v) for v in start),
            tuple(int(v) for v in end), (255, 0, 255), 2,
        )

    def save_all_imgs(self, path, prefix=""):
        import cv2

        os.makedirs(path, exist_ok=True)
        for name, img in self.imgs.items():
            cv2.imwrite(os.path.join(path, f"{prefix}{name}.png"), img)
