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


def _class_palette(n: int) -> np.ndarray:
    """Deterministic per-class BGR palette (PASCAL-VOC bit-reversal map)."""
    out = np.zeros((n, 3), np.uint8)
    for i in range(n):
        c = i + 1
        r = g = b = 0
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        out[i] = (b, g, r)
    return out


class Debugger:
    """Named-image debug board (debugger.py:21-899 surface: themes,
    per-class heatmap colormaps, boxes, pose skeletons, track ids, arrows,
    blend/save)."""

    # COCO-17 skeleton (debugger.py:40-85): edges + left/right edge colors +
    # per-joint colors
    num_joints = 17
    edges = [
        [0, 1], [0, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 6], [5, 7],
        [7, 9], [6, 8], [8, 10], [5, 11], [6, 12], [11, 12], [11, 13],
        [13, 15], [12, 14], [14, 16],
    ]
    ec = [
        (255, 0, 0), (0, 0, 255), (255, 0, 0), (0, 0, 255), (255, 0, 0),
        (0, 0, 255), (255, 0, 255), (255, 0, 0), (255, 0, 0), (0, 0, 255),
        (0, 0, 255), (255, 0, 0), (0, 0, 255), (255, 0, 255), (255, 0, 0),
        (255, 0, 0), (0, 0, 255), (0, 0, 255),
    ]
    colors_hp = [(128, 0, 128)] + [(128, 0, 0), (0, 0, 128)] * 8

    def __init__(self, cfg=None, dataset=None, theme: Optional[str] = None):
        self.imgs: Dict[str, np.ndarray] = {}
        self.cfg = cfg
        self.theme = theme or getattr(cfg, "debugger_theme", "white")
        self.class_names = list(getattr(dataset, "class_name", []) or [])
        self.down_ratio = getattr(cfg, "down_ratio", 4)
        n = max(len(self.class_names), 80)
        self._palette = _class_palette(n)
        self.track_color: Dict[int, tuple] = {}

    def clear(self):
        self.imgs = {}

    def _class_color(self, cat: int):
        c = self._palette[int(cat) % len(self._palette)].astype(np.float32)
        if self.theme == "white":
            # dark-on-light: invert and cap brightness (debugger.py:35-37)
            c = np.clip(255.0 - c, 0.0, 0.6 * 255.0)
        return tuple(int(v) for v in c)

    def add_img(self, img, img_id="default"):
        self.imgs[img_id] = np.ascontiguousarray(img.copy())

    def add_blend_img(self, back, fore, img_id="blend", trans=0.7):
        """Blend a colored foreground (e.g. gen_colormap output) over an
        image; single-channel float foregrounds get the legacy JET blend."""
        import cv2

        back = np.ascontiguousarray(back)
        if fore.ndim == 3 and fore.dtype == np.uint8:
            if fore.shape[:2] != back.shape[:2]:
                fore = cv2.resize(fore, (back.shape[1], back.shape[0]))
            out = back.astype(np.float32) * (1.0 - trans) + \
                fore.astype(np.float32) * trans
            self.imgs[img_id] = np.clip(out, 0, 255).astype(np.uint8)
        else:
            self.imgs[img_id] = blend_heatmap(back, fore, alpha=trans)

    # ---- per-class heatmap colormaps (debugger.py:133-171; NHWC here) -----

    def _gen_colormap(self, hm: np.ndarray, colors: np.ndarray, output_res):
        import cv2

        hm = hm.copy().astype(np.float32)
        hm[hm == 1] = 0.5                   # ignore regions (debugger.py:136)
        h, w, c = hm.shape
        if output_res is None:
            output_res = (h * self.down_ratio, w * self.down_ratio)
        colors = colors.reshape(-1, 3)[:c].reshape(1, 1, c, 3).astype(
            np.float32
        )
        cm = (hm[..., None] * colors).max(axis=2).astype(np.uint8)
        return cv2.resize(cm, (output_res[1], output_res[0]))

    def gen_colormap(self, hm: np.ndarray, output_res=None) -> np.ndarray:
        """[h, w, C] class heatmap -> colored uint8 map, one color per
        class (debugger.py:133-152)."""
        colors = np.array([self._class_color(i) for i in range(hm.shape[-1])],
                          np.float32)
        return self._gen_colormap(hm, colors, output_res)

    def gen_colormap_hp(self, hm: np.ndarray, output_res=None) -> np.ndarray:
        """[h, w, J] keypoint heatmap -> per-joint colored map
        (debugger.py:154-171)."""
        colors = np.array(self.colors_hp, np.float32)
        if self.theme == "white":
            colors = 255.0 - colors
        return self._gen_colormap(hm, colors, output_res)

    # ---- overlays ----------------------------------------------------------

    def add_coco_bbox(self, bbox, cat, conf=1.0, img_id="default"):
        import cv2

        b = np.asarray(bbox, int)
        color = self._class_color(int(cat))
        cv2.rectangle(self.imgs[img_id], (b[0], b[1]), (b[2], b[3]), color, 2)
        name = (self.class_names[int(cat)] if int(cat) < len(self.class_names)
                else str(int(cat)))
        cv2.putText(self.imgs[img_id], f"{name} {conf:.2f}",
                    (b[0], max(b[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    color, 1, cv2.LINE_AA)

    def add_tracking_id(self, ct, tracking_id, img_id="default"):
        """Track-id label at the object center (debugger.py:264-277)."""
        import cv2

        cv2.putText(self.imgs[img_id], f"{int(tracking_id)}",
                    (int(ct[0]), int(ct[1])), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (255, 0, 255), 1, cv2.LINE_AA)

    def add_coco_hp(self, points, tracking_id=0, img_id="default"):
        """COCO-17 pose skeleton overlay (debugger.py:278-310): per-joint
        dots + left/right colored limb edges, clipped to the image."""
        import cv2

        pts = np.asarray(points, np.int32).reshape(self.num_joints, 2)
        img = self.imgs[img_id]
        h, w = img.shape[:2]
        for j in range(self.num_joints):
            if 0 <= pts[j, 0] < w and 0 <= pts[j, 1] < h:
                cv2.circle(img, (pts[j, 0], pts[j, 1]), 3,
                           self.colors_hp[j], -1)
        for j, e in enumerate(self.edges):
            if (pts[e].min() > 0 and pts[e, 0].max() < w
                    and pts[e, 1].max() < h):
                cv2.line(img, tuple(pts[e[0]]), tuple(pts[e[1]]),
                         self.ec[j], 2, lineType=cv2.LINE_AA)

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
