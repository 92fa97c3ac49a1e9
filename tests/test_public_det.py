"""Public-detection mode: external dets replace model dets, embeddings are
sampled at the PUBLIC boxes' centers (reference detector.py:193-198 +
utils/tracker.py:776-831), and track IDs persist across frames."""

import numpy as np
import pytest

from deft_tpu.config import mot_config


H, W = 270, 480          # original frame dims
INP_H, INP_W = 128, 160  # model input dims (small test config)


def gt_boxes(t):
    """Two well-separated slow movers, tlbr in original pixels."""
    return [
        np.array([30 + 2 * t, 40, 80 + 2 * t, 140], np.float64),
        np.array([330 - 2 * t, 120, 390 - 2 * t, 230], np.float64),
    ]


def make_frame(t):
    img = np.full((H, W, 3), 40, np.uint8)
    for box, color in zip(gt_boxes(t), ((200, 60, 60), (60, 200, 200))):
        x1, y1, x2, y2 = box.astype(int)
        img[y1:y2, x1:x2] = color
    return img


def cur_dets(t):
    return [{"bbox": b.tolist(), "score": 0.9, "class": 1,
             "ct": [(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]}
            for b in gt_boxes(t)]


@pytest.fixture(scope="module")
def public_detector():
    from deft_tpu.inference.detector import Detector

    cfg = mot_config(input_h=INP_H, input_w=INP_W, dla_node="conv",
                     track_thresh=1e-3, compute_dtype="float32",
                     public_det=True)
    det = Detector(cfg)
    det.img_height, det.img_width = H, W
    return det


def test_public_det_centers_mapping():
    """Centers must be sampled where the features are (warped input frame);
    parity mode reproduces the reference's original-dims normalization."""
    from deft_tpu.inference.detector import Detector, public_det_centers

    cfg = mot_config(input_h=INP_H, input_w=INP_W, dla_node="conv")
    det = Detector.__new__(Detector)  # only need pre_process helpers
    det.cfg = cfg
    det.rest_focal_length = 1000.0
    _, meta = Detector.pre_process(det, make_frame(0))

    dets = [{"bbox": [W / 2 - 10, H / 2 - 10, W / 2 + 10, H / 2 + 10]},
            {"bbox": [350, 190, 370, 210]}]
    centers, n = public_det_centers(dets, meta, 100, embed_parity=False)
    assert n == 2
    # the image center maps to the input-frame center -> normalized (0, 0)
    np.testing.assert_allclose(centers[0], [0.0, 0.0], atol=1e-2)
    # fix_res: s = max(H, W) = 480 square centered at (240, 135) mapped with
    # the UNIFORM scale INP_W / s (CenterNet affine); x spans the full width
    cx, cy = 360.0, 200.0
    scale = INP_W / 480.0
    exp_x = 2 * cx / W - 1
    exp_y = 2 * ((cy - H / 2) * scale + INP_H / 2) / INP_H - 1
    np.testing.assert_allclose(centers[1], [exp_x, exp_y], atol=1e-2)
    assert np.all(centers[2:] == 0)

    # parity mode: normalized by ORIGINAL dims (tracker.py:818)
    centers_p, _ = public_det_centers(dets, meta, 100, embed_parity=True)
    np.testing.assert_allclose(
        centers_p[1], [2 * cx / W - 1, 2 * cy / H - 1], atol=1e-6
    )
    # x agrees between modes for this geometry; y deliberately differs
    assert abs(centers_p[1][0] - centers[1][0]) < 1e-2
    assert abs(centers_p[1][1] - centers[1][1]) > 0.1


@pytest.mark.slow
def test_public_det_ids_persist_runner(public_detector):
    """Public dets differ from (untrained) model dets; IDs must persist."""
    from deft_tpu.inference.runner import PipelinedRunner

    runner = PipelinedRunner(public_detector, depth=2)
    n_frames = 6

    def snap(fr):
        # STrack objects are live/mutable: snapshot state at collection time
        return sorted((t.track_id, float(t.tlbr[0])) for t in fr)

    tracks = []
    for t in range(n_frames):
        done = runner.submit(make_frame(t), {"cur_dets": cur_dets(t)})
        if done is not None:
            tracks.append(snap(done))
    tracks.extend(snap(fr) for fr in runner.flush())

    assert len(tracks) == n_frames
    # exactly the two public detections become tracks each frame
    for fr in tracks:
        assert len(fr) == 2
    id_sets = [sorted(tid for tid, _ in fr) for fr in tracks]
    assert all(ids == id_sets[0] for ids in id_sets), id_sets
    # boxes come from the public file, not the model (KF smoothing allows a
    # few pixels of slack)
    for t, fr in enumerate(tracks):
        got = sorted(x1 for _, x1 in fr)
        exp = sorted(float(b[0]) for b in gt_boxes(t))
        np.testing.assert_allclose(got, exp, atol=6.0)
    # object identity follows geometry: the left mover keeps one id
    left_id = min(tracks[0], key=lambda p: p[1])[0]
    for fr in tracks:
        assert min(fr, key=lambda p: p[1])[0] == left_id


@pytest.mark.slow
def test_public_det_runner_equals_detector_run(public_detector):
    from deft_tpu.inference.detector import Detector
    from deft_tpu.inference.runner import PipelinedRunner

    frames = [make_frame(t) for t in range(5)]
    metas = [{"cur_dets": cur_dets(t)} for t in range(5)]

    runner = PipelinedRunner(public_detector, depth=2)
    out_runner = runner.track_sequence(frames, metas)

    det2 = Detector(public_detector.cfg, model=public_detector.model,
                    variables=public_detector.variables)
    det2.img_height, det2.img_width = H, W
    det2.reset_tracking()
    out_direct = [det2.run(f, m) for f, m in zip(frames, metas)]

    def canonical(per_frame):
        """Remap raw ids to first-appearance order (the two paths use
        different IdAllocator states)."""
        remap = {}
        out = []
        for fr in per_frame:
            row = []
            for t in sorted(fr, key=lambda t: t.tlbr[0]):
                remap.setdefault(t.track_id, len(remap))
                row.append(remap[t.track_id])
            out.append(row)
        return out

    assert canonical(out_runner) == canonical(out_direct)


@pytest.mark.slow
def test_embed_parity_mode(public_detector):
    """--embed_parity reproduces the reference's original-dims center
    normalization (tracker.py:818) inside the fused detect program: the
    embeddings must equal extract() at host-computed parity centers, and
    differ from the default input-frame sampling when the warp crops."""
    import jax.numpy as jnp

    from deft_tpu.ops.affine import get_affine_transform

    det = public_detector
    model, variables = det.model, det.variables
    frame = make_frame(0)
    images, meta = det.pre_process(frame)

    inv = get_affine_transform(
        meta["c"], meta["s"], 0,
        [meta["inp_width"], meta["inp_height"]], inv=True,
    ).astype(np.float32)
    ptf = np.concatenate([inv.reshape(-1),
                          [meta["width"], meta["height"]]]).astype(np.float32)

    dets_p, emb_p = model.apply(variables, jnp.asarray(images), k=16,
                                parity_tf=jnp.asarray(ptf), method="detect")
    dets_d, emb_d = model.apply(variables, jnp.asarray(images), k=16,
                                method="detect")

    # decoded boxes identical; embeddings differ because H/W aspect != crop
    np.testing.assert_allclose(np.asarray(dets_p["bboxes"]),
                               np.asarray(dets_d["bboxes"]), atol=1e-5)
    assert not np.allclose(np.asarray(emb_p), np.asarray(emb_d), atol=1e-4)

    # the parity centers, computed on host, give the same embeddings
    bb = np.asarray(dets_p["bboxes"][0])
    cts_in = np.stack([(bb[:, 0] + bb[:, 2]) / 2, (bb[:, 1] + bb[:, 3]) / 2],
                      axis=-1) * 4.0                      # input pixels
    ones = np.ones((len(cts_in), 1), np.float32)
    orig = np.concatenate([cts_in, ones], 1) @ inv.T      # original pixels
    centers = np.stack([2 * orig[:, 0] / meta["width"] - 1,
                        2 * orig[:, 1] / meta["height"] - 1], -1)
    emb_ref = model.apply(variables, jnp.asarray(images),
                          jnp.asarray(centers[None].astype(np.float32)),
                          method="embed_image")
    np.testing.assert_allclose(np.asarray(emb_p), np.asarray(emb_ref),
                               rtol=1e-4, atol=1e-5)
