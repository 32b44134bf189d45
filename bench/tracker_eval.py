"""Built-in tracker quality measurement on synthetic rendered head motion.

The reference outsources detection/tracking to OpenFace (C++ CE-CLM);
our built-in tracker is Haar re-detect + LK flow (io/decode.py,
native/loader.cpp). This script quantifies its accuracy envelope
(VERDICT round 2 next-step 9): clips are rendered with a procedural
face texture moving under known ground-truth boxes/eye positions, so
IoU and landmark error are exact.

Scenarios sweep translation speed, oscillating motion, and scale
change; trackers measured:
  * detect+lk / detect+hold — the full ``face_boxes`` pipeline
    (Haar re-detect every 8 frames, LK flow or hold-last in between);
  * lk-only / hold-only     — no detector, ground-truth init (isolates
    tracking drift from detection).

Also reports eye-landmark error for ``decode.eye_landmarks`` vs the
renderer's known eye centers. Results go to stdout as JSON lines; the
measured envelope is recorded in docs/SERVING.md.

    python bench/tracker_eval.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def render_face(size=64, rng=None):
    """Procedural face texture with Haar-detectable luminance structure
    (bright oval, dark eye pupils/brows/mouth, vertical shading)."""
    rng = rng or np.random.default_rng(0)
    s = size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    cy, cx = s / 2, s / 2
    img = np.zeros((s, s, 3), np.float32)
    face = (((yy - cy) / (0.50 * s)) ** 2
            + ((xx - cx) / (0.40 * s)) ** 2) < 1
    img[face] = (205, 170, 145)
    img *= (0.8 + 0.4 * (1 - ((yy - cy) / s) ** 2))[..., None]
    for ex in (cx - 0.17 * s, cx + 0.17 * s):
        eye = (((yy - (cy - 0.10 * s)) / (0.05 * s)) ** 2
               + ((xx - ex) / (0.09 * s)) ** 2) < 1
        img[eye] = (240, 240, 240)
        pup = (((yy - (cy - 0.10 * s)) / (0.03 * s)) ** 2
               + ((xx - ex) / (0.03 * s)) ** 2) < 1
        img[pup] = (35, 25, 25)
        brow = ((np.abs(yy - (cy - 0.20 * s)) < 0.02 * s)
                & (np.abs(xx - ex) < 0.10 * s))
        img[brow] = (70, 50, 45)
    mouth = (((yy - (cy + 0.24 * s)) / (0.04 * s)) ** 2
             + ((xx - cx) / (0.13 * s)) ** 2) < 1
    img[mouth] = (130, 70, 70)
    img += rng.normal(0, 3, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def render_clip(t=48, h=144, w=192, face_size=64, motion="translate",
                speed=1.0, seed=0):
    """-> (frames [T, H, W, 3] uint8, gt boxes [T, 4] (y, x, h, w),
    gt eyes [T, 2, 2] (y, x) source pixels)."""
    import cv2
    rng = np.random.default_rng(seed)
    face = render_face(face_size, rng)
    bg = np.clip(rng.normal(90, 25, (h, w, 3)), 0, 255).astype(np.uint8)
    bg = cv2.GaussianBlur(bg, (7, 7), 2)
    frames, boxes, eyes = [], [], []
    y0, x0 = h / 2 - face_size / 2, 8.0
    for i in range(t):
        fs = face_size
        if motion == "translate":
            yi, xi = y0, x0 + speed * i
        elif motion == "sine":
            yi = y0 + 12 * np.sin(i / 5.0)
            xi = x0 + speed * i
        elif motion == "scale":
            fs = int(round(face_size * (1.0 + 0.01 * speed * i)))
            fs = min(fs, min(h, w) - 4)   # keep the face inside the frame
            yi, xi = y0, x0 + i
        else:
            raise ValueError(motion)
        fimg = (face if fs == face_size
                else cv2.resize(face, (fs, fs),
                                interpolation=cv2.INTER_LINEAR))
        yi = min(max(0, int(round(yi))), h - fs)
        xi = min(max(0, int(round(xi))), w - fs)
        fr = bg.copy()
        fr[yi:yi + fs, xi:xi + fs] = fimg
        frames.append(fr)
        boxes.append([yi, xi, fs, fs])
        ey = yi + 0.40 * fs          # renderer: eyes at cy - 0.10*s
        eyes.append([[ey, xi + 0.33 * fs], [ey, xi + 0.67 * fs]])
    return (np.stack(frames), np.asarray(boxes, np.float32),
            np.asarray(eyes, np.float32))


def iou(a, b):
    ay, ax, ah, aw = a
    by, bx, bh, bw = b
    y0, x0 = max(ay, by), max(ax, bx)
    y1, x1 = min(ay + ah, by + bh), min(ax + aw, bx + bw)
    inter = max(0.0, y1 - y0) * max(0.0, x1 - x0)
    return float(inter / (ah * aw + bh * bw - inter))


def run_tracker(frames, gt, mode):
    """mode: detect+lk | detect+hold | lk-only | hold-only."""
    from mimamo_tpu.io import decode
    track = "hold" if mode.endswith("hold") or mode == "hold-only" \
        else "lk"
    tr = decode.BoxTracker(frames.shape[1], frames.shape[2], track=track)
    if mode in ("lk-only", "hold-only"):
        tr.det = None
        tr.last = gt[0].copy()       # ground-truth init
    return np.stack([tr.update(f) for f in frames])


def boxes_iou(boxes, gt_boxes):
    """Per-frame IoU of tracked boxes vs ground truth. The tracker
    squares + margin-expands detections (crop framing), so each frame
    scores against max(raw gt, margin-expanded gt)."""
    m = 0.25
    gt_exp = gt_boxes.copy()
    side = gt_boxes[:, 2] * (1 + m)
    gt_exp[:, 0] = gt_boxes[:, 0] - (side - gt_boxes[:, 2]) / 2
    gt_exp[:, 1] = gt_boxes[:, 1] - (side - gt_boxes[:, 3]) / 2
    gt_exp[:, 2] = gt_exp[:, 3] = side
    return np.asarray([max(iou(b, g), iou(b, ge))
                       for b, g, ge in zip(boxes, gt_boxes, gt_exp)])


def warp_err_px(tracked_eyes, gt_eyes, crop=112):
    """Alignment error IN OUTPUT-CROP PIXELS (round-4 VERDICT directive
    3: box-IoU does not measure what the model actually consumes).

    Both eye sets go through the production similarity fit
    (``preprocess.similarity_from_eyes``); each frame's error is the
    mean displacement, over the crop corners + center, between where
    the tracked warp samples the source and where the ground-truth warp
    would — mapped back into crop pixels through the inverse gt
    transform. 0 = the model sees exactly the gt-aligned face.
    """
    from mimamo_tpu import preprocess
    pt = preprocess.similarity_from_eyes(tracked_eyes, crop)
    pg = preprocess.similarity_from_eyes(gt_eyes, crop)
    pts = np.asarray([[0, 0], [0, crop - 1], [crop - 1, 0],
                      [crop - 1, crop - 1],
                      [(crop - 1) / 2, (crop - 1) / 2]], np.float64)
    homo = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)  # [P,3]
    errs = []
    for at, ag in zip(np.asarray(pt, np.float64),
                      np.asarray(pg, np.float64)):
        src = homo @ at.T                                   # [P, 2]
        # crop px under the gt warp that sample the same source pos
        inv = np.linalg.inv(np.vstack([ag, [0, 0, 1]]))[:2]
        back = np.concatenate([src, np.ones((len(src), 1))],
                              axis=1) @ inv.T
        errs.append(np.linalg.norm(back - pts, axis=1).mean())
    return float(np.mean(errs))


def run_eye_tracker(frames, boxes, gt_eyes, track):
    """Ground-truth-initialized eye tracking (detector disabled).

    The Haar EYE cascade never fires on the procedural face at any
    rendered size (verified 64–160 px: its trained features need real
    eyelid/gradient texture), so — exactly like the lk-only/hold-only
    box modes — the point-tracking policy is isolated from detection by
    initializing with the first frame's gt eyes. This is the honest
    measurable axis of round-4 VERDICT directive 3: what LK point flow
    buys BETWEEN detections; the detection-side sanity gate is
    unit-tested with mocked detections (tests/test_tracker.py).
    """
    from mimamo_tpu.io import decode
    tr = decode.EyeTracker(track=track)
    tr.det = None
    tr.last = gt_eyes[0].copy()
    return np.stack([tr.update(f, b) for f, b in zip(frames, boxes)])


def evaluate_eyes(frames, boxes, gt_eyes, track, crop=112):
    lm = run_eye_tracker(frames, boxes, gt_eyes, track)
    return {"mode": f"eyes-{track}-gtinit",
            "eye_err_px": round(float(np.abs(lm - gt_eyes).mean()), 2),
            "final_eye_err_px": round(
                float(np.abs(lm[-1] - gt_eyes[-1]).mean()), 2),
            "warp_err_croppx": round(
                warp_err_px(lm, gt_eyes, crop=crop), 2)}


def evaluate(frames, gt_boxes, gt_eyes, mode, eye_track="lk", crop=112):
    from mimamo_tpu.io import decode
    boxes = run_tracker(frames, gt_boxes, mode)
    ious = boxes_iou(boxes, gt_boxes)
    ctr_err = np.abs((boxes[:, :2] + boxes[:, 2:] / 2)
                     - (gt_boxes[:, :2] + gt_boxes[:, 2:] / 2))
    row = {"mode": mode,
           "mean_iou": round(float(ious.mean()), 3),
           "final_iou": round(float(ious[-1]), 3),
           "mean_center_err_px": round(float(ctr_err.mean()), 2)}
    if mode.startswith("detect"):
        lm = decode.eye_landmarks(frames, boxes, track=eye_track)
        row["eye_track"] = eye_track
        row["eye_err_px"] = round(
            float(np.abs(lm - gt_eyes).mean()), 2)
        row["warp_err_croppx"] = round(
            warp_err_px(lm, gt_eyes, crop=crop), 2)
    return row


def main() -> int:
    from mimamo_tpu.io import decode
    det = decode._haar_detector()
    eye_det = decode._eye_detector()
    print(json.dumps({"detector": type(det).__name__ if det else None,
                      "eye_detector":
                      type(eye_det).__name__ if eye_det else None}))
    scenarios = [("static", "translate", 0.0),
                 ("translate-1px", "translate", 1.0),
                 ("translate-2px", "translate", 2.0),
                 ("translate-4px", "translate", 4.0),
                 ("sine-2px", "sine", 2.0),
                 ("scale-0.5pct", "scale", 0.5)]
    for name, motion, speed in scenarios:
        frames, gt, gt_eyes = render_clip(motion=motion, speed=speed)
        for mode in ("detect+lk", "detect+hold", "lk-only", "hold-only"):
            if mode.startswith("detect") and det is None:
                continue
            row = evaluate(frames, gt, gt_eyes, mode)
            print(json.dumps({"scenario": name, **row}))
        # eye-policy A/B, gt-initialized (see run_eye_tracker): LK
        # point flow vs the old hold-last, on the detect+lk boxes
        boxes = run_tracker(frames, gt, "detect+lk") if det is not None \
            else gt
        for track in ("lk", "hold"):
            row = evaluate_eyes(frames, boxes, gt_eyes, track)
            print(json.dumps({"scenario": name, **row}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
