"""Host-side video decode and face-box provisioning.

Reference behavior: the reference's only native component is the external
OpenFace C++ binary doing detect/landmark/align/crop on the host, frame by
frame, writing image files (SURVEY.md §2 "OpenFace", §3.1). Porting that
C++ is explicitly out of scope (SURVEY.md §7 hard part 4); the TPU-native
contract is: the host decodes frames and supplies face *boxes*; alignment,
crop, resize and normalize all happen on device (preprocess.py).

Box sources, in priority order:
  1. precomputed boxes file (``<video>.boxes.npy`` [T, 4] or explicit path)
  2. OpenCV Haar cascade face detector (ships with opencv, offline-safe)
  3. centered square fallback covering the frame
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:  # cv2 is present in this image; keep the import soft for portability.
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def decode_video(path: str, max_frames: Optional[int] = None
                 ) -> np.ndarray:
    """Decode a video file to [T, H, W, 3] RGB uint8 frames."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video decode")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    frames = []
    while max_frames is None or len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def write_video(path: str, frames_rgb: np.ndarray, fps: float = 25.0
                ) -> None:
    """Write [T, H, W, 3] RGB uint8 frames (tests/demos)."""
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video write")
    t, h, w, _ = frames_rgb.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for f in frames_rgb:
        out.write(cv2.cvtColor(f.astype(np.uint8), cv2.COLOR_RGB2BGR))
    out.release()


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def load_image_dir(path: str, size: Optional[int] = None) -> np.ndarray:
    """Directory of per-frame images -> [T, H, W, 3] RGB uint8.

    The reference's OpenFace stage writes one aligned-crop image per
    frame into a directory (SURVEY.md §2 "Video preprocessor"); this
    reads that layout (sorted filenames = frame order), optionally
    resizing to ``size``.
    """
    if cv2 is None:
        raise RuntimeError("OpenCV is required to read image dirs")
    names = sorted(f for f in os.listdir(path)
                   if f.lower().endswith(IMAGE_EXTS))
    if not names:
        raise ValueError(f"no images found in {path}")
    frames = []
    for name in names:
        img = cv2.imread(os.path.join(path, name))
        if img is None:
            raise ValueError(f"unreadable image: {name} in {path}")
        if size is not None and img.shape[:2] != (size, size):
            img = cv2.resize(img, (size, size),
                             interpolation=cv2.INTER_LINEAR)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    shapes = {f.shape for f in frames}
    if len(shapes) > 1:
        raise ValueError(
            f"{path}: inconsistent frame shapes {sorted(shapes)}; pass "
            f"size= to normalize")
    return np.stack(frames)


def _haar_detector():
    if cv2 is None:
        return None
    xml = os.path.join(cv2.data.haarcascades,
                       "haarcascade_frontalface_default.xml")
    if not os.path.exists(xml):
        return None
    det = cv2.CascadeClassifier(xml)
    return det if not det.empty() else None


def _center_box(h: int, w: int) -> np.ndarray:
    side = min(h, w)
    return np.asarray([(h - side) / 2, (w - side) / 2, side, side],
                      np.float32)


def _shift_box(box: np.ndarray, dy: float, dx: float, h: int,
               w: int) -> np.ndarray:
    y0, x0, bh, bw = box
    y0 = float(np.clip(y0 + dy, 0, h - bh))
    x0 = float(np.clip(x0 + dx, 0, w - bw))
    return np.asarray([y0, x0, bh, bw], np.float32)


def _lk_shift(prev_gray: np.ndarray, cur_gray: np.ndarray,
              box: np.ndarray) -> Optional[Tuple[float, float]]:
    """Median sparse-LK displacement of good features inside ``box``."""
    y0, x0, bh, bw = box.astype(int)
    roi = prev_gray[y0:y0 + bh, x0:x0 + bw]
    if roi.size == 0:
        return None
    pts = cv2.goodFeaturesToTrack(roi, maxCorners=32, qualityLevel=0.05,
                                  minDistance=5)
    if pts is None or len(pts) < 4:
        return None
    pts = pts.reshape(-1, 2) + np.asarray([x0, y0], np.float32)
    nxt, ok, _err = cv2.calcOpticalFlowPyrLK(
        prev_gray, cur_gray, pts.astype(np.float32), None,
        winSize=(15, 15), maxLevel=2)
    ok = ok.reshape(-1).astype(bool)
    if ok.sum() < 4:
        return None
    d = (nxt.reshape(-1, 2) - pts)[ok]
    dx, dy = np.median(d[:, 0]), np.median(d[:, 1])
    return float(dy), float(dx)


def face_boxes(frames_rgb: np.ndarray,
               boxes_path: Optional[str] = None,
               detect_every: int = 8,
               margin: float = 0.25,
               track: str = "lk") -> np.ndarray:
    """Per-frame (y0, x0, height, width) face boxes for [T, H, W, 3] frames.

    Re-detects every ``detect_every`` frames; between detections the box
    follows the face via sparse Lucas-Kanade optical flow
    (``track="lk"``, the default) instead of the reference's hold-last
    policy (``track="hold"`` restores it — SURVEY.md §2 "Video
    preprocessor" notes the reference reuses the last crop on no-face
    frames). Flow tracking closes part of the capability gap vs
    OpenFace's CE-CLM tracking for moving faces without any native
    dependency beyond OpenCV. Boxes are squared and expanded by
    ``margin`` to approximate OpenFace's aligned crop extent.
    """
    t, h, w, _ = frames_rgb.shape
    if boxes_path:
        if not os.path.exists(boxes_path):
            raise FileNotFoundError(
                f"boxes file not found: {boxes_path} (explicit paths must "
                f"exist; omit the argument to use the built-in detector)")
        boxes = np.load(boxes_path).astype(np.float32)
        if boxes.shape != (t, 4):
            raise ValueError(
                f"{boxes_path}: expected shape {(t, 4)}, got {boxes.shape}")
        return boxes
    if track not in ("lk", "hold"):
        raise ValueError(f"track must be 'lk' or 'hold', got {track!r}")

    det = _haar_detector()
    boxes = np.empty((t, 4), np.float32)
    last = _center_box(h, w)
    prev_gray = None
    for i in range(t):
        # hold mode only needs gray on detection frames; lk needs every
        # frame for the flow pyramid.
        need_gray = (track == "lk"
                     or (det is not None and i % detect_every == 0))
        gray = (cv2.cvtColor(frames_rgb[i], cv2.COLOR_RGB2GRAY)
                if need_gray else None)
        detected = False
        if det is not None and i % detect_every == 0:
            m = min(h, w) // 8  # cv2 Size is (width, height); use min side
            found = det.detectMultiScale(gray, scaleFactor=1.2,
                                         minNeighbors=4, minSize=(m, m))
            if len(found):
                x, y, bw, bh = max(found, key=lambda b: b[2] * b[3])
                side = max(bw, bh) * (1.0 + margin)
                cy, cx = y + bh / 2, x + bw / 2
                y0 = np.clip(cy - side / 2, 0, h - 1)
                x0 = np.clip(cx - side / 2, 0, w - 1)
                side_y = min(side, h - y0)
                side_x = min(side, w - x0)
                side = min(side_y, side_x)
                last = np.asarray([y0, x0, side, side], np.float32)
                detected = True
        if (track == "lk" and not detected and prev_gray is not None):
            shift = _lk_shift(prev_gray, gray, last)
            if shift is not None:
                last = _shift_box(last, shift[0], shift[1], h, w)
        boxes[i] = last
        prev_gray = gray
    return boxes


def _eye_detector():
    if cv2 is None:
        return None
    xml = os.path.join(cv2.data.haarcascades, "haarcascade_eye.xml")
    det = cv2.CascadeClassifier(xml) if os.path.exists(xml) else None
    return det if det is not None and not det.empty() else None


def eye_landmarks(frames_rgb: np.ndarray, boxes: np.ndarray,
                  detect_every: int = 8) -> np.ndarray:
    """Per-frame ((left_y, left_x), (right_y, right_x)) eye landmarks.

    Haar-cascade detection inside the upper half of each face box, with
    hold-last on failure; when no eyes were ever found the canonical
    in-box positions are used (alignment then degenerates to the plain
    box crop — same fallback policy as the box tracker). The landmark
    *interface* is the contract: precomputed landmarks from a stronger
    tracker can be passed straight to preprocess.similarity_from_eyes.
    """
    t, h, w, _ = frames_rgb.shape
    det = _eye_detector()
    out = np.empty((t, 2, 2), np.float32)

    def canonical(box):
        y0, x0, bh, bw = box
        return np.asarray([[y0 + 0.38 * bh, x0 + 0.22 * bw],
                           [y0 + 0.38 * bh, x0 + 0.78 * bw]], np.float32)

    last: Optional[np.ndarray] = None
    for i in range(t):
        if det is not None and i % detect_every == 0:
            y0, x0, bh, bw = boxes[i].astype(int)
            roi = frames_rgb[i, y0:y0 + bh // 2, x0:x0 + bw]
            if roi.size:
                gray = cv2.cvtColor(roi, cv2.COLOR_RGB2GRAY)
                found = det.detectMultiScale(gray, 1.1, 3)
                if len(found) >= 2:
                    found = sorted(found, key=lambda r: -r[2] * r[3])[:2]
                    pts = sorted(
                        ((y0 + fy + fh / 2.0, x0 + fx + fw / 2.0)
                         for fx, fy, fw, fh in found),
                        key=lambda p: p[1])
                    last = np.asarray(pts, np.float32)
        out[i] = last if last is not None else canonical(boxes[i])
    return out


def load_landmarks(video_path: str, t: int,
                   landmarks_path: Optional[str] = None
                   ) -> Optional[np.ndarray]:
    """Precomputed eye landmarks for a video, if available.

    File contracts (documented for external trackers — SURVEY.md §7 hard
    part 4):

    * ``<video>.landmarks.npy`` — float [T, 2, 2] per-frame
      ((left_y, left_x), (right_y, right_x)) eye points, or [T, K>=3, 2]
      dense landmark sets, in source pixels.
    * ``<video>.openface.csv`` (or any explicit ``.csv`` path) — raw
      OpenFace ``FeatureExtraction`` output; parsed by
      :mod:`mimamo_tpu.io.openface` into [T, 68, 2].

    An explicit ``landmarks_path`` must exist; without one, the sidecar
    paths are probed (npy first) and None returned when absent (callers
    then fall back to the built-in Haar eye tracker).
    """
    if landmarks_path is None:
        for candidate in (video_path + ".landmarks.npy",
                          video_path + ".openface.csv"):
            if os.path.exists(candidate):
                landmarks_path = candidate
                break
        else:
            return None
    elif not os.path.exists(landmarks_path):
        raise FileNotFoundError(
            f"landmarks file not found: {landmarks_path}")
    if landmarks_path.endswith(".csv"):
        from .openface import read_landmarks_csv
        lm, _success = read_landmarks_csv(landmarks_path, num_frames=t)
        return lm
    lm = np.load(landmarks_path).astype(np.float32)
    # Accept full-length sidecars for truncated (max_frames) runs.
    if lm.ndim != 3 or lm.shape[-1] != 2 or lm.shape[0] < t:
        raise ValueError(
            f"{landmarks_path}: expected shape [>= {t}, K, 2] "
            f"(K=2 eye points or a dense landmark set) per frame, got "
            f"{lm.shape}")
    return lm[:t]


def load_video_with_boxes(path: str,
                          boxes_path: Optional[str] = None,
                          max_frames: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + box in one call. Default boxes file: ``<path>.boxes.npy``."""
    frames = decode_video(path, max_frames=max_frames)
    if boxes_path is None:
        candidate = path + ".boxes.npy"
        boxes_path = candidate if os.path.exists(candidate) else None
    return frames, face_boxes(frames, boxes_path=boxes_path)
