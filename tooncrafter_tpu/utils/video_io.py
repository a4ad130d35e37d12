"""Host-side video/image IO.

Replaces the reference's torchvision/ffmpeg h264 writer
(`/root/reference/utils/save_video.py:27-41`) and decord reader with
OpenCV (C++/ffmpeg under the hood) — the same "native code does the codec
work" split the reference uses, minus the torch dependency.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def to_uint8(video: np.ndarray) -> np.ndarray:
    """(T,H,W,3) float in [-1,1] -> uint8 RGB (NaN-safe)."""
    v = np.nan_to_num(np.asarray(video, np.float32), nan=0.0,
                      posinf=1.0, neginf=-1.0)
    v = np.clip(v, -1.0, 1.0)
    return ((v + 1.0) * 127.5).astype(np.uint8)


def write_video(path: str, video: np.ndarray, fps: int = 8) -> str:
    """video: (T,H,W,3) float [-1,1] or uint8 RGB. Writes mp4 (falls back
    to per-frame PNGs if no codec available). Returns the written path."""
    if video.dtype != np.uint8:
        video = to_uint8(video)
    t, h, w, _ = video.shape
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if _HAS_CV2:
        for fourcc_name in ("avc1", "mp4v"):
            fourcc = cv2.VideoWriter_fourcc(*fourcc_name)
            vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
            if vw.isOpened():
                for frame in video:
                    vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                vw.release()
                return path
            vw.release()
    # fallback: PNG frames
    base = os.path.splitext(path)[0]
    os.makedirs(base, exist_ok=True)
    for i, frame in enumerate(video):
        _write_png(os.path.join(base, f"frame_{i:04d}.png"), frame)
    return base


def _write_png(path: str, frame: np.ndarray):
    if _HAS_CV2:
        cv2.imwrite(path, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    else:
        from PIL import Image
        Image.fromarray(frame).save(path)


def write_video_grid(path: str, videos: np.ndarray, fps: int = 8) -> str:
    """(N,T,H,W,3) batch -> one mp4 with clips side by side (the
    save_results grid of utils/save_video.py:27-41)."""
    grid = np.concatenate(list(videos), axis=2)  # stack along width
    return write_video(path, grid, fps=fps)


def read_video_frames(path: str, indices: Optional[Sequence[int]] = None
                      ) -> np.ndarray:
    """Decode selected frames (or all) as (T,H,W,3) uint8 RGB."""
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable for video decode")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    frames = []
    if indices is None:
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    else:
        for idx in indices:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, f = cap.read()
            if not ok:
                raise IOError(f"cannot read frame {idx} of {path}")
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames)


def video_metadata(path: str):
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    meta = {
        "frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        "fps": float(cap.get(cv2.CAP_PROP_FPS)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
    }
    cap.release()
    return meta


def load_image(path: str) -> np.ndarray:
    """-> (H,W,3) float32 in [-1,1]."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return img / 127.5 - 1.0
