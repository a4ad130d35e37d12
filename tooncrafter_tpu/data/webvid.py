"""WebVid-style video-clip dataset + async host-side loader.

Rebuilds /root/reference/lvdm/data/webvid.py:13-171 semantics without
torch/decord:
  * CSV metadata (pandas), videos under `{data_dir}/{page_dir}/{videoid}.mp4`
  * random frame stride in [1, frame_stride] when `random_fs`
    (webvid.py:89-92), shrunk until the clip fits (:109-118)
  * skip-and-retry on unreadable/short videos (:95-149)
  * resize shorter side + center crop, normalize to [-1, 1]
  * returns {'video': (T,H,W,3), 'caption', 'path', 'fps', 'frame_stride'}

The loader is a thread-pooled prefetcher (host CPUs decode while the TPU
trains) — the tf.data/grain-style async pipeline counterpart of decord's
native decoding.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from tooncrafter_tpu.utils import video_io


class WebVidDataset:
    def __init__(self, meta_path: str, data_dir: str, video_length: int = 16,
                 frame_stride: int = 6, resolution=(320, 512),
                 random_fs: bool = True, fps_max: Optional[float] = None,
                 fixed_fps: Optional[float] = None, seed: int = 0):
        import pandas as pd

        self.meta = pd.read_csv(meta_path)
        self.data_dir = data_dir
        self.video_length = video_length
        self.frame_stride = frame_stride
        self.random_fs = random_fs
        self.resolution = tuple(resolution)
        self.fps_max = fps_max
        self.fixed_fps = fixed_fps
        self.seed = seed
        # random.Random is not thread-safe and PrefetchLoader calls
        # __getitem__ from several worker threads — give each thread its own
        # deterministic stream
        self._tls = threading.local()

    @property
    def rng(self) -> random.Random:
        r = getattr(self._tls, "rng", None)
        if r is None:
            r = random.Random(f"{self.seed}:{threading.get_ident()}")
            self._tls.rng = r
        return r

    def __len__(self):
        return len(self.meta)

    def _path(self, row) -> str:
        rel = os.path.join(str(row["page_dir"]), f"{row['videoid']}.mp4")
        return os.path.join(self.data_dir, rel)

    def _process(self, frames: np.ndarray) -> np.ndarray:
        """uint8 (T,H,W,3) -> float32 (T,h,w,3) in [-1,1]: resize-to-cover +
        center crop + normalize, via the native C++ kernel (threaded across
        frames; cv2 fallback inside)."""
        from tooncrafter_tpu import native

        th, tw = self.resolution
        return native.preprocess_clip(frames, th, tw)

    def __getitem__(self, index: int) -> Dict:
        # retry loop: advance through the table on bad samples
        for _ in range(20):
            row = self.meta.iloc[index % len(self.meta)]
            path = self._path(row)
            try:
                meta = video_io.video_metadata(path)
                n = meta["frames"]
                fs = (self.rng.randint(1, self.frame_stride)
                      if self.random_fs else self.frame_stride)
                required = fs * (self.video_length - 1) + 1
                while required > n and fs > 1:  # shrink stride to fit
                    fs -= 1
                    required = fs * (self.video_length - 1) + 1
                if required > n:
                    raise ValueError(f"too short: {n} frames")
                start = self.rng.randint(0, n - required)
                idxs = list(range(start, start + required, fs))
                frames = video_io.read_video_frames(path, idxs)
                video = self._process(frames)
                fps = meta["fps"] / fs if self.fixed_fps is None \
                    else self.fixed_fps
                if self.fps_max:
                    fps = min(fps, self.fps_max)
                return {
                    "video": video,
                    "caption": str(row.get("name", "")),
                    "path": path,
                    "fps": np.float32(fps),
                    "frame_stride": np.int32(fs),
                }
            except Exception:
                index += 1
        raise RuntimeError("20 consecutive unreadable samples")


class PrefetchLoader:
    """Thread-pooled shuffling batch loader with bounded prefetch.

    `shard=(index, count)` gives each training host a disjoint slice of
    every epoch — the counterpart of the reference's rank/worker split
    (`/root/reference/main/utils_data.py:15-28` shards an iterable dataset
    across workers; DistributedSampler shards map-style data across
    ranks). All hosts shuffle the full epoch with the same (seed, epoch)
    stream and then take `order[index::count]`, so the shards are
    disjoint, deterministic, and cover every row each epoch. Callers pass
    `(jax.process_index(), jax.process_count())` (see cli/train.py); the
    loader itself stays jax-free.
    """

    def __init__(self, dataset, batch_size: int, tokenizer=None,
                 num_workers: int = 4, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = True, shard=None):
        self.ds = dataset
        self.bs = batch_size
        self.tokenizer = tokenizer
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        if shard is None:
            shard = (0, 1)
        index, count = shard
        if not (0 <= index < count):
            raise ValueError(f"shard index {index} not in [0, {count})")
        self.shard_index = int(index)
        self.shard_count = int(count)
        self._epoch = 0

    def _collate(self, samples: List[Dict]) -> Dict[str, np.ndarray]:
        batch = {
            "video": np.stack([s["video"] for s in samples]),
            "fs": np.stack([s["frame_stride"] for s in samples]),
            "fps": np.stack([s["fps"] for s in samples]),
            "captions": [s["caption"] for s in samples],
        }
        if self.tokenizer is not None:
            batch["tokens"] = self.tokenizer(batch["captions"])
            batch["null_tokens"] = np.tile(self.tokenizer([""]),
                                           (len(samples), 1))
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self.ds)))
        # reshuffle per epoch (the reference's PL loader reshuffles every
        # epoch); deterministic given (seed, epoch). The shuffle covers the
        # FULL table on every host (same stream), then each host keeps its
        # strided slice — disjoint across hosts by construction.
        random.Random(f"{self.seed}:{self._epoch}").shuffle(order)
        self._epoch += 1
        if self.shard_count > 1:
            # Truncate every shard to the common length so all hosts yield
            # the SAME number of batches per epoch. A strided slice alone
            # leaves shards whose sizes differ by 1 when len(ds) is not a
            # multiple of shard_count, and with per-host drop_last batching
            # a short host ends its epoch one step early — the other hosts
            # then block forever in the next collective (the reference's
            # DistributedSampler pads ranks to equal length for the same
            # reason).
            common = len(order) // self.shard_count
            order = order[self.shard_index::self.shard_count][:common]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        lock = threading.Lock()
        cursor = [0]

        def worker():
            while not stop.is_set():
                with lock:
                    i = cursor[0]
                    if i + self.bs > len(order):
                        break
                    cursor[0] += self.bs
                idxs = order[i:i + self.bs]
                try:
                    samples = [self.ds[j] for j in idxs]
                    q.put(self._collate(samples))
                except Exception as exc:  # surface loader errors
                    q.put(exc)
                    break
            q.put(None)

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        finished = 0
        try:
            while finished < len(threads):
                item = q.get()
                if item is None:
                    finished += 1
                    continue
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
