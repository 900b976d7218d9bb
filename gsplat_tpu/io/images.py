"""Async ground-truth image pipeline.

TPU-native equivalent of the reference's loader thread + pinned double buffer
+ transfer stream (/root/reference/cuda/trainer.cu:85-199,1406-1444): a
background thread decodes images (PIL, RGB float32/255 — matching OpenCV's
convertTo(1/255), trainer.cu:171-191) and stages them; `jax.device_put`
dispatches the H2D copy asynchronously so it overlaps with the compute
stream, replacing cudaMemcpyAsync + events. Random image order with
replacement (trainer.cu:1233-1235, uniform_int_distribution over mt19937).
"""

from __future__ import annotations

import queue
import random
import threading

import jax
import numpy as np


def load_image(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


class AsyncImageLoader:
    """Prefetches (image_index, device_array) pairs on a background thread."""

    def __init__(
        self,
        paths: list[str],
        seed: int = 0,
        prefetch: int = 2,
        order: str = "random",
        start: int = 0,
    ):
        """``start`` is the draw counter to resume from (== the training
        iteration): draws are COUNTER-BASED — draw k depends only on
        (seed, k), never on history — so a resumed run samples the exact
        image sequence an uninterrupted run would (checkpoint
        reproducibility; the reference's mt19937 stream is not resumable)."""
        self._paths = paths
        self._seed = seed
        self._order = order
        self._seq = start
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _next_index(self) -> int:
        k = self._seq
        self._seq += 1
        if self._order == "random":
            # int-only seed (Python 3.11+ restricts seed types)
            return random.Random(self._seed * 1_000_003 + k).randint(
                0, len(self._paths) - 1
            )
        return k % len(self._paths)

    def _loop(self):
        while not self._stop.is_set():
            idx = -1
            try:
                idx = self._next_index()
                arr = load_image(self._paths[idx])
            except Exception as e:  # pragma: no cover — surfaced by next():
                # a dead producer thread would deadlock the training loop.
                self._q.put((idx, e))
                continue
            # device_put dispatches the H2D transfer; it completes
            # asynchronously while compute proceeds (double buffering via
            # the queue depth).
            dev = jax.device_put(arr)
            while not self._stop.is_set():
                try:
                    self._q.put((idx, dev), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self):
        idx, item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return idx, item

    def close(self):
        self._stop.set()
        # Drain so the producer can exit a blocking put.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
