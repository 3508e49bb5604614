"""Directory serving pipeline: native threaded decode -> device -> async encode.

The reference's production loop is strictly serial per image: imread ->
(graph rebuild) -> predict -> imsave (models.py:212-415).  Here the three
stages overlap:

  * a decode thread keeps a lookahead queue filled using the C codec's
    pthread batch loader (runtime/native_io.imread_batch; falls back to the
    Python decoders transparently);
  * the main thread feeds the device — the only serialized resource;
  * encodes are handed to a small thread pool (the ctypes call releases the
    GIL for the whole C encode).

With uniform input sizes the device never waits on IO after the first
image; the pipeline's steady-state rate is the device rate.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from image_enhance_keras_tpu.data.io import imread, imwrite, list_images
from image_enhance_keras_tpu.engine import output_name
from image_enhance_keras_tpu.utils.logging import get_logger

__all__ = ["PipelineStats", "serve_directory"]

log = get_logger(__name__)


@dataclasses.dataclass
class PipelineStats:
    images: int
    out_pixels: int
    wall_s: float
    decode_s: float  # aggregate decode-thread busy time
    device_s: float  # main-thread device time (upload+compute+download)
    encode_s: float  # aggregate encoder busy time

    @property
    def out_mpix_s(self) -> float:
        return self.out_pixels / max(self.wall_s, 1e-9) / 1e6


def _decode_worker(paths, q, batch, threads, busy):
    from image_enhance_keras_tpu.runtime import native_io

    def _fallback(p):
        try:
            return imread(p)  # PIL fallback for formats the codec skips
        except Exception as e:  # noqa: BLE001 - a bad file must not kill the pipe
            log.warning("skipping undecodable %s (%s)", p, e)
            return None

    try:
        for i in range(0, len(paths), batch):
            chunk = paths[i : i + batch]
            t0 = time.perf_counter()
            if native_io.available():
                imgs = native_io.imread_batch(chunk, threads=threads)
            else:
                imgs = [_fallback(p) for p in chunk]
            busy[0] += time.perf_counter() - t0
            for p, im in zip(chunk, imgs):
                if im is None:
                    im = _fallback(p)
                if im is not None:
                    q.put((p, im))
    finally:
        q.put(None)  # the consumer must never wait forever


def serve_directory(
    resolver,
    dir_path: str,
    suffix: str = "scaled",
    scale_label: int = 1,
    decode_threads: int = 8,
    encode_threads: int = 4,
    lookahead: int = 4,
) -> PipelineStats:
    """Upscale every image in a directory with overlapped IO; returns stats."""
    tag = f"_{suffix}("
    paths = [
        p for p in list_images(dir_path)
        if tag not in os.path.basename(p) and "_intermediate_" not in os.path.basename(p)
    ]
    q: queue.Queue = queue.Queue(maxsize=lookahead)
    decode_busy = [0.0]
    t_start = time.perf_counter()
    # decode batch >= thread count, else half the native decoder threads
    # idle (the batch is drained before refilling); the queue bound alone
    # caps memory
    dec = threading.Thread(
        target=_decode_worker,
        args=(paths, q, max(lookahead, decode_threads), decode_threads,
              decode_busy),
        daemon=True,
    )
    dec.start()

    device_s = 0.0
    encode_busy = [0.0]
    out_px = 0
    n = 0

    def _encode(dst, arr):
        t0 = time.perf_counter()
        imwrite(dst, arr)
        encode_busy[0] += time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=encode_threads) as pool:
        from collections import deque

        futures: deque = deque()
        # backpressure: each pending future pins a full x4 uint8 output
        # (~100 MB for a 1080p input) — when the device outruns the
        # encoders, block on the oldest instead of queueing unboundedly
        max_pending = 2 * encode_threads
        while True:
            item = q.get()
            if item is None:
                break
            path, img = item
            t0 = time.perf_counter()
            out = resolver.upscale(img)
            device_s += time.perf_counter() - t0
            out_px += out.shape[0] * out.shape[1]
            n += 1
            futures.append(pool.submit(_encode, output_name(path, suffix, scale_label), out))
            while len(futures) >= max_pending:
                futures.popleft().result()
        for f in futures:
            f.result()
    wall = time.perf_counter() - t_start
    stats = PipelineStats(n, out_px, wall, decode_busy[0], device_s, encode_busy[0])
    log.info(
        "served %d images: %.2f out-Mpix/s wall (device %.2fs, decode %.2fs, encode %.2fs)",
        n, stats.out_mpix_s, device_s, decode_busy[0], encode_busy[0],
    )
    return stats
