"""Perf sweep: split-tile sizes, frame sizes (spatial-extent MFU effect),
batched vs mapped frames, ref-geometry chunking.  One JSON line per point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver

    iters = int(os.environ.get("IEK_BENCH_ITERS", "3"))
    dtype = jnp.bfloat16
    base = SuperResolver(model="didbl", dtype=dtype)
    params = base.params
    forward = base._forward_fn()

    def timed(fn, imgs) -> float:
        c = fn(params, imgs, jnp.int32(1))
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(params, imgs, c)
        float(c)
        return (time.perf_counter() - t0) / iters

    def emit(name, dt, out_px):
        mpix = out_px / dt / 1e6
        print(json.dumps({"case": name, "s": round(dt, 4),
                          "out_mpix_s": round(mpix, 2)}), flush=True)

    def mk_imgs(batch, size):
        rng = np.random.default_rng(0)
        return jax.device_put(jnp.asarray(
            rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)))

    def checksum_map(per_image_fn):
        def fn(params, ims, salt):
            im2 = ims + (salt % 2).astype(jnp.uint8)
            outs = lax.map(lambda im: per_image_fn(params, im), im2)
            return jnp.sum(outs[:, ::97, ::97, :].astype(jnp.int32))
        return jax.jit(fn)

    # 1) frame-size effect on whole-frame MFU (batch scaled to equal pixels)
    # measured: 256x16=18.39, 512x4=17.77; 1024x1 whole-frame OOMs in compile
    for size, batch in ((256, 16),) if os.environ.get("IEK_SWEEP_SIZES") else ():
        imgs = mk_imgs(batch, size)

        def one(p, im):
            x = im.astype(jnp.float32)[None] / 255.0
            y = forward(p, x)[0]
            return jnp.clip(jnp.round(y * 255.0), 0.0, 255.0).astype(jnp.uint8)

        emit(f"fast_{size}x{batch}", timed(checksum_map(one), imgs),
             16 * size * size * batch)

    # 2) batched conv (4 frames in one forward): OOMs in compile — the tail
    # would need 4 x 2048^2 x 128 bf16 live at once; lax.map per frame is
    # the memory-feasible schedule (and split-mode the scalable one).
    imgs = mk_imgs(4, 512)

    # 3) split tile sweep
    for t in (32, 64, 128):
        r = SuperResolver(model="didbl", dtype=dtype, mode="split", split_tile=t)
        inner = r._split_fn((512, 512))
        emit(f"split_t{t}", timed(checksum_map(lambda p, im: inner(p, im)), imgs),
             16 * 512 * 512 * 4)

    # 3b) split at 1024^2 (whole-frame OOMs in compile; split is the exact path)
    big = mk_imgs(1, 1024)
    r = SuperResolver(model="didbl", dtype=dtype, mode="split", split_tile=64)
    inner = r._split_fn((1024, 1024))
    emit("split_1024_t64", timed(checksum_map(lambda p, im: inner(p, im)), big),
         16 * 1024 * 1024)

    # 4) ref geometry with full+remainder chunking (chunk 16 and 32)
    for ch in (16, 32):
        r = SuperResolver(model="didbl", dtype=dtype, geometry="ref", tile_chunk=ch)
        inner = r._pipeline_for(r.plan_for(512, 512))
        emit(f"patch_ref_c{ch}",
             timed(checksum_map(lambda p, im: inner(p, im)), imgs),
             16 * 512 * 512 * 4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
