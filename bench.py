"""End-to-end x4 inference benchmark on the flagship model (didbl, full
128-feature config, ~111 MFLOP per input pixel).

Measures sustained on-device throughput of the production modes:
  * fast   — whole-frame forward, bf16 (serving for frames that fit HBM);
  * split  — whole-frame body + halo-striped tail, bf16: byte-identical to
             fast with bounded memory (the scalable serving default);
  * patch  — overlapped-tile pipelines: perf geometry (192/176/8) and the
             reference-exact 96/64/8 (models.py:184-416) with its inherent
             2.85x overlap redundancy at 512^2 (speed-of-light 9.9 Mpix/s);
  * int8   — fast/split modes over XLA's native-rate int8 convs
             (374.5 TFLOP/s = 95% of the 394 TOPS peak, 2.0x bf16;
             quality delta measured in EVAL_PROFILES.json).

Timing hygiene for the relay-attached chip: iterations are *chained* (each
batch input depends on the previous checksum, so nothing can be cached or
elided) and every measurement ends with a host fetch of a scalar checksum.
Large outputs stay HBM-resident (the relay moves device->host at ~0.1MB/s).

Baseline (BASELINE.json): ">100 megapixels/sec of end-to-end x4 inference on
a single v5e-8" = 12.5 out-Mpix/s per chip.  vs_baseline = value / 12.5.
``value`` is the best quality-gated serving mode — the max over every
measured production mode (incl. the split2d and batch variants).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: IEK_BENCH_SIZE (512), IEK_BENCH_BATCH (4), IEK_BENCH_ITERS (3),
IEK_BENCH_MODES (int8_split2d,int8_fast,fast,split2d,split,int8_split,
    patch_perf,patch_ref — headline modes first so a watchdog cut still
    records them; also int8_pallas,fast_batch,int8_batch — the
    whole-batch modes need a small IEK_BENCH_BATCH: the batched tail
    exceeds HBM at 4x512^2; suffixes _upq/_upmm/_m55 enable the matching
    IEK_INT8_* trace-time lever for any int8 mode),
IEK_BENCH_GLOBAL_TIMEOUT (1700s watchdog that emits whatever is measured),
IEK_BENCH_TILE / IEK_BENCH_CHUNK (split2d tile edge / tile-batch chunk,
    default 128 / 8 — the measured optimum; used by the tile sweep).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RESULTS: dict[str, float] = {}
_DONE = threading.Event()


def _emit_and_exit():
    size = int(os.environ.get("IEK_BENCH_SIZE", "512"))
    # snapshot: the watchdog thread must not iterate RESULTS while the main
    # thread inserts a finished mode (dict-changed-size would kill the
    # timer thread and the watchdog would never emit)
    RES = dict(RESULTS)
    # headline = best production serving mode; int8 qualifies because its
    # quality gate passed (EVAL_PROFILES.json: SSIM-Y delta 0.0004 <= 0.003)
    value = max(
        RES.get("fast", 0.0),
        RES.get("split", 0.0),
        RES.get("int8_fast", 0.0),
        RES.get("int8_split", 0.0),
        RES.get("fast_batch", 0.0),
        RES.get("int8_batch", 0.0),
        RES.get("split2d", 0.0),
        RES.get("mixed_fast", 0.0),
        RES.get("mixed_split2d", 0.0),
        RES.get("int8_split2d", 0.0),
        RES.get("int8_split2d_bt", 0.0),
        RES.get("int8_split2d_dyn", 0.0),
        RES.get("int8_split2d_bt_dyn", 0.0),
    )
    parts = ", ".join(f"{k} {v:.1f}" for k, v in RES.items())
    note = "" if _DONE.is_set() else " [watchdog: partial results]"
    print(
        json.dumps(
            {
                "metric": (
                    f"didbl x4 end-to-end on-device out-Mpix/s/chip, {size}^2 "
                    f"uint8 frames, bf16 (int8 = XLA native-rate int8 convs): "
                    f"{parts or 'nothing measured'}; baseline 100 Mpix/s on "
                    f"v5e-8 = 12.5/chip{note}"
                ),
                "value": round(value, 2),
                "unit": "output Mpix/s/chip",
                "vs_baseline": round(value / 12.5, 3),
            }
        ),
        flush=True,
    )
    os._exit(0)


def main() -> int:
    watchdog = threading.Timer(
        float(os.environ.get("IEK_BENCH_GLOBAL_TIMEOUT", "1700")), _emit_and_exit
    )
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver

    size = int(os.environ.get("IEK_BENCH_SIZE", "512"))
    batch = int(os.environ.get("IEK_BENCH_BATCH", "4"))
    iters = int(os.environ.get("IEK_BENCH_ITERS", "3"))
    modes = [
        m.strip()
        for m in os.environ.get(
            "IEK_BENCH_MODES",
            "int8_split2d,int8_fast,fast,split2d,split,int8_split,"
            "patch_perf,patch_ref",
        ).split(",")
        if m.strip()
    ]

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    )
    out_px = 16 * size * size * batch

    def timed(fn, params) -> float:
        c = fn(params, imgs, jnp.int32(1))
        float(c)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(params, imgs, c)
        float(c)  # forces materialisation of the whole chain
        return (time.perf_counter() - t0) / iters

    def checksum_map(per_image_fn):
        def fn(params, ims, salt):
            im2 = ims + (salt % 2).astype(jnp.uint8)
            outs = lax.map(lambda im: per_image_fn(params, im), im2)
            return jnp.sum(outs[:, ::97, ::97, :].astype(jnp.int32))

        return jax.jit(fn)

    base = SuperResolver(model="didbl", dtype=jnp.bfloat16)
    shared_params = base.params

    for mode in modes:
        # trace-time env levers for the *_upq/*_upmm modes; reset per
        # iteration so a failed mode cannot leak into the next
        os.environ.pop("IEK_INT8_UPQ", None)
        os.environ.pop("IEK_INT8_UPMM", None)
        os.environ.pop("IEK_INT8_MERGE55", None)
        mode_impl = mode
        if mode.endswith("_upq"):
            os.environ["IEK_INT8_UPQ"] = "1"
            mode_impl = mode[: -len("_upq")]
        elif mode.endswith("_upmm"):
            os.environ["IEK_INT8_UPMM"] = "1"
            mode_impl = mode[: -len("_upmm")]
        elif mode.endswith("_m55"):
            os.environ["IEK_INT8_MERGE55"] = "1"
            mode_impl = mode[: -len("_m55")]
        try:
            if mode_impl == "fast":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="fast",
                                  params=shared_params)
                inner, p = r._fast_fn((size, size)), r.params
            elif mode_impl == "split":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="split",
                                  split_tile=128, params=shared_params)
                inner, p = r._split_fn((size, size)), r.params
            elif mode_impl == "patch_perf":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16,
                                  geometry="perf", params=shared_params)
                inner, p = r._pipeline_for(r.plan_for(size, size)), r.params
            elif mode_impl == "patch_ref":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16,
                                  geometry="ref", params=shared_params)
                inner, p = r._pipeline_for(r.plan_for(size, size)), r.params
            elif mode_impl == "int8_fast":
                # XLA native-rate int8 convs (374.5 TFLOP/s measured = 95% of
                # the 394 TOPS peak); 'int8_pallas' keeps the Mosaic kernels
                # for comparison (their dots run at the bf16 rate).
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="fast",
                                  forward="int8", params=shared_params)
                inner, p = r._fast_fn((size, size)), r._fwd_params()
            elif mode_impl == "int8_split":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="split",
                                  forward="int8", split_tile=128,
                                  params=shared_params)
                inner, p = r._split_fn((size, size)), r._fwd_params()
            elif mode_impl in ("split2d", "int8_split2d", "int8_split2d_bt",
                               "int8_split2d_dyn", "int8_split2d_bt_dyn"):
                # 2-D tiled tail: the 16x-pixel tail runs as a BATCH of
                # <=512^2 HR tiles where v5e convs hit ~188 TFLOP/s instead
                # of the ~118 they reach on 2048^2 spatials (tile sweep, r2).
                # _bt adds the r3 tiled int8 BODY (256^2 segments, bit-exact;
                # the 1x512^2 body ran at ~175 vs ~291 TFLOP/s-equiv);
                # _dyn quantizes the tail with dynamic per-tile scales
                # (0.0004 SSIM-Y delta scheme).
                fwd = "xla" if mode_impl == "split2d" else "int8"
                tile = int(os.environ.get("IEK_BENCH_TILE", "128"))
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="split",
                                  forward=fwd, split_tile=tile, split_tile_w=tile,
                                  params=shared_params)
                r.split2d_chunk = int(os.environ.get("IEK_BENCH_CHUNK", "8"))
                if "_bt" in mode_impl:
                    r.int8_body_tile = int(os.environ.get("IEK_BODY_TILE", "256"))
                    r.int8_body_seg = int(os.environ.get("IEK_BODY_SEG", "4"))
                if "_dyn" in mode_impl:
                    r.int8_dynamic_tail = True
                inner, p = r._split_fn((size, size)), r._fwd_params()
            elif mode_impl == "mixed_fast":
                # MIXED profile (r4): bf16 MXU dots, f32 epilogues — measured
                # to recover ALL of bf16's ~4 dB PSNR-Y loss (EVAL.md)
                r = SuperResolver(model="didbl", mixed=True, mode="fast",
                                  params=shared_params)
                inner, p = r._fast_fn((size, size)), r.params
            elif mode_impl == "mixed_split2d":
                tile = int(os.environ.get("IEK_BENCH_TILE", "128"))
                r = SuperResolver(model="didbl", mixed=True, mode="split",
                                  split_tile=tile, split_tile_w=tile,
                                  params=shared_params)
                r.split2d_chunk = int(os.environ.get("IEK_BENCH_CHUNK", "8"))
                inner, p = r._split_fn((size, size)), r.params
            elif mode_impl in ("mixedtail_fast", "mixedtail_split2d"):
                # SELECTIVE-mixed (r5): pure-bf16 body, f32 epilogues only
                # in the 16x-pixel tail (--dtype mixed-tail)
                if mode_impl == "mixedtail_fast":
                    r = SuperResolver(model="didbl", mixed="tail", mode="fast",
                                      params=shared_params)
                    inner, p = r._fast_fn((size, size)), r.params
                else:
                    tile = int(os.environ.get("IEK_BENCH_TILE", "128"))
                    r = SuperResolver(model="didbl", mixed="tail", mode="split",
                                      split_tile=tile, split_tile_w=tile,
                                      params=shared_params)
                    r.split2d_chunk = int(os.environ.get("IEK_BENCH_CHUNK", "8"))
                    inner, p = r._split_fn((size, size)), r.params
            elif mode_impl == "int8_pallas":
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="fast",
                                  forward="pallas_int8", params=shared_params)
                inner, p = r._fast_fn((size, size)), r._fwd_params()
            elif mode_impl in ("fast_batch", "int8_batch"):
                # batched-frame serving (the engine's upscale_video pattern):
                # all frames go through ONE conv batch.  Measured (tile
                # sweep, r2): batch-1 convs run at 140.8/119.8 TFLOP/s at
                # 512²/2048² while the same volume batched runs at ~190 —
                # XLA tiles the batch dimension better than big spatials.
                fwd = "int8" if mode_impl == "int8_batch" else "xla"
                r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="fast",
                                  forward=fwd, params=shared_params)
                forward = r._forward_fn()
                pp = r._fwd_params()

                def batch_fn(params, ims, salt, forward=forward):
                    x = (ims + (salt % 2).astype(jnp.uint8)).astype(jnp.float32) / 255.0
                    y = forward(params, x)
                    out = jnp.clip(jnp.round(y * 255.0), 0.0, 255.0).astype(jnp.uint8)
                    return jnp.sum(out[:, ::97, ::97, :].astype(jnp.int32))

                dt = timed(jax.jit(batch_fn), pp)
                RESULTS[mode] = out_px / dt / 1e6
                print(json.dumps({"mode": mode,
                                  "out_mpix_s": round(RESULTS[mode], 2)}),
                      file=sys.stderr, flush=True)
                continue
            else:
                # a typo'd mode must not silently lower the headline
                print(json.dumps({"mode": mode, "error": "unknown mode"}),
                      file=sys.stderr, flush=True)
                continue
            dt = timed(checksum_map(lambda pp, im: inner(pp, im)), p)
            RESULTS[mode] = out_px / dt / 1e6
            print(json.dumps({"mode": mode, "out_mpix_s": round(RESULTS[mode], 2)}),
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 - record and keep measuring
            print(json.dumps({"mode": mode, "error": str(e)[:200]}),
                  file=sys.stderr, flush=True)

    # the *_upq/*_upmm levers are set inside the loop; after the LAST such
    # mode they must not leak into any later in-process tracing (ADVICE r4)
    os.environ.pop("IEK_INT8_UPQ", None)
    os.environ.pop("IEK_INT8_UPMM", None)
    os.environ.pop("IEK_INT8_MERGE55", None)

    _DONE.set()
    watchdog.cancel()
    _emit_and_exit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
