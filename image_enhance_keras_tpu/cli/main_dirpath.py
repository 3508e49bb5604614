"""Directory inference CLI — preserves the reference contract
(main_dirpath.py:6-16): positional image directory, --model, --scale,
--mode, --save_intermediate, --suffix, --patch_size; outputs
`<stem>_<suffix>(<scale>x)<ext>` next to each input.

Extensions over the reference: every zoo model is reachable (the reference
asserts didbl-only, main_dirpath.py:27), --weights points at a Keras .h5 or
an orbax checkpoint, --dtype bfloat16 enables the TPU serving profile, and
--devices shards tiles across the mesh (parallel inference).

Usage:  python -m image_enhance_keras_tpu.cli.main_dirpath <imgdir> [options]
"""

from __future__ import annotations

import argparse
import sys

from image_enhance_keras_tpu.models import MODEL_REGISTRY
from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="x4 super-resolve every image in a directory",
        epilog=(
            "Defaults reproduce the reference's tiled output bit-for-bit "
            "(the slowest mode). For serving throughput use the quality-"
            "gated profile: --dtype bfloat16 --mode split --forward int8 "
            "--split-tile 128 --split-tile-w 128 (~4x faster; see SERVING.md)."
        ),
    )
    p.add_argument("imgpath", help="directory of images to upscale")
    p.add_argument("--model", default="didbl", choices=sorted(MODEL_REGISTRY))
    p.add_argument("--scale", default=1, type=int, help="scale label used in output names")
    p.add_argument("--mode", default="patch", choices=["fast", "patch", "split"],
                   help="patch: reference-exact overlapped tiling; fast: whole-frame "
                        "forward; split: whole-frame body + halo-striped tail "
                        "(bit-identical to fast, bounded memory — the serving default)")
    p.add_argument("--forward", default="xla",
                   choices=["xla", "int8", "pallas", "pallas_chain", "pallas_int8"],
                   help="conv tower execution path (int8 = XLA native-rate "
                        "int8 convs, the production serving dtype; pallas* = "
                        "hand-written VMEM kernels, kept for research)")
    p.add_argument("--save_intermediate", default=False, action="store_true")
    p.add_argument("--suffix", default="scaled", help="suffix of output images")
    p.add_argument("--patch_size", default=96, type=int, help="tile size (reference: 96)")
    p.add_argument("--step", default=64, type=int, help="tile step (reference: 64)")
    p.add_argument("--geometry", default=None, choices=["ref", "perf"],
                   help="tile geometry preset (overrides patch_size/step)")
    p.add_argument("--weights", default=None,
                   help="Keras .h5, params .npz, or orbax checkpoint dir; "
                        "omitted = the model's committed demo checkpoint "
                        "(error if none exists); 'none' = explicit "
                        "random-init smoke run")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "mixed", "mixed-tail"],
                   help="serving precision: float32 (exact), bfloat16 "
                        "(fastest, ~3 dB PSNR-Y below f32 at equal SSIM), "
                        "mixed (bf16 MXU dots + f32 epilogues — measured "
                        "to recover ALL of bf16's PSNR loss; see EVAL.md), "
                        "or mixed-tail (didbl family: pure-bf16 body, f32 "
                        "epilogues only in the 16x-pixel post-upsample "
                        "tail — the selective profile; see SERVING.md)")
    p.add_argument("--tile_chunk", default=16, type=int)
    p.add_argument("--devices", default=1, type=int,
                   help="shard tiles across this many devices (data-parallel inference)")
    p.add_argument("--split-tile", type=int, default=None,
                   help="split-mode row stripe/tile height (body-map px; "
                        "default 64; the measured split2d optimum is 128)")
    p.add_argument("--split-tile-w", type=int, default=None,
                   help="2-D tiled tail: also tile split-mode columns "
                        "(body-map px; best perf ~128 at x4)")
    p.add_argument("--self-ensemble", action="store_true",
                   help="x8 geometric self-ensemble (flips/rot90 averaged): "
                        "~0.1-0.2 dB better at 8x the forwards")
    p.add_argument("--back-projection", type=int, default=0, metavar="N",
                   help="N iterative back-projection steps: refine the SR "
                        "output so its PIL-bicubic downscale matches the "
                        "LR input (test-time, model-agnostic)")
    p.add_argument("--internal-learn", type=int, default=0, metavar="N",
                   help="ZSSR-style per-image test-time adaptation: fine-"
                        "tune a copy of the weights for N steps on pairs "
                        "built from the input itself (zero external data) "
                        "before upscaling — targets image-specific textures "
                        "the training corpus lacks; costs N train steps per "
                        "image")
    p.add_argument("--internal-learn-lr", type=float, default=None,
                   help="adaptation learning rate (default 2e-5)")
    p.add_argument("--pipeline", action="store_true",
                   help="overlap native decode -> device -> encode "
                        "(runtime.serving); prints wall-clock Mpix/s incl. IO")
    p.add_argument("--int8-acc", default=None, choices=["bf16", "s32", "f32"],
                   help="int8 conv accumulator emission (default bf16: +2%% "
                        "throughput, noise-level quality change — "
                        "EVAL_PROFILES.json; s32 = exact native path)")
    p.add_argument("--round-mode", default="round", choices=["round", "trunc"],
                   help="final uint8 cast: round (nearest, quality-positive "
                        "default) or trunc (the reference's exact cast, "
                        "models.py:391 — for byte-parity runs against "
                        "reference-produced outputs)")
    p.add_argument("--int8-calib-dir", default=None, metavar="DIR",
                   help="calibrate int8 activation scales on images from "
                        "DIR (a few representative production frames); "
                        "default: package-bundled photos — the shipped "
                        "default never reads eval images")
    p.add_argument("--int8-emit", default=None, choices=["wide", "s8"],
                   help="int8 branch-intermediate emission: s8 fuses the "
                        "requantize into the conv epilogue so the "
                        "a1/b1 branch legs are written as int8 (1 B/elt) "
                        "instead of f32 — bit-exact vs wide")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import os

    # the numeric knobs are trace-time env vars; scope them to this run so
    # an in-process caller's next main() sees the documented defaults again
    saved = {
        k: os.environ.get(k) for k in ("IEK_INT8_ACC", "IEK_INT8_EMIT")
    }
    if args.int8_acc:
        os.environ["IEK_INT8_ACC"] = args.int8_acc
    if args.int8_emit:
        os.environ["IEK_INT8_EMIT"] = args.int8_emit
    try:
        return _run(args)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _run(args) -> int:
    import os

    from image_enhance_keras_tpu.cli.common import resolve_cli_weights

    args.weights = resolve_cli_weights(args.model, args.weights)
    import jax.numpy as jnp

    dtype = None if args.dtype == "float32" else jnp.bfloat16
    mixed = "tail" if args.dtype == "mixed-tail" else args.dtype == "mixed"
    if args.devices > 1:
        from image_enhance_keras_tpu.parallel import ShardedResolver as Resolver

        resolver = Resolver(
            model=args.model,
            weights=args.weights,
            dtype=dtype,
            patch=args.patch_size,
            step=args.step,
            geometry=args.geometry,
            tile_chunk=args.tile_chunk,
            mode=args.mode,
            forward=args.forward,
            n_devices=args.devices,
            split_tile_w=args.split_tile_w,
            **({"split_tile": args.split_tile} if args.split_tile else {}),
            self_ensemble=args.self_ensemble,
            back_projection=args.back_projection,
            round_mode=args.round_mode,
            mixed=mixed,
            internal_learn=args.internal_learn,
        )
    else:
        from image_enhance_keras_tpu.engine import SuperResolver

        resolver = SuperResolver(
            model=args.model,
            weights=args.weights,
            dtype=dtype,
            patch=args.patch_size,
            step=args.step,
            geometry=args.geometry,
            tile_chunk=args.tile_chunk,
            mode=args.mode,
            forward=args.forward,
            split_tile_w=args.split_tile_w,
            **({"split_tile": args.split_tile} if args.split_tile else {}),
            self_ensemble=args.self_ensemble,
            back_projection=args.back_projection,
            round_mode=args.round_mode,
            mixed=mixed,
            internal_learn=args.internal_learn,
        )
    if args.int8_calib_dir:
        resolver.int8_calib_dir = args.int8_calib_dir
    if args.internal_learn_lr is not None:
        resolver.internal_learn_lr = args.internal_learn_lr
    if args.pipeline:
        from image_enhance_keras_tpu.runtime.serving import serve_directory

        if args.save_intermediate:
            log.warning(
                "--save_intermediate is not supported by the overlapped "
                "--pipeline path; no intermediate images will be written"
            )

        stats = serve_directory(
            resolver, args.imgpath, suffix=args.suffix, scale_label=args.scale
        )
        log.info("wrote %d images (%.2f out-Mpix/s incl. IO)",
                 stats.images, stats.out_mpix_s)
        return 0
    outs = resolver.upscale_dir(
        args.imgpath,
        suffix=args.suffix,
        scale_label=args.scale,
        save_intermediate=args.save_intermediate,
    )
    log.info("wrote %d images", len(outs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
