"""Export CLI: serialize a serving forward as a StableHLO artifact.

    python -m image_enhance_keras_tpu.cli.export_model out.iekx \
        --model didbl --weights weights_Double/didbl_set5demo.npz --hw 512 512

The artifact embeds weights + graph; load with runtime.export.load_forward
(only jax required).  One artifact per input-size bucket.
"""

from __future__ import annotations

import argparse
import sys

from image_enhance_keras_tpu.models import MODEL_REGISTRY


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="export a serving forward (StableHLO)")
    p.add_argument("out", help="artifact path (.iekx)")
    p.add_argument("--model", default="didbl", choices=sorted(MODEL_REGISTRY))
    p.add_argument("--weights", default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--forward", default="xla",
                   choices=["xla", "int8", "pallas", "pallas_chain", "pallas_int8"])
    p.add_argument("--hw", nargs=2, type=int, default=[512, 512],
                   metavar=("H", "W"), help="input size bucket")
    p.add_argument("--mode", default="fast", choices=["fast", "split", "patch"],
                   help="serving program to export (split + --split-tile-w = "
                        "the bounded-memory 2-D tiled production mode)")
    p.add_argument("--split-tile", type=int, default=128)
    p.add_argument("--split-tile-w", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from image_enhance_keras_tpu.cli.common import resolve_cli_weights
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.runtime.export import export_pipeline

    resolver = SuperResolver(
        model=args.model,
        weights=resolve_cli_weights(args.model, args.weights),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        forward=args.forward,
        mode=args.mode,
        split_tile=args.split_tile,
        split_tile_w=args.split_tile_w,
    )
    n = export_pipeline(resolver, tuple(args.hw), args.out)
    tiling = f" tile {args.split_tile}" + (
        f"x{args.split_tile_w}" if args.split_tile_w else ""
    ) if args.mode == "split" else ""
    print(f"wrote {args.out}: {n / 1e6:.1f} MB "
          f"({args.model} {args.hw[0]}x{args.hw[1]} {args.dtype} "
          f"{args.forward} {args.mode}{tiling})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
