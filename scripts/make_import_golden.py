"""Generate tests/golden/didbl96_golden.npz — the committed golden forward
activations for the Keras-import parity gate (tests/test_keras_import_golden.py).

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
    from tests.test_keras_import_golden import _forward_96, GOLDEN

    with tempfile.TemporaryDirectory() as td:
        import pathlib

        y = _forward_96(pathlib.Path(td))
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
