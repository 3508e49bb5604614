"""REAL-Keras import parity gate (VERDICT r3 missing #1 / weak #4).

The r1-r3 import gate was gated on *Keras-faithful* fixtures this repo
writes itself — layout-complete but circular in one respect: the stored
layer ORDER was assumed, never observed.  ``tf_keras`` (Keras 2.x on TF,
CPU) turns out to be importable in this environment, so this module closes
the loop with a genuinely Keras-written HDF5:

1. Build the reference graphs (didbl models.py:1159-1222, difv4 1021-1047,
   difvdsr 1288-1357) as real Keras 2 functional models
   (tests/real_keras_models.py — fresh code written from SURVEY.md
   section 2.2, independent of this repo's flax/JAX stack).
2. ``model.save_weights`` -> the same root-layout HDF5 format as the
   production checkpoint ``weights_Double/weights025-17-0.93.h5``
   (written by ModelCheckpoint(save_weights_only=True), models.py:141-142).
3. Assert the stored ``layer_names`` order is the TOPOLOGICAL
   ``model.layers`` order — per light53 block a1(3x3), b1(5x5), a2(5x5),
   b2(3x3), branch heads before branch tails — NOT graph-creation order.
   This is the finding that caught a real bug: creation order swaps the
   shape-identical a2/b1 pair of 5x5 kernels silently (measured 23x the
   f32-noise output error on a seeded model).
4. Import through ``import_keras_weights`` and require the flax forward to
   match ``model.predict`` — TF's own conv + TF1 resize_bilinear forward —
   to f32 tolerance.  This is truth-vs-implementation, not
   fixture-vs-implementation.
5. Cross-check the independent NumPy oracle (tests/oracle_didbl_numpy.py)
   against the same Keras predict, so BOTH independent restatements are
   pinned to ground truth.

Reduced block counts keep the TF CPU forward fast; the order logic being
verified is per-block, so 2 body blocks exercise it exactly as 16 do.
"""

from __future__ import annotations

import numpy as np
import pytest

tf_keras = pytest.importorskip("tf_keras")

import jax.numpy as jnp  # noqa: E402

from image_enhance_keras_tpu.models.didbl import DifvdsrDouble  # noqa: E402
from image_enhance_keras_tpu.models.zoo import init_params  # noqa: E402
from image_enhance_keras_tpu.models.keras_import import (  # noqa: E402
    import_keras_weights,
    load_keras_h5,
)
from tests.real_keras_models import (  # noqa: E402
    build_real_keras_didbl,
    build_real_keras_difv4,
    build_real_keras_difvdsr,
    seeded_weights,
)

COUNTS = dict(n_body53=2, n_light=2, n_tail53=1)
FEATURES = 16
HW = 12  # LR input size; TF predict at 12^2 -> 48^2 is sub-second on CPU


@pytest.fixture(scope="module")
def real_h5(tmp_path_factory):
    """A genuinely tf_keras-written save_weights HDF5 + its own predict."""
    model = build_real_keras_didbl(HW, HW, features=FEATURES, **COUNTS)
    seeded_weights(model, seed=21)
    path = str(tmp_path_factory.mktemp("real_keras") / "didbl_real.h5")
    model.save_weights(path)
    rng = np.random.default_rng(23)
    x = rng.integers(0, 256, (1, HW, HW, 3)).astype(np.float32) / 255.0
    y_keras = np.asarray(model.predict(x, verbose=0), np.float32)
    return path, x, y_keras


def test_real_file_is_root_layout_with_layer_names(real_h5):
    """The save_weights file shape the importer must parse: layer groups at
    the file root (no model_weights wrapper) + a layer_names attr."""
    import h5py

    path, _, _ = real_h5
    with h5py.File(path, "r") as f:
        assert "model_weights" not in f
        assert "layer_names" in f.attrs


def test_real_keras_stores_topological_layer_order(real_h5):
    """Keras save_weights stores model.layers (topological) order: within
    each light53 block the two branch HEADS (conv2d_a1 3x3, conv2d_b1 5x5)
    come before the two branch TAILS (a2 5x5, b2 3x3).  Layer NAME suffixes
    are creation order (a1, a2, b1, b2), so topological storage shows up as
    non-monotonic conv name indices: [i, i+2, i+1, i+3] per block."""
    path, _, _ = real_h5
    convs = load_keras_h5(path)
    names = [name for name, _k, _b in convs]
    shapes = [k.shape[:2] for _n, k, _b in convs]

    def idx(n):  # "conv2d" -> 0, "conv2d_7" -> 7
        return 0 if n == "conv2d" else int(n.rsplit("_", 1)[1])

    # level1 (named) first, out conv last
    assert names[0] == "level1"
    n_blocks = COUNTS["n_body53"] + COUNTS["n_tail53"]
    # each light53 block: stored a1, b1, a2, b2 -> shapes (3,3),(5,5),(5,5),(3,3)
    # [shape-degenerate with creation order] but indices i, i+2, i+1, i+3.
    pos = 1
    for _ in range(COUNTS["n_body53"]):
        quad = [idx(n) for n in names[pos : pos + 4]]
        base = quad[0]
        assert quad == [base, base + 2, base + 1, base + 3], (
            f"stored light53 order is not topological: {names[pos:pos + 4]}"
        )
        assert shapes[pos : pos + 4] == [(3, 3), (5, 5), (5, 5), (3, 3)]
        pos += 4
    # light blocks are chains: monotonic
    for _ in range(COUNTS["n_light"]):
        a, b = (idx(n) for n in names[pos : pos + 2])
        assert b == a + 1
        pos += 2
    for _ in range(COUNTS["n_tail53"]):
        quad = [idx(n) for n in names[pos : pos + 4]]
        base = quad[0]
        assert quad == [base, base + 2, base + 1, base + 3]
        pos += 4
    assert shapes[pos] == (3, 3) and convs[pos][1].shape[-1] == 3  # out conv
    assert n_blocks * 4 + COUNTS["n_light"] * 2 + 2 == len(convs)


def test_import_matches_real_keras_predict(real_h5):
    """THE gate: h5 -> import_keras_weights -> flax forward == TF's own
    predict (conv stack + the genuine TF1 resize_bilinear kernel).  A wrong
    layer-order convention fails this at ~1e-1; f32 conv reassociation noise
    is ~1e-6."""
    path, x, y_keras = real_h5
    model = DifvdsrDouble(features=FEATURES, **COUNTS)
    params = init_params(model, input_hw=(8, 8))
    params = import_keras_weights(path, "didbl", params, **COUNTS)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)), np.float32)
    assert y.shape == y_keras.shape == (1, 4 * HW, 4 * HW, 3)
    np.testing.assert_allclose(y, y_keras, atol=5e-5)
    assert float(np.std(y_keras)) > 1e-2  # the comparison has teeth


def test_numpy_oracle_matches_real_keras_predict(real_h5):
    """Pin the independent NumPy oracle to the same ground truth: both
    de-circularized restatements agree with real Keras, so agreement
    BETWEEN them (the cheap gate run everywhere) is anchored."""
    from tests.oracle_didbl_numpy import didbl_numpy_forward

    path, x, y_keras = real_h5
    y = didbl_numpy_forward(path, x, convention="topo", **COUNTS).astype(np.float32)
    np.testing.assert_allclose(y, y_keras, atol=5e-5)


def test_fixture_layer_names_match_real(real_h5, tmp_path):
    """The committed-golden fixture writer must emit the EXACT layer_names
    sequence (names, order, weightless groups) and per-group weight_names
    that real Keras save_weights produces — so the golden gate stresses the
    importer with the true file shape, not an approximation."""
    import h5py

    from tests.test_keras_import_golden import _write_keras_faithful_h5

    real_path, _, _ = real_h5
    fix_path = str(tmp_path / "fixture.h5")
    _write_keras_faithful_h5(
        fix_path, root_layout=True, features=FEATURES, **COUNTS
    )

    def _layout(path):
        with h5py.File(path, "r") as f:
            names = [
                n.decode() if isinstance(n, bytes) else n
                for n in f.attrs["layer_names"]
            ]
            wns = {
                n: [
                    w.decode() if isinstance(w, bytes) else w
                    for w in f[n].attrs["weight_names"]
                ]
                for n in names
            }
            shapes = {
                n: [tuple(f[n][w].shape) for w in wns[n]] for n in names
            }
        return names, wns, shapes

    real = _layout(real_path)
    fix = _layout(fix_path)
    assert fix[0] == real[0], "layer_names sequence differs from real Keras"
    assert fix[1] == real[1], "weight_names differ from real Keras"
    assert fix[2] == real[2], "weight shapes differ from real Keras"


@pytest.mark.slow
def test_full_size_real_keras_didbl_parity(tmp_path):
    """The maximal gate short of the real checkpoint: the FULL production
    didbl (16/6/2 blocks, 128 features, ~21.8M params) built in real Keras,
    save_weights-written, imported, and the flax forward must equal TF's
    own predict.  Also pins the full-size fixture plan to the real file's
    layer_names.  ~25s on CPU (one-time TF graph build dominates)."""
    import h5py

    from image_enhance_keras_tpu.models.zoo import get_model
    from tests.test_keras_import_golden import _keras_layer_plan

    model_k = build_real_keras_didbl(HW, HW)
    seeded_weights(model_k, seed=51)
    path = str(tmp_path / "didbl_full_real.h5")
    model_k.save_weights(path)

    with h5py.File(path, "r") as f:
        real_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in f.attrs["layer_names"]
        ]
    assert [n for n, _ in _keras_layer_plan()] == real_names

    x = (
        np.random.default_rng(53).integers(0, 256, (1, HW, HW, 3)) / 255.0
    ).astype(np.float32)
    y_keras = np.asarray(model_k.predict(x, verbose=0), np.float32)

    model, _spec = get_model("didbl")
    params = init_params(model, input_hw=(8, 8))
    params = import_keras_weights(path, "didbl", params)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(y, y_keras, atol=5e-5)  # measured ~4e-7


def test_wrapped_full_model_save_layout(real_h5, tmp_path):
    """Keras ``model.save`` (full-model h5) nests the same groups under
    ``model_weights`` — the importer must read a REAL wrapped file to the
    identical tree as the real save_weights file."""
    import jax

    path, _, _ = real_h5
    model_k = build_real_keras_didbl(HW, HW, features=FEATURES, **COUNTS)
    model_k.load_weights(path)
    wrapped = str(tmp_path / "didbl_full_model.h5")
    model_k.save(wrapped, include_optimizer=False)

    model = DifvdsrDouble(features=FEATURES, **COUNTS)
    params = init_params(model, input_hw=(8, 8))
    a = import_keras_weights(path, "didbl", params, **COUNTS)
    b = import_keras_weights(wrapped, "didbl", params, **COUNTS)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_difv4_import_matches_real_keras_predict(tmp_path):
    """Same truth gate for the difv4 family (models.py:1021-1047): real
    Keras 2 graph -> save_weights -> import -> flax forward == TF predict.
    difv4's blocks are chains, so this pins the graph WIRING (two in-graph
    x2 TF1 bilinears, the mid-tower long skip, LeakyReLU(0.001) heads)
    rather than layer ordering."""
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4

    counts = dict(n_head=2, n_mid=2, n_tail=2)
    model_k = build_real_keras_difv4(HW, HW, features=FEATURES, **counts)
    seeded_weights(model_k, seed=31)
    path = str(tmp_path / "difv4_real.h5")
    model_k.save_weights(path)
    rng = np.random.default_rng(33)
    x = rng.integers(0, 256, (1, HW, HW, 3)).astype(np.float32) / 255.0
    y_keras = np.asarray(model_k.predict(x, verbose=0), np.float32)

    model = Difvdsr4(features=FEATURES, **counts)
    params = init_params(model, input_hw=(8, 8))
    params = import_keras_weights(path, "difv4", params, **counts)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)), np.float32)
    assert y.shape == y_keras.shape == (1, 4 * HW, 4 * HW, 3)
    np.testing.assert_allclose(y, y_keras, atol=5e-5)
    # seeded-weight outputs through the x0.1-scaled chains are low-contrast;
    # teeth = structured output well above the 5e-5 parity tolerance
    assert float(np.std(y_keras)) > 1e-3


def test_difvdsr_import_matches_real_keras_predict(tmp_path):
    """Same truth gate for the difvdsr refiner (models.py:1288-1357):
    pins the diff-block wiring (Subtract, three-way Add, LeakyReLU(0.2),
    x0.1) and its a,b,c,d conv consumption order against real Keras."""
    from image_enhance_keras_tpu.models.difvdsr import Difvdsr

    model_k = build_real_keras_difvdsr(HW, HW, features=FEATURES, n_blocks=3)
    seeded_weights(model_k, seed=41)
    path = str(tmp_path / "difvdsr_real.h5")
    model_k.save_weights(path)
    rng = np.random.default_rng(43)
    x = rng.integers(0, 256, (1, HW, HW, 3)).astype(np.float32) / 255.0
    y_keras = np.asarray(model_k.predict(x, verbose=0), np.float32)

    model = Difvdsr(features=FEATURES, n_blocks=3)
    params = init_params(model, input_hw=(8, 8))
    params = import_keras_weights(path, "difvdsr", params, n_blocks=3)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)), np.float32)
    assert y.shape == y_keras.shape == (1, HW, HW, 3)
    np.testing.assert_allclose(y, y_keras, atol=5e-5)
    assert float(np.std(y_keras)) > 1e-3


def test_wrong_convention_is_caught(real_h5):
    """Regression teeth: consuming the real file in creation order (the
    pre-r4 behavior) swaps each block's two 5x5 kernels and visibly breaks
    the forward — the error the real-Keras gate originally caught."""
    from tests.oracle_didbl_numpy import didbl_numpy_forward

    path, x, y_keras = real_h5
    y_bad = didbl_numpy_forward(
        path, x, convention="creation", **COUNTS
    ).astype(np.float32)
    assert float(np.max(np.abs(y_bad - y_keras))) > 1e-3
