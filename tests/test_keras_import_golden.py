"""Weight-import parity gate (VERDICT r1 item 3).

Three layers of defence against import drift (layer order, HWIO layout,
bias handling — the risks of loading the reference's real
weights025-17-0.93.h5, models.py:1217):

1. A *Keras-faithful* full-size didbl HDF5 fixture: exact Keras 2.x layer
   naming (`input_1`, `conv2d`, `conv2d_1`, ..., `lambda`, `lambda_1`, ...)
   with ``layer_names`` in the TOPOLOGICAL order Keras ``save_weights``
   actually stores (branch heads of each light53 block before the branch
   tails — verified against a real tf_keras-written didbl in
   tests/test_keras_import_real.py) and weightless InputLayer/Lambda groups
   interleaved.  Regenerated deterministically (seeded), so the 90 MB file
   itself is never committed.
2. Committed golden forward activations for a 96^2 tile
   (tests/golden/didbl96_golden.npz): h5 -> pytree -> f32 forward must
   reproduce them.  Any drift in conv ordering, kernel layout or bias
   import moves the output by orders of magnitude more than the 1e-3
   tolerance (which only absorbs cross-platform f32 ulp noise).
3. An independent NumPy conv oracle: flax ``nn.Conv`` on imported HWIO
   kernels must equal a hand-written SAME-padded correlation, proving the
   HWIO interpretation rather than assuming it.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.models import get_model, init_params
from image_enhance_keras_tpu.models.keras_import import (
    keras_conv_order,
    import_keras_weights,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "didbl96_golden.npz")


def _keras_layer_plan(n_body53=16, n_light=6, n_tail53=2, features=128):
    """(keras_layer_name, conv_shape_or_None) — the EXACT layer_names
    sequence a real tf_keras ``save_weights`` stores for the didbl graph
    (asserted equal to a genuinely Keras-written file, name for name, in
    tests/test_keras_import_real.py::test_fixture_layer_names_match_real).

    Layer NAMES carry creation-order suffixes (models.py:1159-1222 build
    sequence: per light53 the x0.9 lambda first, then a1, act, a2, b1, act,
    b2, Add, x0.1 lambda, Add) while the stored ORDER is topological
    ``model.layers`` order, which interleaves each block's branches —
    a1(3x3), b1(5x5), both relus, a2(5x5), b2(3x3) — and places the x0.1
    lambda BEFORE the x0.9 lambda (Keras depth is computed from the output
    side, where the identity leg is shallower).  An earlier revision
    stored creation conv order a1, a2, b1, b2; the a2/b1 swap is
    shape-silent and was caught by the real-Keras gate.  Weightless layers
    (activations, adds, lambdas, input) appear in layer_names with empty
    weight_names — the importer must skip them by content, not by name."""
    plan = [("input_1", None), ("level1", (1, 1, 3, features))]
    idx = 0  # Keras 2.x suffixes: first instance bare, then _1, _2, ...
    act = 0
    lam = 0
    add = 0
    F = features

    def _n(prefix, i):
        return prefix if i == 0 else f"{prefix}_{i}"

    def conv(shape):
        nonlocal idx
        name = _n("conv2d", idx)
        idx += 1
        return (name, shape)

    def actl():
        nonlocal act
        name = _n("activation", act)
        act += 1
        return (name, None)

    def lmb():
        nonlocal lam
        name = _n("lambda", lam)
        lam += 1
        return (name, None)

    def addl():
        nonlocal add
        name = _n("add", add)
        add += 1
        return (name, None)

    def light53():
        # creation order assigns the names...
        lam09 = lmb()
        a1 = conv((3, 3, F, F))
        act_a = actl()
        a2 = conv((5, 5, F, F))
        b1 = conv((5, 5, F, F))
        act_b = actl()
        b2 = conv((3, 3, F, F))
        add_sum = addl()
        lam01 = lmb()
        add_out = addl()
        # ...stored order is topological: branch heads, relus, branch
        # tails, sum, x0.1, x0.9, out-add
        return [a1, b1, act_a, act_b, a2, b2, add_sum, lam01, lam09, add_out]

    for _ in range(n_body53):
        plan += light53()
    for _ in range(n_light):  # light: a chain — creation == topological
        plan += [conv((3, 3, F, F)), actl(), conv((3, 3, F, F)), lmb(), addl()]
    plan += [lmb()]  # resizeX4bil
    for _ in range(n_tail53):
        plan += light53()
    plan += [conv((3, 3, F, 3))]
    return plan


def _write_keras_faithful_h5(path, seed=2, root_layout=False, **plan_kw):
    """``root_layout=True`` writes the ``save_weights`` file shape: layer
    groups + ``layer_names`` at the FILE ROOT instead of under a
    ``model_weights`` group (Keras writes the wrapper only in full-model
    saves; ``model.save_weights`` omits it).  ``plan_kw`` forwards reduced
    block counts / features to :func:`_keras_layer_plan`."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        mw = f if root_layout else f.create_group("model_weights")
        names = []
        for name, shape in _keras_layer_plan(**plan_kw):
            names.append(name.encode())
            g = mw.create_group(name)
            if shape is None:
                g.attrs["weight_names"] = []
                continue
            cout = shape[-1]
            # He-scaled weights: signal propagates with O(1) variance through
            # the 0.9/0.1 residual chain, so the golden activations are
            # structured (drift moves them by >> the test tolerance)
            fan_in = shape[0] * shape[1] * shape[2]
            k = (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
            b = (rng.standard_normal((cout,)) * 0.05).astype(np.float32)
            g.create_dataset(f"{name}/kernel:0", data=k)
            g.create_dataset(f"{name}/bias:0", data=b)
            g.attrs["weight_names"] = [
                f"{name}/kernel:0".encode(),
                f"{name}/bias:0".encode(),
            ]
        mw.attrs["layer_names"] = names


def _forward_96(tmp_path):
    model, _ = get_model("didbl")
    params = init_params(model, input_hw=(16, 16))
    path = str(tmp_path / "didbl_full.h5")
    _write_keras_faithful_h5(path)
    params = import_keras_weights(path, "didbl", params)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (1, 96, 96, 3)).astype(np.float32) / 255.0
    y = model.apply({"params": params}, jnp.asarray(x))
    return np.asarray(y, dtype=np.float32)


def test_full_size_h5_import_matches_golden(tmp_path):
    """h5 -> pytree -> f32 forward on a 96^2 tile reproduces the committed
    golden activations.  Regenerate with scripts/make_import_golden.py ONLY
    when the fixture or graph intentionally changes."""
    y = _forward_96(tmp_path)
    assert y.shape == (1, 384, 384, 3)
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run scripts/make_import_golden.py")
    g = np.load(GOLDEN)
    np.testing.assert_allclose(y[0, ::16, ::16, :], g["slice"], atol=1e-3)
    assert abs(float(np.mean(y)) - float(g["mean"])) < 1e-4


def test_save_weights_root_layout_import(tmp_path):
    """Keras ``save_weights`` writes layer groups at the file root (no
    ``model_weights`` wrapper).  The importer must read both layouts to the
    identical tree (VERDICT r3 next-5)."""
    model, _ = get_model("didbl")
    params = init_params(model, input_hw=(8, 8))
    p_wrapped = str(tmp_path / "wrapped.h5")
    p_root = str(tmp_path / "root.h5")
    _write_keras_faithful_h5(p_wrapped, seed=9)
    _write_keras_faithful_h5(p_root, seed=9, root_layout=True)
    a = import_keras_weights(p_wrapped, "didbl", params)
    b = import_keras_weights(p_root, "didbl", params)
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_import_agrees_with_independent_numpy_oracle(tmp_path):
    """De-circularization (VERDICT r3 weak 4): the flax forward over the
    imported tree must agree with tests/oracle_didbl_numpy.py — a
    from-scratch NumPy restatement of the reference graph reading the h5
    DIRECTLY (no importer, no flax, no ops/resize).  A shared day-one wiring
    error would have to be made twice, independently, to pass.  Small input
    keeps the f64 oracle fast; the full 96^2 agreement runs at
    golden-generation time (scripts/make_import_golden.py)."""
    from tests.oracle_didbl_numpy import didbl_numpy_forward

    model, _ = get_model("didbl")
    params = init_params(model, input_hw=(8, 8))
    path = str(tmp_path / "didbl_full.h5")
    _write_keras_faithful_h5(path)
    params = import_keras_weights(path, "didbl", params)
    rng = np.random.default_rng(13)
    x = rng.integers(0, 256, (1, 24, 24, 3)).astype(np.float32) / 255.0
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)), np.float32)
    y_oracle = didbl_numpy_forward(path, x)
    assert y.shape == y_oracle.shape == (1, 96, 96, 3)
    np.testing.assert_allclose(y, y_oracle, atol=2e-3)
    # and the oracle is not trivially flat (the comparison has teeth)
    assert float(np.std(y_oracle)) > 1e-2


def test_oracle_upsample_matches_tf1_construction():
    """The oracle's closed-form TF1 upsample == ops/resize's matmul and
    phase-interleave constructions (three independent statements of
    models.py:1392-1399)."""
    from image_enhance_keras_tpu.ops.resize import (
        resize_bilinear_tf1,
        upsample_phase_tf1,
    )
    from tests.oracle_didbl_numpy import upsample_tf1

    rng = np.random.default_rng(17)
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    want = upsample_tf1(np.asarray(x, np.float64), 4).astype(np.float32)
    got_mat = np.asarray(resize_bilinear_tf1(jnp.asarray(x), (20, 28)))
    got_phase = np.asarray(upsample_phase_tf1(jnp.asarray(x[None]), 4)[0])
    np.testing.assert_allclose(got_mat, want, atol=1e-5)
    np.testing.assert_allclose(got_phase, want, atol=1e-5)


def test_flax_conv_matches_numpy_oracle():
    """Independent HWIO proof: flax nn.Conv(SAME) == hand-written NumPy
    correlation on the same kernel/bias."""
    import flax.linen as nn

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 9, 10, 3)).astype(np.float32)
    k = rng.standard_normal((3, 5, 3, 4)).astype(np.float32)  # HWIO
    b = rng.standard_normal((4,)).astype(np.float32)

    conv = nn.Conv(4, (3, 5), padding="SAME")
    y = np.asarray(conv.apply({"params": {"kernel": k, "bias": b}}, jnp.asarray(x)))

    # NumPy oracle: zero-pad, correlate
    ph, pw = 1, 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    want = np.zeros_like(y)
    for i in range(9):
        for j in range(10):
            window = xp[0, i : i + 3, j : j + 5, :]  # (3,5,3)
            want[0, i, j] = np.einsum("hwi,hwio->o", window, k) + b
    np.testing.assert_allclose(y, want, atol=1e-4)


def test_weightless_layers_interleaved_are_skipped(tmp_path):
    """layer_names containing InputLayer/Lambda entries (as the real file
    does) must not shift the positional conv matching."""
    model, _ = get_model("didbl")
    params = init_params(model, input_hw=(8, 8))
    path = str(tmp_path / "faithful.h5")
    _write_keras_faithful_h5(path, seed=5)
    out = import_keras_weights(path, "didbl", params)

    # independently read conv layers in file order and check positions
    import h5py

    def _s(x):
        return x.decode() if isinstance(x, bytes) else x

    with h5py.File(path, "r") as f:
        mw = f["model_weights"]
        convs = []
        for n in [_s(x) for x in mw.attrs["layer_names"]]:
            wn = [_s(x) for x in mw[n].attrs["weight_names"]]
            if wn:
                convs.append(np.asarray(mw[n][wn[0]]))
    order = keras_conv_order("didbl")
    # first conv -> level1, fifth conv -> body53_0/conv_b2, last -> out
    for pos, keys in ((0, order[0]), (4, order[4]), (len(convs) - 1, order[-1])):
        node = out
        for kk in keys:
            node = node[kk]
        np.testing.assert_array_equal(np.asarray(node["kernel"]), convs[pos])
