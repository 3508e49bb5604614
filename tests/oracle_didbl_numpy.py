"""Independent NumPy forward oracle for the didbl graph.

De-circularizes the Keras-import golden gate (VERDICT r3 weak 4): the
committed golden activations used to be produced by the same flax forward
they gate, so a day-one wiring error shared by fixture and model was
invisible.  This module restates the reference graph
(/root/reference/models.py:1159-1222) from scratch:

  * weights come straight from the HDF5 file in stored layer order via a
    local h5py read — NOT through models/keras_import.py;
  * convs are SAME-padded correlations as 25/9 shifted matmuls (the
    per-conv oracle proven in test_keras_import_golden.py, extended);
  * the x4 upsample is the TF1 closed form out[f*k+r] = (1-r/f)*in[k] +
    (r/f)*in[k+1, clamped] written directly in NumPy — independent of
    ops/resize.py's matmul construction;
  * block wiring (branch kernel sizes, 0.9/0.1 residual scales, relus)
    is written out against models.py:1177-1199, not imported.

scripts/make_import_golden.py runs this against the flax forward at
golden-generation time and refuses to write a golden the two
implementations disagree on.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_convs_file_order", "didbl_numpy_forward"]


def read_convs_file_order(h5_path: str) -> list[tuple[np.ndarray, np.ndarray]]:
    """(kernel, bias) for every weight-bearing layer, in the file's stored
    ``layer_names`` order.  Local h5py read — independent of the importer."""
    import h5py

    out = []
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = [
            n.decode() if isinstance(n, bytes) else n
            for n in root.attrs["layer_names"]
        ]
        for name in names:
            g = root[name]
            wn = [
                n.decode() if isinstance(n, bytes) else n
                for n in g.attrs.get("weight_names", [])
            ]
            if not wn:
                continue
            kernel = bias = None
            for w in wn:
                arr = np.asarray(g[w], dtype=np.float64)
                if "kernel" in w:
                    kernel = arr
                elif "bias" in w:
                    bias = arr
            if kernel is not None:
                out.append((kernel, bias))
    return out


def conv_same(x: np.ndarray, k: np.ndarray, b: np.ndarray) -> np.ndarray:
    """SAME zero-padded correlation: (H, W, Cin) x (kh, kw, Cin, Cout) ->
    (H, W, Cout), accumulated in float64 as kh*kw shifted matmuls."""
    kh, kw, cin, cout = k.shape
    ph, pw = kh // 2, kw // 2
    h, w = x.shape[:2]
    xp = np.pad(x, ((ph, ph), (pw, pw), (0, 0)))
    y = np.zeros((h * w, cout), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            y += xp[i : i + h, j : j + w].reshape(h * w, cin) @ k[i, j]
    return y.reshape(h, w, cout) + b


def upsample_tf1_axis(x: np.ndarray, axis: int, f: int) -> np.ndarray:
    """TF1 resize_bilinear (align_corners=False) at integer factor f along
    one axis: out[f*k + r] = (1 - r/f) * in[k] + (r/f) * in[k+1], last
    sample clamped (reference models.py:1392-1399 semantics)."""
    x = np.moveaxis(x, axis, 0)
    nxt = np.concatenate([x[1:], x[-1:]], axis=0)
    phases = [(1.0 - r / f) * x + (r / f) * nxt for r in range(f)]
    up = np.stack(phases, axis=1).reshape((x.shape[0] * f,) + x.shape[1:])
    return np.moveaxis(up, 0, axis)


def upsample_tf1(x: np.ndarray, f: int) -> np.ndarray:
    return upsample_tf1_axis(upsample_tf1_axis(x, 0, f), 1, f)


def _relu(x):
    return np.maximum(x, 0.0)


def didbl_numpy_forward(
    h5_path: str,
    x: np.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    convention: str = "topo",
) -> np.ndarray:
    """(1, H, W, 3) [0,1] -> (1, sH, sW, 3): the exact didbl graph
    (models.py:1177-1199) over weights read straight from the h5.

    ``convention`` names the file's light53 conv storage order.  Keras
    ``save_weights`` stores topological ``model.layers`` order — per block
    a1(3x3), b1(5x5), a2(5x5), b2(3x3), both branch heads before the branch
    tails — while sequentially-named non-Keras files carry graph-build
    (creation) order a1, a2, b1, b2 (models.py:1248-1270: branch a =
    3x3 -> relu -> 5x5, branch b = 5x5 -> relu -> 3x3).  Chain segments
    (level1, light blocks, the in-graph x4 bilinear, the out conv) are
    identical under both."""
    if convention not in ("topo", "creation"):
        raise ValueError(f"unknown layer-order convention {convention!r}")
    convs = iter(read_convs_file_order(h5_path))

    def nxt():
        return next(convs)

    h = _relu(conv_same(np.asarray(x[0], np.float64), *nxt()))

    def light53(h):
        if convention == "topo":
            a1, b1, a2, b2 = nxt(), nxt(), nxt(), nxt()
        else:
            a1, a2, b1, b2 = nxt(), nxt(), nxt(), nxt()
        a = conv_same(_relu(conv_same(h, *a1)), *a2)
        b = conv_same(_relu(conv_same(h, *b1)), *b2)
        return 0.9 * h + 0.1 * (a + b)

    for _ in range(n_body53):
        h = light53(h)
    for _ in range(n_light):
        t = _relu(conv_same(h, *nxt()))
        h = h + 0.1 * conv_same(t, *nxt())
    h = upsample_tf1(h, scale)
    for _ in range(n_tail53):
        h = light53(h)
    out = _relu(conv_same(h, *nxt()))
    leftovers = sum(1 for _ in convs)
    if leftovers:
        raise ValueError(
            f"h5 has {leftovers} conv layers beyond the didbl graph"
        )
    return out[None].astype(np.float32)
