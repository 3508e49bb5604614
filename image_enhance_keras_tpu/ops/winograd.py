"""Winograd/Toom-Cook convolution for the residual-block convs.

Why: the didbl tower is compute-bound on the MXU (~63-71% utilisation,
STATUS.md), so the remaining headroom is *fewer multiplies*, not better
scheduling.  Winograd F(m x m, k x k) computes an m x m output tile with
(m+k-1)^2 elementwise products instead of (m*k)^2 MACs:

    F(2,3): 16 vs 36 products  -> 2.25x fewer MXU FLOPs
    F(2,5): 36 vs 100 products -> 2.78x fewer
    F(4,3): 36 vs 144 products -> 4.0x fewer

For channelled conv the elementwise products become per-transform-position
(P, Cin) x (Cin, Cout) matmuls — exactly MXU shape with Cin = Cout = 128.
XLA has no Winograd pass of its own, so this is net-new FLOP reduction.

Transform construction (instead of hard-coding published matrices): the
transposition principle on Toom-Cook full convolution.  With n = m + k - 1
evaluation points (n-1 finite + infinity):

    full conv:  c = W^{-1} [(V_m u) . (V_k g)]   (exact polynomial mult)
    transpose:  y = V_m^T [(V_k g) . (W^{-T} d)]  == valid correlation

so A^T = V_m^T, G = V_k, B^T = W^{-T}, where V_j is the n x j Vandermonde
of the points (infinity row = leading-coefficient selector) and W = V_n.
Correctness is gated by an exact numerical identity test (float64) in
tests/test_winograd.py, not by trusting any published table.

Numerics on TPU: transforms (entries up to +-2^4 and small fractions) are
applied in f32 on the VPU; only the (P, Cin) x (Cin, Cout) dots run in the
requested compute dtype (bf16 in serving).  F(2,x) keeps the transform
amplification ~1 order of magnitude below F(4,x), which is why m=2 is the
serving default; m=4 for the 3x3s is available behind the same API.

Reference mapping: a drop-in for `lax.conv_general_dilated` on the SAME
3x3/5x5 convs of `_residual_block_light53` / `_residual_block_light`
(/root/reference/models.py:1231-1270).  This is a bench/experiment op only
(scripts/bench_winograd.py + tests) — it is NOT wired into any `--forward`
mode, because the measured roofline says it LOSES to direct conv on v5e:
the 52x MXU:VPU rate ratio makes the VPU-side transforms the bottleneck at
C=128 (see the bench script header for the measured numbers).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["winograd_matrices", "winograd_conv2d_same", "flops_ratio"]


@functools.lru_cache(maxsize=None)
def _matrices_np(m: int, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(A^T (m,n), G (n,k), B^T (n,n)) float64 for F(m, k), n = m+k-1."""
    n = m + k - 1
    # n-1 finite points, symmetric around 0 with small magnitudes (keeps the
    # transform entries small -> bf16/f32-friendly): 0, 1, -1, 2, -2, 3, ...
    pts = [0]
    v = 1
    while len(pts) < n - 1:
        pts.append(v)
        if len(pts) < n - 1:
            pts.append(-v)
        v += 1

    def vand(cols: int) -> np.ndarray:
        """n x cols: rows = [p^0 ... p^(cols-1)]; infinity row selects the
        leading coefficient."""
        V = np.zeros((n, cols), dtype=np.float64)
        for i, p in enumerate(pts):
            V[i] = [float(p) ** j for j in range(cols)]
        V[n - 1, cols - 1] = 1.0  # the infinity point
        return V

    A_t = vand(m).T                       # (m, n)
    G = vand(k)                           # (n, k)
    B_t = np.linalg.inv(vand(n)).T        # (n, n)
    return A_t, G, B_t


def winograd_matrices(m: int, k: int):
    """f32 jnp copies of (A^T, G, B^T) for F(m x m, k x k)."""
    A_t, G, B_t = _matrices_np(m, k)
    return (jnp.asarray(A_t, jnp.float32), jnp.asarray(G, jnp.float32),
            jnp.asarray(B_t, jnp.float32))


def flops_ratio(m: int, k: int) -> float:
    """Direct MACs / Winograd products per m x m output tile (MXU work cut)."""
    n = m + k - 1
    return (m * k) ** 2 / float(n * n)


def _transform_weights(w, G, dtype):
    """(k, k, Cin, Cout) -> (n, n, Cin, Cout): U = G g G^T per channel pair."""
    u = jnp.einsum("ia,abcd->ibcd", G, w.astype(jnp.float32))
    u = jnp.einsum("jb,ibcd->ijcd", G, u)
    return u.astype(dtype)


def winograd_conv2d_same(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    m: int = 2,
    dtype=None,
) -> jnp.ndarray:
    """SAME kxk conv of x (N, H, W, C) via Winograd F(m x m, k x k).

    Transforms run in f32; the n^2 batched (P, Cin) x (Cin, Cout) dots run in
    ``dtype`` (default: x.dtype).  Bit-for-bit this is NOT the direct conv —
    parity is numerical (rtol ~1e-6 f32, ~1e-2 bf16); quality gating happens
    at the SSIM level like the int8 path (EVAL_PROFILES.json).
    """
    n_, h, w_, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    n = m + k - 1
    r = k // 2  # SAME padding
    dot_dtype = dtype or x.dtype

    A_t, G, B_t = winograd_matrices(m, k)
    U = _transform_weights(w, G, dot_dtype)  # (n, n, Cin, Cout)

    # pad: SAME halo + round H/W up to multiples of m
    hp = -(-h // m) * m
    wp = -(-w_ // m) * m
    x_p = jnp.pad(
        x, ((0, 0), (r, hp - h + (n - m - r)), (r, wp - w_ + (n - m - r)), (0, 0))
    ).astype(jnp.float32)
    th, tw = hp // m, wp // m

    # gather the n x n input tiles at stride m as n^2 strided slices:
    # V_tiles[a, b] (N, th, tw, C) = x_p[:, a::m, b::m] windows
    rows = [
        jnp.stack(
            [
                lax.slice(
                    x_p,
                    (0, a, bcol, 0),
                    (n_, a + (th - 1) * m + 1, bcol + (tw - 1) * m + 1, cin),
                    (1, m, m, 1),
                )
                for bcol in range(n)
            ]
        )
        for a in range(n)
    ]
    d = jnp.stack(rows)  # (n, n, N, th, tw, C) f32

    # input transform: V = B^T d B over the two tile dims
    v = jnp.einsum("ia,ab...->ib...", B_t, d)
    v = jnp.einsum("jb,ib...->ij...", B_t, v)

    # per-position channel contraction on the MXU (batched over n*n)
    v2 = v.astype(dot_dtype).reshape(n * n, n_ * th * tw, cin)
    u2 = U.reshape(n * n, cin, cout)
    mprod = lax.dot_general(
        v2, u2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n*n, P, Cout) f32
    mprod = mprod.reshape(n, n, n_, th, tw, cout)

    # output transform: Y = A^T M A -> (m, m, N, th, tw, Cout)
    y = jnp.einsum("ia,ab...->ib...", A_t, mprod)
    y = jnp.einsum("jb,ib...->ij...", A_t, y)

    # interleave the m x m phases back to (N, H, W, Cout)
    y = y.transpose(2, 3, 0, 4, 1, 5)  # (N, th, m, tw, m, C)
    y = y.reshape(n_, hp, wp, cout)[:, :h, :w_, :]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)
