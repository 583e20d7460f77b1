"""Pallas kernel: separable bilinear grid sampling (DySample hot path).

The inference-side bilinear sampler in ops/resample.py expresses
grid_sample as a dense one-hot interpolation matrix A (N_out, H*W) matmul'd
with the source — 6x faster than gathers on TPU because it rides the MXU.
Its remaining cost is NOT the matmul (~3.4 ms of the measured 12.5 ms at
the b128 40→80 DySample): it is A itself. XLA materializes the
(B, N, H*W) matrix in HBM (~10.5 GB at b128), and the step pays its write
+ read back at HBM speed.

This kernel removes that traffic. Bilinear weights factorize exactly:

    A[n, y*W + x] = WY[n, y] * WX[n, x]

with WY/WX carrying 2 taps per row (the corner weights, border-clipped or
zero-masked). WY/WX are built by XLA (B*N*(H+W) work — 20x smaller than
B*N*H*W) and streamed into VMEM; each program forms its A-tile
(TILE_N, H*W) *in VMEM* as an outer product and immediately contracts it
with the resident source tile on the MXU. A never touches HBM.

Replaces the same torch op as ops/resample.py:grid_sample_bilinear
(reference modules_upsample/DySample.py:58-61 F.grid_sample). Training
still uses the gather path (backward residual discipline, see
ops/resample.py); this kernel carries a custom_vjp whose backward defers
to the differentiable one-hot formulation so eval-mode grads stay exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE_N = 512
# whole source must sit in VMEM next to the A-tile; cap matches
# ops/resample.py:_ONEHOT_MAX_SRC sources (<=4096 px) at C<=256 bf16
_VMEM_SRC_LIMIT = 4 * 1024 * 1024


def _taps(g, n_in, zeros: bool):
    """Two 1-D bilinear taps for coordinates g → (idx0, idx1, w0, w1)."""
    g0 = jnp.floor(g)
    frac = g - g0
    i0 = jnp.clip(g0, 0, n_in - 1).astype(jnp.int32)
    i1 = jnp.clip(g0 + 1, 0, n_in - 1).astype(jnp.int32)
    w0 = 1.0 - frac
    w1 = frac
    if zeros:
        w0 = w0 * ((g0 >= 0) & (g0 <= n_in - 1))
        w1 = w1 * ((g0 + 1 >= 0) & (g0 + 1 <= n_in - 1))
    return i0, i1, w0, w1


def _tap_matrix(g, n_in, zeros: bool, dtype):
    """(B, N, n_in) two-tap weight rows: W[b,n,i] = w0*(i==i0) + w1*(i==i1).

    Built with B*N*n_in comparisons — the cheap factor of the one-hot
    matrix. Coincident taps (border clip) sum, matching the additive corner
    accumulation of ops/resample.py:_sample_bilinear_onehot.
    """
    i0, i1, w0, w1 = _taps(g, n_in, zeros)
    ar = jnp.arange(n_in, dtype=jnp.int32)
    m = (i0[..., None] == ar) * w0[..., None] + (i1[..., None] == ar) * w1[..., None]
    return m.astype(dtype)


def _kernel(wy_ref, wx_ref, x_ref, ey_ref, ex_ref, o_ref):
    # A[n, y*W+x] = WY[n,y] * WX[n,x], formed as two selection matmuls with
    # constant 0/1 spreading matrices (EY[y, y*W+x] = 1, EX[x, y*W+x] = 1).
    # Mosaic-safe: rank-2 ops only (rank-3 broadcasts with a 40-wide minor
    # dim fail tpu.reshape legalization). Exact: every EY/EX column has a
    # single nonzero, so the "accumulation" is pure selection.
    ay = jnp.dot(wy_ref[0], ey_ref[:], preferred_element_type=jnp.float32)
    ax = jnp.dot(wx_ref[0], ex_ref[:], preferred_element_type=jnp.float32)
    a = (ay * ax).astype(x_ref.dtype)
    o_ref[0] = jnp.dot(
        a, x_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_sample(x, gy, gx, padding_mode: str, interpret: bool = False):
    b, h, w, c = x.shape
    n = gy.shape[1]
    zeros = padding_mode == "zeros"
    wy = _tap_matrix(gy, h, zeros, x.dtype)  # (B, N, H)
    wx = _tap_matrix(gx, w, zeros, x.dtype)  # (B, N, W)

    tn = min(_TILE_N, n)
    n_pad = -n % tn
    if n_pad:
        wy = jnp.pad(wy, ((0, 0), (0, n_pad), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, n_pad), (0, 0)))
    grid = (b, (n + n_pad) // tn)

    # constant 0/1 spreaders: EY[y, s] = (s // W == y), EX[x, s] = (s % W == x)
    s_ids = jnp.arange(h * w, dtype=jnp.int32)
    ey = (s_ids[None, :] // w == jnp.arange(h, dtype=jnp.int32)[:, None]).astype(x.dtype)
    ex = (s_ids[None, :] % w == jnp.arange(w, dtype=jnp.int32)[:, None]).astype(x.dtype)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tn, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, h * w, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((h, h * w), lambda i, j: (0, 0)),
            pl.BlockSpec((w, h * w), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(wy, wx, x.reshape(b, h * w, c), ey, ex)
    return out[:, :n]


def _onehot_reference(x, gy, gx, padding_mode: str):
    """Differentiable XLA twin (same math, A materialized) — backward pass
    and non-TPU fallback."""
    from ..ops.resample import _sample_bilinear_onehot

    return _sample_bilinear_onehot(x, gy, gx, padding_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sample_bilinear_separable(x, gy, gx, padding_mode: str = "border",
                              interpret: bool = False):
    """Bilinear-sample NHWC `x` at pixel coords gy/gx (B, N) → (B, N, C).

    Forward runs the fused Pallas kernel (A-tile never leaves VMEM);
    backward differentiates the equivalent one-hot formulation.
    """
    return _pallas_sample(x, gy, gx, padding_mode, interpret)


def _fwd(x, gy, gx, padding_mode, interpret):
    return _pallas_sample(x, gy, gx, padding_mode, interpret), (x, gy, gx)


def _bwd(padding_mode, interpret, res, g):
    x, gy, gx = res
    _, vjp = jax.vjp(lambda *a: _onehot_reference(*a, padding_mode), x, gy, gx)
    return vjp(g)


sample_bilinear_separable.defvjp(_fwd, _bwd)


def supported(x, gy, gx) -> bool:
    """Whether the Pallas path handles these shapes (source resident in
    VMEM; 2-D flat coords)."""
    b, h, w, c = x.shape
    src_bytes = h * w * c * jnp.dtype(x.dtype).itemsize
    tile_bytes = _TILE_N * h * w * jnp.dtype(x.dtype).itemsize
    return gy.ndim == 2 and src_bytes + tile_bytes <= _VMEM_SRC_LIMIT
