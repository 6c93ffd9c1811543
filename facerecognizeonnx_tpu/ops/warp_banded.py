"""Banded affine warp: gather bands, interpolate with MXU matmuls.

XLA TPU gathers cost ~per-index (docs/PERFORMANCE.md): the classic
4-neighbor formulation needs 4 indices per output pixel (803k for a
64-face batch → ~19 ms on v5e). This formulation needs ONE index per
(face, output ROW):

  1. 4-level mip pyramid of the frames (2x2 mean per level), each level
     stored top-left in a zero (B, 4, H, W, 3) canvas. A face picks the
     level where its source extent fits a static BAND — big/rotated
     faces read a downscaled mip (antialiased; deviates from plain
     bilinear only for faces whose source extent exceeds the band).
  2. One windowed gather per output row: (band, band, 3) patch whose
     start is the row's source-coordinate AABB corner (7168 indices for
     64 faces — 112x fewer, and each window is a contiguous stream).
  3. Exact bilinear INSIDE the band via interpolation matrices built
     from iota (the separable hat filter): a batched (out, band) @
     (band, band*3) MXU matmul for the y-pass, a VPU weighted reduction
     for the x-pass. Zero-border semantics fall out of the hat weights
     (missing neighbors simply contribute nothing).

Numerics: band values are exact in bf16 (uint8 range); hat weights are
bf16 (~1 intensity-LSB worst case vs the f32 gather path). Level-0
faces otherwise match `warp_affine_batch` bilinear exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from facerecognizeonnx_tpu.ops.warp import invert_affine

NUM_LEVELS = 4


def build_pyramid(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 → (B, 4, H, W, 3) uint8 canvases (levels
    1x, 1/2, 1/4, 1/8 at top-left, zeros elsewhere)."""
    B, H, W, _ = frames_u8.shape
    level = frames_u8.astype(jnp.float32)
    canvases = [frames_u8]
    for _ in range(NUM_LEVELS - 1):
        level = (
            lax.reduce_window(
                level, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            * 0.25
        )
        h, w = level.shape[1], level.shape[2]
        canvas = jnp.zeros((B, H, W, 3), jnp.float32)
        canvas = lax.dynamic_update_slice(canvas, level, (0, 0, 0, 0))
        canvases.append((canvas + 0.5).astype(jnp.uint8))
    return jnp.stack(canvases, axis=1)


def warp_affine_banded(
    frames_u8: jnp.ndarray,
    Ms: jnp.ndarray,
    out_size: int = 112,
    band: int = 128,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 + (B, K, 2, 3) forward affines →
    (B, K, out, out, 3) float32 BGR crops (zero border)."""
    B, H, W, _ = frames_u8.shape
    K = Ms.shape[1]
    out = out_size
    N = B * K * out

    pyramid = build_pyramid(frames_u8)  # (B, 4, H, W, 3) u8

    Minv = jax.vmap(jax.vmap(invert_affine))(Ms)  # (B, K, 2, 3)
    a, b_, tx = Minv[..., 0, 0], Minv[..., 0, 1], Minv[..., 0, 2]
    c, d, ty = Minv[..., 1, 0], Minv[..., 1, 1], Minv[..., 1, 2]

    # mip level per face: source extent across out pixels must fit band
    s_col = jnp.maximum(jnp.hypot(a, c), jnp.hypot(b_, d))
    extent = (out - 1) * s_col + 2.0
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(extent / (band - 2.0), 1e-6))),
        0,
        NUM_LEVELS - 1,
    )
    factor = jnp.exp2(level)  # (B, K)

    # rescale the inverse map into mip coordinates (box-mips align pixel
    # centers as (c + 0.5)/f - 0.5)
    af, bf, cf, df = (v / factor for v in (a, b_, c, d))
    txf = (tx + 0.5) / factor - 0.5
    tyf = (ty + 0.5) / factor - 0.5

    ii = jnp.arange(out, dtype=jnp.float32)  # output row index i
    # row-start coords (B, K, out): sx(j) = af*j + (bf*i + txf)
    sx0 = bf[..., None] * ii + txf[..., None]
    sy0 = df[..., None] * ii + tyf[..., None]
    sx_end = sx0 + af[..., None] * (out - 1)
    sy_end = sy0 + cf[..., None] * (out - 1)

    big = 1e7
    x_min = jnp.clip(jnp.minimum(sx0, sx_end), -big, big)
    y_min = jnp.clip(jnp.minimum(sy0, sy_end), -big, big)
    Lw = (W / factor)[..., None]  # mip extent in canvas
    Lh = (H / factor)[..., None]
    x_lo = jnp.clip(jnp.floor(x_min), 0.0, jnp.maximum(Lw - band, 0.0))
    y_lo = jnp.clip(jnp.floor(y_min), 0.0, jnp.maximum(Lh - band, 0.0))

    # gather indices: one per (b, k, i)
    b_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, K, out)
    )
    lvl_idx = jnp.broadcast_to(level.astype(jnp.int32)[..., None], (B, K, out))
    idx = jnp.stack(
        [
            b_idx.reshape(-1),
            lvl_idx.reshape(-1),
            y_lo.astype(jnp.int32).reshape(-1),
            x_lo.astype(jnp.int32).reshape(-1),
        ],
        axis=-1,
    )  # (N, 4)

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2, 3),
    )
    bands = lax.gather(
        pyramid, idx, dn, slice_sizes=(1, 1, band, band, 3)
    )  # (N, band, band, 3) u8
    bands = bands.astype(jnp.bfloat16)

    # local fractional coords per output pixel (N, out_cols)
    jj = jnp.arange(out, dtype=jnp.float32)
    lx = (
        af[..., None, None] * jj + (sx0 - x_lo)[..., None]
    ).reshape(N, out)
    ly = (
        cf[..., None, None] * jj + (sy0 - y_lo)[..., None]
    ).reshape(N, out)
    lx = jnp.clip(lx, -2.0, float(band) + 1.0)
    ly = jnp.clip(ly, -2.0, float(band) + 1.0)

    r = jnp.arange(band, dtype=jnp.float32)
    Yw = jnp.maximum(0.0, 1.0 - jnp.abs(ly[..., None] - r)).astype(jnp.bfloat16)
    Xw = jnp.maximum(0.0, 1.0 - jnp.abs(lx[..., None] - r)).astype(jnp.bfloat16)

    # y-pass on MXU: (N, out, band) @ (N, band, band*3)
    T = lax.dot_general(
        Yw,
        bands.reshape(N, band, band * 3),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, out, band*3)
    T = T.reshape(N, out, band, 3)
    # x-pass on VPU: weighted reduce over the band columns
    out_rows = jnp.sum(T * Xw.astype(jnp.float32)[..., None], axis=2)  # (N, out, 3)
    return out_rows.reshape(B, K, out, out, 3)
