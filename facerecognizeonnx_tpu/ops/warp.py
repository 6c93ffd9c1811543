"""Bilinear affine warp on device (cv2::warpAffine semantics).

Replaces the reference's cv2::warpAffine alignment step
(reference: src/face_recognizer.cpp:129-130) and its crop+resize
fallback (:116-127) with one fused device op: both paths are expressed
as an affine matrix, so a batch of faces warps in a single XLA program
regardless of which faces fell back.

cv2.warpAffine conventions reproduced:
  - M maps src→dst; sampling runs through the inverse map
  - bilinear interpolation at half-integer-free pixel centers
  - constant 0 border (border="zero"); border="clamp" replicates edges,
    matching cv2.resize for the crop-fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 2, 3) affine matrices."""
    a, b, tx = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    c, d, ty = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv_det = 1.0 / det
    ia, ib = d * inv_det, -b * inv_det
    ic, id_ = -c * inv_det, a * inv_det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def crop_resize_affine(box_xyxy: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Affine (src→dst) equivalent of crop-to-box then bilinear resize.

    Mirrors the reference's alignment fallback (src/face_recognizer.cpp:116-127):
    crop `box ∩ image` (caller pre-clips the box) then cv2.resize to the
    recognizer input. cv2.resize maps dst center j to src (j+0.5)/a-0.5+x1
    with a = out/w; inverted to forward form here.
    """
    x1, y1, x2, y2 = (box_xyxy[..., i] for i in range(4))
    w = jnp.maximum(x2 - x1, 1e-3)
    h = jnp.maximum(y2 - y1, 1e-3)
    ax = out_w / w
    ay = out_h / h
    tx = (0.5 - x1) * ax - 0.5
    ty = (0.5 - y1) * ay - 0.5
    zeros = jnp.zeros_like(ax)
    row0 = jnp.stack([ax, zeros, tx], axis=-1)
    row1 = jnp.stack([zeros, ay, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def warp_affine_batch(
    frames: jnp.ndarray,
    Ms: jnp.ndarray,
    out_h: int,
    out_w: int,
    border: str = "zero",
) -> jnp.ndarray:
    """Warp K faces from each of B frames in ONE gather.

    frames: (B, H, W, C); Ms: (B, K, 2, 3) forward affines.
    Returns (B, K, out_h, out_w, C) float32.

    TPU note: XLA gathers are per-element-overhead bound; one fused
    gather over a flat (B·H·W, C) operand measures ~2.5x faster than
    B·K separate per-face gathers (50ms → 20ms for 64 faces from 8
    640x640 frames on v5e).
    """
    frames = frames.astype(jnp.float32)
    B, H, W, C = frames.shape
    K = Ms.shape[1]

    Minv = jax.vmap(jax.vmap(invert_affine))(Ms)  # (B, K, 2, 3)
    ys = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    # (B, K, out_h, out_w)
    src_x = (
        Minv[..., 0, 0, None, None] * xs
        + Minv[..., 0, 1, None, None] * ys
        + Minv[..., 0, 2, None, None]
    )
    src_y = (
        Minv[..., 1, 0, None, None] * xs
        + Minv[..., 1, 1, None, None] * ys
        + Minv[..., 1, 2, None, None]
    )
    if border == "clamp":
        src_x = jnp.clip(src_x, 0.0, W - 1.0)
        src_y = jnp.clip(src_y, 0.0, H - 1.0)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = frames.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None, None]

    def sample(yi, xi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        idx = (base + yc * W + xc).reshape(-1)
        vals = jnp.take(flat, idx, axis=0).reshape(B, K, out_h, out_w, C)
        if border == "zero":
            vals = jnp.where(inb[..., None], vals, 0.0)
        return vals

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def warp_affine(
    image: jnp.ndarray,
    M: jnp.ndarray,
    out_h: int,
    out_w: int,
    border: str = "zero",
) -> jnp.ndarray:
    """Warp (H, W, C) image with forward affine M (2, 3) to (out_h, out_w, C).

    Batched over leading dims of M via broadcasting is NOT done here —
    use jax.vmap over M (and optionally image) for a batch of faces; the
    gather below is tiny (out_h*out_w points) next to the embed convnet.
    """
    img = image.astype(jnp.float32)
    H, W = img.shape[0], img.shape[1]
    C = img.shape[2]

    Minv = invert_affine(M)
    ys = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    src_x = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    src_y = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]

    if border == "clamp":
        src_x = jnp.clip(src_x, 0.0, W - 1.0)
        src_y = jnp.clip(src_y, 0.0, H - 1.0)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = img.reshape(H * W, C)
        vals = jnp.take(flat, yc * W + xc, axis=0)  # (out_h, out_w, C)
        if border == "zero":
            vals = jnp.where(inb[..., None], vals, 0.0)
        return vals

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)

    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
