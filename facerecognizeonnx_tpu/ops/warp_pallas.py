"""Pallas TPU warp kernels: per-face window DMA + MXU interpolation.

Every XLA-level warp formulation bottoms out in lax.gather, which on
TPU costs per-index and tops out ~12 GB/s even for big windowed slices
(docs/PERFORMANCE.md). These kernels bypass gather entirely. Two
layouts exist:

x-major (v5, `layout="xmajor"`, THE SHIPPING KERNEL — 8.79 vs 21.46
ms/256 faces on v5e, byte-identical output):
  host prologue: 4-level mip pyramid (B, 4, 3, PAD_W, PAD_H) bf16 with
      x in SUBLANES and y in LANES; per-face window (128, 256)
  kernel, grid (faces,): per chunk ONE (3·128, 256)@(256, 1792) bf16
      MXU matmul (y-pass, channels stacked in M), then the hat-weighted
      x-reduction over SUBLANES — 16 vregs per channel instead of the
      y-major kernel's 7-step cross-lane shuffle tree over 256 lanes,
      which the round-2 accounting showed was the dominant VPU phase.
  extras: fused normalize epilogue (embed-ready bf16 RGB out),
      valid-slot skip, (k, N)-transposed scalar tables (SMEM pads each
      prefetch-table row to 512 B — (N, k) cost 512 KB at N=1024).

y-major (v3a, the round-2 kernel, kept for A/B history): window
(WIN_Y, WIN_X) = (128, 256) with y in sublanes; per chunk one
(1792, 128)@(128, 768) matmul then a cross-lane x-reduction.

Semantics match ops/warp_banded.py (zero border, box-filtered mips for
faces bigger than the window); level-0 faces are exact bilinear up to
bf16 hat-weight quantization (~1 intensity LSB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecognizeonnx_tpu.ops.warp import invert_affine

NUM_LEVELS = 4
# DMA starts must be tile-aligned (sublane 16 for bf16, lane 128), so the
# window is oversized to keep ≥COVER px of guaranteed coverage after
# flooring the start to alignment.
#
# Window sizing is a quality/FLOP knob: the hat-weight matmul contracts
# over WIN_Y and its product dim is WIN_X, so (128, 256) halves the
# kernel FLOPs vs the original (176, 384) AND packs the MXU K-dim
# perfectly (K=128). COVER drops 158→110: faces with source span in
# (110, 158] now sample pyramid level 1 — for minification >1.4x the
# box-mip + bilinear pair is an ANTI-ALIASED resample (better than
# cv2's aliasing direct bilinear), so this trades exact-parity range
# for speed without an accuracy loss in embeddings.
# Coverage proof: x_min - x_lo ≤ 127 and span+2 ≤ 112 ≤ 256-127;
#                 y_min - y_lo ≤ 15 and span+2 ≤ 112 ≤ 128-15.
WIN_Y = 128  # 16-aligned start + 110 coverage (slice len ÷16)
WIN_X = 256  # 128-aligned start + 110 coverage (slice len ÷128)
COVER = 110.0
ALIGN_Y, ALIGN_X = 16, 128
PAD_H, PAD_W = 656, 768  # canvas padding so aligned windows always fit
OUT = 112
ROWS_PER_CHUNK = 16
CHUNKS = OUT // ROWS_PER_CHUNK  # 7
# v3: no column padding — chunks are 16 rows x 112 real columns. PIX is
# still a multiple of 128 (1792 = 14 vregs of lanes), so flat VMEM
# stores stay lane-aligned, and EVERY per-pixel tensor (weight gen,
# matmuls, x-pass) shrinks 12.5% vs the v2 (row, 128-padded-col) layout.
PIX = ROWS_PER_CHUNK * OUT  # 1792 flat (row, col) pixels per chunk


def build_pyramid_cf(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) u8 → (B, 4, 3, H, W) bf16 channels-first canvases.

    bf16 because Mosaic has no u8→bf16 cast in-kernel; uint8 values are
    exact in bf16 and the matmuls want bf16 operands anyway."""
    B, H, W, _ = frames_u8.shape
    assert H <= PAD_H - ALIGN_Y and W <= PAD_W - ALIGN_X, (H, W)
    base = jnp.transpose(frames_u8, (0, 3, 1, 2)).astype(jnp.float32)
    level = base
    # write each level straight into one bf16 buffer: no per-level f32
    # canvases, no stack copy, no final cast pass (saves ~200 MB of HBM
    # traffic per 8-frame batch vs the naive stack-then-cast form)
    pyr = jnp.zeros((B, NUM_LEVELS, 3, PAD_H, PAD_W), jnp.bfloat16)
    for lvl in range(NUM_LEVELS):
        if lvl:
            level = (
                lax.reduce_window(
                    level, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                * 0.25
            )
        pyr = lax.dynamic_update_slice(
            pyr,
            jnp.round(level).astype(jnp.bfloat16)[:, None],
            (0, lvl, 0, 0, 0),
        )
    return pyr


def _kernel(iparams_ref, fparams_ref, pyr_ref, out_ref, win_scr, sem,
            xpass_bf16=False, unroll=1):
    """grid = (N,): one step per face.

    DMA is double-buffered ACROSS faces: face f's compute overlaps face
    f+1's window fetch (win_scr has 2 slots; semaphores persist across
    grid steps). The 4 row-chunks run unrolled inside one step — v1 used
    a (N, 4) grid and paid fixed per-step overhead 256 times instead of
    64 (docs/PERFORMANCE.md round-2 agenda item 2)."""
    f = pl.program_id(0)
    n = pl.num_programs(0)
    slot = lax.rem(f, 2)

    def copy_for(face, slot_, c):
        """Channel c's window → scratch columns [c·WIN_X, (c+1)·WIN_X):
        the 3 channels sit side-by-side so the interpolation contracts
        all of them in ONE (PIX, WIN_Y)·(WIN_Y, 3·WIN_X) matmul instead
        of 3 — the kernel is matmul-DISPATCH-bound, not FLOP-bound."""
        b = iparams_ref[face, 0]
        lvl = iparams_ref[face, 1]
        y_lo = pl.multiple_of(iparams_ref[face, 2], ALIGN_Y)
        x_lo = pl.multiple_of(iparams_ref[face, 3], ALIGN_X)
        return pltpu.make_async_copy(
            pyr_ref.at[b, lvl, c, pl.ds(y_lo, WIN_Y), pl.ds(x_lo, WIN_X)],
            win_scr.at[slot_, :, pl.ds(c * WIN_X, WIN_X)],
            sem.at[slot_, c],
        )

    @pl.when(f == 0)
    def _first_fetch():
        for c in range(3):
            copy_for(0, 0, c).start()

    @pl.when(f + 1 < n)
    def _prefetch_next():
        for c in range(3):
            copy_for(f + 1, lax.rem(f + 1, 2), c).start()

    for c in range(3):
        copy_for(f, slot, c).wait()

    af = fparams_ref[f, 0]
    bf_ = fparams_ref[f, 1]
    cf = fparams_ref[f, 2]
    df = fparams_ref[f, 3]
    tx_loc = fparams_ref[f, 4]
    ty_loc = fparams_ref[f, 5]

    ry = lax.broadcasted_iota(jnp.int32, (1, WIN_Y), 1).astype(jnp.float32)
    rx = lax.broadcasted_iota(jnp.int32, (1, WIN_X), 1).astype(jnp.float32)
    zf = lax.broadcasted_iota(jnp.int32, (PIX, 1), 0).astype(jnp.float32)
    # row/col of the flat pixel index: OUT=112 is not a power of two, so
    # the split is float multiply-floor (exact: values ≤ PIX are far below
    # f32 integer precision and the +0.5 bias dwarfs the reciprocal error)
    ii_base = jnp.floor((zf + 0.5) * (1.0 / OUT))
    jj = zf - ii_base * OUT

    # Measured alternatives that LOST on v5e (keep v2's simple loop shape;
    # see docs/PERFORMANCE.md round-2 notes):
    #   - software-pipelining next chunk's weights through the fori_loop
    #     carry: 28.9 vs 23.5 ms — the bf16 carries spill and Mosaic was
    #     already overlapping enough;
    #   - replacing the per-channel cross-lane x-reduction with one
    #     (PIX, 3·WIN_X)@(3·WIN_X, 128) ones-block MXU matmul: 27.5 ms —
    #     the extra t-cast + xw tiling outweigh the reduce it removes.
    def one_chunk(chunk):
        ii = ii_base + chunk * ROWS_PER_CHUNK
        lx = af * jj + bf_ * ii + tx_loc  # (PIX, 1)
        ly = cf * jj + df * ii + ty_loc
        lx = jnp.clip(lx, -2.0, WIN_X + 1.0)
        ly = jnp.clip(ly, -2.0, WIN_Y + 1.0)
        yw = jnp.maximum(0.0, 1.0 - jnp.abs(ly - ry)).astype(jnp.bfloat16)

        # ONE matmul for all 3 channels (windows laid side-by-side)
        if xpass_bf16:
            # v4a: the whole x-pass in bf16 — packed 2/vreg on the VPU,
            # halving the dominant multiply+reduce width. Exactness: each
            # xw row has ≤2 nonzero hat weights, so the bf16 "sum" adds
            # two products of u8-valued pixels — error ≤1 intensity LSB,
            # same bound the bf16 hat weights already imply.
            xw = jnp.maximum(0.0, 1.0 - jnp.abs(lx - rx)).astype(jnp.bfloat16)
            t = jnp.dot(
                yw, win_scr[slot], preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            for c in range(3):
                t_c = t[:, c * WIN_X : (c + 1) * WIN_X]
                out_ref[0, c, pl.ds(chunk * PIX, PIX)] = jnp.sum(
                    t_c * xw, axis=1
                ).astype(jnp.float32)
        else:
            xw = jnp.maximum(0.0, 1.0 - jnp.abs(lx - rx)).astype(jnp.float32)
            t = jnp.dot(
                yw, win_scr[slot], preferred_element_type=jnp.float32
            )  # (PIX, 3*WIN_X)
            for c in range(3):
                t_c = t[:, c * WIN_X : (c + 1) * WIN_X]
                out_ref[0, c, pl.ds(chunk * PIX, PIX)] = jnp.sum(t_c * xw, axis=1)

    if unroll == 1:
        def chunk_body(chunk, _):
            one_chunk(chunk)
            return 0

        lax.fori_loop(0, CHUNKS, chunk_body, 0)
    else:
        # Partial unroll: the j-th and (j+1)-th chunk bodies are
        # data-independent (disjoint out_ref slices, shared read-only
        # window), giving Mosaic's scheduler a chance to overlap chunk
        # i's VPU x-pass with chunk i+1's MXU matmul — the phases run
        # ~sequentially in the fori form (docs/PERFORMANCE.md warp
        # accounting). pl.when guards the ragged tail (CHUNKS=7).
        n_steps = (CHUNKS + unroll - 1) // unroll

        def chunk_body(cb, _):
            for j in range(unroll):
                chunk = cb * unroll + j

                @pl.when(chunk < CHUNKS)
                def _do(chunk=chunk):
                    one_chunk(chunk)
            return 0

        lax.fori_loop(0, n_steps, chunk_body, 0)
    out_ref[0, 3, :] = jnp.zeros((CHUNKS * PIX,), jnp.float32)


# ---------------------------------------------------------------------------
# x-major (v5) layout: the transposed-pyramid candidate from
# docs/PERFORMANCE.md. Windows are stored (x, y) — x in SUBLANES
# (16-aligned DMA starts), y in LANES (128-aligned starts) — so the
# y-pass matmul becomes win(3·128, 256) @ ywT(256, PIX) and, decisively,
# the x-pass reduction runs over SUBLANES (16 vregs, ~15 adds) instead
# of the 7-step cross-lane shuffle tree over 256 lanes that dominated
# the y-major kernel's VPU time (warp accounting: x-pass ~28 µs of the
# 66 µs/face total). Same FLOPs, same hat-weight semantics, same COVER.
#
# Coverage proof (mirrors the y-major one with the alignments swapped):
#   x: x_min - x_lo ≤ 15  and span+2 ≤ 112 ≤ 128-15
#   y: y_min - y_lo ≤ 127 and span+2 ≤ 112 ≤ 256-127
XM_WIN_X = 128  # sublane dim: 16-aligned start + ≥111 coverage
XM_WIN_Y = 256  # lane dim: 128-aligned start + ≥127 coverage
XM_ALIGN_X, XM_ALIGN_Y = 16, 128
XM_PAD_W, XM_PAD_H = 656, 768  # (x, y) canvas: W ≤ 640 ≤ 656-16, H ≤ 640 ≤ 768-128
# fixed-point scales for the merged scalar table (see _kernel_xm)
FP_COEF = float(1 << 20)
FP_TX = float(1 << 16)


def build_pyramid_xm(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) u8 → (B, 4, 3, PAD_W, PAD_H) bf16 x-major canvases
    (same box-filtered mips as build_pyramid_cf, transposed layout)."""
    B, H, W, _ = frames_u8.shape
    assert W <= XM_PAD_W - XM_ALIGN_X and H <= XM_PAD_H - XM_ALIGN_Y, (H, W)
    base = jnp.transpose(frames_u8, (0, 3, 2, 1)).astype(jnp.float32)
    level = base
    pyr = jnp.zeros((B, NUM_LEVELS, 3, XM_PAD_W, XM_PAD_H), jnp.bfloat16)
    for lvl in range(NUM_LEVELS):
        if lvl:
            level = (
                lax.reduce_window(
                    level, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                * 0.25
            )
        pyr = lax.dynamic_update_slice(
            pyr,
            jnp.round(level).astype(jnp.bfloat16)[:, None],
            (0, lvl, 0, 0, 0),
        )
    return pyr


def _kernel_xm(params_ref, pyr_ref, out_ref, win_scr, sem,
               epilogue=None, skip_invalid=False):
    """x-major kernel, grid = (N,).

    ALL scalar params ride ONE (8, N) int32 table: rows 0-1 are packed
    meta (row0 = b<<8 | lvl<<4 | valid, row1 = x_lo<<16 | y_lo), rows
    2-5 the affine coefficients in Q·2^20 fixed point, rows 6-7 the
    window-local translations in Q·2^16. Fixed point because Mosaic has
    no SCALAR bitcast ('tpu.bitcast' wants vectors), and ONE table
    because XLA:TPU charges each prefetched SMEM operand 512 B ×
    grid-steps REGARDLESS of its shape (measured: s32[1024,2] and
    f32[1024,6] both allocate 512 KB scoped SMEM) — two operands at
    N=1024 hit the 1 MB SMEM ceiling exactly, which was the entire
    batch-128 compile failure. Precision: 2^-20 px per output step /
    2^-16 px absolute — far below the bf16 hat-weight quantization.
    Range: coeffs clip to ±2000, translations to ±30000; any TRUE value
    beyond that maps every sample outside the clip window [-2, WIN+1]
    (window coords span ≤ 256), so clipping is semantically exact for
    reachable transforms and keeps degenerate ones finite.
    Same cross-face DMA double-buffering as the y-major kernel.

    epilogue=(mean, scale): emit embed-ready bf16 normalized RGB
    (channel 2-c, (px-mean)/scale) instead of raw f32 BGR — kills the
    separate normalize pass AND shrinks the kernel's HBM write 8/3×.
    skip_invalid: faces with valid=0 skip their window DMA and all
    compute (pl.when), writing zeros — real frames rarely fill all K
    slots (reference embeds only detected faces, src/main.cpp:226).
    """
    f = pl.program_id(0)
    n = pl.num_programs(0)
    slot = lax.rem(f, 2)

    def meta(face):
        w0 = params_ref[0, face]
        w1 = params_ref[1, face]
        b = lax.shift_right_logical(w0, 8)
        lvl = lax.bitwise_and(lax.shift_right_logical(w0, 4), 0xF)
        valid = lax.bitwise_and(w0, 0xF)
        x_lo = pl.multiple_of(lax.shift_right_logical(w1, 16), XM_ALIGN_X)
        y_lo = pl.multiple_of(lax.bitwise_and(w1, 0xFFFF), XM_ALIGN_Y)
        return b, lvl, valid, x_lo, y_lo

    def copy_for(face, slot_, c):
        b, lvl, _, x_lo, y_lo = meta(face)
        return pltpu.make_async_copy(
            pyr_ref.at[b, lvl, c, pl.ds(x_lo, XM_WIN_X), pl.ds(y_lo, XM_WIN_Y)],
            win_scr.at[slot_, pl.ds(c * XM_WIN_X, XM_WIN_X), :],
            sem.at[slot_, c],
        )

    def start_fetch(face, slot_):
        def go():
            for c in range(3):
                copy_for(face, slot_, c).start()
        if skip_invalid:
            pl.when(meta(face)[2] != 0)(go)
        else:
            go()

    @pl.when(f == 0)
    def _first_fetch():
        start_fetch(0, 0)

    @pl.when(f + 1 < n)
    def _prefetch_next():
        start_fetch(f + 1, lax.rem(f + 1, 2))

    valid_f = meta(f)[2]

    def wait_windows():
        for c in range(3):
            copy_for(f, slot, c).wait()

    def fparam(k, scale):
        return params_ref[2 + k, f].astype(jnp.float32) * (1.0 / scale)

    af = fparam(0, FP_COEF)
    bf_ = fparam(1, FP_COEF)
    cf = fparam(2, FP_COEF)
    df = fparam(3, FP_COEF)
    tx_loc = fparam(4, FP_TX)
    ty_loc = fparam(5, FP_TX)

    # pixel index in LANES (the y-major kernel put it in sublanes): the
    # interpolated row t and the x-weights then share the (win-dim,
    # pixel-lane) layout whose reduction runs over sublanes.
    zf = lax.broadcasted_iota(jnp.int32, (1, PIX), 1).astype(jnp.float32)
    ii_base = jnp.floor((zf + 0.5) * (1.0 / OUT))
    jj = zf - ii_base * OUT
    x_iota = lax.broadcasted_iota(jnp.int32, (XM_WIN_X, 1), 0).astype(jnp.float32)
    y_iota = lax.broadcasted_iota(jnp.int32, (XM_WIN_Y, 1), 0).astype(jnp.float32)

    if epilogue is not None:
        mean, scale = epilogue
        out_dtype = jnp.bfloat16
    else:
        out_dtype = jnp.float32

    def one_chunk(chunk):
        ii = ii_base + chunk * ROWS_PER_CHUNK
        lx = af * jj + bf_ * ii + tx_loc  # (1, PIX)
        ly = cf * jj + df * ii + ty_loc
        lx = jnp.clip(lx, -2.0, XM_WIN_X + 1.0)
        ly = jnp.clip(ly, -2.0, XM_WIN_Y + 1.0)
        ywT = jnp.maximum(0.0, 1.0 - jnp.abs(ly - y_iota)).astype(jnp.bfloat16)
        xwT = jnp.maximum(0.0, 1.0 - jnp.abs(lx - x_iota))  # (128, PIX) f32
        # (3·128, 256) @ (256, PIX): K=256, M = exactly 3 MXU tiles
        t = jnp.dot(win_scr[slot], ywT, preferred_element_type=jnp.float32)
        for c in range(3):
            t_c = t[c * XM_WIN_X : (c + 1) * XM_WIN_X]
            s = jnp.sum(t_c * xwT, axis=0)  # sublane reduce: 16 vregs
            if epilogue is not None:
                out_ref[0, 2 - c, pl.ds(chunk * PIX, PIX)] = (
                    (s - mean) * (1.0 / scale)
                ).astype(out_dtype)
            else:
                out_ref[0, c, pl.ds(chunk * PIX, PIX)] = s

    def compute():
        wait_windows()

        def chunk_body(chunk, _):
            one_chunk(chunk)
            return 0

        lax.fori_loop(0, CHUNKS, chunk_body, 0)
        out_ref[0, 3, :] = jnp.zeros((CHUNKS * PIX,), out_dtype)

    if skip_invalid:
        pl.when(valid_f != 0)(compute)

        @pl.when(valid_f == 0)
        def _zero_out():
            out_ref[...] = jnp.zeros(out_ref.shape, out_dtype)
    else:
        compute()


def _warp_affine_pallas_xm(
    frames_u8, Ms, interpret, epilogue, valid
):
    """x-major driver: level select + aligned window starts + packed
    scalar params, then the _kernel_xm grid."""
    B, H, W, _ = frames_u8.shape
    K = Ms.shape[1]
    N = B * K

    pyramid = build_pyramid_xm(frames_u8)

    Minv = jax.vmap(jax.vmap(invert_affine))(Ms)
    a, b_, tx = Minv[..., 0, 0], Minv[..., 0, 1], Minv[..., 0, 2]
    c, d, ty = Minv[..., 1, 0], Minv[..., 1, 1], Minv[..., 1, 2]

    span_x = (OUT - 1) * (jnp.abs(a) + jnp.abs(b_)) + 2.0
    span_y = (OUT - 1) * (jnp.abs(c) + jnp.abs(d)) + 2.0
    extent = jnp.maximum(span_x, span_y)
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(extent / COVER, 1e-6))),
        0,
        NUM_LEVELS - 1,
    )
    factor = jnp.exp2(level)

    af, bf_, cf, df = (v / factor for v in (a, b_, c, d))
    txf = (tx + 0.5) / factor - 0.5
    tyf = (ty + 0.5) / factor - 0.5

    big = 1e7
    x_min = jnp.clip(
        jnp.minimum(af * (OUT - 1), 0.0)
        + jnp.minimum(bf_ * (OUT - 1), 0.0)
        + txf,
        -big,
        big,
    )
    y_min = jnp.clip(
        jnp.minimum(cf * (OUT - 1), 0.0)
        + jnp.minimum(df * (OUT - 1), 0.0)
        + tyf,
        -big,
        big,
    )
    max_x = float(((XM_PAD_W - XM_WIN_X) // XM_ALIGN_X) * XM_ALIGN_X)
    max_y = float(((XM_PAD_H - XM_WIN_Y) // XM_ALIGN_Y) * XM_ALIGN_Y)
    x_lo = jnp.clip(jnp.floor(x_min / XM_ALIGN_X) * XM_ALIGN_X, 0.0, max_x)
    y_lo = jnp.clip(jnp.floor(y_min / XM_ALIGN_Y) * XM_ALIGN_Y, 0.0, max_y)

    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, K))
    if valid is None:
        valid_i = jnp.ones((B, K), jnp.int32)
    else:
        valid_i = valid.reshape(B, K).astype(jnp.int32)
    w0 = (
        (b_idx << 8) | (level.astype(jnp.int32) << 4) | valid_i
    ).reshape(-1)
    w1 = (
        (x_lo.astype(jnp.int32) << 16) | y_lo.astype(jnp.int32)
    ).reshape(-1)
    # ONE merged (8, N) int32 fixed-point table: each prefetched SMEM
    # operand costs 512 B × grid-steps regardless of shape, so a second
    # operand alone exhausts SMEM at N=1024 (_kernel_xm docstring).
    # nan_to_num keeps degenerate transforms (singular M → inf/nan
    # inverse) finite; the clips are semantically exact (docstring).
    def enc(v, scale, lim):
        v = jnp.clip(jnp.nan_to_num(v.reshape(-1)), -lim, lim)
        return jnp.round(v * scale).astype(jnp.int32)

    params = jnp.stack(
        [
            w0,
            w1,
            enc(af, FP_COEF, 2000.0),
            enc(bf_, FP_COEF, 2000.0),
            enc(cf, FP_COEF, 2000.0),
            enc(df, FP_COEF, 2000.0),
            enc(txf - x_lo, FP_TX, 30000.0),
            enc(tyf - y_lo, FP_TX, 30000.0),
        ],
        axis=0,
    )  # (8, N) int32

    out_dtype = jnp.float32 if epilogue is None else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, CHUNKS * PIX), lambda f, *_: (f, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3 * XM_WIN_X, XM_WIN_Y), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_xm, epilogue=epilogue, skip_invalid=valid is not None
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 4, CHUNKS * PIX), out_dtype),
        interpret=interpret,
    )(params, pyramid)

    crops = out[:, :3].reshape(B, K, 3, OUT, OUT)
    return jnp.transpose(crops, (0, 1, 3, 4, 2))


def warp_affine_pallas(
    frames_u8: jnp.ndarray,
    Ms: jnp.ndarray,
    out_size: int = OUT,
    interpret: bool = False,
    xpass_bf16: bool = False,
    unroll: int = 1,
    layout: str = "ymajor",
    epilogue=None,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, H, W, 3) u8 + (B, K, 2, 3) forward affines →
    (B, K, out, out, 3) f32 BGR (zero border).

    layout="xmajor" selects the transposed-pyramid v5 kernel (sublane
    x-reduce instead of the cross-lane tree). epilogue=(mean, scale)
    (xmajor only) returns embed-ready bf16 normalized RGB instead of
    raw f32 BGR. valid (B, K) bool (xmajor only) skips invalid faces'
    DMA + compute entirely, returning zeros in those slots.
    """
    assert out_size == OUT, "kernel is specialized to 112 output"
    if layout == "xmajor":
        return _warp_affine_pallas_xm(frames_u8, Ms, interpret, epilogue, valid)
    assert epilogue is None and valid is None, "ymajor kernel: raw BGR only"
    B, H, W, _ = frames_u8.shape
    K = Ms.shape[1]
    N = B * K

    pyramid = build_pyramid_cf(frames_u8)

    Minv = jax.vmap(jax.vmap(invert_affine))(Ms)
    a, b_, tx = Minv[..., 0, 0], Minv[..., 0, 1], Minv[..., 0, 2]
    c, d, ty = Minv[..., 1, 0], Minv[..., 1, 1], Minv[..., 1, 2]

    # level: the face's full source AABB must fit the guaranteed window
    # coverage (window minus alignment slack)
    span_x = (OUT - 1) * (jnp.abs(a) + jnp.abs(b_)) + 2.0
    span_y = (OUT - 1) * (jnp.abs(c) + jnp.abs(d)) + 2.0
    extent = jnp.maximum(span_x, span_y)
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(extent / COVER, 1e-6))),
        0,
        NUM_LEVELS - 1,
    )
    factor = jnp.exp2(level)

    af, bf_, cf, df = (v / factor for v in (a, b_, c, d))
    txf = (tx + 0.5) / factor - 0.5
    tyf = (ty + 0.5) / factor - 0.5

    big = 1e7
    x_min = jnp.clip(
        jnp.minimum(af * (OUT - 1), 0.0)
        + jnp.minimum(bf_ * (OUT - 1), 0.0)
        + txf,
        -big,
        big,
    )
    y_min = jnp.clip(
        jnp.minimum(cf * (OUT - 1), 0.0)
        + jnp.minimum(df * (OUT - 1), 0.0)
        + tyf,
        -big,
        big,
    )
    # floor starts to DMA tile alignment; canvas padding guarantees the
    # aligned window always fits and still covers the in-frame samples
    max_x = float(((PAD_W - WIN_X) // ALIGN_X) * ALIGN_X)
    max_y = float(((PAD_H - WIN_Y) // ALIGN_Y) * ALIGN_Y)
    x_lo = jnp.clip(jnp.floor(x_min / ALIGN_X) * ALIGN_X, 0.0, max_x)
    y_lo = jnp.clip(jnp.floor(y_min / ALIGN_Y) * ALIGN_Y, 0.0, max_y)

    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, K))
    iparams = jnp.stack(
        [
            b_idx.reshape(-1),
            level.astype(jnp.int32).reshape(-1),
            y_lo.astype(jnp.int32).reshape(-1),
            x_lo.astype(jnp.int32).reshape(-1),
        ],
        axis=-1,
    )  # (N, 4) int32
    fparams = jnp.stack(
        [
            af.reshape(-1),
            bf_.reshape(-1),
            cf.reshape(-1),
            df.reshape(-1),
            (txf - x_lo).reshape(-1),
            (tyf - y_lo).reshape(-1),
        ],
        axis=-1,
    ).astype(jnp.float32)  # (N, 6)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, CHUNKS * PIX), lambda f, *_: (f, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            # double-buffered; 3 channel windows side-by-side in lanes
            pltpu.VMEM((2, WIN_Y, 3 * WIN_X), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, xpass_bf16=xpass_bf16, unroll=unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 4, CHUNKS * PIX), jnp.float32),
        interpret=interpret,
    )(iparams, fparams, pyramid)

    # CHUNKS*PIX = OUT*OUT exactly (no column padding in v3)
    crops = out[:, :3].reshape(B, K, 3, OUT, OUT)
    return jnp.transpose(crops, (0, 1, 3, 4, 2))
