"""Pallas TPU kernel: streaming fused gallery similarity + top-k.

The 1:N identification hot path (BASELINE.json config 5: 100k-embedding
gallery search). The naive XLA form materializes the full (Q, G)
similarity matrix to HBM before top-k; this kernel streams gallery TILES
through VMEM instead:

  grid step t:  sims = (Q, D) x (D, T) on the MXU  →  (sims+1)/2
                merge into a running (Q, k) top-k held in VMEM scratch
                (k-step unrolled argmax-and-mask — no sort primitive)

HBM traffic drops from O(Q·G) similarity writes + reads to just the
gallery stream itself (which is unavoidable), and the (Q, k) result.
Top-k selection overlaps the next tile's matmul via the normal Pallas
double-buffered pipeline.

Measured reality check (scan-amortized device timing, v5e, Q=128,
G=100k): the XLA materialize+top_k reference runs 0.65 ms — near the
gallery-read bandwidth floor — vs 1.36 ms for this kernel, so the
kernel only wins where (Q, G) cannot materialize in HBM (~2G+
similarity elements); GalleryBank.search auto-escalates on that
boundary. A jnp reference implementation (same math, XLA) backs tests
and non-TPU platforms.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")  # python float: jnp constants would be captured tracers


def _merge_topk(cat_s: jnp.ndarray, cat_i: jnp.ndarray, k: int):
    """Running-top-k merge without a sort primitive (Mosaic-friendly):
    k unrolled rounds of (argmax → one-hot extract → mask out)."""
    q = cat_s.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, cat_s.shape, 1)
    out_s = []
    out_i = []
    s = cat_s
    for _ in range(k):
        am = jnp.argmax(s, axis=1)  # (Q,)
        onehot = col_ids == am[:, None]
        out_s.append(jnp.max(s, axis=1))
        out_i.append(jnp.sum(jnp.where(onehot, cat_i, 0), axis=1))
        s = jnp.where(onehot, NEG_INF, s)
    return (
        jnp.stack(out_s, axis=1),  # (Q, k)
        jnp.stack(out_i, axis=1).astype(jnp.int32),
    )


def _kernel(q_ref, g_ref, out_s_ref, out_i_ref, s_scr, i_scr, *, tile, k, n_real):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        s_scr[:] = jnp.full(s_scr.shape, NEG_INF, jnp.float32)
        i_scr[:] = jnp.zeros(i_scr.shape, jnp.int32)

    sims = jnp.dot(
        q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32
    )
    sims = (sims + 1.0) * 0.5
    ids = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + t * tile
    sims = jnp.where(ids < n_real, sims, NEG_INF)  # mask padding rows

    cat_s = jnp.concatenate([s_scr[:], sims], axis=1)
    cat_i = jnp.concatenate([i_scr[:], ids], axis=1)
    new_s, new_i = _merge_topk(cat_s, cat_i, k)
    s_scr[:] = new_s
    i_scr[:] = new_i

    @pl.when(t == pl.num_programs(0) - 1)
    def _flush():
        out_s_ref[:] = s_scr[:]
        out_i_ref[:] = i_scr[:]


def gallery_topk_pallas(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, D) x (G, D) → ((Q, k) sims on the (cos+1)/2 scale, (Q, k) idx).

    Pads G up to a tile multiple; padded rows can never win (masked to
    -inf inside the kernel). k is clamped to the real gallery size by the
    caller if needed — here it must be ≤ padded G.
    """
    queries = jnp.asarray(queries, jnp.float32)
    gallery = jnp.asarray(gallery, jnp.float32)
    qn, d = queries.shape
    n_real = gallery.shape[0]
    tile = min(tile, max(128, 1 << (n_real - 1).bit_length()))
    pad = (-n_real) % tile
    if pad:
        gallery = jnp.concatenate(
            [gallery, jnp.zeros((pad, d), jnp.float32)], axis=0
        )
    g_padded = gallery.shape[0]
    grid = g_padded // tile

    kernel = functools.partial(_kernel, tile=tile, k=k, n_real=n_real)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qn, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn, k), jnp.float32),
            pltpu.VMEM((qn, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * d * g_padded,
            bytes_accessed=4 * (qn * d + g_padded * d + 2 * qn * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, gallery)
    return out_s, out_i


def gallery_topk_reference(
    queries: jnp.ndarray, gallery: jnp.ndarray, k: int,
    storage_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA reference with identical semantics (materializes (Q, G)).

    storage_dtype=bf16 reads the gallery (and queries) at half width.
    MEASURED NEGATIVE for throughput (BENCH_r03, v5e, 100k×512): bf16
    at rest 145.8k q/s vs f32 153.1k — the bandwidth-floor hypothesis
    did not survive contact; the search is not purely gallery-read
    bound at this size. It remains the HBM-capacity option (half the
    resident bytes; the matmul still accumulates f32; L2-normalized
    features lose ~2^-8 relative per element, ~1e-4 on the summed
    cosine — top-k recall parity tested in tests/test_pallas_gallery.py)."""
    if storage_dtype is not None:
        queries = queries.astype(storage_dtype)
        gallery = gallery.astype(storage_dtype)
    sims = (jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32) + 1.0) * 0.5
    s, i = jax.lax.top_k(sims, k)
    return s, i.astype(jnp.int32)


def gallery_topk_tiled(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    tile: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT hierarchical top-k: per-tile top-k, then top-k of winners.

    The true top-k rows live in at most k tiles' own top-k sets, so two
    stages are exact, and stage 2 sorts only (G/tile)*k values. Requires
    k ≤ tile.

    MEASURED NEGATIVE RESULT (kept for completeness + as the exactness
    oracle for tiling-based sharded variants): scan-amortized device
    timing on v5e (Q=128, G=100k, k=5) puts this at 2.71 ms vs 0.65 ms
    for plain materialize+lax.top_k — XLA's top_k is already internally
    hierarchical, so the explicit staging only adds passes
    (docs/PERFORMANCE.md). GalleryBank's auto path does NOT pick it.
    """
    assert k <= tile, (k, tile)
    queries = jnp.asarray(queries, jnp.float32)
    gallery = jnp.asarray(gallery, jnp.float32)
    qn = queries.shape[0]
    n_real = gallery.shape[0]
    sims = (
        jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32) + 1.0
    ) * 0.5
    pad = (-n_real) % tile
    if pad:
        sims = jnp.concatenate(
            [sims, jnp.full((qn, pad), NEG_INF, jnp.float32)], axis=1
        )
    nt = sims.shape[1] // tile
    s3 = sims.reshape(qn, nt, tile)
    v1, i1 = jax.lax.top_k(s3, k)  # (Q, nt, k) — sorts are tile-wide
    flat_i = i1 + (jnp.arange(nt, dtype=jnp.int32) * tile)[None, :, None]
    v2, sel = jax.lax.top_k(v1.reshape(qn, nt * k), k)
    idx = jnp.take_along_axis(flat_i.reshape(qn, nt * k), sel, axis=1)
    return v2, idx.astype(jnp.int32)
