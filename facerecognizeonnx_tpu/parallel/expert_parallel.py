"""Expert parallelism: per-domain specialist recognizers over a mesh.

The reference is a single-model app (one w600k_r50.onnx embeds every
face, src/main.cpp:281). Production face systems routinely keep several
SPECIALIST recognizers — per-pose / per-camera / per-demographic
fine-tunes of the same architecture — and route each face to the right
one. On TPU the idiomatic form of that is expert parallelism (the MoE
dispatch/combine pattern): every mesh shard of an "expert" axis holds
ONE expert's full weights resident in its HBM, each face crop is routed
to its expert's chip with a capacity-bucketed `lax.all_to_all` over
ICI, embedded there, and carried back by the inverse all_to_all. Chips
never exchange weights — only the (C, 112, 112, 3) crop buffers and the
(C, 512) features move, so the wire cost per face is ~37 KB + 2 KB
regardless of model size.

This completes the framework's parallel surface (SURVEY.md §2
checklist: dp — sharded_ops; tp — tensor_parallel; pp —
pipeline_stage; sp analog — the sharded gallery axis; ep — here).

Experts share one architecture (identical param pytree structure), so
the program is SPMD: the same compiled embed runs on every chip, only
the resident weights differ. Heterogeneous-architecture ensembles are
deliberately out of scope — they would break the single-program model
and belong at the serving layer (route between separately compiled
programs), not inside one XLA program.

Routing contract: `expert_ids` is any int array the caller computed —
a learned gate, a quality score, or the landmark-geometry router below
(`route_by_yaw`). Within ONE program step, faces beyond an expert's
capacity (or with id outside [0, E)) are NOT embedded; their feature
rows return zero and their `routed` flag is False, mirroring the
reference's empty-feature failure contract
(src/face_recognizer.cpp:254-257). `ep_embed_crops` implements the
overflow recovery on top (default overflow="rerun"): leftovers are
compacted and re-run through the SAME compiled program until every
valid-id face carries its expert's feature — a routing spike costs
extra passes, never wrong/empty features. Faces with ids outside
[0, E) are a caller error and stay routed=False.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.sharded_ops import _pad_rows, shard_map


def stack_experts(params_list: Sequence) -> Tuple:
    """Stack E same-architecture param pytrees along a new leading axis.

    Returns (stacked_pytree, E). Every leaf gains a leading E dim — the
    axis the mesh's "expert" dimension shards, so each chip's local
    leaf slice is exactly its resident experts' weights. Stacking
    happens ON HOST (numpy): the only device-resident copy is the
    SHARDED one make_ep_program places — stacking on the default device
    would demand the full E-expert tree fit one chip, the exact
    constraint ep exists to remove.
    """
    if not params_list:
        raise ValueError("need at least one expert")
    treedefs = {jax.tree_util.tree_structure(p) for p in params_list}
    if len(treedefs) != 1:
        raise ValueError(
            "experts must share one architecture (param pytree "
            f"structures differ: {treedefs})"
        )
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *params_list
    )
    return stacked, len(params_list)


def route_by_yaw(kps, n_experts: int) -> jnp.ndarray:
    """Demonstration router: bucket faces by head yaw from the 5 raw
    (pre-alignment) landmarks.

    The nose x-position relative to the eye span is a monotone yaw
    proxy: ~0.5 frontal, →0/1 toward left/right profile. Buckets split
    [0, 1] evenly, so n_experts=3 gives left-profile / frontal /
    right-profile specialists. kps: (..., 5, 2) in original pixel
    coords, landmark order left-eye, right-eye, nose, mouth corners
    (SURVEY.md C1). Returns int32 ids in [0, n_experts).
    """
    kps = jnp.asarray(kps)
    le_x, re_x, nose_x = kps[..., 0, 0], kps[..., 1, 0], kps[..., 2, 0]
    span = re_x - le_x
    r = jnp.where(
        jnp.abs(span) > 1e-6, (nose_x - le_x) / jnp.where(span == 0, 1, span), 0.5
    )
    r = jnp.clip(r, 0.0, 1.0 - 1e-6)
    return (r * n_experts).astype(jnp.int32)


def _dispatch_combine(x, ids, local_params, n, local_E, capacity, axis, embed_fn):
    """The per-shard MoE dispatch → expert compute → combine body.

    x: (b, S, S, 3) local crops; ids: (b,) global expert ids. Returns
    (feats (b, 512), routed (b,) bool). Runs inside shard_map over
    `axis` (size n); E = n * local_E experts total, expert e resident
    on shard e // local_E.
    """
    b = x.shape[0]
    E = n * local_E
    valid_id = (ids >= 0) & (ids < E)
    ids_c = jnp.where(valid_id, ids, 0)
    # position of each face within its (this-shard, expert) bucket:
    # cumulative count of earlier same-expert faces (invalid ids don't
    # consume slots)
    oh = jax.nn.one_hot(ids_c, E, dtype=jnp.int32) * valid_id[:, None]
    pos = jnp.take_along_axis(jnp.cumsum(oh, axis=0), ids_c[:, None], axis=1)[:, 0] - 1
    keep = valid_id & (pos < capacity)
    pos_w = jnp.where(keep, pos, capacity)  # capacity = out-of-bounds → dropped

    # dispatch buffers: (E, C, S, S, 3); overflow writes drop
    buf = jnp.zeros((E, capacity) + x.shape[1:], x.dtype)
    buf = buf.at[ids_c, pos_w].set(
        jnp.where(keep[:, None, None, None], x, 0), mode="drop"
    )

    # all_to_all over ICI: shard s's block for experts [j*local_E, ...)
    # goes to shard j; received dim 0 indexes the SOURCE shard
    buf = buf.reshape((n, local_E * capacity) + x.shape[1:])
    buf = lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=True)
    xbuf = (
        buf.reshape((n, local_E, capacity) + x.shape[1:])
        .transpose((1, 0, 2) + tuple(range(3, 3 + len(x.shape[1:]))))
        .reshape((local_E, n * capacity) + x.shape[1:])
    )

    if local_E == 1:  # the production layout: one expert per chip
        feats = embed_fn(
            jax.tree_util.tree_map(lambda l: l[0], local_params), xbuf[0]
        )[None]
    else:  # scan over resident experts (same program each step)
        feats = lax.map(lambda pe_xe: embed_fn(*pe_xe), (local_params, xbuf))

    # inverse route: features travel back to their faces' home shards
    d = feats.shape[-1]
    fbuf = (
        feats.reshape(local_E, n, capacity, d)
        .transpose(1, 0, 2, 3)
        .reshape(n, local_E * capacity, d)
    )
    fbuf = lax.all_to_all(fbuf, axis, split_axis=0, concat_axis=0, tiled=True)
    fbuf = fbuf.reshape(E, capacity, d)

    out = fbuf[ids_c, jnp.minimum(pos_w, capacity - 1)]
    out = jnp.where(keep[:, None], out, 0.0)
    return out, keep


def make_ep_program(
    stacked_params,
    n_experts: int,
    cfg: PipelineConfig,
    mesh: Optional[Mesh] = None,
    axis: str = "expert",
    data_axis: Optional[str] = None,
    capacity_factor: float = 1.25,
    local_batch: int = 8,
):
    """Build the expert-parallel embed program ONCE; returns (program, mesh).

    `program(crops_u8, expert_ids)` takes (B, S, S, 3) uint8 BGR crops
    plus per-crop expert ids and returns ((B, 512) L2-normalized
    features, (B,) routed mask). B must equal local_batch × (data-axis
    size × expert-axis size): the crop batch is sharded over BOTH axes
    (the expert axis does double duty as a data axis on the way in,
    exactly like MoE token sharding), then faces cross to their
    expert's shard via all_to_all.

    capacity_factor bounds each expert's per-step buffer at
    ceil(cf × local_batch / E) slots per source shard — the standard
    MoE capacity rule: cf=1.0 fits a perfectly uniform routing; skewed
    routings need more or faces overflow (routed=False).

    Weights are device_put up front: leaf axis 0 (the expert axis)
    sharded over `axis`, so chip j keeps only experts
    [j·E/n, (j+1)·E/n) resident — the whole point of ep is that model
    memory scales OUT with the mesh instead of replicating.
    """
    from facerecognizeonnx_tpu.embed.pipeline import embed_crops

    if mesh is None:
        mesh = make_mesh((axis,))
    n = mesh.shape[axis]
    if n_experts % n != 0:
        raise ValueError(f"{n_experts} experts not divisible over {n} shards")
    local_E = n_experts // n
    batch_axes = (data_axis, axis) if data_axis else (axis,)
    n_batch_shards = int(np.prod([mesh.shape[a] for a in batch_axes]))
    capacity = max(1, math.ceil(capacity_factor * local_batch / n_experts))

    stacked_params = jax.device_put(
        stacked_params,
        NamedSharding(mesh, P(axis)),
    )
    bsh = P(batch_axes)
    in_sharding = NamedSharding(mesh, bsh)

    def embed_fn(p, xs):
        return embed_crops(p, xs, cfg)

    body = functools.partial(
        _dispatch_combine,
        n=n, local_E=local_E, capacity=capacity, axis=axis,
        embed_fn=embed_fn,
    )
    fn = jax.jit(
        shard_map(
            lambda p, x, ids: body(x, ids, p),
            mesh=mesh,
            in_specs=(P(axis), bsh, bsh),
            out_specs=(bsh, bsh),
            check_rep=False,
        )
    )

    def program(crops_u8, expert_ids):
        x = jax.device_put(np.asarray(crops_u8), in_sharding)
        ids = jax.device_put(
            np.asarray(expert_ids, np.int32), in_sharding
        )
        return fn(stacked_params, x, ids)

    program.batch = local_batch * n_batch_shards
    program.capacity = capacity
    return program, mesh


def ep_embed_crops(
    params_list: Sequence,
    expert_ids,
    crops_bgr,
    cfg: PipelineConfig,
    mesh: Optional[Mesh] = None,
    axis: str = "expert",
    data_axis: Optional[str] = None,
    capacity_factor: float = 1.25,
    overflow: str = "rerun",
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot convenience: route B crops across E specialist
    recognizers sharded over the mesh's expert axis.

    Returns ((B, 512) features, (B,) routed), both host numpy.

    overflow="rerun" (default): capacity-overflowed faces are compacted
    and re-run through the SAME compiled program — each pass routes at
    least `capacity` more faces per (shard, expert), so a skewed
    routing converges in a few passes and every valid-id face ends up
    with its expert's exact feature (routed all-True unless ids are
    invalid). A pass that makes no progress stops the loop defensively.
    overflow="drop": single-pass semantics — overflowed rows stay zero
    with routed=False (the reference's empty-feature failure contract,
    src/face_recognizer.cpp:254-257; callers handle leftovers
    themselves). Rows with ids outside [0, E) never route under either
    policy. Pads B to the batch-shard multiple; padded rows carry id −1
    so they consume no expert capacity.
    """
    if overflow not in ("rerun", "drop"):
        raise ValueError(f"overflow must be 'rerun' or 'drop', got {overflow!r}")
    stacked, E = stack_experts(params_list)
    if mesh is None:
        if data_axis is not None:
            raise ValueError(
                "data_axis requires an explicit mesh carrying both axes "
                "(make_mesh((data_axis, axis), shape))"
            )
        # default mesh: the LARGEST device subset the expert count
        # divides — E=2 on an 8-chip host must run on 2 shards, not
        # raise '2 experts not divisible over 8 shards'
        n_dev = len(jax.devices())
        n = max(d for d in range(1, min(E, n_dev) + 1) if E % d == 0)
        mesh = make_mesh((axis,), devices=jax.devices()[:n])
    batch_axes = (data_axis, axis) if data_axis else (axis,)
    n_shards = int(np.prod([mesh.shape[a] for a in batch_axes]))

    crops_host = _pad_rows(np.asarray(crops_bgr), n_shards)
    b_real = np.asarray(crops_bgr).shape[0]
    ids_host = np.full(crops_host.shape[0], -1, np.int32)
    ids_host[:b_real] = np.asarray(expert_ids, np.int32)

    program, mesh = make_ep_program(
        stacked, E, cfg, mesh=mesh, axis=axis, data_axis=data_axis,
        capacity_factor=capacity_factor,
        local_batch=crops_host.shape[0] // n_shards,
    )
    feats, routed = program(crops_host, ids_host)
    # np.array (copy): device arrays view as read-only; the rerun loop
    # scatters into these
    feats, routed = np.array(feats), np.array(routed)
    if overflow == "rerun":
        valid = (ids_host >= 0) & (ids_host < E)
        while True:
            left = np.nonzero(valid & ~routed)[0]
            if len(left) == 0:
                break
            sub_crops = np.zeros_like(crops_host)
            sub_ids = np.full(crops_host.shape[0], -1, np.int32)
            sub_crops[: len(left)] = crops_host[left]
            sub_ids[: len(left)] = ids_host[left]
            f2, r2 = program(sub_crops, sub_ids)  # same compiled program
            f2 = np.asarray(f2)[: len(left)]
            r2 = np.asarray(r2)[: len(left)]
            if not r2.any():  # defensive: cannot happen with capacity ≥ 1
                break
            feats[left[r2]] = f2[r2]
            routed[left[r2]] = True
    return feats[:b_real], routed[:b_real]
