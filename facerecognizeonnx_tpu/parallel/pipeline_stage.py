"""Stage-pipelined (pipeline-parallel) frame→features inference.

The fused program (pipeline/fused.py) runs detect→align→embed on every
chip. This module splits it into TWO pipeline stages over a mesh
"stage" axis instead:

  stage 0 — detector chips: normalize → SCRFD → decode → NMS → umeyama
            align → warp (the VPU-heavy half; SCRFD-500m is
            depthwise-conv/VPU bound — docs/PERFORMANCE.md)
  stage 1 — embed chips: IResNet/MobileFaceNet → L2 norm (the MXU-heavy
            half; ~6 GFLOP/face of dense convs)

Microbatches flow stage 0 → stage 1 through `lax.ppermute` over ICI:
at step t, stage 0 detects+aligns microbatch t while stage 1 embeds
microbatch t-1 — a classic 2-deep pipeline with one warm-up bubble.
Why this mapping is TPU-sane rather than a gimmick:

  * the two stages stress COMPLEMENTARY units (VPU vs MXU), so two
    chips in a pipeline can beat two chips running the fused program
    data-parallel whenever one unit would otherwise idle;
  * each chip keeps only ITS stage's weights resident — the recognizer
    (~166 MB fp32 for w600k_r50, models/README.md:46,51) never touches
    detector chips, halving per-chip weight HBM;
  * the inter-stage wire is small: (micro, K, 112, 112, 3) embed-ready
    crops + fixed-shape Detections, a few MB per hop over ICI.

Composes with data parallelism on an ("data", "stage") mesh: frames
shard over "data", each data replica runs its own 2-stage pipeline.
The reference has no analog (single-process CPU app, SURVEY.md §2
"Parallelism & distributed" row); this is part of the framework's
first-class scaling surface alongside dp (sharded_frames_to_features)
and gallery/model sharding (sharded_topk_search).

All devices execute one SPMD program; `lax.cond` on the stage index
keeps each chip doing only its own stage's work (XLA compiles both
branches, executes one — the skipped branch costs nothing at runtime).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import decode_outputs
from facerecognizeonnx_tpu.detect.pipeline import _forward, postprocess
from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch, embed_crops
from facerecognizeonnx_tpu.ops.image import normalize_to_rgb
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.sharded_ops import pack_recognizer, shard_map
from facerecognizeonnx_tpu.types import Detections

N_STAGES = 2  # detect+align | embed


def _detect_align_stage(det_params, frames_mb, cfg: PipelineConfig, k: int):
    """Stage 0: (M, S, S, 3) u8 frames → (embed-ready crops, Detections).

    Identical math to the front half of pipeline/fused.frames_to_features
    (normalize → SCRFD → decode → per-image postprocess → fused
    align/warp with the normalize epilogue)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = normalize_to_rgb(frames_mb, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
    outs = _forward(det_params, x, dtype)
    scores, boxes, kps = decode_outputs(outs, cfg.det_input_size, cfg.num_anchors)
    dets = jax.vmap(lambda s, b, kk: postprocess(s, b, kk, 1.0, cfg))(
        scores, boxes, kps
    )
    crops = align_faces_batch(
        frames_mb,
        dets.kps[:, :k],
        dets.boxes[:, :k],
        cfg,
        valid=dets.valid[:, :k] if cfg.skip_invalid_faces else None,
        normalized=True,
    )
    return crops, dets


def _embed_stage(arc_params, crops, valid, cfg: PipelineConfig):
    """Stage 1: (M, K, 112, 112, 3) crops → (M, K, 512) features."""
    m, k = crops.shape[0], crops.shape[1]
    feats = embed_crops(
        arc_params, crops.reshape((m * k,) + crops.shape[2:]), cfg,
        normalized=True,
    )
    return feats.reshape(m, k, -1) * valid[..., None].astype(jnp.float32)


def _tp_embed_stage(arc_params, crops, valid, cfg: PipelineConfig, axis: str):
    """Stage 1, tensor-parallel: the recognizer channel-sharded over the
    mesh `axis` (Megatron conv/qkv sharding, parallel/tensor_parallel.py).
    `arc_params` leaves are the LOCAL shards; the crops arrive replicated
    over `axis` (both model columns of stage 0 detect the same frames).
    Same math as _embed_stage up to psum summation order."""
    from facerecognizeonnx_tpu.models.layers import l2_normalize
    from facerecognizeonnx_tpu.parallel.tensor_parallel import tp_apply

    m, k = crops.shape[0], crops.shape[1]
    dtype = jnp.dtype(cfg.compute_dtype)
    feats = tp_apply(
        arc_params,
        crops.reshape((m * k,) + crops.shape[2:]).astype(dtype),
        axis,
        compute_dtype=dtype,
    )
    feats = l2_normalize(feats)
    return feats.reshape(m, k, -1) * valid[..., None].astype(jnp.float32)


def pipelined_frames_to_features(
    det_params,
    arc_params,
    frames_u8,
    cfg: PipelineConfig,
    mesh: Optional[Mesh] = None,
    max_faces_embed: int = 8,
    n_micro: int = 2,
    data_axis: str = "data",
    stage_axis: str = "stage",
    model_axis: str = "model",
) -> Tuple[Detections, jnp.ndarray]:
    """Stage-pipelined fused inference over `mesh[stage_axis]` (size 2).

    frames_u8: (B, S, S, 3) letterboxed BGR uint8. Returns exactly what
    pipeline/fused.frames_to_features returns for the same inputs:
    (Detections over cfg.max_faces slots, (B, K, 512) features) — the
    pipelining is an execution-schedule choice, not a semantic one.

    If `data_axis` is also in the mesh, frames additionally shard over
    it (dp × pp). B is padded up to n_data * n_micro; padding frames
    yield valid=False slots and are stripped before returning.

    If `model_axis` is also in the mesh (size > 1), the embed stage runs
    TENSOR-PARALLEL over it (Megatron channel sharding,
    parallel/tensor_parallel.py) — the full dp × pp × tp composition on
    one 3-axis mesh. Stage-0 (detect+align) work is replicated across
    the model columns; each stage-1 chip keeps only its 1/P slice of the
    recognizer weights and the per-block psums ride ICI within a stage.
    Requires a plain native param pytree (IResNet/ViT) for `arc_params`.
    """
    if mesh is None:
        n = len(jax.devices())
        mesh = make_mesh(
            (data_axis, stage_axis), (n // N_STAGES, N_STAGES)
        )
    if mesh.shape[stage_axis] != N_STAGES:
        raise ValueError(
            f"mesh axis {stage_axis!r} must have size {N_STAGES}, got "
            f"{mesh.shape[stage_axis]}"
        )
    n_data = mesh.shape.get(data_axis, 1)
    has_data = data_axis in mesh.axis_names and n_data > 1
    n_model = mesh.shape.get(model_axis, 1)
    has_model = model_axis in mesh.axis_names and n_model > 1
    if has_model and (hasattr(arc_params, "qstate") or not isinstance(arc_params, dict)):
        raise ValueError(
            "tensor-parallel embed stage needs a plain native param "
            f"pytree (IResNet/ViT); got {type(arc_params).__name__}"
        )

    frames_host = np.asarray(frames_u8)
    b_real = frames_host.shape[0]
    chunk = n_data * n_micro
    pad = (-b_real) % chunk
    if pad:
        frames_host = np.concatenate(
            [frames_host, np.zeros((pad,) + frames_host.shape[1:],
                                   frames_host.dtype)], axis=0
        )
    local_b = frames_host.shape[0] // n_data
    micro = local_b // n_micro
    k = max_faces_embed

    if has_model:
        from facerecognizeonnx_tpu.parallel.tensor_parallel import (
            pack_tp_params,
            recognizer_param_specs,
            validate_tp_width,
        )

        ap_tree = pack_tp_params(arc_params)
        validate_tp_width(ap_tree, mesh.shape[model_axis], model_axis)
        arc_specs = recognizer_param_specs(ap_tree, model_axis)
        rebuild = lambda ap: ap  # leaves are local shards; used as-is
    else:
        ap_tree, rebuild = pack_recognizer(arc_params)
        arc_specs = P()

    # Shape/dtype of the stage-0 outputs (the zero-filled pipeline carry
    # and the cond else-branches must match them exactly).
    mb_aval = jax.ShapeDtypeStruct(
        (micro,) + frames_host.shape[1:], frames_host.dtype
    )
    crops_aval, dets_aval = jax.eval_shape(
        lambda f: _detect_align_stage(det_params, f, cfg, k), mb_aval
    )

    def _zero_crops():
        return jnp.zeros(crops_aval.shape, crops_aval.dtype)

    def _zero_dets():
        return Detections(
            boxes=jnp.zeros(dets_aval.boxes.shape, dets_aval.boxes.dtype),
            scores=jnp.zeros(dets_aval.scores.shape, dets_aval.scores.dtype),
            kps=jnp.zeros(dets_aval.kps.shape, dets_aval.kps.dtype),
            valid=jnp.zeros(dets_aval.valid.shape, dets_aval.valid.dtype),
        )

    feat_dim = cfg.feature_dim

    def body(dp, ap, frames_local):
        stage = lax.axis_index(stage_axis)
        arc = rebuild(ap)
        mbs = frames_local.reshape((n_micro, micro) + frames_local.shape[1:])
        # one extra zero step drains the last microbatch through stage 1
        mbs = jnp.concatenate(
            [mbs, jnp.zeros((1,) + mbs.shape[1:], mbs.dtype)], axis=0
        )

        def step(carry, frames_mb):
            crops_in, dets_in = carry
            crops_out, dets_out = lax.cond(
                stage == 0,
                lambda: _detect_align_stage(dp, frames_mb, cfg, k),
                lambda: (_zero_crops(), _zero_dets()),
            )
            # the collective-free dp/pp path keeps embed under lax.cond
            # (idle stages skip it); the tp path runs it UNCONDITIONALLY
            # on every chip — its per-block psums over model_axis must be
            # executed by all members of each model group, and stage-0
            # chips hold zero crops so their result is masked to zeros by
            # the stage gate below (wasted FLOPs on idle stages, but the
            # schedule overlaps them with real stage-0 work)
            if has_model:
                feats = _tp_embed_stage(
                    arc, crops_in, dets_in.valid[:, :k], cfg, model_axis
                )
                feats = feats * (stage == N_STAGES - 1).astype(jnp.float32)
            else:
                feats = lax.cond(
                    stage == N_STAGES - 1,
                    lambda: _embed_stage(
                        arc, crops_in, dets_in.valid[:, :k], cfg
                    ),
                    lambda: jnp.zeros((micro, k, feat_dim), jnp.float32),
                )
            # shift the inter-stage wire one stage to the right over ICI;
            # stage 0 receives nothing → ppermute fills its carry with
            # zeros, which is exactly the idle-stage state
            shifted = jax.tree_util.tree_map(
                lambda a: lax.ppermute(
                    a, stage_axis,
                    [(i, i + 1) for i in range(N_STAGES - 1)],
                ),
                (crops_out, dets_out),
            )
            # bool can't ride psum: emit valid as int32, scores et al as-is
            dets_emit = dets_in._replace(valid=dets_in.valid.astype(jnp.int32))
            return shifted, (feats, dets_emit)

        _, (feats_seq, dets_seq) = lax.scan(
            step, (_zero_crops(), _zero_dets()), mbs
        )
        # step t emitted microbatch t-1's results (warm-up bubble):
        # drop step 0, keep 1..n_micro
        feats_seq = feats_seq[1:]
        dets_seq = jax.tree_util.tree_map(lambda a: a[1:], dets_seq)
        # results live on the LAST stage's chips (other stages hold
        # zeros): one tiny psum over the stage axis replicates them
        feats_seq, dets_seq = jax.tree_util.tree_map(
            lambda a: lax.psum(a, stage_axis), (feats_seq, dets_seq)
        )
        feats_out = feats_seq.reshape((local_b, k, feat_dim))
        dets_out = Detections(
            boxes=dets_seq.boxes.reshape((local_b,) + dets_seq.boxes.shape[2:]),
            scores=dets_seq.scores.reshape(
                (local_b,) + dets_seq.scores.shape[2:]
            ),
            kps=dets_seq.kps.reshape((local_b,) + dets_seq.kps.shape[2:]),
            valid=dets_seq.valid.reshape(
                (local_b,) + dets_seq.valid.shape[2:]
            ).astype(bool),
        )
        return dets_out, feats_out

    dsh = P(data_axis) if has_data else P()
    fn = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), arc_specs, dsh),
            out_specs=(
                Detections(boxes=dsh, scores=dsh, kps=dsh, valid=dsh),
                dsh,
            ),
            check_rep=False,
        )
    )
    if has_model:
        ap_tree = jax.device_put(
            ap_tree,
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), arc_specs,
                is_leaf=lambda v: isinstance(v, P),
            ),
        )
    x = jax.device_put(frames_host, NamedSharding(mesh, dsh))
    dets, feats = fn(det_params, ap_tree, x)
    dets = Detections(
        boxes=dets.boxes[:b_real],
        scores=dets.scores[:b_real],
        kps=dets.kps[:b_real],
        valid=dets.valid[:b_real],
    )
    return dets, feats[:b_real]
