"""Training driver: LR schedule, step loop, periodic eval + checkpoint.

The reference is inference-only — its persistent state is two pre-
trained .onnx files loaded at startup (src/main.cpp:269-284); there is
no training surface to mirror. This driver completes the framework's
training subsystem the TPU way: one jit-compiled SPMD step
(train/trainer.py partial-FC over a ("data", "model") mesh) inside a
host loop that only synchronizes on log boundaries — per-step host
fetches of the loss would serialize the device pipeline, so losses stay
on device between logs and are pulled in one batch.

Resume is crash-safe: `fit(ckpt_path=...)` restores the newest
checkpoint (orbax, sharded arrays restore with their shardings —
utils/checkpoint.load_train_state) and skips the already-trained steps.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def warmup_cosine(
    peak_lr: float,
    total_steps: int,
    warmup_steps: Optional[int] = None,
    end_scale: float = 0.01,
):
    """The standard large-batch recipe: linear warmup → cosine decay.

    Returns an optax schedule; pass it as make_train_step(..., lr=...)
    (optax.sgd takes schedules natively). warmup defaults to
    min(total/10, 1000) steps; the floor is peak_lr * end_scale.
    """
    import optax

    if warmup_steps is None:
        warmup_steps = max(1, min(total_steps // 10, 1000))
    warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=peak_lr * end_scale,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=peak_lr * end_scale,
    )


def fit(
    state,
    step_fn: Callable,
    batches,
    steps: int,
    eval_fn: Optional[Callable] = None,
    eval_every: int = 0,
    ckpt_path: Optional[str] = None,
    ckpt_every: int = 0,
    log_every: int = 50,
    log: Callable[[str], None] = print,
) -> Tuple[object, List[Dict]]:
    """Run `steps` training steps; returns (state, history).

    state/step_fn: from train.trainer init_train_state/make_train_step
    (call inside `with mesh:` for multi-chip runs, as the step was
    built over that mesh). batches: iterator of (images, labels) —
    train.data.IdentityFolderDataset.batches(...) or any equivalent.
    eval_fn(state) -> dict runs every `eval_every` steps (0 = never)
    and its metrics land in history. ckpt_path + ckpt_every persist the
    full TrainState (orbax; final state is always saved); an existing
    checkpoint at ckpt_path resumes — already-done steps are skipped by
    consuming the batch iterator without stepping, so the data order
    matches an uninterrupted run.
    """
    from facerecognizeonnx_tpu.utils.checkpoint import (
        load_train_state,
        save_train_state,
    )

    start_step = 0
    if ckpt_path and os.path.exists(ckpt_path):
        state = load_train_state(ckpt_path, state)
        start_step = int(np.asarray(state.step))
        log(f"resumed from {ckpt_path} at step {start_step}")
    if start_step >= steps:
        return state, []

    history: List[Dict] = []
    pending: List[Tuple[int, object]] = []  # (step, device loss)
    t_log = time.time()

    def drain(extra: Optional[Dict] = None):
        """Pull pending device losses in one sync; one history row per
        logged step window."""
        nonlocal t_log
        if not pending:
            return
        losses = [float(np.asarray(v)) for _, v in pending]
        row = {
            "step": pending[-1][0],
            "loss": losses[-1],
            "loss_mean": float(np.mean(losses)),
            "steps_per_sec": len(pending) / max(time.time() - t_log, 1e-9),
        }
        if extra:
            row.update(extra)
        history.append(row)
        log(
            f"step {row['step']}/{steps} loss {row['loss_mean']:.4f} "
            f"({row['steps_per_sec']:.2f} steps/s)"
            + (f" {extra}" if extra else "")
        )
        pending.clear()
        t_log = time.time()

    it = iter(batches)
    for n in range(steps):
        try:
            images, labels = next(it)
        except StopIteration:
            log(f"data exhausted at step {n}; stopping early")
            break
        if n < start_step:
            continue  # consume for deterministic resume order
        state, loss = step_fn(state, images, labels)
        pending.append((n + 1, loss))
        done = n + 1
        if log_every and (done % log_every == 0 or done == steps):
            extra = None
            if eval_fn and eval_every and done % eval_every == 0:
                extra = eval_fn(state)
            drain(extra)
        elif eval_fn and eval_every and done % eval_every == 0:
            drain(eval_fn(state))
        if ckpt_path and ckpt_every and done % ckpt_every == 0:
            drain()
            save_train_state(ckpt_path, state)
    drain()
    if ckpt_path:
        save_train_state(ckpt_path, state)
    return state, history
