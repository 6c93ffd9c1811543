"""Train/fine-tune the ArcFace embedder on a device mesh.

Synthetic-data demo of the training subsystem (train/): dp × partial-FC
model parallelism, BN running-stat updates, orbax checkpointing. Swap
`synthetic_batches` for a real (images, labels) source to fine-tune on
actual identities.

Usage:
  python examples/train_arcface.py --steps 20 --classes 128 --batch 32 \
      [--cpu] [--mesh 4x2] [--remat] [--ckpt /tmp/arc_ckpt]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batches(rng, batch, num_classes, size):
    """Class-conditional blobs so the loss has signal to minimize."""
    import numpy as np

    anchors = rng.normal(0, 1, (num_classes, size, size, 3)).astype(np.float32)
    while True:
        labels = rng.integers(0, num_classes, batch)
        images = anchors[labels] + rng.normal(0, 0.3, (batch, size, size, 3))
        yield images.astype(np.float32).clip(-3, 3), labels.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--classes", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--arch", default="iresnet50")
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--mesh", default=None, help="e.g. 4x2 (data x model)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.parallel.mesh import make_mesh
    from facerecognizeonnx_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    if args.mesh:
        d, m = (int(v) for v in args.mesh.split("x"))
        mesh = make_mesh(("data", "model"), (d, m))
    else:
        mesh = make_mesh(("data", "model"))
    print(f"mesh: {dict(mesh.shape)} devices={len(jax.devices())}")

    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=args.size)
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=args.classes, cfg=cfg,
        arch=args.arch, mesh=mesh, lr=args.lr,
    )
    step = make_train_step(mesh, cfg, lr=args.lr, remat=args.remat)

    rng = np.random.default_rng(0)
    data = synthetic_batches(rng, args.batch, args.classes, args.size)
    with mesh:
        for i in range(args.steps):
            images, labels = next(data)
            t0 = time.time()
            state, loss = step(state, jnp.asarray(images), jnp.asarray(labels))
            loss = float(loss)
            print(f"step {i + 1}/{args.steps} loss={loss:.4f} ({time.time() - t0:.2f}s)")

    if args.ckpt:
        from facerecognizeonnx_tpu.utils.checkpoint import save_train_state

        save_train_state(args.ckpt, state)
        print(f"checkpoint saved to {args.ckpt}")


if __name__ == "__main__":
    main()
