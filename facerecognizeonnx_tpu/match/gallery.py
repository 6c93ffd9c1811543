"""1:N identification gallery.

The reference has no gallery (its webcam mode keeps ONE in-memory
reference feature, src/main.cpp:211-212); this is the scaled-up
framework surface the BASELINE.json configs require ("1:N
identification: 100k-embedding gallery cosine-sim matmul search on
MXU"). Small galleries search on the local device in one matmul; large
galleries shard rows across the mesh via parallel/sharded_ops.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np

from facerecognizeonnx_tpu.errors import GalleryError


def _on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except RuntimeError:
        return False


class GalleryBank:
    def __init__(self, feature_dim: int = 512):
        self.feature_dim = feature_dim
        self._names: List[str] = []
        self._feats = np.zeros((0, feature_dim), np.float32)
        # device-resident copies of the bank, keyed by dtype name and
        # invalidated on mutation: without this every search() pays a
        # full host→device upload of the bank (205 MB at 100k×512 f32 —
        # seconds on a tunneled host), and the bf16 copy exists AT REST
        # instead of being re-cast per call
        self._dev_cache: dict = {}

    def __len__(self) -> int:
        return len(self._names)

    @property
    def names(self) -> List[str]:
        return list(self._names)

    @property
    def features(self) -> np.ndarray:
        return self._feats

    def add(self, name: str, feature: np.ndarray) -> None:
        feat = np.asarray(feature, np.float32).reshape(1, -1)
        if feat.shape[1] != self.feature_dim:
            raise GalleryError(
                f"feature dim {feat.shape[1]} != bank dim {self.feature_dim}"
            )
        norm = np.linalg.norm(feat)
        if norm > 0:
            feat = feat / norm
        self._names.append(name)
        self._feats = np.concatenate([self._feats, feat], axis=0)
        self._dev_cache.clear()

    def add_batch(self, names: Sequence[str], features: np.ndarray) -> None:
        feats = np.asarray(features, np.float32)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = np.where(norms > 0, feats / np.maximum(norms, 1e-20), feats)
        self._names.extend(names)
        self._feats = np.concatenate([self._feats, feats], axis=0)
        self._dev_cache.clear()

    def _device_feats(self, dtype=None):
        """Bank rows on device at `dtype` (default f32), cached until the
        bank mutates."""
        import jax.numpy as jnp

        key = "f32" if dtype is None else jnp.dtype(dtype).name
        if key not in self._dev_cache:
            arr = jnp.asarray(self._feats)
            if dtype is not None:
                arr = arr.astype(dtype)
            self._dev_cache[key] = arr
        return self._dev_cache[key]

    # ------------------------------------------------------------ search

    def search(
        self,
        queries: np.ndarray,
        top_k: int = 1,
        sharded: bool = False,
        method: str = "auto",
        storage_dtype=None,
    ) -> Tuple[List[List[str]], np.ndarray]:
        """(Q, D) L2-normalized queries → (names [Q][top_k], sims (Q, top_k))
        on the (cos+1)/2 scale.

        sharded=True distributes gallery rows over the device mesh
        (parallel/sharded_ops.sharded_topk_search). method: "auto" uses
        XLA materialize+top_k (fastest by scan-amortized device timing:
        0.65 ms for Q=128 x G=100k on v5e — lax.top_k is NOT the
        bottleneck it appears under per-dispatch timing), escalating to
        the streaming Pallas kernel only when (Q, G) cannot
        materialize; "tiled"/"pallas"/"xla" force a path."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        if queries.ndim != 2 or queries.shape[1] != self.feature_dim:
            from facerecognizeonnx_tpu.errors import InvalidInputError

            raise InvalidInputError(
                f"query shape {queries.shape} incompatible with "
                f"{self.feature_dim}-d gallery"
            )
        if len(self) == 0:
            return [[] for _ in range(len(queries))], np.zeros((len(queries), 0))
        top_k = min(top_k, len(self))
        if sharded:
            from facerecognizeonnx_tpu.parallel.sharded_ops import (
                sharded_topk_search,
            )

            sims, idx = sharded_topk_search(queries, self._feats, top_k)
            sims, idx = np.asarray(sims), np.asarray(idx)
        elif method == "pallas" or (
            # (Q, G) too big to materialize → stream tiles through VMEM
            method == "auto"
            and queries.shape[0] * len(self) > 2_000_000_000
            and _on_tpu()
        ):
            import jax.numpy as jnp

            from facerecognizeonnx_tpu.ops.pallas_gallery import (
                gallery_topk_pallas,
            )

            sims, idx = gallery_topk_pallas(
                jnp.asarray(queries), self._device_feats(), top_k
            )
            sims, idx = np.asarray(sims), np.asarray(idx)
        elif method == "tiled":
            if top_k > 512:
                raise ValueError(
                    f"method='tiled' supports top_k <= 512 (tile size); "
                    f"got top_k={top_k} — use method='xla' or 'auto'"
                )
            # NEGATIVE result kept for completeness: scan-amortized
            # device timing (Q=128, G=100k, v5e) measures tiled512 at
            # 2.71 ms vs 0.65 ms for materialize+lax.top_k — XLA's
            # top_k is already hierarchical internally; the explicit
            # two-stage form only adds passes. (Per-dispatch timings
            # that suggested otherwise were tunnel-noise artifacts —
            # docs/PERFORMANCE.md "measurement discipline".)
            import jax.numpy as jnp

            from facerecognizeonnx_tpu.ops.pallas_gallery import (
                gallery_topk_tiled,
            )

            sims, idx = gallery_topk_tiled(
                jnp.asarray(queries), self._device_feats(), top_k, tile=512
            )
            sims, idx = np.asarray(sims), np.asarray(idx)
        else:
            import jax.numpy as jnp

            from facerecognizeonnx_tpu.ops.pallas_gallery import (
                gallery_topk_reference,
            )

            # storage_dtype=bf16 keeps the bank resident at half width —
            # a CAPACITY option (102 vs 205 MB at 100k×512; top-1 recall
            # parity tested in tests/test_pallas_gallery.py), NOT a
            # throughput one: measured 145.8k q/s bf16-at-rest vs 153.1k
            # f32 on v5e (BENCH_r03) — the search is not purely
            # bandwidth-bound at this size, so f32 stays the default
            bank = self._device_feats(storage_dtype)
            q = jnp.asarray(queries)
            s, i = gallery_topk_reference(
                q if storage_dtype is None else q.astype(storage_dtype),
                bank, top_k,
            )
            sims, idx = np.asarray(s), np.asarray(i)
        names = [[self._names[j] for j in row] for row in idx]
        return names, sims

    # ----------------------------------------------------------- persist

    def save(self, path: str) -> None:
        np.savez(
            path,
            features=self._feats,
            names=json.dumps(self._names),
            feature_dim=self.feature_dim,
        )

    @classmethod
    def load(cls, path: str) -> "GalleryBank":
        if not os.path.exists(path):
            raise GalleryError(f"gallery file not found: {path}")
        with np.load(path, allow_pickle=False) as data:
            bank = cls(feature_dim=int(data["feature_dim"]))
            bank._feats = np.asarray(data["features"], np.float32)
            bank._names = list(json.loads(str(data["names"])))
        return bank
