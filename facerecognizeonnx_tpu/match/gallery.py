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


class _Store:
    """One immutable-by-convention version of the bank: (names, feats)
    plus the device-resident copies of THIS version. Mutations install a
    whole new _Store, so a search that grabbed `self._store` once works
    on a consistent snapshot even while another thread enrolls/removes
    (the HTTP server's identify vs DELETE /enroll race — labels can
    never misalign with rows, and a shrinking bank can never IndexError
    a concurrent reader). The device cache avoids a full host→device
    upload per search (205 MB at 100k×512 f32 — seconds on a tunneled
    host) and keeps the bf16 copy AT REST instead of re-cast per call."""

    __slots__ = ("names", "feats", "cache")

    def __init__(self, names: List[str], feats: np.ndarray, cache=None):
        self.names = names
        self.feats = feats
        self.cache: dict = {} if cache is None else cache


class GalleryBank:
    def __init__(self, feature_dim: int = 512):
        import threading

        self.feature_dim = feature_dim
        self._store = _Store([], np.zeros((0, feature_dim), np.float32))
        # serializes the mutators' read-modify-write of _store; readers
        # never take it (they snapshot _store once)
        self._mu = threading.Lock()

    # internals kept as (settable) views for persistence/tests;
    # assignment installs a fresh store = a mutation
    @property
    def _names(self) -> List[str]:
        return self._store.names

    @_names.setter
    def _names(self, value) -> None:
        self._store = _Store(list(value), self._store.feats)

    @property
    def _feats(self) -> np.ndarray:
        return self._store.feats

    @_feats.setter
    def _feats(self, value) -> None:
        self._store = _Store(self._store.names, value)

    @property
    def _dev_cache(self) -> dict:
        return self._store.cache

    def __len__(self) -> int:
        return len(self._store.names)

    @property
    def names(self) -> List[str]:
        return list(self._store.names)

    @property
    def features(self) -> np.ndarray:
        return self._store.feats

    def add(self, name: str, feature: np.ndarray) -> None:
        feat = np.asarray(feature, np.float32).reshape(1, -1)
        if feat.shape[1] != self.feature_dim:
            raise GalleryError(
                f"feature dim {feat.shape[1]} != bank dim {self.feature_dim}"
            )
        norm = np.linalg.norm(feat)
        if norm > 0:
            feat = feat / norm
        with self._mu:
            store = self._store
            self._store = _Store(
                store.names + [name],
                np.concatenate([store.feats, feat], axis=0),
            )

    def add_batch(self, names: Sequence[str], features: np.ndarray) -> None:
        feats = np.asarray(features, np.float32)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = np.where(norms > 0, feats / np.maximum(norms, 1e-20), feats)
        with self._mu:
            store = self._store
            self._store = _Store(
                store.names + list(names),
                np.concatenate([store.feats, feats], axis=0),
            )

    def remove(self, name: str) -> int:
        """Remove EVERY enrollment under `name` (a person may have
        several rows); returns how many were removed. The device-
        resident bank copies invalidate like any other mutation. The
        reference's only 'gallery' is one in-memory webcam feature that
        can merely be overwritten (src/main.cpp:211-212,253-256);
        removal is a production-surface requirement (mis-enrollments,
        data-deletion requests)."""
        with self._mu:
            store = self._store
            keep = [i for i, n in enumerate(store.names) if n != name]
            removed = len(store.names) - len(keep)
            if removed:
                self._store = _Store(
                    [store.names[i] for i in keep], store.feats[keep]
                )
        return removed

    def rename(self, old: str, new: str) -> int:
        """Relabel every enrollment under `old` to `new`; returns the
        row count. Features are untouched, so the device cache carries
        over to the new store version."""
        with self._mu:
            store = self._store
            names = [new if n == old else n for n in store.names]
            n = sum(1 for a, b in zip(store.names, names) if a != b)
            if n:
                self._store = _Store(names, store.feats, cache=store.cache)
        return n

    def _device_feats(self, dtype=None, store: "_Store" = None):
        """`store`'s rows on device at `dtype` (default f32), cached on
        that store version (two racing fills upload twice, last wins —
        benign)."""
        import jax.numpy as jnp

        if store is None:
            store = self._store
        key = "f32" if dtype is None else jnp.dtype(dtype).name
        if key not in store.cache:
            arr = jnp.asarray(store.feats)
            if dtype is not None:
                arr = arr.astype(dtype)
            store.cache[key] = arr
        return store.cache[key]

    def device_bank_padded(
        self, min_rows: int = 64, store: "_Store" = None, sharding=None
    ):
        """(device rows zero-padded to a power-of-two bucket ≥ min_rows,
        n_real, names snapshot) — the operand shape for the one-dispatch
        fused identify (pipeline/fused.frames_to_matches): mutations
        within a bucket reuse the compiled program (pad rows are masked
        there via n_real), and only bucket GROWTH recompiles. Cached per
        (bucket, sharding) on the store version like _device_feats;
        sharding (e.g. a replicated NamedSharding for dp serving) places
        the bank once instead of per dispatch."""
        import jax
        import jax.numpy as jnp

        if store is None:
            store = self._store
        n = store.feats.shape[0]
        gpad = min_rows
        while gpad < n:
            gpad *= 2
        key = ("pad", gpad, sharding)
        if key not in store.cache:
            arr = np.zeros((gpad, self.feature_dim), np.float32)
            arr[:n] = store.feats
            store.cache[key] = (
                jnp.asarray(arr) if sharding is None
                else jax.device_put(arr, sharding)
            )
        return store.cache[key], n, store.names

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
        # ONE snapshot for the whole search: rows, labels, and device
        # cache all come from the same bank version (concurrent
        # enroll/remove installs a new _Store and cannot misalign us)
        store = self._store
        if not store.names:
            return [[] for _ in range(len(queries))], np.zeros((len(queries), 0))
        top_k = min(top_k, len(store.names))
        if sharded:
            from facerecognizeonnx_tpu.parallel.sharded_ops import (
                sharded_topk_search,
            )

            sims, idx = sharded_topk_search(queries, store.feats, top_k)
            sims, idx = np.asarray(sims), np.asarray(idx)
        elif method == "pallas" or (
            # (Q, G) too big to materialize → stream tiles through VMEM
            method == "auto"
            and queries.shape[0] * len(store.names) > 2_000_000_000
            and _on_tpu()
        ):
            import jax.numpy as jnp

            from facerecognizeonnx_tpu.ops.pallas_gallery import (
                gallery_topk_pallas,
            )

            sims, idx = gallery_topk_pallas(
                jnp.asarray(queries), self._device_feats(store=store), top_k
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
                jnp.asarray(queries), self._device_feats(store=store),
                top_k, tile=512,
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
            bank = self._device_feats(storage_dtype, store=store)
            q = jnp.asarray(queries)
            s, i = gallery_topk_reference(
                q if storage_dtype is None else q.astype(storage_dtype),
                bank, top_k,
            )
            sims, idx = np.asarray(s), np.asarray(i)
        names = [[store.names[j] for j in row] for row in idx]
        return names, sims

    def find_duplicates(
        self, threshold: float = 0.8, chunk: int = 128
    ) -> List[Tuple[str, str, float]]:
        """Gallery hygiene: pairs of rows whose similarity exceeds
        `threshold` on the (cos+1)/2 scale — double enrollments under
        different names, or the same name enrolled twice from near-
        identical photos. Returns (name_i, name_j, sim) with i < j,
        sorted by descending similarity; same-name duplicate rows are
        included (they are usually intentional multi-enrollments, so
        callers filter on name_i != name_j for the alarming subset).

        Runs as chunked self-queries through the same device search
        path as identify (one (chunk, D) x (D, G) matmul per chunk);
        a 100k-row bank scans in a few hundred chunk searches.
        """
        store = self._store
        n = len(store.names)
        if n < 2:
            return []
        import jax
        import jax.numpy as jnp

        bank = self._device_feats(store=store)

        @jax.jit
        def chunk_sims(rows, b):
            return (rows @ b.T + 1.0) * 0.5

        out: List[Tuple[str, str, float]] = []
        feats = store.feats
        for lo in range(0, n, chunk):
            rows = jnp.asarray(feats[lo : lo + chunk])
            sims = np.asarray(chunk_sims(rows, bank))
            # keep strictly-upper-triangle pairs so each duplicate pair
            # reports once; the self-pair (i, i) sits on the diagonal
            for r in range(sims.shape[0]):
                i = lo + r
                js = np.nonzero(sims[r, i + 1 :] > threshold)[0] + i + 1
                for j in js:
                    out.append(
                        (store.names[i], store.names[int(j)],
                         float(sims[r, int(j)]))
                    )
        out.sort(key=lambda t: -t[2])
        return out

    # ----------------------------------------------------------- persist

    def save(self, path: str) -> None:
        store = self._store  # one consistent version on disk
        np.savez(
            path,
            features=store.feats,
            names=json.dumps(store.names),
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
