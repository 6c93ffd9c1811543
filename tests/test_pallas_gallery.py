"""Streaming gallery top-k Pallas kernel vs XLA reference (interpret
mode on CPU; the same kernel compiles for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.ops.pallas_gallery import (
    gallery_topk_pallas,
    gallery_topk_reference,
)


def _normed(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("g,k,tile", [(512, 5, 128), (1000, 8, 256), (130, 3, 128)])
def test_matches_reference(rng, g, k, tile):
    queries = jnp.asarray(_normed(rng, 4))
    gallery = jnp.asarray(_normed(rng, g))
    s_p, i_p = gallery_topk_pallas(queries, gallery, k, tile=tile, interpret=True)
    s_r, i_r = gallery_topk_reference(queries, gallery, k)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))


def test_padding_rows_never_win(rng):
    # tiny gallery, big tile → mostly padding; all results must be real rows
    queries = jnp.asarray(_normed(rng, 2))
    gallery = jnp.asarray(_normed(rng, 5) * 0.01)  # low-similarity rows
    s, i = gallery_topk_pallas(queries, gallery, 5, tile=128, interpret=True)
    assert np.asarray(i).max() < 5
    assert np.isfinite(np.asarray(s)).all()


def test_self_query_ranks_first(rng):
    gallery = jnp.asarray(_normed(rng, 64))
    s, i = gallery_topk_pallas(gallery[:3], gallery, 2, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], [0, 1, 2])
    np.testing.assert_allclose(np.asarray(s)[:, 0], 1.0, atol=1e-5)
