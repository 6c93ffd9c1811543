"""Probe: where do vit_t's 50 ms/256 crops go? (exp_vit_embed.py found
~19 TF/s effective vs ~197 peak.)

Phases timed in isolation at the exact shapes of a vit_t forward
(B=256 crops, T=196 tokens, D=256, H=4 heads, 12 blocks):
  gemms   — the 12 blocks' qkv/proj/mlp GEMMs only, no LN/attention
  ln      — 24 LayerNorms on (B, T, D)
  attn    — 12 x softmax(QK^T)V at (B, H, T, dh)
  attn256 — same with T padded to 256 (lane-aligned) to price the
            196-token padding waste
  full    — the real model forward (reference point)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, x, inner=20, outer=3):
    def prog(x):
        def body(c, _):
            y = fn(c)
            return c + (jnp.sum(y) * 0.0 + 1.0).astype(c.dtype), jnp.sum(y)

        cf, ss = jax.lax.scan(body, x, None, length=inner)
        return ss[-1], cf

    jfn = jax.jit(prog)
    try:
        s, xc = jfn(x)
        float(s)
        t0 = time.time()
        for _ in range(outer):
            s, xc = jfn(xc)
        float(s)
        dt = (time.time() - t0) / (outer * inner) * 1000.0
        print(f"{name:8s}: {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def main():
    B, T, D, H, DEPTH = 256, 196, 256, 4, 12
    dh = D // H
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32), bf)
    w_qkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05, bf)
    w_proj = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05, bf)
    w_m1 = jnp.asarray(rng.normal(size=(D, 4 * D)).astype(np.float32) * 0.05, bf)
    w_m2 = jnp.asarray(rng.normal(size=(4 * D, D)).astype(np.float32) * 0.05, bf)
    print(f"devices: {jax.devices()}", flush=True)

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32).astype(bf)

    def gemms(v):
        h = v.reshape(B * T, D)
        for _ in range(DEPTH):
            q = mm(h, w_qkv)
            h = mm(q[:, :D], w_proj)
            m = mm(h, w_m1)
            h = mm(jax.nn.gelu(m, approximate=False), w_m2)
        return h

    def ln_only(v):
        h = v
        for _ in range(2 * DEPTH):
            f = h.astype(jnp.float32)
            mu = f.mean(-1, keepdims=True)
            var = f.var(-1, keepdims=True)
            h = ((f - mu) * jax.lax.rsqrt(var + 1e-6)).astype(bf)
        return h

    def attn_at(t):
        def fn(v):
            h = v[:, :t]
            for _ in range(DEPTH):
                q = h.reshape(B, t, H, dh)
                s = jnp.einsum("bqhd,bkhd->bhqk", q, q,
                               preferred_element_type=jnp.float32) * dh**-0.5
                a = jax.nn.softmax(s, axis=-1).astype(bf)
                h = jnp.einsum("bhqk,bkhd->bqhd", a, q,
                               preferred_element_type=jnp.float32
                               ).astype(bf).reshape(B, t, D)
            return h
        return fn

    timed("gemms", gemms, x)
    timed("ln", ln_only, x)
    timed("attn", attn_at(T), x)
    x256 = jnp.asarray(rng.normal(size=(B, 256, D)).astype(np.float32), bf)
    timed("attn256", attn_at(256), x256)

    from facerecognizeonnx_tpu.models import vit
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    params = init_on_host(
        lambda: vit.fold_inference_params(
            vit.init_params(jax.random.PRNGKey(0), arch="vit_t")
        )
    )
    crops = jnp.asarray(rng.uniform(-1, 1, (B, 112, 112, 3)).astype(np.float32), bf)
    timed("full", lambda v: vit.apply(params, v, compute_dtype=bf), crops)


if __name__ == "__main__" and "--ablate" not in sys.argv:
    main()


def ablations():
    """full-minus-X deltas: which unpriced op carries the ~17 ms gap
    between the phase sum (26.8 ms) and the full forward (43.4 ms)?"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from facerecognizeonnx_tpu.models import vit
    from facerecognizeonnx_tpu.models import layers as L
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    B = 256
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    params = init_on_host(
        lambda: vit.fold_inference_params(
            vit.init_params(jax.random.PRNGKey(0), arch="vit_t")
        )
    )
    crops = jnp.asarray(rng.uniform(-1, 1, (B, 112, 112, 3)).astype(np.float32), bf)

    timed("full", lambda v: vit.apply(params, v, compute_dtype=bf), crops)

    # (a) LN -> pure cast
    real_ln = vit._layer_norm
    vit._layer_norm = lambda p, x, eps=1e-6: x
    timed("no_ln", lambda v: vit.apply(params, v, compute_dtype=bf), crops)
    vit._layer_norm = real_ln

    # (b) attention -> proj GEMM only (keeps qkv+proj GEMMs, drops
    # slices/reshapes/einsums/softmax)
    real_attn = vit._attention
    def fake_attn(p, x2, b, t, heads, dtype, linear_fn):
        qkv = linear_fn(p["qkv"], x2, compute_dtype=dtype).astype(dtype)
        return linear_fn(p["proj"], qkv[:, : x2.shape[-1]],
                         compute_dtype=dtype).astype(dtype)
    vit._attention = fake_attn
    timed("no_attn", lambda v: vit.apply(params, v, compute_dtype=bf), crops)
    vit._attention = real_attn

    # (c) gelu -> identity is inside apply; approximate instead: time a
    # linear_fn that skips the f32 bias epilogue (cast inside the hook)
    def lean_linear(p, x, compute_dtype=jnp.float32):
        y = jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(compute_dtype)
    timed("lean_lin", lambda v: vit.apply(params, v, compute_dtype=bf,
                                          linear_fn=lean_linear), crops)


if __name__ == "__main__" and "--ablate" in sys.argv:
    ablations()
    sys.exit(0)
