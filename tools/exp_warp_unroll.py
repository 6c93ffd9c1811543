import sys, time, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from facerecognizeonnx_tpu.ops.warp_pallas import warp_affine_pallas

B, K = 32, 8
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3), dtype=np.uint8))
theta = rng.uniform(-0.8, 0.8, (B, K)); scale = rng.uniform(0.3, 1.6, (B, K))
a = scale*np.cos(theta); b = -scale*np.sin(theta)
Ms = np.zeros((B, K, 2, 3), np.float32)
Ms[...,0,0]=a; Ms[...,0,1]=b; Ms[...,0,2]=56*(1-a)-56*b+rng.uniform(-40,40,(B,K))+200
Ms[...,1,0]=-b; Ms[...,1,1]=a; Ms[...,1,2]=56*b+56*(1-a)+rng.uniform(-40,40,(B,K))+200
Ms = jnp.asarray(Ms)

def timed(name, **kw):
    fn = jax.jit(lambda f: (lambda c: (jnp.sum(c.astype(jnp.float32)),
        f + (jnp.abs(jnp.sum(c))*0+1).astype(jnp.uint8)))(
        warp_affine_pallas(f, Ms, **kw)))
    t0=time.time(); s,f2=fn(frames); float(s)
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    for _ in range(2): s,f2=fn(f2)
    float(s); t0=time.time()
    for _ in range(20): s,f2=fn(f2)
    float(s); dt=(time.time()-t0)/20*1000
    print(f"{name}: {dt:7.2f} ms / 256 faces", flush=True)
    return dt

t1 = timed("unroll1 (baseline)")
t2 = timed("unroll2", unroll=2)
print(f"ratio: {t2/t1:.3f}", flush=True)
t3 = timed("unroll2+bf16", unroll=2, xpass_bf16=True)
print(f"ratio bf16: {t3/t1:.3f}", flush=True)
