import time, numpy as np, jax, jax.numpy as jnp
from countr_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from countr_tpu.ops.attention import multi_head_attention
from countr_tpu.ops.pallas_attn import fused_attention

rng = np.random.default_rng(0)
B, N, C, H = 32, 576, 768, 12
q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)

xla = jax.jit(lambda q,k,v: multi_head_attention(q,k,v,H))
pal = jax.jit(lambda q,k,v: fused_attention(q,k,v,H))

print("compiling xla...", flush=True)
a = xla(q,k,v); a.block_until_ready()
print("compiling pallas...", flush=True)
b = pal(q,k,v); b.block_until_ready()
err = float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32))))
print("max abs diff:", err, flush=True)

for name, f in [("xla", xla), ("pallas", pal)]:
    t0=time.time()
    for _ in range(20): out = f(q,k,v)
    out.block_until_ready()
    dt = (time.time()-t0)/20
    print(f"{name}: {dt*1e3:.2f} ms/call", flush=True)
