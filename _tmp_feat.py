import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
M, CELLS, H = 262144, 49, 128
key = jax.random.PRNGKey(0)
obs = jax.random.randint(key, (M, CELLS, 3), 0, 9, jnp.int32)
k1, k2, k3, k4 = jax.random.split(key, 4)
Wt = jax.random.normal(k1, (CELLS, 12, H), jnp.float32)
Wc = jax.random.normal(k2, (CELLS, 10, H), jnp.float32)
Ws = jax.random.normal(k3, (CELLS, 20, H), jnp.float32)
Wflat = jax.random.normal(k4, (CELLS * 42, H), jnp.float32)
W128 = jax.random.normal(k4, (CELLS * 128, H), jnp.float32)

def bench(name, fn, *a, reps=10):
    f = jax.jit(fn); o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:38s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

def v1_concat_flatten(obs, Wflat):
    t = (obs[..., 0:1] == jnp.arange(12)).astype(jnp.bfloat16)
    c = (obs[..., 1:2] == jnp.arange(10)).astype(jnp.bfloat16)
    s = (obs[..., 2:3] == jnp.arange(20)).astype(jnp.bfloat16)
    x = jnp.concatenate([t, c, s], -1).reshape(M, -1)
    return x @ Wflat.astype(jnp.bfloat16)

def v2_multidim_dots(obs, Wt, Wc, Ws):
    dn = (((1, 2), (0, 1)), ((), ()))
    out = 0
    for i, (W, n) in enumerate([(Wt, 12), (Wc, 10), (Ws, 20)]):
        oh = (obs[..., i:i+1] == jnp.arange(n)).astype(jnp.bfloat16)
        out = out + jax.lax.dot_general(oh, W.astype(jnp.bfloat16), dn,
                                        preferred_element_type=jnp.float32)
    return out

def v3_slot128(obs, W128):
    # one 128-slot one-hot per cell: type@0, color@16, state@32 -> flat free
    code = jnp.arange(128)
    oh = ((obs[..., 0:1] == code) | (obs[..., 1:2] + 16 == code)
          | (obs[..., 2:3] + 32 == code)).astype(jnp.bfloat16)
    x = oh.reshape(M, -1)
    return x @ W128.astype(jnp.bfloat16)

bench("v1 concat+flatten+dense (current)", v1_concat_flatten, obs, Wflat)
bench("v2 3x multi-dim dot_general", v2_multidim_dots, obs, Wt, Wc, Ws)
bench("v3 128-slot onehot flat", v3_slot128, obs, W128)
