import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from marlgrid_tpu.ops import embed as E

cells, H = 49, 128
rng = np.random.default_rng(0)
ws = tuple(jnp.asarray(rng.normal(size=(cells, n, H)), jnp.float32)*0.1 for n in E.WIDTHS)
wp = E.pack_weights(*ws)

def xla_embed(x, ws):  # x (R, F, S)
    R, F, S = x.shape
    o = x.reshape(R, 3, cells, S).astype(jnp.int32)
    tot = 0
    for i, (w, n) in enumerate(zip(ws, E.WIDTHS)):
        code = o[:, i]
        if i == 2: code = jnp.clip(code, 0, n-1)
        oh = (code[..., None, :] == jnp.arange(n)[:, None]).astype(jnp.bfloat16)
        tot = tot + jax.lax.dot_general(oh, w.astype(jnp.bfloat16), (((1,2),(0,1)),((),())), preferred_element_type=jnp.float32)
    return tot

def timeit(f, x, reps=10):
    # chain: x depends on previous output -> no cross-call elision
    @jax.jit
    def loop(x):
        def body(x, _):
            out = f(x)
            return jnp.bitwise_xor(x, (out.sum() > 1e30).astype(x.dtype)), None
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x
    jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x))
    return (time.perf_counter()-t0)/reps*1000

for (R, S, bs, tag) in [(4, 4096, 512, "rollout-step"), (2048, 128, 128, "loss-mb-blocks"), (1, 262144, 512, "loss-mb-flat")]:
    x = jnp.asarray(rng.integers(0, 10, size=(R, 3*cells, S)), jnp.uint8)
    tk = timeit(lambda x_: E.onehot_embed(x_, wp, cells, bs), x)
    tx2 = timeit(lambda x_: xla_embed(x_, ws), x)
    tkb = timeit(lambda x_: jax.grad(lambda w_: (E.onehot_embed(x_, w_, cells, bs)**2).sum())(wp)[0], x)
    txb = timeit(lambda x_: jax.grad(lambda ws_: (xla_embed(x_, ws_)**2).sum())(ws)[0], x)
    print(f"{tag:15s} R={R} S={S}: pallas fwd {tk:7.2f} ms  xla fwd {tx2:7.2f} ms | pallas f+b {tkb:7.2f}  xla f+b {txb:7.2f}", flush=True)
