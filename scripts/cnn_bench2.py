import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

S = 49152
DT = jnp.bfloat16

class Std(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = x.astype(DT)
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), dtype=DT)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), dtype=DT)(x))
        x = nn.relu(nn.Conv(64, (3, 3), dtype=DT)(x))
        return x.sum()

class S2d(nn.Module):
    @nn.compact
    def __call__(self, x):          # x (S, 14, 14, 48) uint8
        x = x.astype(DT)
        x = nn.relu(nn.Conv(32, (2, 2), dtype=DT)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), dtype=DT)(x))
        x = nn.relu(nn.Conv(64, (3, 3), dtype=DT)(x))
        return x.sum()

def timeit(f, *a):
    r = f(*a); jax.tree.map(lambda v: np.asarray(v).sum(), r)
    t0 = time.perf_counter()
    for _ in range(3): r = f(*a)
    jax.tree.map(lambda v: np.asarray(v).sum(), r)
    return (time.perf_counter()-t0)/3*1000

for name, mod, shape in [("std", Std(), (S, 56, 56, 3)),
                         ("s2d", S2d(), (S, 14, 14, 48))]:
    x = jnp.zeros(shape, jnp.uint8)
    p = mod.init(jax.random.PRNGKey(0), x[:1])
    fwd = jax.jit(lambda p, x, m=mod: m.apply(p, x))
    gr = jax.jit(lambda p, x, m=mod: jax.grad(lambda p_: m.apply(p_, x))(p))
    print(f"{name}: fwd {timeit(fwd, p, x):7.1f} ms   fwd+bwd {timeit(gr, p, x):7.1f} ms", flush=True)
