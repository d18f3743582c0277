import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from marlgrid_tpu.models import ActorCritic
from marlgrid_tpu.parallel.ppo import PPOConfig

cfg = PPOConfig(torso="cnn_image")
net = ActorCritic(cfg)
S = 98304 // 2   # half the per-iter samples to keep mem sane
x = jnp.zeros((S, 56, 56, 3), jnp.uint8)
params = net.init(jax.random.PRNGKey(0), x[:1])

fwd = jax.jit(lambda p, x: net.apply(p, x)[0].sum())
gr = jax.jit(lambda p, x: jax.grad(lambda p_: net.apply(p_, x)[0].sum())(p))

def timeit(f, *a):
    r = f(*a); jax.tree.map(lambda v: np.asarray(v).sum(), r)
    t0 = time.perf_counter()
    for _ in range(3): r = f(*a)
    jax.tree.map(lambda v: np.asarray(v).sum(), r)
    return (time.perf_counter()-t0)/3*1000

tf = timeit(fwd, params, x)
tb = timeit(gr, params, x)
flop_fwd = S * 6.2e6
print(f"S={S}: fwd {tf:.1f} ms ({flop_fwd/tf*1e-9:.1f} TF/s), fwd+bwd {tb:.1f} ms ({3*flop_fwd/tb*1e-9:.1f} TF/s eff)")
