import time
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import ppo

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               n_clutter=10, n_bonus_tiles=3, reward_decay=False,
               max_steps=250, view_size=7, observation_style="encode",
               agent_colors=default_agent_colors(4))
cfg = ppo.PPOConfig(n_envs=4096, rollout_len=64)
key = jax.random.PRNGKey(0)
net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
B, T, N, vs = 4096, 64, 4, 7
n = T * B * N
flat = dict(
    obs=jax.random.randint(key, (n, vs*vs*3), 0, 9, jnp.uint8),
    act=jnp.zeros((n,), jnp.int32),
    logp=jnp.zeros((n,), jnp.float32),
    val=jnp.zeros((n,), jnp.float32),
    adv=jax.random.normal(key, (n,)),
    ret=jnp.zeros((n,), jnp.float32),
)

def loss_fn(p, batch):
    o = batch["obs"].astype(jnp.int32).reshape(-1, vs, vs, 3)
    logits, value = net.apply(p, o)
    logp = jax.nn.log_softmax(logits)
    logp_a = jnp.take_along_axis(logp, batch["act"][..., None], -1)[..., 0]
    ratio = jnp.exp(logp_a - batch["logp"])
    adv = batch["adv"]; adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(ratio*adv, jnp.clip(ratio, 0.8, 1.2)*adv).mean()
    vf = 0.5 * ((value - batch["ret"])**2).mean()
    return pg + 0.5*vf, None

def make_update(shuffle):
    @jax.jit
    def upd(params, opt_state, key):
        mb = n // cfg.n_minibatches
        def epoch(carry, _):
            p, os_, key = carry
            key, pk = jax.random.split(key)
            idx_all = jax.random.permutation(pk, n) if shuffle else jnp.arange(n)
            def minibatch(carry, idx):
                p, os_ = carry
                batch = jax.tree.map(lambda x: x[idx], flat)
                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
                up, os2 = tx.update(g, os_, p)
                return (optax.apply_updates(p, up), os2), l
            idxs = idx_all[:mb*cfg.n_minibatches].reshape(cfg.n_minibatches, mb)
            (p, os_), ls = jax.lax.scan(minibatch, (p, os_), idxs)
            return (p, os_, key), ls
        (p, os_, key), ls = jax.lax.scan(epoch, (params, opt_state, key), None, length=cfg.n_epochs)
        return ls.mean()
    return upd

for name, f in [("update WITH perm gather", make_update(True)),
                ("update contiguous slices", make_update(False))]:
    out = f(params, opt_state, key); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3): out = f(params, opt_state, key)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)
