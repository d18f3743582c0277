"""Recurrent PPO: memory-equipped policies on the device-resident stack.

The reference's flagship workload — the ICML 2021 social-learning
experiments its README cites (SURVEY §2.1 docs row) — trains RECURRENT
agents: a partial 7x7 egocentric view cannot carry the goal-cycle phase or
other agents' past behavior without memory. The reference ships no learner
at all; ``parallel/ppo.py`` is the feedforward TPU-native stack and this
module is its recurrent sibling (GRU/LSTM between torso and heads).

TPU-first design decisions:

- **Rollout and update drive ONE per-timestep function**
  (``RecurrentActorCritic.__call__``): the update re-runs each minibatch's
  full T-step sequence under ``lax.scan`` from the STORED rollout-initial
  hidden state (the standard device-resident recurrent-PPO recipe: stored
  h0 becomes one-iteration stale across epochs; the clipped ratios absorb
  it). Re-running the identical op sequence makes recomputed log-probs at
  unchanged params match the rollout's — the row-alignment invariant
  (tests/test_ppo_rnn.py::test_ratio_dev_alignment).

- **Minibatches are ENV blocks, not row shuffles.** A recurrent loss needs
  whole sequences, so the shuffle granularity is (env-chunk) blocks of c
  lanes x the full T axis: trajectories store feature-major (T, N, F, B)
  uint8 exactly like the feedforward encode path (no lane<->sublane
  relayout anywhere), reshape to (G, T, N, F, c) blocks with ONLY
  leading-dim moves (B never leaves the lane dim), and a minibatch gathers
  whole contiguous blocks (large DMAs, same rationale as ppo.py's
  block-granular shuffle).

- **Hidden-state resets are caller-side masking.** The env auto-resets on
  done; the carry is zeroed by multiplying with (1 - done) after each cell
  step — in rollout and update alike — so episode boundaries cut memory
  exactly where the env cut the episode. The carry survives train-step
  boundaries (it is part of the training state, checkpointed alongside
  env_state).

Scope: 'encode' observations with the mlp torso (the fast feature-major
path). Image-obs recurrence would compose the same scan with the
rematerialized render; not built until a workload needs it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core import obs as obs_mod, step as step_mod
from ..core.state import EnvParams
from ..models import RecurrentActorCritic
from .ppo import PPOConfig, _gae, init_env_batch  # noqa: F401 (re-export)


def init_state_rnn(env_params: EnvParams, cfg: PPOConfig, key):
    """(net, params, tx, opt_state, h) for the recurrent shared policy.

    ``h`` is the carry for the full (N, B) batch — part of the training
    state from here on (train loop, checkpoints).
    """
    assert cfg.rnn in ("gru", "lstm"), cfg.rnn
    assert env_params.observation_style == "encode" and cfg.torso == "mlp", \
        "recurrent PPO supports the encode/mlp feature-major path"
    net = RecurrentActorCritic(cfg)
    F = 3 * env_params.view_size ** 2
    obs0 = jnp.zeros((1, F, 1), jnp.int32)
    params = net.init(key, obs0, net.initial_carry((1, 1)),
                      feature_major=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    h = net.initial_carry((env_params.n_agents, cfg.n_envs))
    return net, params, tx, tx.init(params), h


def make_train_step_rnn(env_params: EnvParams, cfg: PPOConfig, net,
                        tx, mesh=None, jit=True):
    """Fused recurrent rollout+update — ONE jitted program.

    fn(params, opt_state, env_state, h, key) ->
        (params, opt_state, env_state, h, key, metrics)
    """
    assert cfg.rnn in ("gru", "lstm"), cfg.rnn
    assert env_params.observation_style == "encode" and cfg.torso == "mlp"
    B, T, N = cfg.n_envs, cfg.rollout_len, env_params.n_agents
    F = 3 * env_params.view_size ** 2

    def obs_of(state):
        """(policy obs int32, store uint8), both feature-major (N, F, B)."""
        bm = obs_mod.all_agent_obs_b(env_params, state, bminor=True)
        fm = bm.transpose(1, 0, 2, 3, 4).reshape(N, F, B)
        return fm, fm.astype(jnp.uint8)

    def constrain(tree, spec=P("data")):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, spec)), tree)

    def constrain_h(h):
        # carry leaves are (N, B, H): the env batch is dim 1
        return constrain(h, P(None, "data"))

    K = max(k for k in range(1, min(cfg.board_pool, B) + 1) if B % k == 0)

    def mask_carry(h, done):
        """Zero the carry of envs whose episode just ended (all agents —
        done is shared per env, SURVEY §3.3)."""
        keep = (~done).astype(cfg.dtype)
        return jax.tree.map(lambda x: x * keep[..., None, :, None]
                            if x.ndim == 4 else x * keep[None, :, None], h)

    def rollout(params, env_state, h, key):
        obs0 = obs_of(env_state)
        h0 = h                                  # stored for the update
        key, fk = jax.random.split(key)
        fresh_b = constrain(step_mod.fresh_pool_tiled(env_params, fk, K, B))

        def body(carry, t):
            env_state, (obs, store), h, key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            logits, value, h = net.apply(params, obs, h,
                                         feature_major=True)
            a = jax.random.categorical(ak, logits)          # (N, B)
            logp = jax.nn.log_softmax(logits)
            logp_a = (logp * (a[..., None] == jnp.arange(logp.shape[-1]))
                      ).sum(-1)
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, a.T, fresh_t, salt=t)
            env_state = constrain(env_state)
            h = constrain_h(mask_carry(h, done))
            tr = dict(obs=store, act=a, logp=logp_a, val=value,
                      rew=rew.T, done=done, ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            return (env_state, obs_of(env_state), h, key), tr

        (env_state, (last_obs, _), h, key), traj = jax.lax.scan(
            body, (env_state, obs0, h, key), jnp.arange(T))
        _, last_value, _ = net.apply(params, last_obs, h,
                                     feature_major=True)
        return env_state, h, key, traj, h0, last_value

    # --- sequence blocking: (env-chunk) blocks x full T ------------------
    c = B
    while c % 2 == 0 and c // 2 >= 128 and B // c < 64:
        c //= 2
    while B // c < cfg.n_minibatches and c % 2 == 0:
        c //= 2                                 # tiny test batches
    G = B // c
    assert G >= cfg.n_minibatches, (G, cfg.n_minibatches)
    used = (G // cfg.n_minibatches) * cfg.n_minibatches

    def blocked_traj(traj, h0, adv, ret, val):
        def env_minor(x):                       # (T, N, B) -> (G, T, N, c)
            return x.reshape(T, N, G, c).transpose(2, 0, 1, 3)

        return dict(
            obs=traj["obs"].reshape(T, N, F, G, c).transpose(3, 0, 1, 2, 4),
            act=env_minor(traj["act"]),
            logp=env_minor(traj["logp"]),
            val=env_minor(val),
            adv=env_minor(adv),
            ret=env_minor(ret),
            done=traj["done"].reshape(T, G, c).transpose(1, 0, 2),
            h0=jax.tree.map(
                lambda x: x.reshape(N, G, c, -1).transpose(1, 0, 2, 3), h0),
        )

    def loss_fn(params, batch):
        obs_T = batch["obs"].transpose(1, 0, 2, 3, 4)   # (T, mb, N, F, c)
        done_T = batch["done"].transpose(1, 0, 2)       # (T, mb, c)

        def body(h, xs):
            obs_t, done_t = xs
            logits, value, h = net.apply(params, obs_t, h,
                                         feature_major=True)
            return mask_carry(h, done_t), (logits, value)

        _, (logits, value) = jax.lax.scan(body, batch["h0"],
                                          (obs_T, done_T))
        # logits (T, mb, N, c, A); labels arrive (mb, T, N, c)
        lab = {k: batch[k].transpose(1, 0, 2, 3)
               for k in ("act", "logp", "val", "adv", "ret")}
        logp = jax.nn.log_softmax(logits)
        logp_a = (logp * (lab["act"][..., None]
                          == jnp.arange(logp.shape[-1]))).sum(-1)
        ratio = jnp.exp(logp_a - lab["logp"])
        adv = lab["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv).mean()
        v_clipped = lab["val"] + jnp.clip(value - lab["val"],
                                          -cfg.clip_eps, cfg.clip_eps)
        vf = 0.5 * jnp.maximum((value - lab["ret"]) ** 2,
                               (v_clipped - lab["ret"]) ** 2).mean()
        ent = -(jax.nn.softmax(logits) * logp).sum(-1).mean()
        total = pg + cfg.vf_coef * vf - cfg.ent_coef * ent
        ratio_dev = jnp.abs(ratio - 1.0).mean()
        return total, dict(pg_loss=pg, vf_loss=vf, entropy=ent,
                           ratio_dev=ratio_dev)

    def update(params, opt_state, traj, h0, last_value, key):
        rew = traj["rew"].reshape(T, N * B)
        val = traj["val"].reshape(T, N * B)
        done = jnp.broadcast_to(traj["done"][:, None, :],
                                (T, N, B)).reshape(T, N * B)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        blocked = blocked_traj(traj, h0, adv.reshape(T, N, B),
                               ret.reshape(T, N, B), traj["val"])

        def epoch(carry, _):
            params, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, G)

            def minibatch(carry, idx):
                params, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], blocked)
                (l, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (l, aux)

            idxs = perm[:used].reshape(cfg.n_minibatches,
                                       used // cfg.n_minibatches)
            (params, opt_state), (ls, auxs) = jax.lax.scan(
                minibatch, (params, opt_state), idxs)
            return (params, opt_state, key), (ls, auxs)

        (params, opt_state, key), (ls, auxs) = jax.lax.scan(
            epoch, (params, opt_state, key), None, length=cfg.n_epochs)
        metrics = {k: v.mean() for k, v in auxs.items()}
        metrics["loss"] = ls.mean()
        return params, opt_state, metrics

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

    def train_step(params, opt_state, env_state, h, key):
        env_state, h, key, traj, h0, last_value = rollout(
            params, env_state, h, key)
        params, opt_state, metrics = update(params, opt_state, traj, h0,
                                            last_value, key)
        metrics = ep_metrics(metrics, traj)
        key = jax.random.fold_in(key, 1)
        return params, opt_state, env_state, h, key, metrics

    if not jit:
        return train_step       # raw fn; scanned by multi_step_rnn
    return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))


def multi_step_rnn(step_fn, k: int):
    """``ppo.multi_step`` for the recurrent signature (h rides the carry)."""
    def fn(params, opt_state, env_state, h, key):
        def body(carry, _):
            params, opt_state, env_state, h, key = carry
            params, opt_state, env_state, h, key, m = step_fn(
                params, opt_state, env_state, h, key)
            return (params, opt_state, env_state, h, key), m

        (params, opt_state, env_state, h, key), ms = jax.lax.scan(
            body, (params, opt_state, env_state, h, key), None, length=k)
        metrics = jax.tree.map(lambda x: x[-1], ms)
        return params, opt_state, env_state, h, key, metrics

    return jax.jit(fn, donate_argnums=(0, 1, 2, 3))
