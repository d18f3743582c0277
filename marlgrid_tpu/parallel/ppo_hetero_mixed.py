"""Mixed-STYLE heterogeneous PPO: encode + image + rich groups, one program.

The reference lets every agent pick its own ``observation_style`` alongside
its view geometry (``marlgrid/agents.py — §GridAgentInterface``, SURVEY
§2.1): one agent can learn from symbolic codes while another learns from
rendered pixels. Rounds 3–5 trained hetero VIEW configs (all-encode,
``ppo_hetero.py``) and hetero recurrent populations (``ppo_hetero_rnn.py``);
this module closes the last composability gap — per-group observation
STYLES training together (the combination that was previously scoped to
VectorEnv/inference only).

Design — per-group style-appropriate pipelines sharing one board:

- The board is painted ONCE per step ``with_lvl=True`` (the image path
  reads prestige-dim levels from the high bits; the encode path ignores
  them — bit-identity tested), and every group renders only its own
  observers against it: encode groups through the feature-major window
  contraction, image/rich groups through the sprite-composite pipeline
  (``all_obs_image_b(observers=…, packed=…)``).
- Per-group torsos: mlp (feature-major) for encode groups, cnn_s2d /
  cnn_image for image and rich groups (rich adds the observe_* aux vector
  after the conv flatten — exactly the homogeneous paths' models).
- The trajectory stores each ENCODE group's obs as uint8 feature-major
  tables and — when any group needs pixels — the EnvStates ONCE
  (rematerialization, ``ppo.py`` recompute path: ~600 B/env-step instead of
  9.4 KB/agent of pixels; the update re-renders each minibatch's group
  POVs from the stored states).
- Minibatches are (t, env-chunk) blocks SHARED across groups (the EnvState
  store's natural granularity): every group contributes its agents of the
  selected blocks, per-group losses are summed with advantage statistics
  over the union of the minibatch's samples (the ppo_hetero.py recipe).

Scope: feedforward (the all-encode fast path keeps its finer per-group
(agent, t, chunk) shuffle in ``ppo_hetero.py``; recurrent hetero stays
encode-only in ``ppo_hetero_rnn.py``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..core import obs as obs_mod, step as step_mod
from ..core.state import EnvParams
from ..models import ActorCritic
from ..vector import obs_groups
from .ppo import PPOConfig, _gae, aux_dim, episode_metrics, rich_aux


def mixed_groups(env_params: EnvParams):
    """The trainable obs groups (any mix of encode/image/rich styles)."""
    groups = obs_groups(env_params)
    for idxs, gp in groups:
        if gp.observation_style not in ("encode", "image", "rich"):
            raise SystemExit(
                f"mixed hetero PPO: agents {list(idxs)} use unsupported "
                f"style {gp.observation_style!r}")
    return groups


def group_cfg(cfg: PPOConfig, gp: EnvParams) -> PPOConfig:
    """The per-group model config: torso follows the group's style."""
    if gp.observation_style == "encode":
        return dataclasses.replace(cfg, torso="mlp")
    side = gp.view_size * gp.view_tile_size
    torso = cfg.torso if cfg.torso in ("cnn_s2d", "cnn_image") else (
        "cnn_s2d" if side % 4 == 0 else "cnn_image")
    if torso == "cnn_s2d" and side % 4:
        torso = "cnn_image"            # s2d needs a block-4 side
    return dataclasses.replace(cfg, torso=torso)


def init_state_hetero_mixed(env_params: EnvParams, cfg: PPOConfig, key):
    """(nets, params_list, tx, opt_state) — one style-appropriate
    ActorCritic per obs group, params in ONE list pytree."""
    assert env_params.has_hetero_obs
    groups = mixed_groups(env_params)
    nets, params_list = [], []
    for g, (idxs, gp) in enumerate(groups):
        cfg_g = group_cfg(cfg, gp)
        net = ActorCritic(cfg_g)
        kg = jax.random.fold_in(key, g)
        if gp.observation_style == "encode":
            obs0 = jnp.zeros((1, gp.view_size, gp.view_size, 3), jnp.int32)
            params_list.append(net.init(kg, obs0))
        else:
            side = gp.view_size * gp.view_tile_size
            shape = ((side // 4, side // 4, 48)
                     if cfg_g.torso == "cnn_s2d" else (side, side, 3))
            obs0 = jnp.zeros((1,) + shape, jnp.uint8)
            kw = {}
            if gp.observation_style == "rich" and aux_dim(gp):
                kw["aux"] = jnp.zeros((1, aux_dim(gp)), jnp.float32)
            params_list.append(net.init(kg, obs0, **kw))
        nets.append(net)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    return nets, params_list, tx, tx.init(params_list)


def make_train_step_hetero_mixed(env_params: EnvParams, cfg: PPOConfig,
                                 nets, tx, mesh=None, jit=True):
    """Fused mixed-style hetero rollout+update — ONE jitted program.

    fn(params_list, opt_state, env_state, key) ->
        (params_list, opt_state, env_state, key, metrics)

    Signature-compatible with ``ppo.multi_step`` for --steps-per-call.
    """
    from .. import rendering

    B, T, N = cfg.n_envs, cfg.rollout_len, env_params.n_agents
    groups = mixed_groups(env_params)
    assert len(nets) == len(groups)
    nG = len(groups)
    n_gs = [len(idxs) for idxs, _ in groups]
    styles = [gp.observation_style for _, gp in groups]
    cfgs = [group_cfg(cfg, gp) for _, gp in groups]
    s2d = [c.torso == "cnn_s2d" for c in cfgs]
    any_pixels = any(s != "encode" for s in styles)
    luts = {g: (jnp.asarray(rendering.base_lut(gp.view_tile_size)),
                jnp.asarray(rendering.agent_lut(gp.view_tile_size)))
            for g, (_, gp) in enumerate(groups) if styles[g] != "encode"}
    _perm = np.concatenate([np.asarray(idxs) for idxs, _ in groups])
    _inv = jnp.asarray(np.argsort(_perm))

    def constrain(tree):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, P("data"))), tree)

    def group_obs(g, state, packed):
        """Group g's policy obs from a shared painted board."""
        idxs, gp = groups[g]
        if styles[g] == "encode":
            bm = obs_mod.all_obs_encode_b(gp, state, bminor=True,
                                          observers=idxs, packed=packed)
            return bm.transpose(1, 0, 2, 3, 4).reshape(
                n_gs[g], 3 * gp.view_size ** 2, B)
        pov = obs_mod.all_obs_image_b(gp, state, *luts[g], bminor=True,
                                      s2d=s2d[g], observers=idxs,
                                      packed=packed)    # (n_g, B, h, w, ch)
        if styles[g] == "rich":
            aux = rich_aux(gp, state)
            aux = (None if aux is None
                   else aux[:, jnp.asarray(idxs)].transpose(1, 0, 2))
            return (pov, aux)                           # aux (n_g, B, d)
        return pov

    def obs_of(state):
        packed = obs_mod.pack_grid_with_agents(env_params, state,
                                               with_lvl=any_pixels)
        return {g: group_obs(g, state, packed) for g in range(nG)}

    def apply_group(g, params, obs):
        """logits (n_g, B', A), value (n_g, B') for any leading layout the
        group's obs carry ((n_g, B) rollout / flattened update batches)."""
        if styles[g] == "encode":
            return nets[g].apply(params, obs, feature_major=True)
        if styles[g] == "rich":
            pov, aux = obs
            return nets[g].apply(params, pov, aux=aux)
        return nets[g].apply(params, obs)

    def gather_rows(parts):
        """{g: (n_g, B)} -> (N, B) in agent-index order."""
        return jnp.concatenate([parts[g] for g in range(nG)], 0)[_inv]

    K = max(k for k in range(1, min(cfg.board_pool, B) + 1) if B % k == 0)

    def rollout(params_list, env_state, key):
        obs0 = obs_of(env_state)
        key, fk = jax.random.split(key)
        fresh_b = constrain(step_mod.fresh_pool_tiled(env_params, fk, K, B))

        def body(carry, t):
            env_state, obs, key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            a_parts, lp_parts, v_parts = {}, {}, {}
            for g in range(nG):
                logits, value = apply_group(g, params_list[g], obs[g])
                ag = jax.random.categorical(jax.random.fold_in(ak, g),
                                            logits)            # (n_g, B)
                lp = jax.nn.log_softmax(logits)
                lp_parts[g] = (lp * (ag[..., None]
                                     == jnp.arange(lp.shape[-1]))).sum(-1)
                a_parts[g], v_parts[g] = ag, value
            act = gather_rows(a_parts)                          # (N, B)
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, act.T, fresh_t, salt=t)
            env_state = constrain(env_state)
            # encode groups store their uint8 codes; pixel groups store
            # the EnvState ONCE (shared) and re-render in the update
            tr = dict(obs={g: obs[g].astype(jnp.uint8)
                           for g in range(nG) if styles[g] == "encode"},
                      act=act, logp=gather_rows(lp_parts),
                      val=gather_rows(v_parts), rew=rew.T, done=done,
                      ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            if any_pixels:
                tr["state"] = carry[0]      # the PRE-step state (obs source)
            return (env_state, obs_of(env_state), key), tr

        (env_state, last_obs, key), traj = jax.lax.scan(
            body, (env_state, obs0, key), jnp.arange(T))
        lv_parts = {}
        for g in range(nG):
            _, lv_parts[g] = apply_group(g, params_list[g], last_obs[g])
        return env_state, key, traj, gather_rows(lv_parts)

    # --- shared (t, env-chunk) blocking (the ppo.py recompute recipe) ----
    c = B
    while c % 2 == 0 and c // 2 >= 16 and T * (B // c) * 2 <= 8192:
        c //= 2
    while B // c * T < cfg.n_minibatches and c % 2 == 0:
        c //= 2                                    # tiny test batches
    G = T * (B // c)
    assert G >= cfg.n_minibatches, (G, cfg.n_minibatches)
    used = (G // cfg.n_minibatches) * cfg.n_minibatches
    if used < G:
        import warnings

        warnings.warn(
            f"mixed hetero PPO minibatching: {G} (t, env-chunk) blocks do "
            f"not divide into {cfg.n_minibatches} minibatches; dropping "
            f"{G - used} block(s) per epoch", stacklevel=2)

    def blocked_traj(traj, adv, ret, val):
        labels = dict(act=traj["act"], logp=traj["logp"], val=val,
                      adv=adv, ret=ret)             # (T, N, B) each
        Bc = B // c

        def blk_group(x, g):   # (T, N, B) -> group rows -> (G, n_g, c)
            idxs = jnp.asarray(groups[g][0])
            return x[:, idxs].reshape(T, n_gs[g], Bc, c) \
                .transpose(0, 2, 1, 3).reshape(G, n_gs[g], c)

        out = []
        for g in range(nG):
            d = {k: blk_group(v, g) for k, v in labels.items()}
            if styles[g] == "encode":
                F_g = traj["obs"][g].shape[2]
                d["obs"] = traj["obs"][g].reshape(
                    T, n_gs[g], F_g, Bc, c).transpose(0, 3, 1, 2, 4) \
                    .reshape(G, n_gs[g], F_g, c)
            out.append(d)
        state_b = None
        if any_pixels:
            # EnvState leaves (T, B, …) -> (G, c, …): contiguous reshape,
            # block g == (t = g // Bc, envs (g % Bc)*c …) — the same block
            # ordering as blk_group above
            state_b = jax.tree.map(
                lambda x: x.reshape((G, c) + x.shape[2:]), traj["state"])
        return out, state_b

    def loss_fn(params_list, batch, state_mb):
        # batch: per-group dicts — labels (mb, n_g, c); encode groups carry
        # obs (mb, n_g, F_g, c); pixel groups re-render from state_mb
        # (leaves (mb, c, …)). Advantage statistics over the UNION.
        total_n = sum(b["adv"].size for b in batch)
        mean = sum(b["adv"].sum() for b in batch) / total_n
        var = sum(((b["adv"] - mean) ** 2).sum() for b in batch) / total_n
        std = jnp.sqrt(var) + 1e-8
        st = packed_mb = None
        if state_mb is not None:
            st = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), state_mb)
            packed_mb = obs_mod.pack_grid_with_agents(env_params, st,
                                                      with_lvl=True)
        pg_s = vf_s = ent_s = dev_s = 0.0
        for g in range(nG):
            b = batch[g]
            if styles[g] == "encode":
                logits, value = nets[g].apply(params_list[g], b["obs"],
                                              feature_major=True)
                # logits (mb, n_g, c, A), labels (mb, n_g, c)
                lab = {k: b[k] for k in ("act", "logp", "val", "adv",
                                         "ret")}
            else:
                # re-render THIS group's observers from the stored states
                obs = group_obs(g, st, packed_mb)   # (n_g, S, …)
                logits, value = apply_group(g, params_list[g], obs)
                # labels (mb, n_g, c) -> the render's (n_g, S) order
                lab = {k: b[k].transpose(1, 0, 2).reshape(n_gs[g], -1)
                       for k in ("act", "logp", "val", "adv", "ret")}
            adv = (lab["adv"] - mean) / std
            logp = jax.nn.log_softmax(logits)
            logp_a = (logp * (lab["act"][..., None]
                              == jnp.arange(logp.shape[-1]))).sum(-1)
            ratio = jnp.exp(logp_a - lab["logp"])
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv)
            v_clip = lab["val"] + jnp.clip(value - lab["val"],
                                           -cfg.clip_eps, cfg.clip_eps)
            vf = 0.5 * jnp.maximum((value - lab["ret"]) ** 2,
                                   (v_clip - lab["ret"]) ** 2)
            ent = -(jax.nn.softmax(logits) * logp).sum(-1)
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
        rew = traj["rew"].reshape(T, N * B)
        val = traj["val"].reshape(T, N * B)
        done = jnp.broadcast_to(traj["done"][:, None, :],
                                (T, N, B)).reshape(T, N * B)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        blocked, state_b = blocked_traj(traj, adv.reshape(T, N, B),
                                        ret.reshape(T, N, B),
                                        val.reshape(T, N, B))

        def epoch(carry, _):
            params_list, opt_state, key = carry
            key, pk = jax.random.split(key)
            # ONE shared permutation: (t, env-chunk) blocks are the sample
            # unit for every group (they index the shared EnvState store)
            idx_shared = jax.random.permutation(pk, G)[:used].reshape(
                cfg.n_minibatches, used // cfg.n_minibatches)

            def minibatch(carry, idx_t):
                params_list, opt_state = carry
                batch = [jax.tree.map(lambda x: x[idx_t], blocked[g])
                         for g in range(nG)]
                state_mb = (None if state_b is None
                            else jax.tree.map(lambda x: x[idx_t], state_b))
                (l, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params_list, batch, state_mb)
                updates, opt_state = tx.update(grads, opt_state,
                                               params_list)
                params_list = optax.apply_updates(params_list, updates)
                return (params_list, opt_state), (l, aux)

            (params_list, opt_state), (ls, auxs) = jax.lax.scan(
                minibatch, (params_list, opt_state), idx_shared)
            return (params_list, opt_state, key), (ls, auxs)

        (params_list, opt_state, key), (ls, auxs) = jax.lax.scan(
            epoch, (params_list, opt_state, key), None,
            length=cfg.n_epochs)
        metrics = {k: v.mean() for k, v in auxs.items()}
        metrics["loss"] = ls.mean()
        return params_list, opt_state, metrics

    def ep_metrics(metrics, traj):
        return episode_metrics(metrics, traj)

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
