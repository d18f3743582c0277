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
  stored sequences under ``lax.scan`` from STORED rollout carries (the
  standard device-resident recurrent-PPO recipe: stored carries become
  one-iteration stale across epochs; the clipped ratios absorb it).
  Re-running the identical op sequence makes recomputed log-probs at
  unchanged params match the rollout's — the row-alignment invariant
  (tests/test_ppo_rnn.py::test_ratio_dev_alignment).

- **Truncated BPTT** (``PPOConfig.bptt_window``): the T-step sequences
  chunk into W windows of L steps; the rollout stores the carry ENTERING
  each window, the update re-runs windows independently (gradients
  truncate at window boundaries, forward states stay exact — ratio_dev
  still ~0 at unchanged params), and minibatch blocks widen W-fold so the
  update's sequential scan shortens T -> L with bigger GEMMs per cell
  step. L is the horizon/throughput knob; L=T (default) is the round-3
  full-sequence update.

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

Scope: 'encode' observations ride the fast feature-major mlp path (with a
shard_map explicit-collective variant); 'image' and 'rich' observations
ride the cnn torsos with EnvState-store rematerialization
(``_make_train_step_rnn_image`` — the rendered-obs recurrent family the
reference's flagship workload trains).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core import obs as obs_mod, step as step_mod
from ..core.state import EnvParams
from ..models import RecurrentActorCritic
from .ppo import (PPOConfig, _gae, aux_dim, episode_metrics,  # noqa: F401
                  init_env_batch, rich_aux)



def mask_carry_env1(h, done, dtype):
    """Zero the carry of envs whose episode just ended (done shared per
    env, SURVEY §3.3) for env-dim-1 carry layouts: rollout leaves
    (N, B, H) / update leaves (mb, N, c, H). Shared with the hetero
    recurrent trainer (ppo_hetero_rnn.py)."""
    keep = (~done).astype(dtype)
    return jax.tree.map(lambda x: x * keep[..., None, :, None]
                        if x.ndim == 4 else x * keep[None, :, None], h)


def init_state_rnn(env_params: EnvParams, cfg: PPOConfig, key):
    """(net, params, tx, opt_state, h) for the recurrent shared policy.

    ``h`` is the carry for the full batch — part of the training state
    from here on (train loop, checkpoints). Encode obs use the
    feature-major mlp path with carry leaves (N, B, H); image obs use the
    cnn torsos with row-major POV batches and carry leaves (B, N, H)
    (matching each path's sample-dim order).
    """
    assert cfg.rnn in ("gru", "lstm"), cfg.rnn
    style = env_params.observation_style
    net = RecurrentActorCritic(cfg)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    if style == "encode":
        assert cfg.torso == "mlp", \
            "encode recurrent PPO uses the mlp feature-major path"
        F = 3 * env_params.view_size ** 2
        obs0 = jnp.zeros((1, F, 1), jnp.int32)
        params = net.init(key, obs0, net.initial_carry((1, 1)),
                          feature_major=True)
        h = net.initial_carry((env_params.n_agents, cfg.n_envs))
    elif style in ("image", "rich"):
        # the social-learning flagship: recurrent agents on RENDERED obs
        # (SURVEY §2.1 docs row; VERDICT r3 missing #5). 'rich' adds the
        # observe_* aux vector, concatenated after the conv flatten.
        assert cfg.torso in ("cnn_s2d", "cnn_image"), \
            "image/rich recurrent PPO uses a cnn_s2d/cnn_image torso"
        side = env_params.view_size * env_params.view_tile_size
        shape = (side // 4, side // 4, 48) if cfg.torso == "cnn_s2d" \
            else (side, side, 3)
        obs0 = jnp.zeros((1, 1) + shape, jnp.uint8)
        kw = {}
        if style == "rich" and aux_dim(env_params):
            kw["aux"] = jnp.zeros((1, 1, aux_dim(env_params)), jnp.float32)
        params = net.init(key, obs0, net.initial_carry((1, 1)), **kw)
        h = net.initial_carry((cfg.n_envs, env_params.n_agents))
    else:
        raise SystemExit(f"recurrent PPO: unknown observation style "
                         f"{style!r}")
    return net, params, tx, tx.init(params), h


def make_train_step_rnn(env_params: EnvParams, cfg: PPOConfig, net,
                        tx, mesh=None, jit=True, axis=None, n_shards=1):
    """Fused recurrent rollout+update — ONE jitted program.

    fn(params, opt_state, env_state, h, key) ->
        (params, opt_state, env_state, h, key, metrics)

    ``axis``/``n_shards``: the shard_map variant
    (``make_train_step_rnn_shard_map``) — the fn then operates on the
    LOCAL env shard (B = cfg.n_envs // n_shards) with explicit
    ``lax.pmean``/``psum`` collectives over ``axis`` for gradients,
    advantage statistics, and episode metrics (the feedforward recipe of
    ppo.make_train_step applied to the recurrent signature — the carry is
    env-sharded like the env batch and never crosses shards).
    """
    assert cfg.rnn in ("gru", "lstm"), cfg.rnn
    if env_params.observation_style in ("image", "rich"):
        assert axis is None and n_shards == 1, \
            "image/rich recurrent PPO is the GSPMD path (no shard_map " \
            "variant)"
        return _make_train_step_rnn_image(env_params, cfg, net, tx,
                                          mesh=mesh, jit=jit)
    assert env_params.observation_style == "encode" and cfg.torso == "mlp"
    B, T, N = cfg.n_envs // n_shards, cfg.rollout_len, env_params.n_agents
    F = 3 * env_params.view_size ** 2
    # truncated BPTT (PPOConfig.bptt_window): sequences chunk into W
    # windows of L steps, each re-run from its STORED rollout carry —
    # gradients truncate at window boundaries, the update scan shortens
    # T -> L, and minibatch blocks widen W-fold (bigger GEMMs per cell
    # step). L == T (the default) is exactly the round-3 full-sequence
    # update: the W=1 reshapes below reduce to the old transforms.
    L = cfg.bptt_window or T
    assert T % L == 0, f"bptt_window {L} must divide rollout_len {T}"
    W = T // L

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
        return mask_carry_env1(h, done, cfg.dtype)

    def rollout(params, env_state, h, key):
        obs0 = obs_of(env_state)
        key, fk = jax.random.split(key)
        if axis is not None:
            # distinct fresh-board layouts per shard (the key is replicated)
            fk = jax.random.fold_in(fk, jax.lax.axis_index(axis))
        fresh_b = constrain(step_mod.fresh_pool_tiled(env_params, fk, K, B))

        def body(carry, t):
            env_state, (obs, store), h, key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            logits, value, h = net.apply(params, obs, h,
                                         feature_major=True)
            if axis is None:
                a = jax.random.categorical(ak, logits)      # (N, B)
            else:
                # per-env action keys from the GLOBAL env index: the
                # sampled stream is independent of the shard count
                env_ids = jax.lax.axis_index(axis) * B + jnp.arange(B)
                akeys = jax.vmap(jax.random.fold_in, (None, 0))(ak, env_ids)
                a = jax.vmap(jax.random.categorical,
                             in_axes=(0, 1), out_axes=1)(akeys, logits)
            logp = jax.nn.log_softmax(logits)
            logp_a = (logp * (a[..., None] == jnp.arange(logp.shape[-1]))
                      ).sum(-1)
            off = 0 if axis is None else jax.lax.axis_index(axis) * B
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, a.T, fresh_t, env_offset=off,
                    salt=t)
            env_state = constrain(env_state)
            h = constrain_h(mask_carry(h, done))
            tr = dict(obs=store, act=a, logp=logp_a, val=value,
                      rew=rew.T, done=done, ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            return (env_state, obs_of(env_state), h, key), tr

        def window(carry, wi):
            # carry[2] is the carry ENTERING this window — stored so the
            # update can re-run the window's L steps from the exact
            # rollout state (truncated BPTT)
            h_start = carry[2]
            carry, tr = jax.lax.scan(body, carry, wi * L + jnp.arange(L))
            return carry, (tr, h_start)

        (env_state, (last_obs, _), h, key), (traj, h0s) = jax.lax.scan(
            window, (env_state, obs0, h, key), jnp.arange(W))
        # (W, L, …) window stacking is time order — flatten back to (T, …)
        traj = jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), traj)
        _, last_value, _ = net.apply(params, last_obs, h,
                                     feature_major=True)
        return env_state, h, key, traj, h0s, last_value

    # --- sequence blocking: (window x env-chunk) blocks of L steps -------
    # B splits into Gc chunks of c lanes; with W windows the shuffle
    # granularity is G = W*Gc blocks, each a full L-step sequence with its
    # own stored entry carry. At W=1 every transform below reduces to the
    # round-3 full-sequence blocking.
    c = B
    while c % 2 == 0 and c // 2 >= 128 and B // c < 64:
        c //= 2
    while W * (B // c) < cfg.n_minibatches and c % 2 == 0:
        c //= 2                                 # tiny test batches
    Gc = B // c
    G = W * Gc
    assert G >= cfg.n_minibatches, (G, cfg.n_minibatches)
    used = (G // cfg.n_minibatches) * cfg.n_minibatches
    if used < G:
        import warnings

        warnings.warn(
            f"recurrent PPO minibatching: {G} sequence blocks do not "
            f"divide into {cfg.n_minibatches} minibatches; dropping "
            f"{G - used} block(s) (~{100 * (G - used) / G:.1f}% of each "
            f"epoch's data). Pick n_minibatches dividing {G} to use all "
            f"of it.", stacklevel=2)

    def blocked_traj(traj, h0s, adv, ret, val):
        def env_minor(x):                   # (T, N, B) -> (G, L, N, c)
            return x.reshape(W, L, N, Gc, c).transpose(0, 3, 1, 2, 4) \
                .reshape(G, L, N, c)

        return dict(
            obs=traj["obs"].reshape(W, L, N, F, Gc, c)
                .transpose(0, 4, 1, 2, 3, 5).reshape(G, L, N, F, c),
            act=env_minor(traj["act"]),
            logp=env_minor(traj["logp"]),
            val=env_minor(val),
            adv=env_minor(adv),
            ret=env_minor(ret),
            done=traj["done"].reshape(W, L, Gc, c).transpose(0, 2, 1, 3)
                .reshape(G, L, c),
            h0=jax.tree.map(
                lambda x: x.reshape(W, N, Gc, c, -1)
                .transpose(0, 2, 1, 3, 4).reshape(G, N, c, -1), h0s),
        )

    def loss_fn(params, batch):
        obs_T = batch["obs"].transpose(1, 0, 2, 3, 4)   # (L, mb, N, F, c)
        done_T = batch["done"].transpose(1, 0, 2)       # (L, mb, c)
        # the torso embed and the heads are per-step STATELESS — run them
        # over ALL L timesteps in ONE batch (L-fold larger GEMMs) and scan
        # ONLY the cell. Identical math to the per-step full apply (the
        # rollout path), so the ratio_dev alignment invariant still holds.
        feats = net.apply(params, obs_T, feature_major=True,
                          method="features")            # (L, mb, N, c, H)

        def body(h, xs):
            x_t, done_t = xs
            h, y = net.apply(params, x_t, h, method="cell_step")
            return mask_carry(h, done_t), y

        _, ys = jax.lax.scan(body, batch["h0"], (feats, done_T),
                             unroll=min(getattr(cfg, "cell_unroll", 1), L))
        logits, value = net.apply(params, ys, method="heads")
        # logits (T, mb, N, c, A); labels arrive (mb, T, N, c)
        lab = {k: batch[k].transpose(1, 0, 2, 3)
               for k in ("act", "logp", "val", "adv", "ret")}
        logp = jax.nn.log_softmax(logits)
        logp_a = (logp * (lab["act"][..., None]
                          == jnp.arange(logp.shape[-1]))).sum(-1)
        ratio = jnp.exp(logp_a - lab["logp"])
        adv = lab["adv"]
        if axis is None:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        else:
            # advantage statistics over the GLOBAL minibatch
            m = jax.lax.pmean(adv.mean(), axis)
            var = jax.lax.pmean(((adv - m) ** 2).mean(), axis)
            adv = (adv - m) / (jnp.sqrt(var) + 1e-8)
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

    def update(params, opt_state, traj, h0s, last_value, key):
        rew = traj["rew"].reshape(T, N * B)
        val = traj["val"].reshape(T, N * B)
        done = jnp.broadcast_to(traj["done"][:, None, :],
                                (T, N, B)).reshape(T, N * B)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        blocked = blocked_traj(traj, h0s, adv.reshape(T, N, B),
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
                if axis is not None:
                    # the data-parallel gradient all-reduce, written out
                    grads = jax.lax.pmean(grads, axis)
                    l = jax.lax.pmean(l, axis)
                    aux = jax.lax.pmean(aux, axis)
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
        return episode_metrics(metrics, traj, axis)

    def train_step(params, opt_state, env_state, h, key):
        env_state, h, key, traj, h0s, last_value = rollout(
            params, env_state, h, key)
        params, opt_state, metrics = update(params, opt_state, traj, h0s,
                                            last_value, key)
        metrics = ep_metrics(metrics, traj)
        key = jax.random.fold_in(key, 1)
        return params, opt_state, env_state, h, key, metrics

    if axis is not None:
        return train_step   # raw per-shard fn; shard_map-wrapped by caller
    if not jit:
        return train_step       # raw fn; scanned by multi_step_rnn
    return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))


def make_train_step_rnn_shard_map(env_params: EnvParams, cfg: PPOConfig,
                                  net, tx, mesh, jit=True):
    """Explicit-collective variant of ``make_train_step_rnn`` (SURVEY §2.3
    multi-host row; the recurrent sibling of
    ``ppo.make_train_step_shard_map``): env batch, trajectories, AND the
    recurrent carry stay LOCAL to each 'data' shard under ``shard_map`` —
    the carry is per-env state, so it shards exactly like the env batch
    (leaves (N, B, H) partitioned on dim 1) and no collective ever touches
    it. Gradients/advantage statistics/metrics cross shards through
    hand-written ``lax.pmean``/``psum``; action sampling is keyed per
    global env index (shard-count invariant, tested 4-shard == 1-shard on
    the virtual CPU mesh)."""
    from jax.sharding import PartitionSpec

    D = mesh.shape["data"]
    assert cfg.n_envs % D == 0, (cfg.n_envs, D)
    local = make_train_step_rnn(env_params, cfg, net, tx, axis="data",
                                n_shards=D)
    hspec = PartitionSpec(None, "data")       # carry leaves (N, B, H)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec("data"),
                  hspec, PartitionSpec()),
        out_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec("data"),
                   hspec, PartitionSpec(), PartitionSpec()),
        check_vma=False)
    if not jit:
        return fn              # traceable; scanned by multi_step_rnn
    return jax.jit(fn, donate_argnums=(0, 1, 2, 3))


def _make_train_step_rnn_image(env_params: EnvParams, cfg: PPOConfig, net,
                               tx, mesh=None, jit=True):
    """Recurrent PPO on RENDERED observations ('image', or 'rich' = pov +
    observe_* aux vector) — the reference's flagship social-learning
    workload (ICML 2021: recurrent agents on pixel POVs, SURVEY §2.1 docs
    row). Composes three existing mechanisms:

    - the sprite-kernel image pipeline (obs rendered (B, N, side, side, 3)
      uint8, or the free space-to-depth layout for cnn_s2d);
    - EnvState-store rematerialization (ppo.py recompute path): the
      trajectory stores ~600 B/env states, and each minibatch re-renders
      its windows' observations inside the update;
    - the truncated-BPTT windowed update: conv features and heads run over
      ALL window timesteps in ONE batch (the convs are per-step
      stateless), only the cell scans sequentially.

    Carry leaves are (B, N, H) (row-major sample order, matching the
    rendered obs). GSPMD 'data' sharding only.
    """
    B, T, N = cfg.n_envs, cfg.rollout_len, env_params.n_agents
    L = cfg.bptt_window or T
    assert T % L == 0, f"bptt_window {L} must divide rollout_len {T}"
    W = T // L
    s2d = cfg.torso == "cnn_s2d"
    rich = env_params.observation_style == "rich"
    pov_params = (env_params.replace(observation_style="image") if rich
                  else env_params)
    from .. import rendering

    luts = (jnp.asarray(rendering.base_lut(env_params.view_tile_size)),
            jnp.asarray(rendering.agent_lut(env_params.view_tile_size)))

    def obs_of(state):
        """(pov, aux-or-None) — aux is the 'rich' observe_* vector."""
        pov = obs_mod.all_agent_obs_b(pov_params, state, *luts, s2d=s2d)
        return pov, (rich_aux(env_params, state) if rich else None)

    def constrain(tree, spec=P("data")):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, spec)), tree)

    def mask_carry(h, done):
        """Carry leaves (B, N, H); done (B,) shared per env."""
        keep = (~done).astype(cfg.dtype)
        return jax.tree.map(lambda x: x * keep[:, None, None], h)

    K = max(k for k in range(1, min(cfg.board_pool, B) + 1) if B % k == 0)

    def rollout(params, env_state, h, key):
        obs0 = obs_of(env_state)
        key, fk = jax.random.split(key)
        fresh_b = constrain(step_mod.fresh_pool_tiled(env_params, fk, K, B))

        def body(carry, t):
            env_state, (obs, aux), h, key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            logits, value, h = net.apply(params, obs, h,
                                         aux=aux)         # (B, N, A/—)
            a = jax.random.categorical(ak, logits)        # (B, N)
            logp = jax.nn.log_softmax(logits)
            logp_a = (logp * (a[..., None] == jnp.arange(logp.shape[-1]))
                      ).sum(-1)
            prev_state = env_state       # pre-step state pairs with obs
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, a, fresh_t, salt=t)
            env_state = constrain(env_state)
            h = constrain(mask_carry(h, done))
            tr = dict(obs=prev_state, act=a, logp=logp_a, val=value,
                      rew=rew, done=done, ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            return (env_state, obs_of(env_state), h, key), tr

        def window(carry, wi):
            h_start = carry[2]
            carry, tr = jax.lax.scan(body, carry, wi * L + jnp.arange(L))
            return carry, (tr, h_start)

        (env_state, (last_obs, last_aux), h, key), (traj, h0s) = \
            jax.lax.scan(window, (env_state, obs0, h, key), jnp.arange(W))
        traj = jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), traj)
        _, last_value, _ = net.apply(params, last_obs, h, aux=last_aux)
        return env_state, h, key, traj, h0s, last_value

    # (window x env-chunk) sequence blocks over the EnvState store
    c = B
    while c % 2 == 0 and c // 2 >= 16 and W * (B // c) * 2 <= 8192:
        c //= 2
    while W * (B // c) < cfg.n_minibatches and c % 2 == 0:
        c //= 2
    Gc = B // c
    G = W * Gc
    assert G >= cfg.n_minibatches, (G, cfg.n_minibatches)
    used = (G // cfg.n_minibatches) * cfg.n_minibatches
    if used < G:
        import warnings

        warnings.warn(
            f"recurrent image PPO minibatching: dropping {G - used} of "
            f"{G} sequence blocks per epoch (n_minibatches does not "
            f"divide G)", stacklevel=2)

    def blocked_traj(traj, h0s, adv, ret, val):
        def env_minor(x):                   # (T, B, N) -> (G, L, c, N)
            return x.reshape(W, L, Gc, c, N).transpose(0, 2, 1, 3, 4) \
                .reshape(G, L, c, N)

        def state_blk(x):                   # (T, B, …) -> (G, L, c, …)
            r = x.reshape((W, L, Gc, c) + x.shape[2:])
            perm = (0, 2, 1, 3) + tuple(range(4, r.ndim))
            return r.transpose(perm).reshape((G, L, c) + x.shape[2:])

        return dict(
            obs=jax.tree.map(state_blk, traj["obs"]),
            act=env_minor(traj["act"]),
            logp=env_minor(traj["logp"]),
            val=env_minor(val),
            adv=env_minor(adv),
            ret=env_minor(ret),
            done=traj["done"].reshape(W, L, Gc, c).transpose(0, 2, 1, 3)
                .reshape(G, L, c),
            # h0s leaves (W, B, N, H): W,Gc adjacent -> row-major split
            h0=jax.tree.map(
                lambda x: x.reshape((G, c) + x.shape[2:]), h0s),
        )

    def loss_fn(params, batch):
        mb = batch["done"].shape[0]
        # flatten stored states in (L, mb, c) order so the rendered batch
        # reshapes straight into scan-step slices (no post-render relayout)
        st = jax.tree.map(
            lambda x: jnp.moveaxis(x, 1, 0).reshape((-1,) + x.shape[3:]),
            batch["obs"])
        obs = obs_mod.all_agent_obs_b(pov_params, st, *luts, bminor=True,
                                      s2d=s2d)          # (N, S, hw…)
        S = obs.shape[1]                                # S = L*mb*c
        au = rich_aux(env_params, st) if rich else None  # (S, N, d)
        if au is not None:
            au = au.transpose(1, 0, 2).reshape(N * S, -1)
        feats = net.apply(params, obs.reshape((N * S,) + obs.shape[2:]),
                          aux=au, method="features")
        feats = feats.reshape((N, L, mb, c, -1)).transpose(1, 2, 3, 0, 4)
        done_T = batch["done"].transpose(1, 0, 2)       # (L, mb, c)

        def body(h, xs):
            x_t, done_t = xs                 # (mb, c, N, F'), (mb, c)
            h, y = net.apply(params, x_t, h, method="cell_step")
            keep = (~done_t).astype(cfg.dtype)
            h = jax.tree.map(lambda x: x * keep[..., None, None], h)
            return h, y

        _, ys = jax.lax.scan(body, batch["h0"], (feats, done_T),
                             unroll=min(getattr(cfg, "cell_unroll", 1), L))
        logits, value = net.apply(params, ys, method="heads")
        # logits (L, mb, c, N, A); labels arrive (mb, L, c, N)
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

    def update(params, opt_state, traj, h0s, last_value, key):
        rew = traj["rew"].reshape(T, B * N)
        val = traj["val"].reshape(T, B * N)
        done = jnp.repeat(traj["done"][..., None], N, -1).reshape(T, B * N)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        blocked = blocked_traj(traj, h0s, adv.reshape(T, B, N),
                               ret.reshape(T, B, N), traj["val"])

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
        return episode_metrics(metrics, traj)

    def train_step(params, opt_state, env_state, h, key):
        env_state, h, key, traj, h0s, last_value = rollout(
            params, env_state, h, key)
        params, opt_state, metrics = update(params, opt_state, traj, h0s,
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
