"""Device-resident PPO for the gridworld (BASELINE config #5 stack).

The reference ships no learner (training lived in the author's external repo
driving ``IndependentLearners`` — SURVEY §2.1); this module provides the
TPU-native equivalent: rollouts are ``lax.scan`` over the vmapped env, GAE and
the clipped-objective update are pure jitted functions, and the whole
iteration (rollout + update) is ONE compiled program with no host-Python in
the loop (BASELINE.json north star). Parameter-shared policy across agents
(each agent is an independent sample), bfloat16 compute on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core import grid_gen, obs as obs_mod, step as step_mod
from ..core.state import EnvParams
from ..models import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 1024
    rollout_len: int = 64
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    n_epochs: int = 2
    n_minibatches: int = 4
    max_grad_norm: float = 0.5
    hidden: int = 128
    channels: Tuple[int, ...] = (32, 64)
    torso: str = "mlp"  # 'mlp' (one big MXU GEMM) | 'cnn' (encode convs)
    #   | 'cnn_image' (Nature CNN on standard images)
    #   | 'cnn_s2d' (Nature-class CNN on the sprite kernel's free
    #     space-to-depth layout — the fastest pixels-to-policy path)
    # recurrent policy: '' (feedforward) | 'gru' | 'lstm' — selects the
    # RecurrentActorCritic family and the sequence-aware update
    # (parallel/ppo_rnn.py); encode/mlp path only
    rnn: str = ""
    # unroll factor for the update's cell-only scan. MEASURED NEGATIVE on
    # v5e (full-T 2.01M -> 1.94M, L=16 2.08M -> 1.57M env-steps/s at
    # unroll=8): the scan's per-step overhead (~38 us profiled) is smaller
    # than the schedule/ILP loss from the unrolled body. Kept as a knob;
    # default 1 = plain scan.
    cell_unroll: int = 1
    # truncated BPTT for the recurrent update: chunk the stored T-step
    # sequences into length-L windows (0 = full T). Each window re-runs
    # from ITS stored rollout carry, so gradients truncate at window
    # boundaries while the forward states stay exact; the update's
    # sequential scan shortens T -> L with W=T/L more (hence wider)
    # minibatch blocks — the horizon/throughput knob for device-resident
    # recurrent PPO (VERDICT r3 weak #2).
    bptt_window: int = 0
    dtype: Any = jnp.bfloat16  # MXU-friendly compute dtype
    # compact per-scenario one-hot vocabularies for the encode embed
    # (((types…),(colors…),(states…)) from core/obs.py::encode_palettes —
    # train.py attaches them for encode/mlp runs): shrinks the embed's
    # MXU pass count ~2.4x on goal_cycle. None = full static vocabularies.
    embed_palettes: Any = None
    # training-batch layout diversity: envs resetting on the same step draw
    # from a pool of board_pool distinct fresh layouts (1 == the old
    # shared-board behavior: every env finishing a step gets THE one board,
    # phase-locking the whole batch onto a single layout per episode
    # generation). Cost is board_pool resets per rollout — measured ~
    # nothing vs the 10.5x of fully independent resets (bench --board-pool).
    board_pool: int = 256
    # image-obs PPO: store EnvStates (~600 B/env) instead of rendered uint8
    # images (~9.4 KB/agent) and re-render each minibatch's observations
    # inside the update — rematerialization in the jax.checkpoint sense,
    # trading the 925 MB trajectory image buffer's HBM traffic for sprite
    # kernel FLOPs (the buffer's store relayout dominated CNN PPO at 48k
    # env-steps/s in round 2). False = the round-2 row store.
    recompute_image_obs: bool = True


def ppo_config_to_dict(cfg: PPOConfig) -> dict:
    """JSON-serializable PPOConfig (dtype dropped — it is a code choice,
    not run configuration); for the checkpoint's config.json."""
    d = dataclasses.asdict(cfg)
    d.pop("dtype")
    return d


def ppo_config_from_dict(d: dict) -> PPOConfig:
    """Inverse of :func:`ppo_config_to_dict`."""
    names = {f.name for f in dataclasses.fields(PPOConfig)} - {"dtype"}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"PPOConfig from config.json: unknown fields "
                         f"{sorted(unknown)}")

    def detuple(v):
        return tuple(detuple(x) for x in v) if isinstance(v, list) else v

    return PPOConfig(**{k: detuple(v) for k, v in d.items()})


def obs_spec(env_params: EnvParams, cfg: "PPOConfig" = None):
    """(shape, dtype) of one agent's observation ('rich': the pov)."""
    if env_params.observation_style in ("image", "rich"):
        side = env_params.view_size * env_params.view_tile_size
        if cfg is not None and cfg.torso == "cnn_s2d":
            # space-to-depth layout, emitted for free by the sprite kernel
            return (side // 4, side // 4, 48), jnp.uint8
        return (side, side, 3), jnp.uint8
    return (env_params.view_size, env_params.view_size, 3), jnp.int32


def aux_dim(env_params: EnvParams) -> int:
    """Width of the 'rich' style's observe_* feature vector."""
    return (int(env_params.observe_rewards)
            + 2 * int(env_params.observe_position)
            + 4 * int(env_params.observe_orientation))


def episode_metrics(metrics, traj, axis=None):
    """Fold the rollout's per-step episode-completion tallies into mean
    return / length / cycle metrics (weighted by completed episodes;
    psum'd over ``axis`` under shard_map). Shared by every train-step
    family — one definition so a weighting fix cannot skew one family."""
    n_eps = traj["done"].astype(jnp.float32).sum()
    ep_ret = traj["ep_ret"].sum()
    ep_len = traj["ep_len"].astype(jnp.float32).sum()
    ep_cyc = traj["ep_cyc"].astype(jnp.float32).sum()
    if axis is not None:
        n_eps, ep_ret, ep_len, ep_cyc = (
            jax.lax.psum(v, axis) for v in (n_eps, ep_ret, ep_len, ep_cyc))
    metrics["episode_return"] = jnp.where(
        n_eps > 0, ep_ret / jnp.maximum(n_eps, 1), 0.0)
    metrics["episode_length"] = jnp.where(
        n_eps > 0, ep_len / jnp.maximum(n_eps, 1), 0.0)
    metrics["episode_cycles"] = jnp.where(
        n_eps > 0, ep_cyc / jnp.maximum(n_eps, 1), 0.0)
    metrics["n_episodes"] = n_eps
    return metrics


def rich_aux(env_params: EnvParams, state):
    """(…, N, d) f32 observe_* features from a batch-leading state — the
    'rich' dict's non-pov fields (SURVEY §3.4), learner-normalized
    (position scaled to [0,1], orientation one-hot). None when no
    observe_* flag is set (pov-only rich obs)."""
    parts = []
    if env_params.observe_rewards:
        parts.append(state.last_reward[..., None])
    if env_params.observe_position:
        sc = jnp.asarray([1.0 / max(env_params.width - 1, 1),
                          1.0 / max(env_params.height - 1, 1)], jnp.float32)
        parts.append(state.agent_pos.astype(jnp.float32) * sc)
    if env_params.observe_orientation:
        parts.append((state.agent_dir[..., None]
                      == jnp.arange(4)).astype(jnp.float32))
    return jnp.concatenate(parts, -1) if parts else None


def init_state(env_params: EnvParams, cfg: PPOConfig, key):
    """(net, params, opt, opt_state) for the shared policy."""
    net = ActorCritic(cfg)
    obs_shape, obs_dtype = obs_spec(env_params, cfg)
    kw = {}
    if env_params.observation_style == "rich" and aux_dim(env_params):
        kw["aux"] = jnp.zeros((1, aux_dim(env_params)), jnp.float32)
    params = net.init(key, jnp.zeros((1,) + obs_shape, obs_dtype), **kw)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    return net, params, tx, tx.init(params)


def _gae(rew, value, done, last_value, gamma, lam):
    """Generalized advantage estimation over the scanned trajectory.

    rew/value/done: (T, B) — episode boundaries (done) cut the bootstrap.
    """
    def body(carry, xs):
        gae, next_value = carry
        r, v, d = xs
        nonterm = 1.0 - d
        delta = r + gamma * next_value * nonterm - v
        gae = delta + gamma * lam * nonterm * gae
        return (gae, v), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rew, value, done.astype(jnp.float32)), reverse=True)
    return adv, adv + value


def make_train_step(env_params: EnvParams, cfg: PPOConfig, net,
                    tx, mesh=None, axis=None, n_shards=1, jit=True,
                    overlap=False):
    """Build the fused rollout+update step: ONE jitted program.

    fn(params, opt_state, env_state, key) ->
        (params, opt_state, env_state, key, metrics)

    When ``mesh`` is given, the env batch is sharding-constrained over the
    'data' axis; GSPMD turns the gradient mean into a psum over ICI.

    ``axis``/``n_shards`` are used by the shard_map variant
    (``make_train_step_shard_map``): the returned fn then operates on the
    LOCAL env shard (B = cfg.n_envs // n_shards) with explicit
    ``lax.pmean`` collectives over ``axis`` for gradients, advantage
    normalization statistics, and metrics.
    """
    B, T, N = cfg.n_envs // n_shards, cfg.rollout_len, env_params.n_agents
    # 'rich' = rendered pov + observe_* aux features: the pov pipeline IS
    # the image pipeline (pov_params), the aux vector is read straight off
    # the stored EnvStates in the recompute update (rich_aux)
    rich = env_params.observation_style == "rich"
    pov_params = (env_params.replace(observation_style="image") if rich
                  else env_params)
    if pov_params.observation_style == "image":
        from .. import rendering

        luts = (jnp.asarray(rendering.base_lut(env_params.view_tile_size)),
                jnp.asarray(rendering.agent_lut(env_params.view_tile_size)))
    else:
        luts = ()

    # encode obs live FEATURE-MAJOR end to end: the obs pipeline produces
    # (3, N, vs, vs, B) batch-minor, the policy contracts the feature axis
    # directly (OneHotEmbed feature_major), the trajectory stores the same
    # (N, F, B) uint8 layout, and the update's minibatch GEMMs contract it
    # as-is — NO uint8 lane<->sublane transpose anywhere (the round-2 bulk
    # store relayout measured ~23 ms/iter at B=4096; the per-step
    # batch-major policy transpose another ~0.15 MB x T x N). Image obs
    # keep the row store (the CNN consumes channel-last rows); so does the
    # 'cnn' torso on encode obs (onehot_features wants channel-last).
    bm_store = (env_params.observation_style == "encode"
                and cfg.torso == "mlp")
    # image-obs trajectories store the pre-step EnvState and re-render each
    # minibatch's observations inside the update (see
    # PPOConfig.recompute_image_obs); 'rich' requires it (the aux fields
    # come from the stored states)
    recompute = (env_params.observation_style in ("image", "rich")
                 and cfg.recompute_image_obs)
    assert not rich or recompute, \
        "rich-obs PPO needs recompute_image_obs=True (EnvState store)"
    assert not rich or cfg.torso in ("cnn_image", "cnn_s2d"), \
        "rich-obs PPO: the pov is an image — use a cnn_image/cnn_s2d torso"
    # 'cnn_s2d' consumes the sprite kernel's free space-to-depth layout
    s2d = cfg.torso == "cnn_s2d"

    def obs_of(state):
        """(policy-input obs, trajectory store form) — both feature-major
        (N, 3*vs*vs, B) on the encode/mlp path; (obs, state-to-store) on
        the image-recompute path."""
        if bm_store:
            bm = obs_mod.all_agent_obs_b(env_params, state, bminor=True)
            fm = bm.transpose(1, 0, 2, 3, 4).reshape(
                N, 3 * env_params.view_size ** 2, B)
            return fm, fm.astype(jnp.uint8)
        major = obs_mod.all_agent_obs_b(pov_params, state, *luts, s2d=s2d)
        if rich:
            return (major, rich_aux(env_params, state)), state
        if recompute:
            return major, state
        return major, major.reshape(B * N, -1).astype(jnp.uint8)

    def constrain(tree):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, P("data"))), tree)

    # board-pool size: the largest divisor of the (local) batch that does
    # not exceed cfg.board_pool (static; B is a power of two in practice)
    K = max(k for k in range(1, min(cfg.board_pool, B) + 1) if B % k == 0)

    def rollout(params, env_state, key):
        obs0 = obs_of(env_state)          # (policy obs, store form) pair
        # a K-layout fresh-board pool, generated vmapped OUTSIDE the scan
        # (an unbatched reset inside the scan body is a serial event chain
        # of tiny kernels — it dominated the rollout at ~1 ms/step). Env i
        # resetting at step t restarts on layout (i + t) % K — layout
        # diversity across the batch instead of the shared-board
        # phase-lock (one layout per episode generation, VERDICT r2).
        key, fk = jax.random.split(key)
        if axis is not None:
            # distinct fresh-board layouts per shard (the key is replicated)
            fk = jax.random.fold_in(fk, jax.lax.axis_index(axis))
        fresh_b = step_mod.fresh_pool_tiled(env_params, fk, K, B)
        fresh_b = constrain(fresh_b)

        def body(carry, t):
            env_state, (obs, store), key = carry
            fresh_t = step_mod.rotate_fresh_batch(fresh_b, t)
            key, ak = jax.random.split(key)
            if bm_store:
                # feature-major apply: logits (N, B, A), value (N, B) —
                # every trajectory leaf on this path is (N, B)-ordered
                logits, value = net.apply(params, obs, feature_major=True)
            elif rich:
                logits, value = net.apply(params, obs[0], aux=obs[1])
            else:
                logits, value = net.apply(params, obs)  # (B, N, A), (B, N)
            if axis is None:
                a = jax.random.categorical(ak, logits)
            else:
                # per-env action keys derived from the GLOBAL env index, so
                # the sampled stream is independent of how the batch is
                # sharded (shard_map variant equivalence)
                env_ids = jax.lax.axis_index(axis) * B + jnp.arange(B)
                akeys = jax.vmap(jax.random.fold_in, (None, 0))(ak, env_ids)
                if bm_store:
                    a = jax.vmap(jax.random.categorical,
                                 in_axes=(0, 1), out_axes=1)(akeys, logits)
                else:
                    a = jax.vmap(jax.random.categorical)(akeys, logits)
            logp = jax.nn.log_softmax(logits)
            # one-hot contraction, not take_along_axis: TPU gathers
            # serialize (this one measured 10 ms/iter)
            logp_a = (logp * (a[..., None] == jnp.arange(logp.shape[-1]))
                      ).sum(-1)
            a_env = a.T if bm_store else a          # the step wants (B, N)
            off = 0 if axis is None else jax.lax.axis_index(axis) * B
            env_state, rew, done, info = \
                step_mod.step_autoreset_with_fresh_batch(
                    env_params, env_state, a_env, fresh_t, env_offset=off,
                    salt=t)
            env_state = constrain(env_state)
            # ``store`` is the PRE-step obs (paired with the action taken
            # from it). Trajectory obs are stored uint8 (codes <= 176): an
            # int32 (T, B, N, vs, vs, 3) buffer pads ~32x on TPU tiles — a
            # measured HBM OOM at B=4096/T=64.
            tr = dict(obs=store, act=a, logp=logp_a, val=value,
                      rew=rew.T if bm_store else rew,
                      done=done, ep_ret=info["episode_return"],
                      ep_len=info["episode_length"],
                      ep_cyc=info["episode_cycles"])
            return (env_state, obs_of(env_state), key), tr

        (env_state, (last_obs, _), key), traj = jax.lax.scan(
            body, (env_state, obs0, key), jnp.arange(T))
        if bm_store:
            _, last_value = net.apply(params, last_obs, feature_major=True)
        elif rich:
            _, last_value = net.apply(params, last_obs[0], aux=last_obs[1])
        else:
            _, last_value = net.apply(params, last_obs)
        return env_state, key, traj, last_value

    def loss_fn(params, batch):
        if bm_store:
            # blocks arrive feature-major (mb, F, c) uint8 — the GEMM
            # contracts F directly; logits (mb, c, A), labels (mb, c)
            logits, value = net.apply(params, batch["obs"],
                                      feature_major=True)
        elif recompute:
            # batch["obs"] is an EnvState with (mb, c, …) leaves: flatten
            # to one render batch and re-render the observations HERE —
            # sprite-kernel FLOPs instead of a 925 MB uint8 trajectory
            # buffer (obs are integer-valued: no gradient flows into the
            # render, exactly like a stored buffer)
            st = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), batch["obs"])
            obs = obs_mod.all_agent_obs_b(pov_params, st, *luts,
                                          bminor=True, s2d=s2d)
            S = obs.shape[1]
            aux = rich_aux(env_params, st) if rich else None   # (S, N, d)
            if aux is not None:
                aux = aux.transpose(1, 0, 2).reshape(N * S, -1)
            logits, value = net.apply(
                params, obs.reshape((N * S,) + obs.shape[2:]), aux=aux)
            logits = logits.reshape(N, S, -1)
            value = value.reshape(N, S)
            # labels arrive (mb, c, N); align to the render's (N, S) order
            batch = dict(batch, **{
                k: batch[k].transpose(2, 0, 1).reshape(N, S)
                for k in ("act", "logp", "val", "adv", "ret")})
        else:
            shape, dtype = obs_spec(env_params, cfg)
            obs = batch["obs"].astype(dtype).reshape((-1,) + shape)
            logits, value = net.apply(params, obs)
        logp = jax.nn.log_softmax(logits)
        # one-hot select (gather-free; the take_along_axis formulation's
        # jvp gather measured 16 ms/iter on TPU)
        logp_a = (logp * (batch["act"][..., None]
                          == jnp.arange(logp.shape[-1]))).sum(-1)
        ratio = jnp.exp(logp_a - batch["logp"])
        adv = batch["adv"]
        if axis is None:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        else:
            # advantage statistics over the GLOBAL minibatch: explicit
            # cross-shard pmean instead of GSPMD-inferred reductions
            m = jax.lax.pmean(adv.mean(), axis)
            var = jax.lax.pmean(((adv - m) ** 2).mean(), axis)
            adv = (adv - m) / (jnp.sqrt(var) + 1e-8)
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv).mean()
        v_clipped = batch["val"] + jnp.clip(value - batch["val"],
                                            -cfg.clip_eps, cfg.clip_eps)
        vf = 0.5 * jnp.maximum((value - batch["ret"]) ** 2,
                               (v_clipped - batch["ret"]) ** 2).mean()
        ent = -(jax.nn.softmax(logits) * logp).sum(-1).mean()
        total = pg + cfg.vf_coef * vf - cfg.ent_coef * ent
        # |ratio-1| on the FIRST minibatch of an update is a row-alignment
        # sanity signal: stored logp recomputed from stored obs at the same
        # params must agree (tests pin it; drift here means trajectory rows
        # got mispaired somewhere in the storage/relayout plumbing)
        ratio_dev = jnp.abs(ratio - 1.0).mean()
        return total, dict(pg_loss=pg, vf_loss=vf, entropy=ent,
                           ratio_dev=ratio_dev)

    def update(params, opt_state, traj, last_value, key):
        # fold agents into the batch: each agent is an independent sample.
        # bm_store leaves are (T, N, B); row-path leaves are (T, B, N).
        if bm_store:
            rew = traj["rew"].reshape(T, N * B)
            val = traj["val"].reshape(T, N * B)
            done = jnp.broadcast_to(traj["done"][:, None, :],
                                    (T, N, B)).reshape(T, N * B)
        else:
            rew = traj["rew"].reshape(T, B * N)
            val = traj["val"].reshape(T, B * N)
            done = jnp.repeat(traj["done"][..., None], N,
                              -1).reshape(T, B * N)
        adv, ret = _gae(rew, val, done, last_value.reshape(-1),
                        cfg.gamma, cfg.gae_lambda)
        # Block-granular shuffle: permuting G contiguous blocks instead of
        # T*B*N single rows turns the per-epoch minibatch gather of the
        # whole ~600 MB trajectory from a per-row random gather (serialized
        # on TPU — it dominated the update step) into large contiguous
        # DMAs. A minibatch is then a random set of (agent, timestep,
        # env-range) blocks — the standard granularity for device-resident
        # PPO.
        if bm_store:
            # blocks stay FEATURE-MAJOR: (G, F, c) with G = N*T*(B//c)
            # (agent, step, env-chunk) blocks and envs on lanes — the store
            # layout reshapes into blocks with only leading-dim swaps (B
            # never leaves the lane dim; the round-2 bulk lane<->sublane
            # relayout of the uint8 store measured ~23 ms/iter)
            c = B
            while c % 2 == 0 and c // 2 >= 128 \
                    and N * T * (B // c) * 2 <= 8192:
                c //= 2
            G = N * T * (B // c)
            assert G >= cfg.n_minibatches, \
                f"fewer trajectory blocks ({G}) than minibatches"
            F = traj["obs"].shape[2]
            obs_b = traj["obs"].transpose(1, 0, 2, 3).reshape(
                N * T, F, B // c, c).transpose(0, 2, 1, 3).reshape(G, F, c)

            def blk(x):                       # (T, N, B) -> (G, c)
                return x.transpose(1, 0, 2).reshape(G, c)

            blocked = dict(
                obs=obs_b,
                act=blk(traj["act"]),
                logp=blk(traj["logp"]),
                val=blk(val.reshape(T, N, B)),
                adv=blk(adv.reshape(T, N, B)),
                ret=blk(ret.reshape(T, N, B)),
            )
        elif recompute:
            # (t, env-chunk) blocks: EnvState leaves (T, B, …) reshape to
            # (G, c, …) with NO relayout at all (row-major split of the two
            # leading dims); labels (T, B, N) reshape to (G, c, N). The
            # whole stored trajectory is ~600 B/env-step instead of
            # N x 9.4 KB of rendered pixels.
            c = B
            while c % 2 == 0 and c // 2 >= 16 and T * (B // c) * 2 <= 8192:
                c //= 2
            G = T * (B // c)
            assert G >= cfg.n_minibatches, \
                f"fewer trajectory blocks ({G}) than minibatches"

            def blk(x):                       # (T, B, N) -> (G, c, N)
                return x.reshape((G, c) + x.shape[2:])

            blocked = dict(
                obs=jax.tree.map(
                    lambda x: x.reshape((G, c) + x.shape[2:]), traj["obs"]),
                act=blk(traj["act"]),
                logp=blk(traj["logp"]),
                val=blk(val.reshape(T, B, N)),
                adv=blk(adv.reshape(T, B, N)),
                ret=blk(ret.reshape(T, B, N)),
            )
        else:
            flat = dict(
                obs=traj["obs"].reshape(T * B * N, -1),
                act=traj["act"].reshape(T * B * N),
                logp=traj["logp"].reshape(T * B * N),
                val=val.reshape(T * B * N),
                adv=adv.reshape(T * B * N),
                ret=ret.reshape(T * B * N),
            )
            n = T * B * N
            G = 1   # largest power-of-2 divisor of n, capped at 8192
            while G * 2 <= 8192 and n % (G * 2) == 0:
                G *= 2
            if G < cfg.n_minibatches:
                # awkward n (odd agent counts etc.): fall back to rows
                G = n
            assert G >= cfg.n_minibatches, \
                f"fewer trajectory rows ({n}) than minibatches"
            rows = n // G
            blocked = jax.tree.map(
                lambda x: x.reshape((G, rows) + x.shape[1:]), flat)
        # a remainder of blocks that does not fill every minibatch is
        # dropped from the epoch (at most n_minibatches-1 blocks); G is
        # static, so the drop is reported once at trace time (no-silent-caps)
        used = (G // cfg.n_minibatches) * cfg.n_minibatches
        if used < G:
            import warnings

            warnings.warn(
                f"PPO minibatching: {G} trajectory blocks do not divide "
                f"into {cfg.n_minibatches} minibatches; dropping {G - used} "
                f"block(s) (~{100 * (G - used) / G:.1f}% of each epoch's "
                f"data). Pick n_minibatches dividing {G} to use all of it.",
                stacklevel=2)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, G)

            def minibatch(carry, idx):
                params, opt_state = carry
                if bm_store or recompute:
                    # blocks are consumed whole: (mb, F, c) feature-major /
                    # (mb, c, …) EnvState leaves + (mb, c, N) labels
                    batch = jax.tree.map(lambda x: x[idx], blocked)
                else:
                    batch = jax.tree.map(
                        lambda x: x[idx].reshape((-1,) + x.shape[2:]),
                        blocked)
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

    def train_step(params, opt_state, env_state, key):
        env_state, key, traj, last_value = rollout(params, env_state, key)
        params, opt_state, metrics = update(params, opt_state, traj,
                                            last_value, key)
        metrics = ep_metrics(metrics, traj)
        key = jax.random.fold_in(key, 1)
        return params, opt_state, env_state, key, metrics

    def rollout_only(params, env_state, key):
        """Priming call for the overlap variant: collect the first
        trajectory without an update."""
        env_state, key, traj, last_value = rollout(params, env_state, key)
        return env_state, (traj, last_value), jax.random.fold_in(key, 1)

    def train_step_overlap(params, opt_state, env_state, prev, key):
        """Overlapped iteration (SURVEY §2.3 'actor/learner overlap via
        double-buffered device rollouts'): the update consumes the
        PREVIOUS iteration's trajectory while this iteration's rollout
        collects the next — both inside ONE program with no data
        dependence between them, so the XLA scheduler interleaves the
        rollout's latency-bound env scan with the update's GEMMs.
        Semantics: each trajectory is optimized with params one iteration
        stale (the clipped importance ratios absorb the off-policy-ness —
        the standard decoupled actor/learner tradeoff)."""
        prev_traj, prev_last = prev
        key, rk = jax.random.split(key)
        env_state, _, traj, last_value = rollout(params, env_state, rk)
        params, opt_state, metrics = update(params, opt_state, prev_traj,
                                            prev_last, key)
        metrics = ep_metrics(metrics, traj)
        key = jax.random.fold_in(key, 1)
        return params, opt_state, env_state, (traj, last_value), key, metrics

    if axis is not None:
        return train_step   # raw per-shard fn; shard_map-wrapped by caller
    if overlap:
        if not jit:         # raw pair; scanned by multi_step_overlap
            return train_step_overlap, jax.jit(rollout_only)
        return (jax.jit(train_step_overlap, donate_argnums=(0, 1, 2, 3)),
                jax.jit(rollout_only))
    if not jit:
        return train_step   # raw fn; scanned by multi_step
    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def multi_step(step_fn, k: int):
    """Fuse ``k`` train iterations into ONE dispatched program
    (``lax.scan`` over the step): through a TPU relay each program dispatch
    costs host-side latency (measured ~20 ms/iter on the axon tunnel vs
    ~62 ms device time), so batching k steps amortizes it k-fold. Returns
    ``fn(params, opt_state, env_state, key) -> (..., metrics)`` with
    metrics of the LAST of the k iterations (matching the driver loop's
    log-every semantics).

    ``step_fn`` must be the UNJITTED train step — pass
    ``make_train_step(..., jit=False)``.
    """
    def fn(params, opt_state, env_state, key):
        def body(carry, _):
            params, opt_state, env_state, key = carry
            params, opt_state, env_state, key, m = step_fn(
                params, opt_state, env_state, key)
            return (params, opt_state, env_state, key), m

        (params, opt_state, env_state, key), ms = jax.lax.scan(
            body, (params, opt_state, env_state, key), None, length=k)
        metrics = jax.tree.map(lambda x: x[-1], ms)
        return params, opt_state, env_state, key, metrics

    return jax.jit(fn, donate_argnums=(0, 1, 2))


def multi_step_overlap(step_fn, k: int):
    """``multi_step`` for the overlap variant (the double-buffered
    trajectory rides the scan carry). ``step_fn`` is the raw overlap step
    from ``make_train_step(..., overlap=True, jit=False)``."""
    def fn(params, opt_state, env_state, prev, key):
        def body(carry, _):
            params, opt_state, env_state, prev, key = carry
            params, opt_state, env_state, prev, key, m = step_fn(
                params, opt_state, env_state, prev, key)
            return (params, opt_state, env_state, prev, key), m

        (params, opt_state, env_state, prev, key), ms = jax.lax.scan(
            body, (params, opt_state, env_state, prev, key), None, length=k)
        metrics = jax.tree.map(lambda x: x[-1], ms)
        return params, opt_state, env_state, prev, key, metrics

    return jax.jit(fn, donate_argnums=(0, 1, 2, 3))


def make_train_step_shard_map(env_params: EnvParams, cfg: PPOConfig, net,
                              tx, mesh, jit=True):
    """Explicit-collective variant of ``make_train_step`` (SURVEY §2.3
    multi-host second tier): the env batch and trajectories stay LOCAL to
    each 'data' shard under ``shard_map``; gradients, advantage statistics
    and episode metrics cross shards through hand-written ``lax.pmean`` /
    ``psum`` collectives instead of GSPMD-inferred ones. Action sampling is
    keyed per global env index, so the computation is independent of the
    shard count (tested: 8-shard == 1-shard on the virtual CPU mesh)."""
    from jax.sharding import PartitionSpec

    D = mesh.shape["data"]
    assert cfg.n_envs % D == 0, (cfg.n_envs, D)
    local = make_train_step(env_params, cfg, net, tx, axis="data",
                            n_shards=D)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec("data"),
                  PartitionSpec()),
        out_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec("data"),
                   PartitionSpec(), PartitionSpec()),
        check_vma=False)
    if not jit:
        return fn              # traceable; scanned by multi_step
    return jax.jit(fn, donate_argnums=(0, 1, 2))


def init_env_batch(env_params: EnvParams, n_envs: int, key, mesh=None,
                   stagger: bool = True):
    """Vmapped reset of the env batch, optionally sharded over 'data'.

    ``stagger=True`` (training default) spreads initial episode phases
    evenly over the batch (env i starts at step_count i*max_steps//B) so
    episode completions stream instead of the whole batch finishing — and
    resetting — in synchronized bursts every max_steps steps (VERDICT r2:
    the burst pattern showed as n_episodes alternating B and 0)."""
    keys = jax.random.split(key, n_envs)
    if mesh is not None:
        keys = jax.lax.with_sharding_constraint(
            keys, jax.sharding.NamedSharding(mesh, P("data")))

    def init(keys):
        state = jax.vmap(lambda k: grid_gen.reset(env_params, k))(keys)
        if stagger:
            state = step_mod.stagger_step_counts(state,
                                                 env_params.max_steps)
        return state

    return jax.jit(init)(keys)
