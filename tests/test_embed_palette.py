"""Compact per-scenario embed vocabularies (core/obs.py::encode_palettes +
models.OneHotEmbed(palettes=…) + the parameterized ops/embed.py kernel).

The contract: a scenario's palette must cover EVERY code its encode
observations can show (coverage sweep over real rollouts), and the compact
formulation must equal the full-vocabulary one when it does (weight-row
expansion equivalence; kernel interpret-mode parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.core import obs as obs_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.models.actor_critic import OneHotEmbed
from marlgrid_tpu.ops import embed as E
from marlgrid_tpu.vector import VectorEnv

LADDER = [
    dict(width=9, height=9, n_agents=1, scenario="empty", max_steps=12,
         view_size=5),
    dict(width=15, height=15, n_agents=3, scenario="cluttered",
         max_steps=15, view_size=7),
    dict(width=15, height=15, n_agents=2, scenario="doorkey", max_steps=15,
         view_size=7),
    dict(width=13, height=13, n_agents=4, scenario="goal_cycle",
         max_steps=15, view_size=7, n_bonus_tiles=3),
]


def _params(kw):
    kw = dict(kw)
    kw["agent_colors"] = default_agent_colors(kw["n_agents"])
    kw["observation_style"] = "encode"
    return EnvParams(**kw)


def _rollout_codes(ep, n_envs=16, steps=30, seed=0):
    env = VectorEnv(ep, n_envs=n_envs)
    key = jax.random.PRNGKey(seed)
    state, obs = env.reset(key)
    seen = [set(), set(), set()]
    planes = lambda o: [set(np.unique(np.asarray(o[..., i])))  # noqa: E731
                        for i in range(3)]
    for p, s in zip(planes(obs), seen):
        s |= p
    for t in range(steps):
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (n_envs, ep.n_agents), 0, 7)
        state, obs, rew, done, info = env.step(state, acts)
        for p, s in zip(planes(obs), seen):
            s |= p
    return seen


@pytest.mark.parametrize("kw", LADDER,
                         ids=[k["scenario"] for k in LADDER])
def test_palette_covers_rollout_codes(kw):
    """Every code a real rollout shows is in the static palette — the
    safety property the compact embed relies on (a missed code would
    silently one-hot to zero)."""
    ep = _params(kw)
    pals = obs_mod.encode_palettes(ep)
    assert pals is not None
    seen = _rollout_codes(ep)
    for plane, (s, pal) in enumerate(zip(seen, pals)):
        missing = {int(v) for v in s} - set(pal)
        assert not missing, (ep.scenario, plane, sorted(missing), pal)


def test_palette_embed_equals_full_embed():
    """Compact output == full-vocabulary output when the full tables hold
    the palette rows (zero elsewhere) — same function, fewer slots."""
    ep = _params(LADDER[3])
    pals = obs_mod.encode_palettes(ep)
    cells = ep.view_size ** 2
    H = 32
    net_p = OneHotEmbed(H, jnp.float32, palettes=pals)
    net_f = OneHotEmbed(H, jnp.float32)
    env = VectorEnv(ep, n_envs=8)
    key = jax.random.PRNGKey(1)
    state, obs = env.reset(key)
    for _ in range(8):
        key, ak = jax.random.split(key)
        state, obs, *_ = env.step(
            state, jax.random.randint(ak, (8, ep.n_agents), 0, 7))
    obs = obs.astype(jnp.int32)                    # (B, N, vs, vs, 3)
    pp = net_p.init(jax.random.PRNGKey(2), obs)["params"]
    # expand palette tables into the full-width tables, rows scattered at
    # the palette code positions
    full_w = (E.WIDTHS[0], E.WIDTHS[1], E.WIDTHS[2])
    fp = {"bias": pp["bias"]}
    for i, (vals, n_full) in enumerate(zip(pals, full_w)):
        w = np.asarray(pp[f"w{i}"]).reshape(cells, len(vals), H)
        wf = np.zeros((cells, n_full, H), np.float32)
        for k, v in enumerate(vals):
            wf[:, v, :] = w[:, k, :]
        fp[f"w{i}"] = jnp.asarray(wf.reshape(cells * n_full, H))
    out_p = net_p.apply({"params": pp}, obs)
    out_f = net_f.apply({"params": fp}, obs)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               atol=2e-5, rtol=2e-5)


def test_palette_kernel_matches_xla(monkeypatch):
    """The parameterized Pallas kernel (interpret mode) equals the XLA
    palette formulation — values-vector compare, no state clip."""
    pals = ((0, 1, 9, 10), (0, 3, 6, 7), (0, 1, 2, 3, 5))
    widths = tuple(len(v) for v in pals)
    cells, H, S, bs = 25, 64, 128, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 12, size=(2, 3 * cells, S)), jnp.uint8)
    ws = [jnp.asarray(rng.normal(size=(cells, n, H)), jnp.float32) * 0.1
          for n in widths]
    out = E.onehot_embed(x, E.pack_weights(*ws), cells, bs, True,
                         widths, pals)
    o = x.reshape(2, 3, cells, S).astype(jnp.int32)
    tot = 0
    for i, (w, vals) in enumerate(zip(ws, pals)):
        oh = (o[:, i][..., None, :]
              == jnp.asarray(vals)[:, None]).astype(jnp.bfloat16)
        tot = tot + jax.lax.dot_general(
            oh, w.astype(jnp.bfloat16), (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
    # kernel output is bf16 (one rounding of its f32 accumulate, r5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(tot), rtol=1e-2, atol=2e-2)


def test_train_cli_palette_roundtrip(tmp_path, capsys):
    """Palette rides PPOConfig -> config.json -> evaluate: the nested
    tuples must survive the JSON round-trip so the restored net matches
    the checkpoint's param shapes."""
    from marlgrid_tpu.parallel import evaluate, train

    ck = str(tmp_path / "ck")
    train.main(["--scenario", "goal_cycle", "--grid-size", "9",
                "--agents", "2", "--envs", "8", "--rollout", "4",
                "--iters", "2", "--max-steps", "10", "--view-size", "5",
                "--epochs", "1", "--minibatches", "2",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_validate_encode_palette_custom_scenario():
    """validate_encode_palette (round-4 advisor): an incomplete custom
    register_scenario palette raises naming the missing codes (a silent
    all-zero one-hot would strip observation signal during training); a
    complete palette passes."""
    import marlgrid_tpu.objects as O
    from marlgrid_tpu.core import grid_gen

    def _engine(params, layers, split_x, door_y):
        return layers, [O.Lava() for _ in range(4)] + [O.Goal()], None

    grid_gen.register_scenario("palcheck_ok", _engine, 5,
                               palette=[O.Lava().encode(),
                                        O.Goal().encode()])
    grid_gen.register_scenario("palcheck_bad", _engine, 5,
                               palette=[O.Goal().encode()])  # lava missing
    base = dict(width=11, height=11, n_agents=2, max_steps=20,
                observation_style="encode",
                agent_colors=default_agent_colors(2))
    obs_mod.validate_encode_palette(
        EnvParams(scenario="palcheck_ok", **base), n_steps=6)
    with pytest.raises(ValueError, match="palette misses"):
        obs_mod.validate_encode_palette(
            EnvParams(scenario="palcheck_bad", **base), n_steps=6)
