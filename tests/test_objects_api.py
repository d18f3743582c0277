"""WorldObj compat classes + register_scenario extensibility hook.

The reference's user-facing object model (``marlgrid/objects.py`` SURVEY
§2.1) and its ``_gen_grid`` subclass hook (SURVEY §3.2): objects round-trip
through ``env.encode()`` cells, predicates agree with the engine tables, and
a custom scenario registered with WorldObj events runs bit-exactly on both
the jitted engine and the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu import objects as O
from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv


def test_worldobj_predicates_match_engine_tables():
    assert not O.Wall().can_overlap() and not O.Wall().see_behind()
    assert O.Goal().can_overlap() and O.Lava().can_overlap()
    assert O.Key("red").can_pickup() and O.Ball().can_pickup()
    assert O.Box().can_pickup() and O.Box().can_contain()
    d = O.Door("blue", state=C.DOOR_LOCKED)
    assert d.is_locked and not d.can_overlap() and not d.see_behind()
    d2 = O.Door("blue", state=C.DOOR_OPEN)
    assert d2.is_open and d2.can_overlap() and d2.see_behind()
    assert O.BonusTile(bonus_id=2).encode() == (C.BONUS,
                                                C.COLOR_TO_IDX["pink"], 2)


def test_worldobj_encode_roundtrip_and_box_contents():
    key = O.Key("yellow")
    assert O.from_encoding(*key.encode()) == key
    assert O.from_encoding(C.EMPTY, 0, 0) is None
    box = O.Box("grey", contains=O.Ball("purple"))
    inner = box.contains
    assert isinstance(inner, O.Ball) and inner.color == "purple"
    # decoded Goal/BonusTile always expose reward/penalty even though
    # from_encoding bypasses subclass __init__ (ADVICE r1)
    g = O.from_encoding(*O.Goal().encode())
    assert isinstance(g, O.Goal) and g.reward == 1.0
    bt = O.from_encoding(*O.BonusTile(bonus_id=1).encode())
    assert isinstance(bt, O.BonusTile)
    assert bt.reward == 1.0 and bt.penalty == 0.5
    # sprite render matches the LUT builder used by the device path
    from marlgrid_tpu import rendering
    np.testing.assert_array_equal(
        O.Goal().render(8),
        rendering.render_base_tile(C.GOAL, C.COLOR_TO_IDX["green"], 0, 8))
    assert O.Wall().str_render() == "WG"
    assert repr(O.Door("red")).startswith("Door(")


def _lavafield_engine(params, layers, split_x, door_y):
    """Custom scenario: 6 lava tiles + a goal, via WorldObj events."""
    events = [O.Lava() for _ in range(6)] + [O.Goal()]
    return layers, events, None


def _lavafield_oracle(oracle):
    for _ in range(6):
        oracle._place_obj(O.Lava())
    oracle._place_obj(O.Goal())
    return None


grid_gen.register_scenario("lavafield", _lavafield_engine, 7,
                           oracle_builder=_lavafield_oracle)


def test_custom_scenario_engine_oracle_parity():
    params = EnvParams(width=11, height=11, n_agents=2, scenario="lavafield",
                       max_steps=30, agent_colors=default_agent_colors(2),
                       observation_style="encode")
    rng = np.random.default_rng(9)
    T = 32
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            return s2, (s2.grid_type, s2.agent_pos, s2.active, rew, done,
                        obs_mod.all_agent_obs(params, s2))

        _, out = jax.lax.scan(body, s0, actions)
        return s0, out

    key = jax.random.PRNGKey(21)
    s0, (gts, poss, acts, rews, dones, obss) = jax.device_get(
        run(key, jnp.asarray(actions, jnp.int32)))

    oracle = OracleEnv(params)
    oracle.reset(key)
    np.testing.assert_array_equal(s0.grid_type,
                                  oracle.grid[..., 0].reshape(-1))
    assert (np.asarray(s0.grid_type) == C.LAVA).sum() == 6
    for t in range(T):
        oobs, orew, odone, _ = oracle.step(actions[t])
        np.testing.assert_array_equal(gts[t],
                                      oracle.grid[..., 0].reshape(-1))
        np.testing.assert_array_equal(poss[t], oracle.agent_pos)
        np.testing.assert_array_equal(acts[t], oracle.active)
        np.testing.assert_allclose(rews[t], orew, atol=1e-5)
        assert bool(dones[t]) == odone
        for i in range(params.n_agents):
            np.testing.assert_array_equal(obss[t, i], oobs[i])


def test_custom_scenario_via_wrapper_class():
    """The reference pattern — subclass the env, point at the scenario."""
    from marlgrid_tpu.wrapper import MultiGridEnv

    class LavaFieldEnv(MultiGridEnv):
        scenario = "lavafield"

    env = LavaFieldEnv(grid_size=11, max_steps=10)
    env.reset(seed=1)
    assert (env.encode()[..., 0] == C.LAVA).sum() == 6
    assert "VO" in str(env)  # orange lava cells in the ASCII render
