"""Constructed multi-agent contention cases (SURVEY §4 item 3).

The randomized-priority sequential loop (``marlgrid/base.py — §step``,
SURVEY §3.3) is the conflict spec: first mover in the shuffled order wins.
These tests pin the emergent outcomes across many permutation seeds.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import step as step_mod
from marlgrid_tpu.core.grid_gen import bordered_layers
from marlgrid_tpu.core.state import EnvParams, default_agent_colors, \
    zeros_state


def mk_state(params, positions, dirs, active=None, seed=0):
    """Hand-built EnvState: bordered empty room + pinned agents."""
    s = zeros_state(params, jax.random.PRNGKey(seed))
    gt, gc, gs = bordered_layers(params)
    s.grid_type, s.grid_color, s.grid_state = (
        gt.reshape(-1), gc.reshape(-1), gs.reshape(-1))
    s.agent_pos = jnp.asarray(positions, jnp.int32)
    s.agent_dir = jnp.asarray(dirs, jnp.int32)
    s.active = jnp.asarray(active if active is not None
                           else [True] * params.n_agents)
    return s


def run_many(params, positions, dirs, actions, active=None, n_seeds=24):
    """Step the same constructed state under many permutation seeds; one
    vmapped call, one fetch."""
    @jax.jit
    def run(seeds):
        def one(seed):
            s = mk_state(params, positions, dirs, active, 0)
            s.key = jax.random.PRNGKey(seed)
            s2, rew, done = step_mod.step(params, s,
                                          jnp.asarray(actions, jnp.int32))
            return s2.agent_pos, s2.agent_dir, s2.active
        return jax.vmap(one)(seeds)

    pos, dirs_out, act = jax.device_get(run(jnp.arange(n_seeds)))
    return pos, dirs_out, act


P2 = EnvParams(width=8, height=8, n_agents=2,
               agent_colors=default_agent_colors(2), max_steps=50)


def test_head_on_same_cell():
    # A at (2,3) facing east, B at (4,3) facing west, both -> (3,3)
    pos, _, _ = run_many(P2, [(2, 3), (4, 3)], [0, 2], [C.FORWARD, C.FORWARD])
    winners = set()
    for k in range(pos.shape[0]):
        a, b = tuple(pos[k, 0]), tuple(pos[k, 1])
        assert (a, b) in {((3, 3), (4, 3)), ((2, 3), (3, 3))}, (a, b)
        winners.add(0 if a == (3, 3) else 1)
    assert winners == {0, 1}, "both priority orders should occur across seeds"


def test_swap_never_happens():
    # adjacent agents facing each other; a swap is impossible under the
    # sequential spec (the first mover is blocked by the still-present other)
    pos, _, _ = run_many(P2, [(2, 3), (3, 3)], [0, 2], [C.FORWARD, C.FORWARD])
    for k in range(pos.shape[0]):
        assert tuple(pos[k, 0]) == (2, 3) and tuple(pos[k, 1]) == (3, 3)


def test_chain_follow():
    # A behind B, both moving east: if B moves first both advance, else only B
    pos, _, _ = run_many(P2, [(2, 3), (3, 3)], [0, 0], [C.FORWARD, C.FORWARD])
    outcomes = set()
    for k in range(pos.shape[0]):
        a, b = tuple(pos[k, 0]), tuple(pos[k, 1])
        assert (a, b) in {((3, 3), (4, 3)), ((2, 3), (4, 3))}, (a, b)
        outcomes.add(a)
    assert len(outcomes) == 2, "both orders should occur across seeds"


def test_ghost_mode_passability():
    # B inactive on the target cell: passable iff ghost_mode (SPEC §5)
    pos, _, _ = run_many(P2, [(2, 3), (3, 3)], [0, 0],
                         [C.FORWARD, C.DONE], active=[True, False])
    for k in range(pos.shape[0]):
        assert tuple(pos[k, 0]) == (3, 3)  # ghost: A stacks onto B's cell

    p_noghost = P2.replace(ghost_mode=False)
    pos, _, _ = run_many(p_noghost, [(2, 3), (3, 3)], [0, 0],
                         [C.FORWARD, C.DONE], active=[True, False])
    for k in range(pos.shape[0]):
        assert tuple(pos[k, 0]) == (2, 3)  # solid: A blocked


def test_active_agents_never_stack():
    """Invariant sweep: random rollouts never put two active agents on one
    cell (SURVEY §4 item 2)."""
    params = EnvParams(width=9, height=9, n_agents=4, scenario="cluttered",
                       n_clutter=8, max_steps=40,
                       agent_colors=default_agent_colors(4))
    from marlgrid_tpu.core import grid_gen

    T = 40

    @jax.jit
    def run(key):
        s = grid_gen.reset(params, key)
        acts = jax.random.randint(jax.random.fold_in(key, 1), (T, 4), 0, 7)

        def body(s, a):
            s2, _, _ = step_mod.step(params, s, a)
            return s2, (s2.agent_pos, s2.active)

        _, (pos, act) = jax.lax.scan(body, s, acts)
        return pos, act

    for seed in range(4):
        pos, act = jax.device_get(run(jax.random.PRNGKey(seed)))
        for t in range(T):
            cells = [tuple(pos[t, i]) for i in range(4) if act[t, i]]
            assert len(cells) == len(set(cells)), f"stacked @t={t}: {cells}"
