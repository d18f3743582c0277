"""Per-agent egocentric observations as pure gathers (SPEC §7).

TPU-native replacement for the reference's observation path
(``marlgrid/base.py — §gen_obs_grid/§gen_agent_obs``, SURVEY §3.4): the
crop+rotate becomes a gather with precomputed per-direction index offset maps,
the ``process_vis`` occlusion flood becomes an unrolled masked sweep (row-wise
vector ops, exact minigrid propagation order), and the tile rasterization
becomes a sprite-LUT gather (``render_tile``'s tile_cache, SURVEY §3.4 hot
loop #3, turned into a one-time LUT + index_select).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .state import EnvParams, EnvState

NS = 3  # sprite-relevant states per type (door open/closed/locked)
N_BASE_APPEAR = C.N_TYPES * C.N_COLORS * NS
N_AGENT_APPEAR = 1 + C.N_COLORS * 4  # 0 = no agent overlay


@functools.lru_cache(maxsize=None)
def rel_offsets(view_size: int, view_offset: int) -> np.ndarray:
    """(4, vs, vs, 2) world-coordinate offsets of each view cell (SPEC §7).

    View cell (vi, vj) of an agent at pos p facing d shows world cell
    ``p + (aj - vj) * DIR_VEC[d] + (vi - c) * DIR_VEC[(d+1) % 4]`` with
    c = vs//2, aj = vs-1-view_offset (agent bottom-center facing up; minigrid
    lineage ``gen_obs_grid`` geometry).
    """
    vs = view_size
    c, aj = vs // 2, vs - 1 - view_offset
    out = np.zeros((4, vs, vs, 2), np.int32)
    for d in range(4):
        up = C.DIR_VEC[d]
        right = C.DIR_VEC[(d + 1) % 4]
        for vi in range(vs):
            for vj in range(vs):
                out[d, vi, vj] = (aj - vj) * up + (vi - c) * right
    return out


def view_world_coords(params: EnvParams, pos, d):
    """(vs, vs, 2) world coords + (vs, vs) in-bounds mask for one agent."""
    offs = jnp.asarray(rel_offsets(params.view_size, params.view_offset))
    w = pos[None, None, :] + offs[d]
    inb = ((w[..., 0] >= 0) & (w[..., 0] < params.width)
           & (w[..., 1] >= 0) & (w[..., 1] < params.height))
    wx = jnp.clip(w[..., 0], 0, params.width - 1)
    wy = jnp.clip(w[..., 1], 0, params.height - 1)
    return wx, wy, inb


def view_cells(params: EnvParams, state: EnvState, i):
    """Symbolic view of agent ``i``: (type, color, state) each (vs, vs),
    OOB read as wall (SPEC §7), plus the agent-overlay layer."""
    pos = state.agent_pos[i]
    d = state.agent_dir[i]
    wx, wy, inb = view_world_coords(params, pos, d)
    grey = C.COLOR_TO_IDX["grey"]
    vt = jnp.where(inb, state.grid_type[wx, wy], C.WALL)
    vc = jnp.where(inb, state.grid_color[wx, wy], grey)
    vst = jnp.where(inb, state.grid_state[wx, wy], 0)

    # Agents visible in the view (SPEC §7): lowest index wins; inactive agents
    # are hidden when ghost_mode.
    N = params.n_agents
    shown = state.active if params.ghost_mode else jnp.ones((N,), bool)
    match = ((wx[..., None] == state.agent_pos[:, 0])
             & (wy[..., None] == state.agent_pos[:, 1])
             & inb[..., None] & shown)                      # (vs, vs, N)
    any_agent = match.any(-1)
    aidx = jnp.argmax(match, -1)                            # lowest index
    acolor = jnp.asarray(params.agent_colors, jnp.int32)[aidx]
    reldir = (state.agent_dir[aidx] - d + 3) % 4
    return vt, vc, vst, any_agent, acolor, reldir


def transparency(vt, vst):
    """see_behind per view cell (walls & non-open doors block; SPEC §2)."""
    return C.see_behind(vt, vst)


def process_vis(t, view_size: int, view_offset: int):
    """Occlusion mask — vectorized minigrid flood (SPEC §7, SURVEY §3.4 [H]).

    ``t`` is the (vs, vs) transparency grid indexed [vi, vj]. Exact
    propagation order of the reference's per-cell sweeps, re-expressed as
    row-wise boolean recurrences (the per-row passes are linear in the row, so
    in-sweep values are final when visited — see oracle's literal version).
    """
    vs = view_size
    c, aj = vs // 2, vs - 1 - view_offset
    mask = jnp.zeros((vs, vs), bool).at[c, aj].set(True)
    for vj in range(vs - 1, -1, -1):
        row = mask[:, vj]
        trow = t[:, vj]
        # left-to-right pass
        for vi in range(vs - 1):
            row = row.at[vi + 1].set(row[vi + 1] | (row[vi] & trow[vi]))
        condL = (row & trow).at[vs - 1].set(False)
        upL = condL | jnp.roll(condL, 1).at[0].set(False)
        # right-to-left pass
        for vi in range(vs - 1, 0, -1):
            row = row.at[vi - 1].set(row[vi - 1] | (row[vi] & trow[vi]))
        condR = (row & trow).at[0].set(False)
        upR = condR | jnp.roll(condR, -1).at[vs - 1].set(False)
        mask = mask.at[:, vj].set(row)
        if vj > 0:
            mask = mask.at[:, vj - 1].set(mask[:, vj - 1] | upL | upR)
    return mask


def agent_obs_encode(params: EnvParams, state: EnvState, i):
    """'encode' observation style (SPEC §7): (vs, vs, 3) int32."""
    vt, vc, vst, any_agent, acolor, reldir = view_cells(params, state, i)
    ot = jnp.where(any_agent, C.AGENT, vt)
    oc = jnp.where(any_agent, acolor, vc)
    os_ = jnp.where(any_agent, reldir, vst)
    if not params.see_through_walls:
        vis = process_vis(transparency(vt, vst), params.view_size,
                          params.view_offset)
        ot, oc, os_ = (jnp.where(vis, a, 0) for a in (ot, oc, os_))
    return jnp.stack([ot, oc, os_], axis=-1)


def base_appearance(vt, vc, vst):
    """Sprite LUT index of the cell's base object (door state only)."""
    s_vis = jnp.where(vt == C.DOOR, jnp.clip(vst, 0, NS - 1), 0)
    return (vt * C.N_COLORS + vc) * NS + s_vis


def agent_obs_image(params: EnvParams, state: EnvState, i, base_lut,
                    agent_lut):
    """'image' observation style (SPEC §7): uint8 (vs*T, vs*T, 3).

    ``base_lut``: (N_BASE_APPEAR, T, T, 3) uint8; ``agent_lut``:
    (N_AGENT_APPEAR, T, T, 4) uint8 (RGB + alpha). Built host-side by
    ``marlgrid_tpu.rendering`` (SURVEY §3.4 TPU translation).
    """
    vs, T = params.view_size, params.view_tile_size
    vt, vc, vst, any_agent, acolor, reldir = view_cells(params, state, i)
    base_id = base_appearance(vt, vc, vst)
    agent_id = jnp.where(any_agent, 1 + acolor * 4 + reldir, 0)
    # Row-flattened takes: XLA CPU's multi-dim uint8 gather codegen is
    # pathologically slow to compile (~45 s per distinct shape); taking whole
    # flattened LUT rows compiles in <1 s and lowers to the same TPU gather.
    base = jnp.take(base_lut.reshape(base_lut.shape[0], -1), base_id,
                    axis=0).reshape(vs, vs, T, T, 3)
    over = jnp.take(agent_lut.reshape(agent_lut.shape[0], -1), agent_id,
                    axis=0).reshape(vs, vs, T, T, 4)
    img = jnp.where(over[..., 3:] > 0, over[..., :3], base)
    if not params.see_through_walls:
        vis = process_vis(transparency(vt, vst), params.view_size,
                          params.view_offset)
        img = img * vis[:, :, None, None, None].astype(img.dtype)
    # (vi, vj, ty, tx, 3) -> rows are vj*T+ty, cols vi*T+tx
    return img.transpose(1, 2, 0, 3, 4).reshape(vs * T, vs * T, 3)


def all_agent_obs(params: EnvParams, state: EnvState, base_lut=None,
                  agent_lut=None):
    """Stacked obs for all agents: (N, …) via vmap over the agent index."""
    idx = jnp.arange(params.n_agents)
    if params.observation_style == "encode":
        return jax.vmap(lambda i: agent_obs_encode(params, state, i))(idx)
    return jax.vmap(
        lambda i: agent_obs_image(params, state, i, base_lut, agent_lut)
    )(idx)
