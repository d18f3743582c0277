"""Per-agent egocentric observations as dense contractions (SPEC §7).

TPU-native replacement for the reference's observation path
(``marlgrid/base.py — §gen_obs_grid/§gen_agent_obs``, SURVEY §3.4): the
crop+rotate becomes one-hot window contractions over precomputed
per-direction offset maps (MXU-shaped einsums — vmapped dynamic-index
gathers serialize on TPU, see core/dense.py), the ``process_vis`` occlusion
flood becomes an unrolled masked sweep (row-wise vector ops, exact minigrid
propagation order), and the tile rasterization becomes a one-hot matmul
against the sprite LUT (``render_tile``'s tile_cache, SURVEY §3.4 hot loop
#3, turned into a one-time LUT + contraction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from . import dense as D
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
    od = D.onehot(d, 4)
    w = pos[None, None, :] + (offs * od[:, None, None, None]).sum(0)
    inb = ((w[..., 0] >= 0) & (w[..., 0] < params.width)
           & (w[..., 1] >= 0) & (w[..., 1] < params.height))
    return w, inb


# Cell packing: one int carries (type, color, state) — one window extraction
# instead of three. state < 2^15 (box packing tops out at 176), so packed
# fits int32 comfortably and is float32-exact (< 2^24) if ever cast.
_PACK_C = C.N_TYPES          # color multiplier
_PACK_S = C.N_TYPES * 16     # state multiplier (color < 16)


def pack_grid(state: EnvState):
    return (state.grid_type + _PACK_C * state.grid_color
            + _PACK_S * state.grid_state)


def view_cells(params: EnvParams, state: EnvState, i, padded=None):
    """Symbolic view of agent ``i``: (type, color, state) each (vs, vs),
    OOB read as wall (SPEC §7), plus the agent-overlay layer.

    The window read is TWO one-hot contractions against the single packed
    layer (``padded`` holds the packed board as float32, shared across
    agents). Benchmarked alternatives on v5e: vmapped dynamic_slice of an
    agent-centered superwindow serializes (batched-start slices lower to
    gathers), and per-layer one-hot einsums tripled the contraction count.
    """
    pos = D.read_row(state.agent_pos, i)
    d = D.read_row(state.agent_dir, i)
    if padded is None:
        padded = pack_grid(state).astype(jnp.float32)
    w, inb = view_world_coords(params, pos, d)
    W, H = params.width, params.height
    ox = ((w[..., 0:1] == jnp.arange(W)) & inb[..., None]) \
        .astype(jnp.float32)
    oy = (jnp.clip(w[..., 1:2], 0, H - 1) == jnp.arange(H)) \
        .astype(jnp.float32)
    # Barriers pin the contraction as a standalone dot: without them XLA
    # fuses it with the surrounding compare/select chain into a kLoop fusion
    # that iterates serially over the env batch (~500x slower, measured).
    ox, oy, padded = jax.lax.optimization_barrier((ox, oy, padded))
    packed = D.select_window(padded, ox, oy).astype(jnp.int32)
    packed = jax.lax.optimization_barrier(packed)
    wall = C.WALL + _PACK_C * C.COLOR_TO_IDX["grey"]
    packed = jnp.where(inb, packed, wall)
    vt = packed % _PACK_C
    vc = (packed // _PACK_C) % 16
    vst = packed // _PACK_S

    # Agents visible in the view (SPEC §7): lowest index wins; inactive agents
    # are hidden when ghost_mode.
    N = params.n_agents
    shown = state.active if params.ghost_mode else jnp.ones((N,), bool)
    match = ((w[..., 0:1] == state.agent_pos[:, 0])
             & (w[..., 1:2] == state.agent_pos[:, 1])
             & inb[..., None] & shown)                      # (vs, vs, N)
    first = match & (jnp.cumsum(match, axis=-1) == 1)       # lowest index
    any_agent = match.any(-1)
    colors = jnp.asarray(params.agent_colors, jnp.int32)
    acolor = (first * colors).sum(-1)
    reldir = (first * ((state.agent_dir - d + 3) % 4)).sum(-1)
    return vt, vc, vst, any_agent, acolor, reldir


def transparency(vt, vst):
    """see_behind per view cell (walls & non-open doors block; SPEC §2)."""
    return (D.table_lookup(C.SEE_BEHIND_BASE, vt)
            | ((vt == C.DOOR) & (vst == C.DOOR_OPEN)))


def process_vis(t, view_size: int, view_offset: int):
    """Occlusion mask — vectorized minigrid flood (SPEC §7, SURVEY §3.4 [H]).

    ``t`` is the (vs, vs) transparency grid indexed [vi, vj]. Exact
    propagation order of the reference's per-cell sweeps, re-expressed as
    row-wise boolean recurrences (the per-row passes are linear in the row, so
    in-sweep values are final when visited — see oracle's literal version).
    The in-row sweeps are closed-form reachability: a left-pass reaches i
    from k ≤ i iff every cell in t[k..i-1] is transparent, i.e. the prefix
    opaque-counts agree — so each pass is one (vs, vs) compare + reduce
    instead of an unrolled scalar recurrence (which was ~170 serial ops).
    """
    vs = view_size
    c, aj = vs // 2, vs - 1 - view_offset
    mask = jnp.zeros((vs, vs), bool).at[c, aj].set(True)
    ii = jnp.arange(vs)
    k_le_i = ii[:, None] <= ii[None, :]
    k_ge_i = ii[:, None] >= ii[None, :]
    for vj in range(vs - 1, -1, -1):
        m = mask[:, vj]
        trow = t[:, vj]
        opaque = (~trow).astype(jnp.int32)
        cs = jnp.cumsum(opaque)            # opaque count in t[0..i]
        cs0 = cs - opaque                  # opaque count in t[0..i-1]
        # left-to-right: rL[i] = OR_{k<=i} m[k] & (no opaque in t[k..i-1])
        rL = (m[:, None] & (cs0[None, :] == cs0[:, None]) & k_le_i).any(0)
        condL = (rL & trow).at[vs - 1].set(False)
        upL = condL | jnp.roll(condL, 1).at[0].set(False)
        # right-to-left from rL: rR[i] = OR_{k>=i} rL[k] & (none in t[i+1..k])
        rR = (rL[:, None] & (cs[:, None] == cs[None, :]) & k_ge_i).any(0)
        condR = (rR & trow).at[0].set(False)
        upR = condR | jnp.roll(condR, -1).at[vs - 1].set(False)
        mask = mask.at[:, vj].set(rR)
        if vj > 0:
            mask = mask.at[:, vj - 1].set(mask[:, vj - 1] | upL | upR)
    return mask


def agent_obs_encode(params: EnvParams, state: EnvState, i, padded=None):
    """'encode' observation style (SPEC §7): (vs, vs, 3) int32."""
    vt, vc, vst, any_agent, acolor, reldir = view_cells(params, state, i,
                                                        padded)
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
                    agent_lut, padded=None):
    """'image' observation style (SPEC §7): uint8 (vs*T, vs*T, 3).

    ``base_lut``: (N_BASE_APPEAR, T, T, 3) uint8; ``agent_lut``:
    (N_AGENT_APPEAR, T, T, 4) uint8 (RGB + alpha). Built host-side by
    ``marlgrid_tpu.rendering``. The per-cell sprite select is a one-hot
    matmul against the flattened LUT — MXU work, no gathers (SURVEY §3.4
    "batched gather/index_select kernel" north star, realized as a
    contraction).
    """
    vs, T = params.view_size, params.view_tile_size
    vt, vc, vst, any_agent, acolor, reldir = view_cells(params, state, i,
                                                        padded)
    base_id = base_appearance(vt, vc, vst)
    agent_id = jnp.where(any_agent, 1 + acolor * 4 + reldir, 0)

    def lut_select(lut, idx, n_rows):
        flat = lut.reshape(n_rows, -1).astype(jnp.float32)
        oh = (idx.reshape(-1)[:, None] == jnp.arange(n_rows)) \
            .astype(jnp.float32)
        out = jnp.einsum("kn,nf->kf", oh, flat,
                         preferred_element_type=jnp.float32)
        return out.reshape(vs, vs, T, T, lut.shape[-1])

    base = lut_select(base_lut, base_id, base_lut.shape[0])
    over = lut_select(agent_lut, agent_id, agent_lut.shape[0])
    img = jnp.where(over[..., 3:] > 0, over[..., :3], base)
    if not params.see_through_walls:
        vis = process_vis(transparency(vt, vst), params.view_size,
                          params.view_offset)
        img = img * vis[:, :, None, None, None]
    img = img.astype(jnp.uint8)
    # (vi, vj, ty, tx, 3) -> rows are vj*T+ty, cols vi*T+tx
    return img.transpose(1, 2, 0, 3, 4).reshape(vs * T, vs * T, 3)


def all_agent_obs(params: EnvParams, state: EnvState, base_lut=None,
                  agent_lut=None):
    """Stacked obs for all agents: (N, …) via vmap over the agent index."""
    idx = jnp.arange(params.n_agents)
    padded = pack_grid(state).astype(jnp.float32)  # shared across agents
    if params.observation_style == "encode":
        return jax.vmap(
            lambda i: agent_obs_encode(params, state, i, padded))(idx)
    return jax.vmap(
        lambda i: agent_obs_image(params, state, i, base_lut, agent_lut,
                                  padded)
    )(idx)
