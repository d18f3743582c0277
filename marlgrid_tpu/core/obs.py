"""Per-agent egocentric observations as dense contractions (SPEC §7).

TPU-native replacement for the reference's observation path
(``marlgrid/base.py — §gen_obs_grid/§gen_agent_obs``, SURVEY §3.4): the
crop+rotate becomes ONE one-hot window contraction per env covering all
agents (the agent axis folds into the contraction's M dimension — measured
the only fast batched-dot shape on v5e; vmapped dynamic-index gathers and
double-batched tiny dots both serialize), the ``process_vis`` occlusion
flood becomes closed-form prefix-count reachability (bit-exact with the
reference's sweep order), and the tile rasterization becomes a one-hot
matmul against the sprite LUT (``render_tile``'s tile_cache, SURVEY §3.4 hot
loop #3, turned into a one-time LUT + contraction).

All functions here take the whole state and return all-agent results —
per-agent slicing happens only at host boundaries.
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

# Cell packing: one int carries (type, color, state) — one window extraction
# instead of three. state < 2^15 (box packing tops out at 176), so packed
# fits int32 comfortably and is float32-exact (< 2^24) when cast for the
# contraction.
_PACK_C = C.N_TYPES          # color multiplier
_PACK_S = C.N_TYPES * 16     # state multiplier (color < 16)
_PACK_A = 32768              # agent-overlay field (cell bits < 32768)
_PACK_L = _PACK_A * 64       # prestige-level field (agent field < 64)


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


def pack_grid(state: EnvState):
    """Flat packed board, float32 for the window contraction."""
    return (state.grid_type.astype(jnp.float32)
            + _PACK_C * state.grid_color.astype(jnp.float32)
            + _PACK_S * state.grid_state.astype(jnp.float32))


def all_view_world_coords(params: EnvParams, state: EnvState):
    """(N, vs, vs, 2) world coords + (N, vs, vs) in-bounds, all agents."""
    offs = jnp.asarray(rel_offsets(params.view_size, params.view_offset))
    od = (state.agent_dir[:, None] == jnp.arange(4)).astype(jnp.int32)
    # (N, 4) one-hot x (4, vs, vs, 2) -> (N, vs, vs, 2), gather-free
    sel = jnp.einsum("nd,dije->nije", od, offs)
    w = state.agent_pos[:, None, None, :] + sel
    inb = ((w[..., 0] >= 0) & (w[..., 0] < params.width)
           & (w[..., 1] >= 0) & (w[..., 1] < params.height))
    return w, inb


def prestige_level(params: EnvParams, prestige):
    """(…, N) int32 quantized prestige level per agent (SPEC §8). The
    scale may differ per OBSERVED agent ((N,) broadcast, last axis)."""
    scale = jnp.asarray(params.prestige_scale_tuple(), jnp.float32)
    return jnp.clip(jnp.floor(prestige / scale)
                    .astype(jnp.int32), 0, C.N_PRESTIGE_LEVELS - 1)


def prestige_dim(params: EnvParams, prestige):
    """(…, N) float32 sprite dim factor per agent: PRESTIGE_DIM[level],
    gather-free."""
    oh = (prestige_level(params, prestige)[..., None]
          == jnp.arange(C.N_PRESTIGE_LEVELS))
    return (oh * jnp.asarray(C.PRESTIGE_DIM)).sum(-1)


def all_view_cells(params: EnvParams, state: EnvState, packed=None,
                   with_dim=False):
    """Symbolic views for ALL agents: (N, vs, vs) type/color/state layers,
    OOB read as wall (SPEC §7), plus the agent-overlay layers.

    One (N*vs*vs, W) x (W, H) contraction pair per env: folding agents into
    M keeps the dot a single-batch GEMM — the one shape XLA compiles well
    here (see module docstring).

    ``with_dim=True`` appends the per-cell prestige dim factor of the
    observed agent (1.0 where no agent) — image paths only.
    """
    N, vs = params.n_agents, params.view_size
    W, H = params.width, params.height
    if packed is None:
        packed = pack_grid(state)
    w, inb = all_view_world_coords(params, state)

    ox = ((w[..., 0:1] == jnp.arange(W)) & inb[..., None]) \
        .astype(jnp.float32).reshape(N * vs * vs, W)
    oy = (jnp.clip(w[..., 1:2], 0, H - 1) == jnp.arange(H)) \
        .astype(jnp.float32).reshape(N * vs * vs, H)
    grid2 = packed.reshape(W, H)
    tmp = jnp.einsum("kw,wh->kh", ox, grid2,
                     preferred_element_type=jnp.float32)
    vals = jnp.einsum("kh,kh->k", tmp, oy,
                      preferred_element_type=jnp.float32)
    packed_view = vals.astype(jnp.int32).reshape(N, vs, vs)
    wall = C.WALL + _PACK_C * C.COLOR_TO_IDX["grey"]
    packed_view = jnp.where(inb, packed_view, wall)
    vt = packed_view % _PACK_C
    vc = (packed_view // _PACK_C) % 16
    vst = packed_view // _PACK_S

    # Agents visible in the view (SPEC §7): lowest index wins; inactive
    # agents are hidden when ghost_mode.
    shown = state.active if params.ghost_mode else jnp.ones((N,), bool)
    match = ((w[..., 0:1] == state.agent_pos[:, 0])
             & (w[..., 1:2] == state.agent_pos[:, 1])
             & inb[..., None] & shown)                  # (N, vs, vs, N)
    first = match & (jnp.cumsum(match, axis=-1) == 1)   # lowest index wins
    any_agent = match.any(-1)
    colors = jnp.asarray(params.agent_colors, jnp.int32)
    acolor = (first * colors).sum(-1)
    reldir = (first * ((state.agent_dir[None, None, None, :]
                        - state.agent_dir[:, None, None, None] + 3) % 4)
              ).sum(-1)
    if not with_dim:
        return vt, vc, vst, any_agent, acolor, reldir
    adim = jnp.where(any_agent,
                     (first * prestige_dim(params, state.prestige)).sum(-1),
                     1.0)
    return vt, vc, vst, any_agent, acolor, reldir, adim


def apply_hidden(params: EnvParams, vt, vc, vst):
    """Blank out hidden object types (visual-only; SPEC: occlusion still
    honors the true cell, so callers compute transparency from the RAW
    layers before applying this)."""
    for t in params.hide_item_types:
        h = vt == t
        vt = jnp.where(h, C.EMPTY, vt)
        vc = jnp.where(h, 0, vc)
        vst = jnp.where(h, 0, vst)
    return vt, vc, vst


def transparency(vt, vst):
    """see_behind per view cell (walls & non-open doors block; SPEC §2)."""
    return (D.table_lookup(C.SEE_BEHIND_BASE, vt)
            | ((vt == C.DOOR) & (vst == C.DOOR_OPEN)))


def process_vis(t, view_size: int, view_offset: int):
    """Occlusion mask — vectorized minigrid flood (SPEC §7, SURVEY §3.4 [H]).

    ``t`` is a (..., vs, vs) transparency grid indexed [..., vi, vj] (any
    leading batch/agent dims). Exact propagation order of the reference's
    per-cell sweeps: the in-row passes are closed-form reachability — a
    left-pass reaches i from k <= i iff every cell in t[k..i-1] is
    transparent, i.e. the prefix opaque-counts agree — so each pass is one
    (vs, vs) compare + reduce instead of an unrolled scalar recurrence.
    """
    vs = view_size
    c, aj = vs // 2, vs - 1 - view_offset
    lead = t.shape[:-2]
    mask = jnp.zeros(lead + (vs, vs), bool).at[..., c, aj].set(True)
    ii = jnp.arange(vs)
    k_le_i = ii[:, None] <= ii[None, :]
    k_ge_i = ii[:, None] >= ii[None, :]
    for vj in range(vs - 1, -1, -1):
        m = mask[..., :, vj]
        trow = t[..., :, vj]
        opaque = (~trow).astype(jnp.int32)
        cs = jnp.cumsum(opaque, axis=-1)   # opaque count in t[0..i]
        cs0 = cs - opaque                  # opaque count in t[0..i-1]
        rL = (m[..., :, None] & (cs0[..., None, :] == cs0[..., :, None])
              & k_le_i).any(-2)
        condL = (rL & trow).at[..., vs - 1].set(False)
        upL = condL | jnp.roll(condL, 1, axis=-1).at[..., 0].set(False)
        rR = (rL[..., :, None] & (cs[..., :, None] == cs[..., None, :])
              & k_ge_i).any(-2)
        condR = (rR & trow).at[..., 0].set(False)
        upR = condR | jnp.roll(condR, -1, axis=-1).at[..., vs - 1].set(False)
        mask = mask.at[..., :, vj].set(rR)
        if vj > 0:
            mask = mask.at[..., :, vj - 1].set(
                mask[..., :, vj - 1] | upL | upR)
    return mask


def all_obs_encode(params: EnvParams, state: EnvState, packed=None):
    """'encode' observation style (SPEC §7): (N, vs, vs, 3) int32."""
    vt, vc, vst, any_agent, acolor, reldir = all_view_cells(params, state,
                                                            packed)
    hvt, hvc, hvst = apply_hidden(params, vt, vc, vst)
    ot = jnp.where(any_agent, C.AGENT, hvt)
    oc = jnp.where(any_agent, acolor, hvc)
    os_ = jnp.where(any_agent, reldir, hvst)
    if not params.see_through_walls:
        vis = process_vis(transparency(vt, vst), params.view_size,
                          params.view_offset)
        ot, oc, os_ = (jnp.where(vis, a, 0) for a in (ot, oc, os_))
    return jnp.stack([ot, oc, os_], axis=-1)


def encode_palettes(params: EnvParams):
    """Static per-plane code vocabularies of the 'encode' observation for
    this scenario — ((types…), (colors…), (states…)) sorted tuples, or
    None when the scenario has no registered palette.

    The one-hot embed's cost is MXU pass count, pass count is
    ceil(cells / (128 // slots-per-cell)), and a scenario only ever shows
    a handful of codes (the same structural fact the sprite kernel
    exploits via grid_gen.SCENARIO_PALETTES) — goal_cycle's 42 full-vocab
    slots shrink to ~17. Codes enumerated per plane from the scenario
    palette + the obs assembly in :func:`all_obs_encode`:

    - type: 0 (empty / occlusion-masked / hidden), WALL (border+clutter),
      AGENT (painted overlay), plus palette object types;
    - color: 0, grey (walls), palette colors, every agent color;
    - state: 0..3 (agent relative dir; covers door open/closed/locked and
      plain objects), bonus ids < n_bonus_tiles (grid_gen paints
      ``(BONUS, pink, bonus_id)``), goal-reward table indices, palette
      s values.

    Used by models.OneHotEmbed(palettes=…); a code outside the vocabulary
    one-hots to ALL-ZERO — equivalent to the full-width formulation as
    long as the vocabulary covers every observable code
    (tests/test_embed_palette.py sweeps real rollouts per scenario).
    """
    from .grid_gen import SCENARIO_PALETTES

    pal = SCENARIO_PALETTES.get(params.scenario)
    if pal is None:
        return None
    hidden = set(params.hide_item_types)
    types = {C.EMPTY, C.WALL, C.AGENT}
    colors = {0, C.COLOR_TO_IDX["grey"]}
    states = {0, 1, 2, 3}
    for (t, c, s) in pal:
        if t in hidden:
            continue
        types.add(t)
        colors.add(c)
        states.add(s)
        if t == C.BONUS:
            states |= set(range(params.n_bonus_tiles))
        if t == C.GOAL:
            states |= set(range(max(1, len(params.goal_rewards))))
    colors |= set(params.agent_colors)
    return (tuple(sorted(types)), tuple(sorted(colors)),
            tuple(sorted(states)))


def validate_encode_palette(params: EnvParams, key=None, n_envs: int = 4,
                            n_steps: int = 24):
    """One-off host-side sweep verifying the scenario's declared palette
    covers every code the 'encode' obs actually shows (round-4 advisor:
    compact one-hot vocabularies map out-of-vocabulary codes to ALL-ZERO,
    so a custom ``register_scenario(palette=…)`` with an incomplete
    palette would silently zero observation signal during training).

    Resets ``n_envs`` boards, random-walks ``n_steps``, and checks every
    observed (type, color, state) plane code against
    :func:`encode_palettes`; raises ValueError naming the missing codes.
    Builtin scenarios are swept exhaustively by tests
    (tests/test_embed_palette.py); train.py runs this at init for CUSTOM
    registered scenarios."""
    pals = encode_palettes(params)
    if pals is None:
        return
    from . import constants as C_
    from . import grid_gen, step as step_mod
    key = jax.random.PRNGKey(0) if key is None else key
    keys = jax.random.split(jax.random.fold_in(key, 0), n_envs)
    state = jax.vmap(lambda k: grid_gen.reset(params, k))(keys)
    vocabs = [set(v) for v in pals]
    names = ("type", "color", "state")

    def check(state, t):
        obs = np.asarray(all_obs_encode_b(params, state))
        for i, vocab in enumerate(vocabs):
            missing = set(np.unique(obs[..., i]).tolist()) - vocab
            if missing:
                raise ValueError(
                    f"scenario {params.scenario!r}: encode palette misses "
                    f"{names[i]} codes {sorted(missing)} (observed at "
                    f"random-walk step {t}; declared vocabulary "
                    f"{sorted(vocab)}). Fix the register_scenario("
                    f"palette=…) declaration, or disable compact embed "
                    f"vocabularies (--no-embed-palette)")

    check(state, 0)
    for t in range(n_steps):
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (n_envs, params.n_agents), 0,
                                  C_.N_ACTIONS)
        state, _, _, _ = step_mod.step_autoreset_batch(params, state, acts)
        check(state, t + 1)


def base_appearance(vt, vc, vst):
    """Sprite LUT index of the cell's base object (door state only)."""
    s_vis = jnp.where(vt == C.DOOR, jnp.clip(vst, 0, NS - 1), 0)
    return (vt * C.N_COLORS + vc) * NS + s_vis


def all_obs_image(params: EnvParams, state: EnvState, base_lut, agent_lut,
                  packed=None):
    """'image' observation style (SPEC §7): uint8 (N, vs*T, vs*T, 3).

    ``base_lut``: (N_BASE_APPEAR, T, T, 3) uint8; ``agent_lut``:
    (N_AGENT_APPEAR, T, T, 4) uint8 (RGB + alpha), built host-side by
    ``marlgrid_tpu.rendering``. The per-cell sprite select is a one-hot
    matmul against the flattened LUT — a single GEMM per env with
    M = N*vs*vs, shared constant RHS (SURVEY §3.4 "batched gather /
    index_select kernel" north star, realized as a contraction).
    """
    N, vs, T = params.n_agents, params.view_size, params.view_tile_size
    vt, vc, vst, any_agent, acolor, reldir, adim = all_view_cells(
        params, state, packed, with_dim=True)
    base_id = base_appearance(*apply_hidden(params, vt, vc, vst))
    agent_id = jnp.where(any_agent, 1 + acolor * 4 + reldir, 0)

    def lut_select(lut, idx):
        n_rows = lut.shape[0]
        flat = lut.reshape(n_rows, -1).astype(jnp.float32)
        oh = (idx.reshape(-1)[:, None] == jnp.arange(n_rows)) \
            .astype(jnp.float32)
        out = jnp.einsum("kn,nf->kf", oh, flat,
                         preferred_element_type=jnp.float32)
        return out.reshape(N, vs, vs, T, T, lut.shape[-1])

    base = lut_select(base_lut, base_id)
    over = lut_select(agent_lut, agent_id)
    # prestige dimming (SPEC §8): scale the agent sprite RGB, truncate
    img = jnp.where(over[..., 3:] > 0,
                    over[..., :3] * adim[..., None, None, None], base)
    if not params.see_through_walls:
        vis = process_vis(transparency(vt, vst), params.view_size,
                          params.view_offset)
        img = img * vis[..., None, None, None]
    img = img.astype(jnp.uint8)
    # (N, vi, vj, ty, tx, 3) -> rows are vj*T+ty, cols vi*T+tx
    return img.transpose(0, 2, 3, 1, 4, 5).reshape(N, vs * T, vs * T, 3)


def all_agent_obs(params: EnvParams, state: EnvState, base_lut=None,
                  agent_lut=None):
    """Stacked obs for all agents: (N, …)."""
    if params.observation_style == "encode":
        return all_obs_encode(params, state)
    return all_obs_image(params, state, base_lut, agent_lut)


# Back-compat per-agent entry points (host/render paths, oracle comparisons)
def agent_obs_encode(params: EnvParams, state: EnvState, i):
    return all_obs_encode(params, state)[i]


def view_cells(params: EnvParams, state: EnvState, i, packed=None):
    return tuple(a[i] for a in all_view_cells(params, state, packed))


# ---------------------------------------------------------------------------
# Explicitly-batched path, batch-minor layout.
#
# Under vmap, every per-env intermediate above becomes (B, N, vs, vs[, N])
# with a tiny minor dim: XLA:TPU tiles the last two dims onto (8 sublanes,
# 128 lanes), so vs=7 pads 18x and N=3 pads 42x — profiling showed the
# occlusion flood + agent overlay at ~1 ms/step from padding alone. The
# functions below take a state whose leaves carry a leading batch dim B and
# keep every hot intermediate in (vs, vs, N, B) layout — batch rides the
# lanes at full width, the 7x7 view lives in the sublane/loop dims. The
# window extraction keeps the §all_view_cells einsum-pair formulation
# (measured 28 us/step standalone vs 25 ms for a TPU gather).
# ---------------------------------------------------------------------------


def _observer_agents(bstate: EnvState, observers):
    """(B, n, 2) pos + (B, n) dir of the OBSERVING agents — all of them
    (observers=None) or a static index subset (the hetero per-group obs
    path renders each group's observers only; the board painting still
    covers every agent, so observed-agent content is unaffected)."""
    if observers is None:
        return bstate.agent_pos, bstate.agent_dir
    idx = jnp.asarray(observers)
    return bstate.agent_pos[:, idx], bstate.agent_dir[:, idx]


def view_coords_bminor(params: EnvParams, bstate: EnvState, observers=None):
    """(N, vs, vs, B) world x, world y, in-bounds — batch-minor.

    Axis order matters: the LAST TWO dims map to (sublane, lane) tiles, so
    (…, vs, B) pads 7→8 only; putting N or vs=7 minor pads 42x/18x.
    """
    vs = params.view_size
    offs = rel_offsets(vs, params.view_offset)     # (4, vs, vs, 2) static np
    apos, adir = _observer_agents(bstate, observers)
    px = apos[..., 0].T[:, None, None, :]          # (N, 1, 1, B)
    py = apos[..., 1].T[:, None, None, :]
    dT = adir.T[:, None, None, :]
    wx = jnp.zeros((1, vs, vs, 1), jnp.int32)
    wy = jnp.zeros((1, vs, vs, 1), jnp.int32)
    for d in range(4):
        sel = (dT == d).astype(jnp.int32)          # (N, 1, 1, B)
        wx = wx + jnp.asarray(offs[d, :, :, 0])[None, :, :, None] * sel
        wy = wy + jnp.asarray(offs[d, :, :, 1])[None, :, :, None] * sel
    wx = wx + px
    wy = wy + py
    inb = ((wx >= 0) & (wx < params.width)
           & (wy >= 0) & (wy < params.height))
    return wx, wy, inb


def pack_grid_with_agents(params: EnvParams, bstate: EnvState,
                          with_lvl=False):
    """(B, W*H) f32 packed board WITH the agent overlay painted in:
    value = cell + _PACK_A*(1 + color*4 + absdir) + _PACK_L*prestige_lvl.

    Painting the overlay into the board lets the window-extraction einsum
    carry agent presence/color/dir (and prestige level) through the SAME
    contraction — the per-view-cell agent-match loop (compares over
    (N, vs, vs, B) per observed agent) disappears from the batched obs
    path. Painted high-index-first so the LOWEST agent index wins a shared
    cell (ghost-mode stacking, SPEC §7); inactive agents hidden when
    ghost_mode. Every field stays f32-exact (max ~15.9M < 2^24), so the
    extraction contraction is still bit-exact.
    """
    N = params.n_agents
    WH = params.width * params.height
    flat = (bstate.agent_pos[..., 0] * params.height
            + bstate.agent_pos[..., 1])                       # (B, N)
    shown = bstate.active if params.ghost_mode \
        else jnp.ones_like(bstate.active)
    lvl = prestige_level(params, bstate.prestige) if with_lvl else None
    plane = jnp.zeros((flat.shape[0], WH), jnp.int32)
    cells = jnp.arange(WH)
    for j in reversed(range(N)):           # lowest index paints last/wins
        sel = (flat[:, j:j + 1] == cells) & shown[:, j:j + 1]
        val = (1 + params.agent_colors[j] * 4) + bstate.agent_dir[:, j:j + 1]
        if with_lvl:
            val = val + lvl[:, j:j + 1] * 64
        plane = jnp.where(sel, val, plane)
    return pack_grid(bstate) + plane.astype(jnp.float32) * float(_PACK_A)


def extract_views_b(params: EnvParams, bstate: EnvState, wx, wy, inb,
                    packed=None, observers=None):
    """Packed view values for all envs/agents: (N, vs, vs, B) int32.

    One batched einsum pair per call (B-major operands — the one dense
    formulation XLA compiles to full-rate fused reduce on v5e); OOB cells
    read as grey wall (SPEC §7). The layout swap to batch-minor goes
    through the Pallas transpose kernel (ops/transpose.py) — letting XLA
    fuse it into the reduction emits strided writes ~10x slower.
    """
    vs = params.view_size
    N = params.n_agents if observers is None else len(observers)
    W, H = params.width, params.height
    B = bstate.grid_type.shape[0]
    K = N * vs * vs
    # B-major coords recomputed straight from the agent block (NOT a
    # transpose of the B-minor ones: a fused transpose feeding the einsum
    # makes the contraction read strided and costs ~10x — measured).
    apos, adir = _observer_agents(bstate, observers)
    offs = rel_offsets(vs, params.view_offset).reshape(4, vs * vs, 2)
    doh = (adir[..., None] == jnp.arange(4))              # (B, N, 4)
    offx = jnp.einsum("bnd,dk->bnk", doh.astype(jnp.int32),
                      jnp.asarray(offs[..., 0]))
    offy = jnp.einsum("bnd,dk->bnk", doh.astype(jnp.int32),
                      jnp.asarray(offs[..., 1]))
    wxB = (apos[..., 0:1] + offx).reshape(B, K)
    wyB = (apos[..., 1:2] + offy).reshape(B, K)
    inbB = ((wxB >= 0) & (wxB < W) & (wyB >= 0) & (wyB < H))
    ox = ((wxB[..., None] == jnp.arange(W)) & inbB[..., None]) \
        .astype(jnp.float32)
    oy = (jnp.clip(wyB[..., None], 0, H - 1) == jnp.arange(H)) \
        .astype(jnp.float32)
    g2 = (pack_grid(bstate) if packed is None else packed).reshape(B, W, H)
    tmp = jnp.einsum("bkw,bwh->bkh", ox, g2,
                     preferred_element_type=jnp.float32)
    vals = jnp.einsum("bkh,bkh->bk", tmp, oy,
                      preferred_element_type=jnp.float32)
    from .. import ops
    pv = ops.transpose_bk(vals.astype(jnp.int32)).reshape(N, vs, vs, B)
    wall = C.WALL + _PACK_C * C.COLOR_TO_IDX["grey"]
    return jnp.where(inb, pv, wall)


def all_view_cells_b(params: EnvParams, bstate: EnvState, with_dim=False,
                     observers=None, packed=None):
    """Batched §all_view_cells, all outputs (N, vs, vs, B) batch-minor.

    The agent overlay (and prestige level when ``with_dim``) arrives
    painted into the packed board (``pack_grid_with_agents``) and is
    decoded from the extraction's high bits — no per-view-cell agent-match
    loop. ``with_dim=True`` appends the observed agent's quantized
    prestige LEVEL (int32; the sprite kernel packs the 3 bits directly).

    ``observers``: static agent-index subset restricting WHO observes
    (N = len(observers)); the painted board still carries every agent, so
    the views' content is identical to slicing the full-N result — the
    hetero per-group path renders each group's observers only (the old
    full-N-render-then-slice did G×N agents' worth of contraction work).
    ``packed``: a precomputed ``pack_grid_with_agents`` board (painting is
    group-independent, so hetero callers paint ONCE and share it)."""
    wx, wy, inb = view_coords_bminor(params, bstate, observers)
    if packed is None:
        packed = pack_grid_with_agents(params, bstate, with_lvl=with_dim)
    pv = extract_views_b(params, bstate, wx, wy, inb, packed, observers)
    low = pv % _PACK_A
    vt = low % _PACK_C
    vc = (low // _PACK_C) % 16
    vst = low // _PACK_S
    ab = pv // _PACK_A
    A = ab % 64
    any_agent = A > 0
    acolor = jnp.where(any_agent, (A - 1) // 4, 0)
    _, adir = _observer_agents(bstate, observers)
    dobs = adir.T[:, None, None, :]                # observer dir (N,1,1,B)
    reldir = jnp.where(any_agent, ((A - 1) % 4 - dobs + 3) % 4, 0)
    if not with_dim:
        return vt, vc, vst, any_agent, acolor, reldir
    return vt, vc, vst, any_agent, acolor, reldir, ab // 64


def transparency_b(vt, vst):
    """see_behind per view cell — only walls and non-open doors block."""
    return ~((vt == C.WALL) | ((vt == C.DOOR) & (vst != C.DOOR_OPEN)))


def process_vis_b(t, view_size: int, view_offset: int):
    """Batch-minor §process_vis: t is (N, vs, vs, B) indexed [., vi, vj, .].

    Same closed-form per-column reachability as §process_vis, with the
    mask built as a functional column list (no dynamic-update-slice on the
    full mask) and the lane dim (B) minor throughout.

    Run-membership closed forms: cs0/cs are monotone non-decreasing, so
    "exists k<=i with m[k] and cs0[k]==cs0[i]" (same transparent run) is
    prefix-max(cs0 where m else -1) == cs0, and the k>=i case is
    suffix-min(cs where rL else BIG) == cs — O(vs) work per column
    instead of the O(vs^2) pairwise broadcast.
    """
    vs = view_size
    c, aj = vs // 2, vs - 1 - view_offset
    N, B = t.shape[0], t.shape[3]
    ii = jnp.arange(vs)
    not_last = (ii != vs - 1)[None, :, None]       # (1, vs, 1)
    not_first = (ii != 0)[None, :, None]
    init_col = (ii == c)[None, :, None]

    cols = [None] * vs
    pending = jnp.zeros((N, vs, B), bool)
    for vj in range(vs - 1, -1, -1):
        m = pending | init_col if vj == aj else pending
        trow = t[:, :, vj]                         # (N, vs, B)
        opaque = (~trow).astype(jnp.int8)
        cs = jnp.cumsum(opaque, axis=1)
        cs0 = cs - opaque
        q = jnp.where(m, cs0, jnp.int8(-1))
        rL = jax.lax.cummax(q, axis=1) == cs0
        condL = rL & trow & not_last
        upL = condL | (jnp.roll(condL, 1, axis=1) & not_first)
        r = jnp.where(rL, cs, jnp.int8(127))
        rR = jax.lax.cummin(r, axis=1, reverse=True) == cs
        condR = rR & trow & not_first
        upR = condR | (jnp.roll(condR, -1, axis=1) & not_last)
        cols[vj] = rR
        pending = upL | upR
    return jnp.stack(cols, axis=2)                 # (N, vs, vs, B)


def all_obs_encode_b(params: EnvParams, bstate: EnvState, bminor=False,
                     observers=None, packed=None):
    """Batched 'encode' obs — bit-identical to ``vmap(all_obs_encode)``
    (tested).

    ``bminor=False``: (B, N, vs, vs, 3) int32, the reference-shaped API.
    ``bminor=True``: (3, N, vs, vs, B) int32, the TPU-native layout (batch
    on lanes) — skips the major<->minor output transpose; use on hot paths
    whose consumer contracts over features anyway (bench, PPO torso).
    ``observers``/``packed``: see :func:`all_view_cells_b` — the hetero
    per-group path renders each group's own observers against one shared
    painted board (bit-identical to slicing the full-N render, tested).
    """
    vt, vc, vst, any_agent, acolor, reldir = all_view_cells_b(
        params, bstate, observers=observers, packed=packed)
    hvt, hvc, hvst = apply_hidden(params, vt, vc, vst)
    ot = jnp.where(any_agent, C.AGENT, hvt)
    oc = jnp.where(any_agent, acolor, hvc)
    os_ = jnp.where(any_agent, reldir, hvst)
    if not params.see_through_walls:
        vis = process_vis_b(transparency_b(vt, vst), params.view_size,
                            params.view_offset)
        ot, oc, os_ = (jnp.where(vis, a, 0) for a in (ot, oc, os_))
    out = jnp.stack([ot, oc, os_], axis=0)         # (3, N, vs, vs, B)
    if bminor:
        return out
    # (3, N, vs, vs, B) -> (B, N, vs, vs, 3): one 5D transpose (compat
    # path only; hot paths pass bminor=True).
    return out.transpose(4, 1, 2, 3, 0)


def all_obs_image_b(params: EnvParams, bstate: EnvState, base_lut, agent_lut,
                    force_xla: bool = False, sprite_interpret: bool = False,
                    bminor: bool = False, s2d: bool = False,
                    observers=None, packed=None):
    """Batched 'image' obs: (B, N, vs*T, vs*T, 3) uint8.

    Fast path: the Pallas sprite-composite kernel (ops/sprite.py) — compact
    scenario palette, VMEM-resident LUTs, no HBM intermediates, no output
    transpose. Fallback (non-TPU backends, unknown palettes, odd batch
    sizes): the sprite select folds batch into a one-hot GEMM M dim against
    the SHARED full-LUT RHS — one (B*N*vs*vs, n_appear) x (n_appear,
    T*T*ch) matmul instead of B vmapped 298-row ones (§all_obs_image). Both
    paths are bit-identical (tested).

    ``observers``/``packed``: see :func:`all_view_cells_b` — the hetero
    per-group path renders each group's own observers (N = len(observers))
    against one shared painted board. A shared ``packed`` board must be
    painted ``with_lvl=True`` (the image path reads the prestige level from
    the high bits; the encode path ignores them, so one with_lvl board
    serves mixed-style groups).
    """
    vs, T = params.view_size, params.view_tile_size
    N = params.n_agents if observers is None else len(observers)
    B = bstate.grid_type.shape[0]
    vt, vc, vst, any_agent, acolor, reldir, alvl = all_view_cells_b(
        params, bstate, with_dim=True, observers=observers, packed=packed)
    base_id = base_appearance(*apply_hidden(params, vt, vc, vst))
    agent_id = jnp.where(any_agent, 1 + acolor * 4 + reldir, 0)
    if not params.see_through_walls:
        vis = process_vis_b(transparency_b(vt, vst), params.view_size,
                            params.view_offset)
        base_id = jnp.where(vis, base_id, N_BASE_APPEAR)   # extra black row
        agent_id = jnp.where(vis, agent_id, 0)

    from ..ops import sprite
    if not force_xla and sprite.config_ok(params) \
            and (sprite_interpret or sprite.available(params, B)):
        # bminor=True returns the kernel's native (N, B, H, W, 3) layout,
        # skipping the final leading-dim swap (hot paths that fold (N, B)
        # into one batch dim anyway — bench, CNN torso)
        return sprite.compose_image_b(params, base_id, agent_id, alvl,
                                      interpret=sprite_interpret,
                                      nb_layout=bminor, s2d=s2d)

    def lut_select(lut, idx, pad_rows):
        n_rows = lut.shape[0] + pad_rows
        flat = lut.reshape(lut.shape[0], -1).astype(jnp.bfloat16)
        if pad_rows:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad_rows, flat.shape[1]), flat.dtype)])
        # idx (N, vs, vs, B) -> B-major rows (B*N*vs*vs,)
        rows = idx.transpose(3, 0, 1, 2).reshape(-1)
        oh = (rows[:, None] == jnp.arange(n_rows)).astype(jnp.bfloat16)
        out = jnp.einsum("kn,nf->kf", oh, flat,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, N, vs, vs, T, T, lut.shape[-1])

    base = lut_select(base_lut, base_id, 1)        # LUT uint8 is bf16-exact
    over = lut_select(agent_lut, agent_id, 0)
    # prestige dimming (SPEC §8): level -> factor, (N, vs, vs, B) ->
    # (B, N, vs, vs) to align
    adim = ((alvl[..., None] == jnp.arange(C.N_PRESTIGE_LEVELS))
            * jnp.asarray(C.PRESTIGE_DIM)).sum(-1)
    adimB = adim.transpose(3, 0, 1, 2)[..., None, None, None]
    img = jnp.where(over[..., 3:] > 0, over[..., :3] * adimB,
                    base).astype(jnp.uint8)
    # (B, N, vi, vj, ty, tx, 3) -> rows vj*T+ty, cols vi*T+tx
    img = img.transpose(0, 1, 3, 4, 2, 5, 6).reshape(
        B, N, vs * T, vs * T, 3)
    if s2d:
        # space-to-depth block-4 layout (see sprite._build_rhs): pixel
        # (r, q) -> channel (r%4)*12 + (q%4)*3 + c of block (r//4, q//4)
        side = vs * T // 4
        img = img.reshape(B, N, side, 4, side, 4, 3)                  .transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                     B, N, side, side, 48)
    if bminor:
        # keep the bminor contract consistent with the sprite kernel's
        # native (N, B, ...) layout even on this fallback path
        return img.transpose(1, 0, 2, 3, 4)
    return img


def all_agent_obs_b(params: EnvParams, bstate: EnvState, base_lut=None,
                    agent_lut=None, bminor=False, s2d=False):
    """Batched obs for a batch-leading state: (B, N, …) — or a TPU-native
    layout with ``bminor=True`` ((3, N, vs, vs, B) for encode; the sprite
    kernel's (N, B, H, W, 3) for image). ``s2d=True`` (image only) emits
    the space-to-depth block-4 layout the 'cnn_s2d' learner consumes —
    free in the sprite kernel (an RHS column relabeling)."""
    if params.observation_style == "encode":
        return all_obs_encode_b(params, bstate, bminor=bminor)
    return all_obs_image_b(params, bstate, base_lut, agent_lut,
                           bminor=bminor, s2d=s2d)
