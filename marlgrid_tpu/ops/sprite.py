"""Pallas sprite-composite kernel — the 'image' observation fast path.

TPU-native replacement for the reference's per-tile rasterize-and-cache
(``marlgrid/base.py — §render_tile`` tile_cache, SURVEY §3.4 hot loop #3) at
batch scale. The XLA formulation (core/obs.py::all_obs_image_b) one-hot-GEMMs
every view cell against the FULL 298-row sprite LUT and materializes two
(B·N·vs², T²·ch) float32 intermediates in HBM before compositing — ~8x
slower than the 'encode' path. This kernel exploits three structural facts:

1. **Scenario palettes are tiny.** A given scenario can only ever show a
   handful of cell appearances (grid_gen.SCENARIO_PALETTES): the one-hot
   contraction needs ~6-14 base rows + 4 agent-alpha rows + 4·n_colors agent
   RGB rows — ALL of one view row's cells fit in a single 128-wide MXU
   contraction, so the whole sprite select + alpha composite collapses to
   TWO (Bc, 128) x (128, vs·T²·ch) matmuls per grid step with VMEM-resident
   LUTs and no HBM intermediates.

2. **The tile interleave can ride the matmul.** RHS columns are laid out in
   final-image order (ty·(vs·T·ch) + vi·(T·ch) + tx·ch + c) with each view
   cell's one-hot feeding a block-diagonal column stripe, so the kernel
   writes pixel rows directly: the output array (B·N, vs, T·vs·T·ch) uint8
   reshapes to the reference-shaped (B, N, vs·T, vs·T, ch) image with NO
   transpose (identical row-major layout).

3. **The alpha plane rides the base matmul for free.** Agent-sprite alpha
   masks depend only on relative dir (4 rows); they are packed into the
   base matmul's unused contraction slots scaled by 4096, so out1 =
   base_rgb + 4096·alpha_bit and the composite is two VPU ops. Sprite
   bytes (≤255), the 4096 flag, and the bf16-exact PRESTIGE_DIM factors
   all multiply/accumulate exactly in bf16xbf16->f32, keeping the kernel
   bit-identical to the XLA path (tested).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

_ALPHA_FLAG = 4096.0
_K = 128           # max contraction width (one MXU pass)


def _ck(slots: int) -> int:
    """Contraction width for ``slots`` used rows: bf16 sublane tile (16)
    granularity — MXU pass time scales with K, so a 6-slot-per-cell
    palette contracts over 48 rows, not a padded 128."""
    return min(_K, -(-slots // 16) * 16)


# --------------------------------------------------------------------------
# Static palette / availability
# --------------------------------------------------------------------------

def base_palette(params):
    """Static tuple of base-cell appearance codes the scenario can show,
    or None when unknown. Codes are core/obs.py::base_appearance values."""
    from ..core.grid_gen import SCENARIO_PALETTES
    from ..core.obs import NS

    pal = SCENARIO_PALETTES.get(params.scenario)
    if pal is None:
        return None
    # EMPTY is deliberately absent: its sprite is all-black, identical to
    # the "no contraction row" sentinel, so it costs zero slots
    triples = [(C.WALL, C.COLOR_TO_IDX["grey"], 0)]
    triples += [t for t in pal if t not in triples and t[0] != C.EMPTY]
    hidden = set(params.hide_item_types)
    triples = [t for t in triples if t[0] not in hidden]
    return tuple((t * C.N_COLORS + c) * NS + s for (t, c, s) in triples)


def agent_color_slots(params):
    """Distinct agent colors, in first-appearance order (static)."""
    out = []
    for c in params.agent_colors:
        if c not in out:
            out.append(c)
    return tuple(out)


def _block_envs(total: int) -> int:
    # bc caps VMEM: out block (bc, vs, lanes) uint8 double-buffered + two
    # (bc, lanes) f32 intermediates; 256 measured safe within 16 MB
    for bc in (256, 128, 64, 32, 16):
        if total % bc == 0:
            return bc
    return 0


def config_ok(params) -> bool:
    """Static palette/size feasibility (backend- and batch-independent;
    the interpret-mode debug path must pass this too)."""
    pal = base_palette(params)
    if pal is None:
        return False
    vs = params.view_size
    nb = len(pal)
    nc = len(agent_color_slots(params))
    return vs * (nb + 4) <= _K and vs * 4 * nc <= _K


def available(params, batch: int) -> bool:
    """Can the kernel serve this config? (static; checked per call site)"""
    import os

    if os.environ.get("MARLGRID_TPU_NO_SPRITE_KERNEL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if not config_ok(params):
        return False
    return _block_envs(batch) >= 16


# --------------------------------------------------------------------------
# Host-side RHS construction (cached per static config)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_rhs(pal, colors, vs: int, T: int, s2d: bool = False):
    """(_K, vs*T*T*3) bf16 RHS pair: base+alpha | agent rgb.

    Row layout per view column vi (block-diagonal over vi):
      RHS1 rows vi*(nb+4) + j       -> base appearance pal[j] sprite bytes
      RHS1 rows vi*(nb+4) + nb + d  -> 4096 * (alpha(dir d) > 0)
      RHS2 rows vi*(4*nc) + k*4 + d -> agent rgb sprite (colors[k], dir d)
    Column layout: ty*(vs*T*3) + vi*(T*3) + tx*3 + c  (final-image order) —
    or, with ``s2d``, SPACE-TO-DEPTH block-4 order (the layout the
    'cnn_s2d' learner consumes: pixel (r, q) lands in channel slot
    (r%4)*12 + (q%4)*3 + c of spatial block (r//4, q//4)): the tile
    interleave rides the matmul either way, so the training-friendly
    layout costs NOTHING — it is a column relabeling of the constant RHS.
    """
    from .. import rendering

    nb = len(pal)
    nc = len(colors)
    lanes = vs * T * T * 3
    base_lut = rendering.base_lut(T)                     # (n_appear, T, T, 3)
    agent_lut = rendering.agent_lut(T)                   # (n_agent, T, T, 4)
    rhs1 = np.zeros((_ck(vs * (nb + 4)), lanes), np.float32)
    rhs2 = np.zeros((_ck(vs * 4 * nc), lanes), np.float32)

    def cols(vi):
        ty, tx, c = np.meshgrid(np.arange(T), np.arange(T), np.arange(3),
                                indexing="ij")
        if s2d:
            # within one vj stripe (T image rows): 2 block-rows of
            # (vs*T//4) spatial blocks x 48 channels
            assert T % 4 == 0, T
            br, dy = ty // 4, ty % 4
            q = vi * T + tx
            return (br * (vs * T // 4 * 48) + (q // 4) * 48
                    + dy * 12 + (q % 4) * 3 + c).reshape(-1)
        return (ty * (vs * T * 3) + vi * (T * 3) + tx * 3 + c).reshape(-1)

    for vi in range(vs):
        cc = cols(vi)
        for j, code in enumerate(pal):
            rhs1[vi * (nb + 4) + j, cc] = \
                base_lut[code].astype(np.float32).reshape(-1)
        for d in range(4):
            alpha = agent_lut[1 + 0 * 4 + d, :, :, 3] > 0   # dir-only mask
            rhs1[vi * (nb + 4) + nb + d, cc] = \
                _ALPHA_FLAG * np.repeat(alpha.astype(np.float32), 3)
        for k, col in enumerate(colors):
            for d in range(4):
                rhs2[vi * (4 * nc) + k * 4 + d, cc] = \
                    agent_lut[1 + col * 4 + d, :, :, :3] \
                    .astype(np.float32).reshape(-1)
    # cache NUMPY (converted per call site): caching jnp arrays created
    # inside a jit trace leaks tracers across compilations
    import ml_dtypes

    return (rhs1.astype(ml_dtypes.bfloat16), rhs2.astype(ml_dtypes.bfloat16))


# --------------------------------------------------------------------------
# Kernel: batch-on-lanes one-hot build + transposed-contraction matmuls
# --------------------------------------------------------------------------

def _make_kernel(vs: int, nb: int, nc: int):
    """Kernel body closure over the static palette geometry.

    The packed per-cell slot words arrive BATCH-MINOR — (vs*vs, bc) with
    the env/agent rows on LANES, exactly how the obs pipeline produces
    them — so no lane<->sublane transpose exists anywhere: the one-hots
    are built TRANSPOSED, (̲K, bc) with contraction slots on sublanes,
    and the matmuls contract dim 0 of both operands ((K, M) x (K, N) ->
    (M, N), native on the MXU). Per view row vj: accumulate the 7 cells'
    one-hots, two matmuls, alpha composite, uint8; lane-concat the vs
    pixel-row stripes into the final-image block layout (free reshape
    outside). All 2D vector ops (Mosaic rejects 3D middle-index stores).
    """
    dn = (((0,), (0,)), ((), ()))
    dims = [float(f) for f in C.PRESTIGE_DIM]

    def kernel(pk_ref, r1_ref, r2_ref, o_ref):
        k1, k2 = r1_ref.shape[0], r2_ref.shape[0]
        iota1 = jax.lax.broadcasted_iota(jnp.int32, (k1, 1), 0)
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (k2, 1), 0)
        pkb = pk_ref[0]                                        # (49, bc)
        rows = []
        for vj in range(vs):
            acc1 = None
            acc2 = None
            for vi in range(vs):
                r = vj * vs + vi
                v = pkb[r:r + 1, :]                            # (1, bc)
                s1 = v & 255
                sa = (v >> 8) & 255
                s2 = (v >> 16) & 255
                lv = (v >> 24) & 7
                oh = (s1 == iota1) | (sa == iota1)             # (k1, bc)
                acc1 = oh if acc1 is None else (acc1 | oh)
                dimf = sum(jnp.where(lv == li, d, 0.0)
                           for li, d in enumerate(dims))       # (1, bc) f32
                # (bf16 accumulate here trips a Mosaic relayout bug — the
                # broadcast i1 mask can't relayout (8,128)->(16,128); f32
                # accumulate + one final convert compiles clean)
                q = jnp.where(s2 == iota2, dimf, 0.0)
                acc2 = q if acc2 is None else (acc2 + q)
            o1 = jax.lax.dot_general(acc1.astype(jnp.bfloat16), r1_ref[:],
                                     dn, preferred_element_type=jnp.float32)
            o2 = jax.lax.dot_general(acc2.astype(jnp.bfloat16), r2_ref[:],
                                     dn, preferred_element_type=jnp.float32)
            # o1 = base_rgb + 4096*alpha_bit; where the flag is set the base
            # value is DISCARDED in favor of o2, so the flag never needs
            # subtracting — o1 < 4096 wherever it is actually read
            # (base sprite bytes <= 255, one block-diagonal row per lane).
            # no direct f32->u8 lowering; values in [0, 256) so i32 matches
            rows.append(jnp.where(o1 >= _ALPHA_FLAG, o2, o1)
                        .astype(jnp.int32).astype(jnp.uint8))
        o_ref[0] = jnp.concatenate(rows, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("vs", "nb", "nc", "lanes",
                                             "bc", "interpret"))
def _compose(pk, rhs1, rhs2, vs: int, nb: int, nc: int, lanes: int, bc: int,
             interpret: bool = False):
    """pk: (N, vs*vs, B) int32 batch-minor -> (N, B, vs*lanes) uint8.

    Grid (n, b-block) with 3D blocks indexed on the LEADING dim only and
    trailing dims (49, bc) == (full, lane-tile): the agent dim never
    merges into the lane dim, so XLA fuses the packed-word production
    straight into the kernel's operand (no relayout copies — a
    (vj,vi,N,B)->(49,N*B) lane merge cost 0.8 ms/call before).
    """
    N, B = pk.shape[0], pk.shape[2]
    return pl.pallas_call(
        _make_kernel(vs, nb, nc),
        grid=(N, B // bc),
        in_specs=[
            pl.BlockSpec((1, vs * vs, bc), lambda n, i: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rhs1.shape[0], lanes), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rhs2.shape[0], lanes), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, vs * lanes), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B, vs * lanes), jnp.uint8),
        interpret=interpret,
    )(pk, rhs1, rhs2)


# --------------------------------------------------------------------------
# Device-side entry: batch-minor ids -> reference-shaped image
# --------------------------------------------------------------------------

def compose_image_b(params, base_id, agent_id, alvl, interpret=False,
                    nb_layout=False, s2d=False):
    """(B, N, vs*T, vs*T, 3) uint8 from batch-minor per-cell ids.

    ``base_id``: (N, vs, vs, B) int32 appearance codes (N_BASE_APPEAR =
    black/invisible row); ``agent_id``: (N, vs, vs, B) int32 (0 = none,
    else 1 + color*4 + reldir, already vis-masked); ``alvl``: (N, vs, vs, B)
    int32 quantized prestige level of the observed agent (3 bits).

    ``nb_layout=True`` returns the TPU-native (N, B, vs*T, vs*T, 3) layout
    (kernel row order is (n, b)), skipping the final leading-dim swap —
    use on hot paths that fold (N, B) into one batch dim anyway.
    """
    vs, T = params.view_size, params.view_tile_size
    # N from the ids, not params.n_agents: hetero observer-subset renders
    # pass (n_g, vs, vs, B) ids for a group of n_g observers
    N = base_id.shape[0]
    B = base_id.shape[-1]
    pal = base_palette(params)
    colors = agent_color_slots(params)
    nb, nc = len(pal), len(colors)
    w1, w2 = nb + 4, 4 * nc
    # interpret mode has no tiling constraints; any bc works there, so odd
    # batch sizes (available() would reject them on TPU) use one block
    bc = _block_envs(B) or B
    lanes = vs * T * T * 3

    # --- batch-minor (B on lanes): compact palette slots per view cell ---
    # (unmatched / invisible -> sentinel 255 == no contraction row == black)
    NOROW = 255
    cb = jnp.full(base_id.shape, -1, jnp.int32)
    for j, code in enumerate(pal):
        cb = jnp.where(base_id == code, j, cb)
    has_agent = agent_id > 0
    acolor = (agent_id - 1) // 4
    reldir = (agent_id - 1) % 4
    ca = jnp.full(agent_id.shape, -1, jnp.int32)
    for k, col in enumerate(colors):
        ca = jnp.where(has_agent & (acolor == col), k * 4 + reldir, ca)
    lvl = alvl                      # 3-bit quantized level, packed as-is

    # absolute contraction-slot values (vi folded in), packed into ONE int32
    vi_off = jnp.arange(vs, dtype=jnp.int32)[None, :, None, None]
    slot1 = jnp.where(cb >= 0, cb + vi_off * w1, NOROW)
    slota = jnp.where(has_agent, nb + reldir + vi_off * w1, NOROW)
    slot2 = jnp.where(ca >= 0, ca + vi_off * w2, NOROW)
    packed = slot1 | (slota << 8) | (slot2 << 16) | (lvl << 24)

    # (N, vi, vj, B) -> (N, vs*vs, B): pure leading-dim permutation with B
    # untouched on lanes — fuses into the elementwise packed-word producer
    # (the expensive lane<->sublane crossing happens nowhere; the kernel
    # consumes batch-minor directly)
    pk = packed.transpose(0, 2, 1, 3).reshape(N, vs * vs, B)

    r1np, r2np = _build_rhs(pal, colors, vs, T, s2d)
    rhs1 = jnp.asarray(r1np, jnp.bfloat16)
    rhs2 = jnp.asarray(r2np, jnp.bfloat16)
    out = _compose(pk, rhs1, rhs2, vs, nb, nc, lanes, bc,
                   interpret=interpret)          # (N, B, vs*lanes)
    if s2d:
        side = vs * T // 4
        img = out.reshape(N, B, side, side, 48)
    else:
        img = out.reshape(N, B, vs * T, vs * T, 3)
    if nb_layout:
        return img
    # (N, B, ...) -> (B, N, ...): leading-dim row shuffle of contiguous
    # 9408-byte rows (bandwidth-bound copy, not a lane transpose)
    return img.transpose(1, 0, 2, 3, 4)
