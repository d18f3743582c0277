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
_K = 128           # contraction width (one MXU pass)


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
    triples = [(C.EMPTY, 0, 0), (C.WALL, C.COLOR_TO_IDX["grey"], 0)]
    triples += [t for t in pal if t not in triples]
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


def available(params, batch: int) -> bool:
    """Can the kernel serve this config? (static; checked per call site)"""
    import os

    if os.environ.get("MARLGRID_TPU_NO_SPRITE_KERNEL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    pal = base_palette(params)
    if pal is None:
        return False
    vs = params.view_size
    nb = len(pal)
    nc = len(agent_color_slots(params))
    if vs * (nb + 4) > _K or vs * 4 * nc > _K:
        return False
    return _block_envs(batch * params.n_agents) >= 16


# --------------------------------------------------------------------------
# Host-side RHS construction (cached per static config)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_rhs(pal, colors, vs: int, T: int):
    """(_K, vs*T*T*3) bf16 RHS pair: base+alpha | agent rgb.

    Row layout per view column vi (block-diagonal over vi):
      RHS1 rows vi*(nb+4) + j       -> base appearance pal[j] sprite bytes
      RHS1 rows vi*(nb+4) + nb + d  -> 4096 * (alpha(dir d) > 0)
      RHS2 rows vi*(4*nc) + k*4 + d -> agent rgb sprite (colors[k], dir d)
    Column layout: ty*(vs*T*3) + vi*(T*3) + tx*3 + c  (final-image order).
    """
    from .. import rendering

    nb = len(pal)
    nc = len(colors)
    lanes = vs * T * T * 3
    base_lut = rendering.base_lut(T)                     # (n_appear, T, T, 3)
    agent_lut = rendering.agent_lut(T)                   # (n_agent, T, T, 4)
    rhs1 = np.zeros((_K, lanes), np.float32)
    rhs2 = np.zeros((_K, lanes), np.float32)

    def cols(vi):
        ty, tx, c = np.meshgrid(np.arange(T), np.arange(T), np.arange(3),
                                indexing="ij")
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
    return (jnp.asarray(rhs1, jnp.bfloat16), jnp.asarray(rhs2, jnp.bfloat16))


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _row_u8(l1, l2, r1, r2):
    """One view row's composited pixel stripe: (bc, lanes) uint8.

    All 2D vector ops (Mosaic rejects 3D middle-index stores and 2D->3D
    shape casts). f32->uint8 goes via int32 (no direct lowering); values
    are in [0, 256) so the two-step cast equals XLA's astype(uint8).
    """
    out1 = jnp.dot(l1, r1, preferred_element_type=jnp.float32)
    out2 = jnp.dot(l2, r2, preferred_element_type=jnp.float32)
    a = out1 >= _ALPHA_FLAG
    base = out1 - jnp.where(a, _ALPHA_FLAG, 0.0)
    return jnp.where(a, out2, base).astype(jnp.int32).astype(jnp.uint8)


def _kernel_concat(l1_ref, l2_ref, r1_ref, r2_ref, o_ref):
    # out block (bc, vs*lanes): per-vj stripes lane-concatenated — the
    # output array (M, vs*lanes) IS the final image layout (free reshape)
    vs = l1_ref.shape[0]
    rows = [_row_u8(l1_ref[vj], l2_ref[vj], r1_ref[:], r2_ref[:])
            for vj in range(vs)]
    o_ref[:] = jnp.concatenate(rows, axis=1)


def _kernel_vjmajor(l1_ref, l2_ref, r1_ref, r2_ref, o_ref):
    # out block (1, bc, lanes) at (vj, i): leading-dim index only
    o_ref[0] = _row_u8(l1_ref[0], l2_ref[0], r1_ref[:], r2_ref[:])


@functools.partial(jax.jit, static_argnames=("vs", "lanes", "bc",
                                             "variant", "interpret"))
def _compose(lhs1, lhs2, rhs1, rhs2, vs: int, lanes: int, bc: int,
             variant: str = "concat", interpret: bool = False):
    """lhs*: (vs, M, _K) bf16 -> (M, vs*lanes) uint8 (M = B*N)."""
    M = lhs1.shape[1]
    if variant == "concat":
        return pl.pallas_call(
            _kernel_concat,
            grid=(M // bc,),
            in_specs=[
                pl.BlockSpec((vs, bc, _K), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vs, bc, _K), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_K, lanes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_K, lanes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bc, vs * lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, vs * lanes), jnp.uint8),
            interpret=interpret,
        )(lhs1, lhs2, rhs1, rhs2)
    # 'vjmajor': per-(vj, i) grid; the vj-major output needs one XLA
    # transpose afterwards (fallback when lane-concat fails to lower)
    out = pl.pallas_call(
        _kernel_vjmajor,
        grid=(vs, M // bc),
        in_specs=[
            pl.BlockSpec((1, bc, _K), lambda vj, i: (vj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, _K), lambda vj, i: (vj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, lanes), lambda vj, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K, lanes), lambda vj, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, lanes), lambda vj, i: (vj, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vs, M, lanes), jnp.uint8),
        interpret=interpret,
    )(lhs1, lhs2, rhs1, rhs2)
    return out.transpose(1, 0, 2).reshape(M, vs * lanes)


# --------------------------------------------------------------------------
# Device-side entry: batch-minor ids -> reference-shaped image
# --------------------------------------------------------------------------

def compose_image_b(params, base_id, agent_id, adim, interpret=False):
    """(B, N, vs*T, vs*T, 3) uint8 from batch-minor per-cell ids.

    ``base_id``: (N, vs, vs, B) int32 appearance codes (N_BASE_APPEAR =
    black/invisible row); ``agent_id``: (N, vs, vs, B) int32 (0 = none,
    else 1 + color*4 + reldir, already vis-masked); ``adim``: (N, vs, vs, B)
    float32 prestige dim factor of the observed agent.
    """
    vs, T, N = params.view_size, params.view_tile_size, params.n_agents
    B = base_id.shape[-1]
    pal = base_palette(params)
    colors = agent_color_slots(params)
    nb, nc = len(pal), len(colors)
    w1, w2 = nb + 4, 4 * nc
    bc = _block_envs(B * N)
    lanes = vs * T * T * 3

    # compact palette indices (unmatched / invisible -> nb == all-zero
    # one-hot == black); agent rows: color slot * 4 + reldir
    cb = jnp.full(base_id.shape, nb, jnp.int32)
    for j, code in enumerate(pal):
        cb = jnp.where(base_id == code, j, cb)
    has_agent = agent_id > 0
    acolor = (agent_id - 1) // 4
    reldir = (agent_id - 1) % 4
    ca = jnp.full(agent_id.shape, 4 * nc, jnp.int32)     # sentinel: no rows
    for k, col in enumerate(colors):
        ca = jnp.where(has_agent & (acolor == col), k * 4 + reldir, ca)
    adir = jnp.where(has_agent, reldir, 4)               # 4 = no alpha row

    # ONE packed transpose to batch-major: cb | ca<<5 | adir<<10 | bf16 adim
    dim_bits = jax.lax.bitcast_convert_type(
        adim.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
    code = cb | (ca << 5) | (adir << 10) | (dim_bits << 16)
    # (N, vi, vj, B) -> (vj, B, N, vi): batch-minor relayout then the big
    # lane transpose, all in one XLA transpose of a small int32 array
    codeT = code.transpose(2, 3, 0, 1)                   # (vj, B, N, vi)
    codeT = codeT.reshape(vs, B * N, vs)

    cbT = codeT & 31
    caT = (codeT >> 5) & 31
    adirT = (codeT >> 10) & 7
    dimT = jax.lax.bitcast_convert_type(
        (codeT >> 16).astype(jnp.uint16), jnp.bfloat16)

    vi_off1 = (jnp.arange(vs) * w1)[None, None, :]
    vi_off2 = (jnp.arange(vs) * w2)[None, None, :]
    slot1 = jnp.where(cbT < nb, cbT + vi_off1, _K)
    slota = jnp.where(adirT < 4, nb + adirT + vi_off1, _K)
    slot2 = jnp.where(caT < 4 * nc, caT + vi_off2, _K)
    iota = jnp.arange(_K)
    oh1 = ((slot1[..., None] == iota) | (slota[..., None] == iota)) \
        .astype(jnp.bfloat16)
    oh2 = (slot2[..., None] == iota).astype(jnp.bfloat16) * dimT[..., None]
    lhs1 = oh1.sum(2)                                    # (vs, B*N, _K)
    lhs2 = oh2.sum(2)

    rhs1, rhs2 = _build_rhs(pal, colors, vs, T)
    import os

    variant = os.environ.get("MARLGRID_SPRITE_VARIANT", "concat")
    out = _compose(lhs1, lhs2, rhs1, rhs2, vs, lanes, bc,
                   variant=variant, interpret=interpret)  # (B*N, vs*lanes)
    return out.reshape(B, N, vs * T, vs * T, 3)
