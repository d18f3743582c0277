"""Policy/value model families for the TPU learner stack.

The reference ships no model code (training lived in the author's external
repo, SURVEY §2.1 — ``IndependentLearners`` is just a zip wrapper); these are
the TPU-native learners this framework provides on top: parameter-shared
nets whose matmuls run bfloat16 on the MXU.

TPU notes measured on v5e (B=4096, 4 agents, 7x7 'encode' obs):
- ``nn.Embed`` lookups are TPU gathers — they serialize; symbolic codes are
  lifted with ONE-HOT features instead (the first Dense/Conv absorbs the
  embedding linearly, same function class, zero gathers).
- 3x3 convs on a 7x7 board leave the MXU idle (tiny spatial, tiny channel
  minor dims); the default torso is an MLP over the flattened one-hot
  planes — one large (M, 1960) x (1960, H) GEMM per call. The CNN torso is
  kept as an option (``PPOConfig.torso='cnn'``).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import constants as C

N_STATE_CODES = 20  # door states + bonus phases; box contents clip here


def onehot_features(obs, dtype):
    """(…, vs, vs, 3) int codes -> (…, vs, vs, 41) one-hot planes."""
    t = (obs[..., 0:1] == jnp.arange(C.N_TYPES + 1)).astype(dtype)
    c = (obs[..., 1:2] == jnp.arange(C.N_COLORS + 1)).astype(dtype)
    s = (jnp.clip(obs[..., 2:3], 0, N_STATE_CODES - 1)
         == jnp.arange(N_STATE_CODES)).astype(dtype)
    return jnp.concatenate([t, c, s], axis=-1)


class OneHotEmbed(nn.Module):
    """First layer: per-cell symbolic codes -> hidden, zero gathers.

    Equivalent to flatten(one-hot planes) @ W, but expressed as three
    multi-dim-contraction ``dot_general``s so no concatenated one-hot
    tensor is materialized and no flatten relayout happens (profiled: the
    concat+reshape relayouts dominated the update step on v5e).
    """

    features: int
    dtype: "object" = jnp.bfloat16
    # compact per-scenario code vocabularies ((types…),(colors…),(states…))
    # from core/obs.py::encode_palettes — shrinks the one-hot slot count
    # per cell (42 -> ~17 on goal_cycle), which is the embed's cost unit
    # (MXU pass count). None = the full static vocabularies. Out-of-vocab
    # codes one-hot to zero; the full path clips states instead (both
    # agree whenever the vocabulary covers the observable codes —
    # tests/test_embed_palette.py).
    palettes: "object" = None

    def _vocab(self):
        if self.palettes is None:
            return (C.N_TYPES + 1, C.N_COLORS + 1, N_STATE_CODES), None
        return tuple(len(v) for v in self.palettes), \
            tuple(tuple(int(x) for x in v) for v in self.palettes)

    @nn.compact
    def __call__(self, obs, channel_first: bool = False,
                 feature_major: bool = False):
        # obs: (..., vs, vs, 3) int — or (..., 3, vs, vs) with
        # channel_first=True (per-sample feature order (c, vi, vj));
        # or (..., 3*vs*vs, S) with feature_major=True: samples S on the
        # MINOR (lane) axis, features on sublanes — the layout the batched
        # obs pipeline produces and the PPO trajectory store keeps, so the
        # first contraction consumes it directly and NO uint8
        # lane<->sublane transpose exists anywhere in the encode PPO path
        # (the bulk store relayout measured ~23 ms/iter at B=4096).
        # All three orderings index the same per-cell weights.
        if feature_major:
            import numpy as np

            from ..ops import embed as embed_op

            lead = obs.shape[:-2]
            S = obs.shape[-1]
            cells = obs.shape[-2] // 3
            widths, values = self._vocab()
            ws = [self.param(f"w{i}", nn.initializers.lecun_normal(),
                             (cells * n, self.features)).reshape(
                                 cells, n, self.features)
                  for i, n in enumerate(widths)]
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            from ..ops import embed2 as embed2_op
            if embed2_op.available(cells, S, self.features, widths):
                # plane-major variant (MARLGRID_TPU_EMBED_V2=1): one
                # broadcast compare + one multi-dim-contraction dot per
                # plane — no per-cell slicing/concat (ops/embed2.py)
                x = obs.reshape((-1,) + obs.shape[-2:])
                out = embed2_op.onehot_embed2(
                    x, ws[0], ws[1], ws[2], cells,
                    embed2_op._block_samples(S), False, widths, values)
                out = out.reshape(lead + out.shape[1:]).astype(self.dtype)
                return out + b.astype(self.dtype)
            if embed_op.available(cells, S, self.features, widths):
                # fused Pallas path: one-hots built in VMEM, codes are the
                # only HBM input (the XLA formulation materializes ~14x
                # the codes' bytes of bf16 one-hots — ~36 ms/iter of the
                # PPO step at B=4096)
                x = obs.reshape((-1,) + obs.shape[-2:])
                wp = embed_op.pack_weights(*ws)
                out = embed_op.onehot_embed(
                    x, wp, cells, embed_op._block_samples(S),
                    False, widths, values)
                out = out.reshape(lead + out.shape[1:]).astype(self.dtype)
                return out + b.astype(self.dtype)
            o = obs.reshape(lead + (3, cells, S))
            nb = len(lead)
            # contract (cells, n) jointly; result (lead..., S, features)
            dn = (((nb, nb + 1), (0, 1)), ((), ()))
            out = None
            for i, n in enumerate(widths):
                code = o[..., i, :, :]                     # (lead, cells, S)
                if values is None:
                    if i == 2:
                        code = jnp.clip(code, 0, N_STATE_CODES - 1)
                    vocab = jnp.arange(n)[:, None]
                else:
                    vocab = jnp.asarray(
                        np.asarray(values[i], np.int32))[:, None]
                oh = (code[..., None, :] == vocab) \
                    .astype(self.dtype)                    # (lead,cells,n,S)
                y = jax.lax.dot_general(oh, ws[i].astype(self.dtype), dn,
                                        preferred_element_type=self.dtype)
                out = y if out is None else out + y
            return out + b.astype(self.dtype)
        if channel_first:
            lead = obs.shape[:-3]
            cells = obs.shape[-2] * obs.shape[-1]
            o = obs.reshape(lead + (3, cells))
        else:
            lead = obs.shape[:-3]
            cells = obs.shape[-3] * obs.shape[-2]
            o = obs.reshape(lead + (cells, 3))
        nb = len(lead)
        dn = (((nb, nb + 1), (0, 1)), ((), ()))
        out = None
        widths, values = self._vocab()
        for i, n in enumerate(widths):
            code = o[..., i, :] if channel_first else o[..., i]
            if values is None:
                if i == 2:
                    code = jnp.clip(code, 0, N_STATE_CODES - 1)
                vocab = jnp.arange(n)
            else:
                import numpy as np

                vocab = jnp.asarray(np.asarray(values[i], np.int32))
            oh = (code[..., None] == vocab).astype(self.dtype)
            w = self.param(f"w{i}", nn.initializers.lecun_normal(),
                           (cells * n, self.features)).reshape(
                               cells, n, self.features)
            y = jax.lax.dot_general(oh, w.astype(self.dtype), dn,
                                    preferred_element_type=self.dtype)
            out = y if out is None else out + y
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + b.astype(self.dtype)


def _conv_torso(mdl: nn.Module, obs, cfg, torso: str):
    """The pixels torso stacks, shared by the feedforward and recurrent
    families (called inside the owning module's compact context, so params
    register under the caller).

    - 'cnn_s2d': space-to-depth POV (side/4, side/4, 48) uint8 — the sprite
      kernel emits this layout for FREE (an RHS column relabeling,
      ops/sprite.py), and the conv stack on 48 input channels runs ~20%
      faster fwd+bwd than the 8x8-stride-4 first conv on 3 channels
      (measured scripts/cnn_bench2.py). Same receptive-field family as the
      Nature CNN's first layer.
    - 'cnn_image': standard-layout (side, side, 3) uint8 Nature-CNN-style
      strided convs; bf16 throughout so the convs run on the MXU.

    Both fold the 1/255 normalization THROUGH the first (linear) conv onto
    its small output instead of the full-res input — conv(x/255, W) + b ==
    conv(x, W)/255 + b — saving a full-image elementwise pass.
    """
    x = obs.astype(cfg.dtype)
    if torso == "cnn_s2d":
        x = nn.Conv(32, (2, 2), use_bias=False, dtype=cfg.dtype,
                    name="conv1")(x)
    else:
        x = nn.Conv(32, (8, 8), strides=(4, 4), use_bias=False,
                    dtype=cfg.dtype, name="conv1")(x)
    b1 = mdl.param("conv1_bias", nn.initializers.zeros, (32,))
    x = nn.relu(x / jnp.asarray(255.0, cfg.dtype) + b1.astype(cfg.dtype))
    x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), dtype=cfg.dtype)(x))
    x = nn.relu(nn.Conv(64, (3, 3), dtype=cfg.dtype)(x))
    return x.reshape(*x.shape[:-3], -1)


class ActorCritic(nn.Module):
    """Torso on symbolic 'encode' observations + policy/value heads.

    Activations are bfloat16 (params float32) so matmuls hit the MXU at
    full rate; heads are cast back to float32 for numerics.
    """

    cfg: "object"  # PPOConfig-like: hidden/channels/dtype/torso fields

    @nn.compact
    def __call__(self, obs, channel_first: bool = False,
                 feature_major: bool = False, aux=None):
        # obs: (..., vs, vs, 3) int32 ((..., 3, vs, vs) with channel_first,
        # (..., 3*vs*vs, S) with feature_major — samples on lanes;
        # mlp torso only — see OneHotEmbed). ``aux``: optional (..., d)
        # f32 per-sample extra features (the 'rich' observation style's
        # observe_* fields — reward/position/orientation), concatenated
        # after the torso flatten (row-major paths only).
        cfg = self.cfg
        torso = getattr(cfg, "torso", "mlp")
        assert aux is None or not (channel_first or feature_major), \
            "aux features are a row-major-path feature"
        assert not ((channel_first or feature_major) and torso != "mlp"), \
            "channel_first/feature_major input is an mlp-torso " \
            "(OneHotEmbed) feature"
        if torso == "cnn":
            x = onehot_features(obs, cfg.dtype)
            for ch in cfg.channels:
                x = nn.Conv(ch, (3, 3), dtype=cfg.dtype)(x)
                x = nn.relu(x)
            x = x.reshape(*x.shape[:-3], -1)
        elif torso in ("cnn_s2d", "cnn_image"):
            x = _conv_torso(self, obs, cfg, torso)
        else:
            x = nn.relu(OneHotEmbed(
                cfg.hidden, cfg.dtype,
                palettes=getattr(cfg, "embed_palettes", None),
                name="torso0")(obs, channel_first, feature_major))
        if aux is not None:
            x = jnp.concatenate([x, aux.astype(cfg.dtype)], axis=-1)
        x = nn.relu(nn.Dense(cfg.hidden, dtype=cfg.dtype, name="torso")(x))
        # 'model'-axis tensor parallelism: GSPMD shards this dense pair when
        # the caller constrains params/activations over the mesh.
        # Heads run in the compute dtype (bf16 on the MXU — an f32 head
        # forced a 134 MB/minibatch activation cast, ~ms per update pass)
        # and cast OUTPUTS to f32 for the softmax/GAE numerics.
        logits = nn.Dense(C.N_ACTIONS, dtype=cfg.dtype, name="pi")(
            x).astype(jnp.float32)
        value = nn.Dense(1, dtype=cfg.dtype, name="v")(
            x).astype(jnp.float32)
        return logits, value[..., 0]


class FusedGRUCell(nn.Module):
    """GRU cell with gate-fused GEMMs: TWO (M, H)x(H, 3H) matmuls per
    step instead of ``nn.GRUCell``'s six separate (H, H) Dense calls —
    the same update formula (r/z recurrent terms unbiased, the
    candidate's recurrent term biased, exactly as flax writes it), but
    each scan step issues 2 wide MXU ops instead of 6 narrow ones.
    Measured on the recurrent PPO step (BASELINE round 4)."""

    features: int
    dtype: "object" = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, x):
        H = self.features
        gi = nn.Dense(3 * H, dtype=self.dtype, name="i")(x)
        gh = nn.Dense(3 * H, use_bias=False, dtype=self.dtype,
                      name="h")(carry)
        b_hn = self.param("hn_bias", nn.initializers.zeros, (H,))
        r = nn.sigmoid(gi[..., :H] + gh[..., :H])
        z = nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
        n = nn.tanh(gi[..., 2 * H:]
                    + r * (gh[..., 2 * H:] + b_hn.astype(self.dtype)))
        new_h = (1.0 - z) * n + z * carry
        return new_h, new_h


class FusedLSTMCell(nn.Module):
    """LSTM cell with gate-fused GEMMs: TWO (M, ·)x(·, 4H) matmuls per
    step — the LSTM counterpart of :class:`FusedGRUCell` (VERDICT r4
    missing #5: equal treatment for both advertised cells).

    flax's ``nn.OptimizedLSTMCell`` computes the same two fused matmuls
    but stores EIGHT per-gate param blocks (hi/hf/hg/ho biased Dense +
    ii/if/ig/io unbiased kernels) and concatenates them at APPLY time;
    this cell stores the fused (·, 4H) kernels directly — same i/f/g/o
    update formula (gate order i, f, g, o; one bias per gate), param tree
    mirroring FusedGRUCell ('i' biased input projection, 'h' unbiased
    recurrent projection). Exact equivalence under a param repack:
    tests/test_ppo_rnn.py::test_fused_lstm_matches_flax_lstm.
    """

    features: int
    dtype: "object" = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, x):
        H = self.features
        c, h = carry
        z = (nn.Dense(4 * H, dtype=self.dtype, name="i")(x)
             + nn.Dense(4 * H, use_bias=False, dtype=self.dtype,
                        name="h")(h))
        i = nn.sigmoid(z[..., :H])
        f = nn.sigmoid(z[..., H:2 * H])
        g = nn.tanh(z[..., 2 * H:3 * H])
        o = nn.sigmoid(z[..., 3 * H:])
        new_c = f * c + i * g
        new_h = o * nn.tanh(new_c)
        return (new_c, new_h), new_h


class RecurrentActorCritic(nn.Module):
    """Memory-equipped policy: OneHotEmbed torso -> GRU/LSTM cell -> heads.

    The reference's flagship use case — the ICML 2021 social-learning
    experiments driving ``IndependentLearners`` (SURVEY §2.1) — trains
    RECURRENT agents: a 7x7 partial view cannot carry the goal-cycle phase
    or other agents' past behavior without memory. The reference itself
    ships no model code; this is the TPU-native recurrent family.

    One call = ONE timestep: ``(obs_t, carry) -> (logits, value, carry')``.
    Both the rollout scan and the update's sequence re-run drive the same
    function, so recomputed hidden states (and hence log-probs at unchanged
    params) are bit-identical to the rollout's — the recurrent PPO path's
    row-alignment invariant (tests/test_ppo_rnn.py).

    Episode-boundary resets of the carry are the CALLER's job (mask the
    returned carry with the step's done flag); keeping the module
    reset-free means the carried state crossing iteration boundaries needs
    no extra bookkeeping.

    The cell runs in ``cfg.dtype`` (bf16 on the MXU: 6 (S, H) x (H, H)
    GEMMs per step with all leading dims folded into M) and the carry is
    kept in ``cfg.dtype`` so the scan carry dtype is stable.
    """

    cfg: "object"  # PPOConfig-like: hidden/dtype/rnn ('gru' | 'lstm')

    def setup(self):
        # setup-style (attribute names become param-tree names, matching
        # the previous compact layout: torso0/cell/torso/pi/v and the
        # conv stack's conv1/Conv_0/Conv_1)
        cfg = self.cfg
        torso = getattr(cfg, "torso", "mlp")
        if torso == "mlp":
            self.torso0 = OneHotEmbed(
                cfg.hidden, cfg.dtype,
                palettes=getattr(cfg, "embed_palettes", None))
        else:
            # pixels torsos (cnn_s2d / cnn_image): same stacks and param
            # names as the feedforward family's _conv_torso
            assert torso in ("cnn_s2d", "cnn_image"), torso
            if torso == "cnn_s2d":
                self.conv1 = nn.Conv(32, (2, 2), use_bias=False,
                                     dtype=cfg.dtype)
            else:
                self.conv1 = nn.Conv(32, (8, 8), strides=(4, 4),
                                     use_bias=False, dtype=cfg.dtype)
            self.conv1_bias = self.param("conv1_bias",
                                         nn.initializers.zeros, (32,))
            self.Conv_0 = nn.Conv(64, (4, 4), strides=(2, 2),
                                  dtype=cfg.dtype)
            self.Conv_1 = nn.Conv(64, (3, 3), dtype=cfg.dtype)
        if cfg.rnn == "lstm":
            self.cell = FusedLSTMCell(cfg.hidden, dtype=cfg.dtype)
        else:
            assert cfg.rnn == "gru", cfg.rnn
            self.cell = FusedGRUCell(cfg.hidden, dtype=cfg.dtype)
        self.torso = nn.Dense(cfg.hidden, dtype=cfg.dtype)
        self.pi = nn.Dense(C.N_ACTIONS, dtype=cfg.dtype)
        self.v = nn.Dense(1, dtype=cfg.dtype)

    def features(self, obs, channel_first: bool = False,
                 feature_major: bool = False, aux=None):
        """Per-step STATELESS torso: any OneHotEmbed layout (mlp) or
        row-major uint8 POV batches (cnn_s2d / cnn_image). Exposed as a
        separate method so the PPO update can run it (and ``heads``) over
        ALL timesteps in ONE batch, leaving only ``cell_step`` inside the
        sequential scan — the torso/head GEMMs then see T(/L)-fold larger
        M dims (ppo_rnn.py loss_fn). ``aux``: optional (..., d) f32
        per-sample extras (the 'rich' style's observe_* fields),
        concatenated after the torso flatten (row-major paths only)."""
        cfg = self.cfg
        torso = getattr(cfg, "torso", "mlp")
        if torso == "mlp":
            assert aux is None, "aux features are a row-major-path feature"
            return nn.relu(self.torso0(obs, channel_first, feature_major))
        assert not (channel_first or feature_major), \
            "image torsos consume row-major POV batches"
        x = obs.astype(cfg.dtype)
        x = self.conv1(x)
        x = nn.relu(x / jnp.asarray(255.0, cfg.dtype)
                    + self.conv1_bias.astype(cfg.dtype))
        x = nn.relu(self.Conv_0(x))
        x = nn.relu(self.Conv_1(x))
        x = x.reshape(*x.shape[:-3], -1)
        if aux is not None:
            x = jnp.concatenate([x, aux.astype(cfg.dtype)], axis=-1)
        return x

    def cell_step(self, x, carry):
        """One recurrent step: (features_t, carry) -> (carry', y_t)."""
        carry, y = self.cell(carry, x)
        return carry, y

    def heads(self, y):
        """Cell outputs -> (logits f32, value f32) — stateless, batchable
        over all timesteps at once."""
        x = nn.relu(self.torso(y))
        logits = self.pi(x).astype(jnp.float32)
        value = self.v(x).astype(jnp.float32)
        return logits, value[..., 0]

    def __call__(self, obs, carry, channel_first: bool = False,
                 feature_major: bool = False, aux=None):
        # obs: any OneHotEmbed layout (mlp torso) or row-major uint8 POV
        # images (cnn torsos — the rendered-obs recurrent family, SURVEY
        # §2.1 social-learning workload); carry: (..., S, hidden) leaves
        # ((lead..., S) matching the sample dims); aux: 'rich' extras
        x = self.features(obs, channel_first, feature_major, aux=aux)
        carry, y = self.cell_step(x, carry)
        logits, value = self.heads(y)
        return logits, value, carry

    def initial_carry(self, lead):
        """Zero carry for ``lead`` sample dims (e.g. (N, B))."""
        z = jnp.zeros(tuple(lead) + (self.cfg.hidden,), self.cfg.dtype)
        # lstm (c, h) must be DISTINCT buffers: the train step donates its
        # inputs, and donating one buffer twice is a runtime error
        return (z, jnp.zeros_like(z)) if self.cfg.rnn == "lstm" else z
