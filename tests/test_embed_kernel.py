"""Fused one-hot-embed Pallas kernel (ops/embed.py) vs the XLA
formulation — forward bit-parity and backward agreement (interpret mode on
the CPU harness; the real-TPU path is exercised by the driver bench and the
perf gate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.ops import embed as E


def _weights(cells, H, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(cells, n, H)), jnp.float32) * 0.1
        for n in E.WIDTHS)


def _ref(x, ws):
    R, F, S = x.shape
    cells = F // 3
    o = x.reshape(R, 3, cells, S).astype(jnp.int32)
    tot = 0
    for i, (w, n) in enumerate(zip(ws, E.WIDTHS)):
        code = o[:, i]
        if i == 2:
            code = jnp.clip(code, 0, n - 1)
        oh = (code[..., None, :] == jnp.arange(n)[:, None]) \
            .astype(jnp.bfloat16)
        tot = tot + jax.lax.dot_general(
            oh, w.astype(jnp.bfloat16), (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
    return tot


@pytest.mark.parametrize("cells,R,S,bs", [(49, 2, 256, 128), (25, 3, 128, 128)])
def test_embed_forward_matches_xla(cells, R, S, bs):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 12, size=(R, 3 * cells, S)), jnp.uint8)
    ws = _weights(cells, 128)
    out = E.onehot_embed(x, E.pack_weights(*ws), cells, bs, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(_ref(x, ws)),
                               rtol=1e-2, atol=2e-2)


def test_embed_state_codes_clip():
    """Box-packed state codes reach 176; the kernel must clip to the state
    vocab exactly like the XLA path."""
    cells = 25
    rng = np.random.default_rng(2)
    x = np.asarray(rng.integers(0, 12, size=(1, 3 * cells, 128)), np.uint8)
    x[0, 2 * cells:, :] = rng.integers(0, 200, size=(cells, 128))  # states
    x = jnp.asarray(x)
    ws = _weights(cells, 128)
    out = E.onehot_embed(x, E.pack_weights(*ws), cells, 128, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(_ref(x, ws)),
                               rtol=1e-2, atol=2e-2)


def test_embed_grad_matches_xla():
    cells, H, R, S, bs = 49, 128, 2, 256, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 12, size=(R, 3 * cells, S)), jnp.uint8)
    ws = _weights(cells, H)

    def loss_k(ws):
        return (E.onehot_embed(x, E.pack_weights(*ws), cells, bs, True)
                ** 2).mean()

    def loss_r(ws):
        return (_ref(x, ws) ** 2).mean()

    gk = jax.grad(loss_k)(ws)
    gr = jax.grad(loss_r)(ws)
    for a, b in zip(gk, gr):
        scale = float(jnp.abs(b).max()) + 1e-8
        # dout is cast bf16 in the kernel's backward (standard bf16
        # training); tolerance reflects that
        assert float(jnp.abs(a - b).max()) / scale < 6e-3


# --- round-5 plane-major variant (ops/embed2.py) -------------------------

def test_embed2_forward_matches_xla():
    from marlgrid_tpu.ops import embed2 as E2

    cells, R, S, bs = 49, 2, 256, 128
    rng = np.random.default_rng(3)
    x = np.asarray(rng.integers(0, 12, size=(R, 3 * cells, S)), np.uint8)
    x[:, 2 * cells:, :] = rng.integers(0, 200, size=(R, cells, S))  # clip
    x = jnp.asarray(x)
    ws = _weights(cells, 128)
    out = E2.onehot_embed2(x, *ws, cells, bs, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(_ref(x, ws)),
                               rtol=1e-2, atol=2e-2)


def test_embed2_palette_and_grad_match():
    """Compact-palette vocabularies + grad_W agreement with the XLA
    formulation (plane-major tables need no packing, so grads flow to the
    natural (cells, n_p, H) tables directly)."""
    from marlgrid_tpu.ops import embed2 as E2

    cells, R, S, bs, H = 25, 2, 128, 128, 128
    widths = (4, 6, 4)
    values = ((0, 2, 7, 10), (0, 3, 5, 6, 8, 9), (0, 1, 2, 3))
    rng = np.random.default_rng(4)
    # half the codes inside the vocab, some outside (must one-hot to zero)
    x = jnp.asarray(rng.integers(0, 12, size=(R, 3 * cells, S)), jnp.uint8)
    ws = tuple(jnp.asarray(rng.normal(size=(cells, n, H)), jnp.float32) * .1
               for n in widths)

    def ref(x, ws):
        o = x.reshape(R, 3, cells, S).astype(jnp.int32)
        tot = 0
        for i, (w, vs_) in enumerate(zip(ws, values)):
            oh = (o[:, i][..., None, :]
                  == jnp.asarray(vs_)[:, None]).astype(jnp.bfloat16)
            tot = tot + jax.lax.dot_general(
                oh, w.astype(jnp.bfloat16), (((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)
        return tot

    out = E2.onehot_embed2(x, *ws, cells, bs, True, widths, values)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref(x, ws)),
                               rtol=1e-2, atol=2e-2)

    def loss_k(ws):
        y = E2.onehot_embed2(x, *ws, cells, bs, True, widths, values)
        return (y * y).sum()

    def loss_r(ws):
        y = ref(x, ws)
        return (y * y).sum()

    gk = jax.grad(loss_k)(ws)
    gr = jax.grad(loss_r)(ws)
    for a, b in zip(gk, gr):
        # bf16 cotangent rounding differs slightly between the kernel's
        # cast point and XLA autodiff's — tolerance covers one bf16 ulp
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
