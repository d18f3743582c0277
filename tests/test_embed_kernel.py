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
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, ws)),
                               atol=1e-5)


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
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, ws)),
                               atol=1e-5)


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
