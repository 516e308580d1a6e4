"""Golden parity tests of core ops against PyTorch (the reference's compute
substrate) — LSTM cell vs ``torch.nn.LSTMCell``, masked softmax/mean vs
AllenNLP formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from style_seqcvae_tpu.ops.lstm import from_torch_lstm_cell, init_lstm_cell, lstm_cell
from style_seqcvae_tpu.ops.masked import masked_mean, masked_softmax


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(12, 8)
    params = from_torch_lstm_cell(
        cell.weight_ih.detach().numpy(), cell.weight_hh.detach().numpy(),
        cell.bias_ih.detach().numpy(), cell.bias_hh.detach().numpy())

    x = np.random.RandomState(1).randn(4, 12).astype(np.float32)
    h = np.random.RandomState(2).randn(4, 8).astype(np.float32)
    c = np.random.RandomState(3).randn(4, 8).astype(np.float32)

    ht, ct = cell(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))
    hj, cj = lstm_cell(params, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))

    np.testing.assert_allclose(np.asarray(hj), ht.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), ct.detach().numpy(), atol=1e-5)


def test_lstm_cell_broadcast_grid_dims():
    params = init_lstm_cell(jax.random.PRNGKey(0), 6, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 6))
    h = jnp.zeros((2, 3, 4, 5))
    c = jnp.zeros((2, 3, 4, 5))
    h2, c2 = lstm_cell(params, x, h, c)
    # identical to flattening the grid dims
    hf, cf = lstm_cell(params, x.reshape(-1, 6), h.reshape(-1, 5), c.reshape(-1, 5))
    np.testing.assert_allclose(np.asarray(h2).reshape(-1, 5), np.asarray(hf), atol=1e-6)


def test_masked_softmax_matches_manual():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[1, 1, 0, 1]])
    w = masked_softmax(logits, mask)
    e = np.exp([1.0, 2.0, 4.0])
    expected = np.array([e[0], e[1], 0.0, e[2]]) / e.sum()
    np.testing.assert_allclose(np.asarray(w)[0], expected, atol=1e-6)
    assert float(jnp.sum(w)) == jax.numpy.allclose(jnp.sum(w), 1.0)


def test_masked_softmax_fully_masked_row_is_zero():
    w = masked_softmax(jnp.ones((1, 3)), jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(w), 0.0)


def test_masked_mean():
    x = jnp.asarray([[[1.0, 10.0], [3.0, 30.0], [100.0, 100.0]]])  # (1,3,2)
    mask = jnp.asarray([[1, 1, 0]])
    m = masked_mean(x, mask[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(m), [[2.0, 20.0]], atol=1e-6)


def test_masked_softmax_fully_masked_row_grad_finite():
    """Regression (round 5): a fully-masked row (zero-detection image → all
    padded boxes) made max(-inf) arithmetic NaN the GRADIENT through the
    untaken where-branch even though the forward value was guarded —
    one such image in a batch NaN'd entire captioner training runs."""
    import jax

    from style_seqcvae_tpu.ops.masked import masked_mean, masked_softmax

    mask = jnp.asarray([[1, 1, 0], [0, 0, 0]], jnp.float32)

    def f(x):
        return jnp.sum(masked_softmax(x, mask) * jnp.arange(3.0))

    x = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    v, g = jax.value_and_grad(f)(x)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    out = np.asarray(masked_softmax(x, mask))
    np.testing.assert_allclose(out[1], 0.0)          # fully masked → zeros
    np.testing.assert_allclose(out[0].sum(), 1.0, rtol=1e-6)

    def fm(x):
        return jnp.sum(masked_mean(x, mask[..., None], axis=1))

    gm = jax.grad(fm)(jnp.ones((2, 3, 4)))
    assert np.isfinite(np.asarray(gm)).all()
