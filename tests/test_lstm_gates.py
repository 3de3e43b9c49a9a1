"""Fused ConvLSTM gate-pointwise Pallas kernel (ops/lstm_gates.py) vs the
jnp path in ConvLSTMCell — forward, gradients, and model-level equality
(interpret mode on CPU). Reference math: e2vid/model/submodules.py:175-214.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openess_tpu.models.e2vid import E2VIDReconstructor, E2VIDStreamingStep
from openess_tpu.ops.lstm_gates import fused_lstm_gates


def jnp_gates(gates, pc):
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * pc + i * g
    h = o * jnp.tanh(c)
    return h, c


@pytest.fixture
def inputs(rng):
    B, H, W, C = 2, 12, 16, 8
    gates = jnp.asarray(rng.normal(size=(B, H, W, 4 * C)), jnp.float32)
    pc = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    return gates, pc


def test_forward_matches_jnp(inputs):
    gates, pc = inputs
    h0, c0 = jnp_gates(gates, pc)
    h1, c1 = fused_lstm_gates(gates, pc, True)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)


def test_gradients_match_jnp(inputs):
    """The custom_vjp backward (recompute kernel) against jax autodiff of
    the jnp path — exercises both cotangents (hidden AND cell)."""
    gates, pc = inputs

    def loss(fn):
        def go(g, p):
            h, c = fn(g, p)
            return jnp.sum(h * h) + jnp.sum(jnp.sin(c))
        return go

    g_ref = jax.grad(loss(jnp_gates), argnums=(0, 1))(gates, pc)
    g_ker = jax.grad(
        loss(lambda g, p: fused_lstm_gates(g, p, True)), argnums=(0, 1)
    )(gates, pc)
    np.testing.assert_allclose(
        np.asarray(g_ref[0]), np.asarray(g_ker[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_ref[1]), np.asarray(g_ker[1]), atol=1e-5
    )


def test_reconstructor_fused_matches_standard(rng):
    """Forcing the fused kernel through the full multi-window scan (all 3
    encoder levels, carried states) must reproduce the jnp path exactly in
    interpret mode — the same f32 math, just streamed by Pallas. (On real
    TPU the Mosaic sigmoid/tanh approximations differ slightly from XLA's:
    measured ~5e-4 latent drift after 3 windows — see ops/lstm_gates.py.)"""
    win = jnp.asarray(rng.normal(size=(1, 3, 5, 16, 24)), jnp.float32)
    m0 = E2VIDReconstructor(num_bins=5, planar_input=True, latent_only=True,
                            fused_gates=False)
    m1 = E2VIDReconstructor(num_bins=5, planar_input=True, latent_only=True,
                            fused_gates=True)
    v = m0.init(jax.random.key(0), win)
    _, l0 = m0.apply(v, win)
    _, l1 = m1.apply(v, win)
    for k in l0:
        np.testing.assert_allclose(
            np.asarray(l0[k]), np.asarray(l1[k]), atol=1e-6, err_msg=k
        )


def test_streaming_step_fused_matches_standard(rng):
    from openess_tpu.models.e2vid import initial_stream_state

    m0 = E2VIDStreamingStep(num_bins=5, fused_gates=False)
    m1 = E2VIDStreamingStep(num_bins=5, fused_gates=True)
    win = jnp.asarray(rng.normal(size=(1, 5, 16, 24)), jnp.float32)
    states = initial_stream_state(1, 16, 24)
    v = m0.init(jax.random.key(1), states, win)
    s0, l0, _ = m0.apply(v, states, win)
    s1, l1, _ = m1.apply(v, states, win)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        (tuple(s0), dict(l0)), (tuple(s1), dict(l1)),
    )


def test_odd_height_blocks(rng):
    """H with no friendly divisor (prime) must still lower: hb falls back
    to a valid divisor (worst case 1)."""
    B, H, W, C = 1, 7, 16, 8
    gates = jnp.asarray(rng.normal(size=(B, H, W, 4 * C)), jnp.float32)
    pc = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    h0, c0 = jnp_gates(gates, pc)
    h1, c1 = fused_lstm_gates(gates, pc, True)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
