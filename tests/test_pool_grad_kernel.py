"""Fused max-pool backward kernel vs its XLA reference and TF MaxPoolGrad.

The routing contract is TF's (reference models/utils.py trains under
tf.nn.max_pool gradients): the FULL upstream gradient goes to the first
maximal element of each window in row-major order. Ties are exercised
explicitly — post-ReLU zeros make them common in the real model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cap2det_tpu.kernels import pool_grad


def _case(seed, n=3, h=7, w=7, c=8, ties=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, h, w, c).astype(np.float32)
    if ties:
        # Heavy duplication: quantize so most windows hold tied maxima.
        x = np.maximum(np.round(x * 2) / 2, 0.0)
    return x


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("hw", [(7, 7), (4, 4), (5, 9)])
def test_kernel_matches_reference(stride, ties, hw):
    h, w = hw
    x = _case(0, h=h, w=w, ties=ties)
    oh, ow = -(-h // stride), -(-w // stride)
    g = np.random.RandomState(1).randn(3, oh, ow, 8).astype(np.float32)
    got = np.asarray(
        pool_grad.maxpool_grad(x, g, 3, stride, interpret=True)
    )
    want = np.asarray(pool_grad.maxpool_grad_reference(x, g, 3, stride))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("ties", [False, True])
def test_reference_matches_tf(stride, ties):
    tf = pytest.importorskip("tensorflow")
    x = _case(2, ties=ties)
    with tf.GradientTape() as tape:
        xt = tf.constant(x)
        tape.watch(xt)
        y = tf.nn.max_pool2d(xt, 3, stride, "SAME")
    oh, ow = y.shape[1:3]
    g = np.random.RandomState(3).randn(3, oh, ow, 8).astype(np.float32)
    want = tape.gradient(y, xt, output_gradients=tf.constant(g)).numpy()
    got = np.asarray(pool_grad.maxpool_grad_reference(x, g, 3, stride))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_model_pool_vjp_first_tie_opt_in(monkeypatch):
    """CAP2DET_POOL_GRAD=ref routes _pool's max backward through the
    first-tie path: an all-equal window sends the whole gradient to its
    top-left element (the default 'slices' form splits it instead —
    kept for speed, see _pool_p_bwd)."""
    from cap2det_tpu.models import inception_v2 as iv2

    x = jnp.ones((1, 4, 4, 8), jnp.float32)

    def pool_grad_of(variant):
        monkeypatch.setenv("CAP2DET_POOL_GRAD", variant)
        return np.asarray(
            jax.jit(jax.grad(
                lambda x: jnp.sum(iv2._pool(x, "pool_max", 2, 2))
            ))(x)
        )

    g = pool_grad_of("ref")
    assert g.sum() == pytest.approx(4 * 8)
    np.testing.assert_allclose(g[0, ::2, ::2, :], 1.0)
    np.testing.assert_allclose(g[0, 1::2, :, :], 0.0)

    # Default form conserves mass but splits ties.
    g = pool_grad_of("slices")
    assert g.sum() == pytest.approx(4 * 8)
    assert g[0, 1, 1, 0] > 0.0


def test_padding_and_channel_blocking():
    """N not a multiple of the block and C below the channel block."""
    x = _case(4, n=13, h=4, w=4, c=24)
    g = np.random.RandomState(5).randn(13, 4, 4, 24).astype(np.float32)
    got = np.asarray(pool_grad.maxpool_grad(x, g, 3, 1, interpret=True))
    want = np.asarray(pool_grad.maxpool_grad_reference(x, g, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_supported_gate():
    assert pool_grad.supported((1000, 7, 7, 576), 3, 1)
    assert pool_grad.supported((1000, 4, 4, 1024), 3, 1)
    assert not pool_grad.supported((2, 512, 768, 128), 3, 2)


@pytest.mark.parametrize("kind", ["pool_max", "pool_avg"])
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(13, 7, 7, 24), (5, 4, 4, 8),
                                   (3, 5, 9, 16)])
def test_pool_fwd_kernel_matches_slices(kind, stride, shape):
    """The Pallas forward pool (default at many-ROI shapes, where
    reduce_window ran 10-30x off the traffic floor) vs the shifted-slice
    reference."""
    from cap2det_tpu.models import inception_v2 as iv2

    x = np.random.RandomState(11).randn(*shape).astype(np.float32)
    got = np.asarray(
        pool_grad.pool_fwd(jnp.asarray(x), kind, 3, stride, interpret=True)
    )
    want = np.asarray(iv2._pool_slices(jnp.asarray(x), kind, 3, stride))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_avgpool_grad_kernel_matches_slice_vjp(stride):
    """The Pallas avg-pool backward (linear spread of g/counts) vs the
    slice-formulation VJP — exact same math, different op structure."""
    from cap2det_tpu.models import inception_v2 as iv2

    r = np.random.RandomState(12)
    x = r.randn(13, 7, 7, 24).astype(np.float32)
    oh = ow = -(-7 // stride)
    g = r.randn(13, oh, ow, 24).astype(np.float32)
    got = np.asarray(pool_grad.avgpool_grad(
        x.shape, jnp.float32, jnp.asarray(g), 3, stride, interpret=True
    ))
    _, vjp = jax.vjp(
        lambda x: iv2._pool_slices(x, "pool_avg", 3, stride), jnp.asarray(x)
    )
    want = np.asarray(vjp(jnp.asarray(g))[0])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_pool_default_gate():
    """The measured shape heuristic: fused pools ONLY at many-ROI
    small-spatial shapes (inc2 P=2000 regime); bench (N=1000) and
    first-stage shapes keep the XLA forms (BENCH_NOTES.md r4)."""
    from cap2det_tpu.models import inception_v2 as iv2

    assert iv2._fused_pool_default((2000, 7, 7, 576))
    assert iv2._fused_pool_default((4000, 4, 4, 1024))
    assert not iv2._fused_pool_default((1000, 7, 7, 576))   # bench
    assert not iv2._fused_pool_default((2, 64, 96, 576))    # first stage
    assert not iv2._fused_pool_default((2000, 32, 32, 64))  # big spatial
