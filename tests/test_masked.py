"""Golden-value tests for masked reductions (mirrors core/utils_test.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.ops import masked


DATA = np.array(
    [[-2.0, 5.0, 1.0, 3.0], [4.0, -3.0, 2.0, 0.0]], dtype=np.float32
)


def test_masked_maximum():
    mask = np.array([[1, 1, 1, 1], [1, 1, 1, 1]], np.float32)
    out = masked.masked_maximum(DATA, mask)
    np.testing.assert_allclose(out, [[5.0], [4.0]])

    mask = np.array([[1, 0, 1, 1], [0, 1, 1, 1]], np.float32)
    out = masked.masked_maximum(DATA, mask)
    np.testing.assert_allclose(out, [[3.0], [2.0]])

    # All-masked rows return the row minimum.
    mask = np.zeros((2, 4), np.float32)
    out = masked.masked_maximum(DATA, mask)
    np.testing.assert_allclose(out, [[-2.0], [-3.0]])


def test_masked_minimum():
    mask = np.array([[0, 1, 1, 1], [1, 1, 0, 1]], np.float32)
    out = masked.masked_minimum(DATA, mask)
    np.testing.assert_allclose(out, [[1.0], [-3.0]])
    mask = np.zeros((2, 4), np.float32)
    out = masked.masked_minimum(DATA, mask)
    np.testing.assert_allclose(out, [[5.0], [4.0]])


def test_masked_sum_avg():
    mask = np.array([[1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
    np.testing.assert_allclose(masked.masked_sum(DATA, mask), [[-1.0], [-3.0]])
    np.testing.assert_allclose(masked.masked_avg(DATA, mask), [[-0.5], [-1.5]])
    # Empty mask: sum 0, avg 0 (tiny denominator).
    zeros = np.zeros((2, 4), np.float32)
    np.testing.assert_allclose(masked.masked_sum(DATA, zeros), [[0.0], [0.0]])
    np.testing.assert_allclose(masked.masked_avg(DATA, zeros), [[0.0], [0.0]])


def test_masked_softmax():
    mask = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], np.float32)
    out = np.asarray(masked.masked_softmax(DATA, mask, axis=-1))
    np.testing.assert_allclose(out.sum(-1), [1.0, 1.0], rtol=1e-5)
    assert out[1, 3] < 1e-6
    expected0 = np.exp(DATA[0]) / np.exp(DATA[0]).sum()
    np.testing.assert_allclose(out[0], expected0, rtol=1e-5)


def test_masked_argmax_argmin():
    mask = np.array([[1, 0, 1, 1], [0, 1, 1, 1]], np.float32)
    np.testing.assert_array_equal(masked.masked_argmax(DATA, mask), [3, 2])
    np.testing.assert_array_equal(masked.masked_argmin(DATA, mask), [0, 1])


def test_masked_nd():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    mask = np.array([[1, 1, 0], [0, 1, 1]], np.float32)
    out = masked.masked_avg_nd(data, mask)
    np.testing.assert_allclose(out[0, 0], (data[0, 0] + data[0, 1]) / 2)
    np.testing.assert_allclose(out[1, 0], (data[1, 1] + data[1, 2]) / 2)


def test_sequence_mask():
    m = masked.sequence_mask(jnp.array([2, 0, 3]), maxlen=4)
    np.testing.assert_array_equal(
        m, [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]]
    )
