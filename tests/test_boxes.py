"""Golden-value tests for box geometry (mirrors core/box_utils_test.py)."""

import jax.numpy as jnp
import numpy as np

from cap2det_tpu.ops import boxes


def test_flip_left_right():
    box = np.array([[0.1, 0.2, 0.6, 0.9]], np.float32)
    out = boxes.flip_left_right(box)
    np.testing.assert_allclose(out, [[0.1, 0.1, 0.6, 0.8]], atol=1e-6)


def test_area():
    box = np.array([[0.0, 0.0, 1.0, 1.0], [0.5, 0.5, 0.25, 1.0]], np.float32)
    np.testing.assert_allclose(boxes.area(box), [1.0, 0.0])


def test_iou():
    b1 = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    b2 = np.array([[0.0, 0.5, 1.0, 1.5]], np.float32)
    np.testing.assert_allclose(boxes.iou(b1, b2), [1.0 / 3.0], rtol=1e-6)
    np.testing.assert_allclose(boxes.iou(b1, b1), [1.0])


def test_pairwise_iou():
    b1 = np.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.5, 0.5]], np.float32)
    b2 = np.array(
        [[0.0, 0.0, 1.0, 1.0], [0.5, 0.5, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0]],
        np.float32,
    )
    out = boxes.pairwise_iou(b1, b2)
    np.testing.assert_allclose(
        out, [[1.0, 0.25, 0.0], [0.25, 0.0, 0.0]], rtol=1e-6
    )


def test_pairwise_iou_batched():
    b = np.random.RandomState(0).rand(3, 5, 4).astype(np.float32)
    b = np.concatenate([np.minimum(b[..., :2], b[..., 2:]),
                        np.maximum(b[..., :2], b[..., 2:])], axis=-1)
    out = boxes.pairwise_iou(b, b)
    assert out.shape == (3, 5, 5)
    np.testing.assert_allclose(np.diagonal(out, axis1=1, axis2=2), 1.0, rtol=1e-5)


def test_scale_to_new_size():
    box = np.array([[[0.5, 0.5, 1.0, 1.0]]], np.float32)
    out = boxes.scale_to_new_size(
        box, jnp.array([500, 400]), jnp.array([1000, 1000])
    )
    np.testing.assert_allclose(out, [[[0.25, 0.2, 0.5, 0.4]]], rtol=1e-6)


def test_evaluate_precision_and_recall():
    gt = np.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.2, 0.2]])
    dt = np.array([[0.0, 0.0, 0.95, 0.95], [0.5, 0.5, 0.6, 0.6]])
    recall, precision = boxes.evaluate_precision_and_recall(
        2, gt, np.array([1, 2]), 2, dt, np.array([1, 1])
    )
    np.testing.assert_array_equal(recall, [True, False])
    np.testing.assert_array_equal(precision, [True, False])
