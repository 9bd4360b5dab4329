"""Image op and sequence-encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.ops import image as image_ops
from cap2det_tpu.text import sequence_encoding as seq


class TestResizers:
    def test_resize_to_size(self):
        img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
        out, shape = image_ops.resize_image_to_size(img, 4, 4)
        assert out.shape == (4, 4, 3)
        np.testing.assert_array_equal(shape, [4, 4, 3])

    def test_min_dimension_target(self):
        assert image_ops.compute_new_size_min_dimension(480, 640, 1000) == (
            1000, 1333,
        )
        assert image_ops.compute_new_size_min_dimension(640, 480, 1000) == (
            1333, 1000,
        )

    def test_max_dimension_target(self):
        assert image_ops.compute_new_size_max_dimension(480, 640, 320) == (
            240, 320,
        )

    def test_resize_min_dimension(self):
        img = np.zeros((30, 60, 3), np.float32)
        out, shape = image_ops.resize_image_to_min_dimension(img, 15)
        assert out.shape == (15, 30, 3)

    def test_resize_max_dimension_pad(self):
        img = np.ones((30, 60, 3), np.float32)
        out, shape = image_ops.resize_image_to_max_dimension(
            img, 40, pad_to_max=True
        )
        assert out.shape == (40, 40, 3)
        np.testing.assert_array_equal(shape, [20, 40, 3])
        assert float(out[25:].sum()) == 0.0  # padded region


class TestIntegralImage:
    def test_integral_image(self):
        img = np.ones((1, 3, 4), np.float32)
        s = np.asarray(image_ops.calc_integral_image(img))
        assert s.shape == (1, 4, 5)
        assert s[0, -1, -1] == 12.0
        assert s[0, 0].sum() == 0.0

    def test_cumsum_2d_box_query(self):
        rng = np.random.RandomState(0)
        img = rng.rand(2, 8, 9).astype(np.float32)
        boxes = np.array(
            [[[0, 0, 8, 9], [2, 3, 5, 7]], [[1, 1, 2, 2], [0, 0, 1, 1]]],
            np.int32,
        )
        out = np.asarray(image_ops.calc_cumsum_2d(img, boxes))
        np.testing.assert_allclose(out[0, 0], img[0].sum(), rtol=1e-5)
        np.testing.assert_allclose(
            out[0, 1], img[0, 2:5, 3:7].sum(), rtol=1e-5
        )
        np.testing.assert_allclose(out[1, 1], img[1, 0, 0], rtol=1e-5)


class TestGaussian:
    def test_kernel_normalized(self):
        k = np.asarray(image_ops.gaussian_kernel(5))
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        assert k[2] == k.max()

    def test_kernel_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        ours = np.asarray(image_ops.gaussian_kernel(5))
        theirs = cv2.getGaussianKernel(5, -1).reshape(-1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_filter_preserves_constant(self):
        img = 3.0 * np.ones((1, 6, 6), np.float32)
        out = np.asarray(image_ops.gaussian_filter(img, ksize=3))
        np.testing.assert_allclose(out, 3.0, rtol=1e-5)


class TestSequenceEncoders:
    def test_average_ignores_padding(self):
        emb = np.zeros((2, 4, 3), np.float32)
        emb[0, :2] = [[1, 2, 3], [3, 2, 1]]
        emb[0, 2:] = 99.0  # padding junk
        emb[1, :4] = 1.0
        out = np.asarray(seq.average_encode(emb, np.array([2, 4])))
        np.testing.assert_allclose(out[0], [2, 2, 2], rtol=1e-5)
        np.testing.assert_allclose(out[1], [1, 1, 1], rtol=1e-5)

    def test_lstm_respects_lengths(self):
        rng = jax.random.PRNGKey(0)
        params = seq.init_lstm_params(rng, 3, 5)
        emb = np.random.RandomState(0).randn(2, 6, 3).astype(np.float32)
        out_full = np.asarray(seq.lstm_encode(params, emb, np.array([3, 6])))
        emb2 = emb.copy()
        emb2[0, 3:] = 123.0  # junk after length must not matter
        out_junk = np.asarray(seq.lstm_encode(params, emb2, np.array([3, 6])))
        np.testing.assert_allclose(out_full, out_junk, rtol=1e-5)

    def test_factory(self):
        params, fn = seq.get_encode_fn(seq.AverageEncoder())
        emb = np.ones((1, 2, 3), np.float32)
        out = fn(params, emb, np.array([2]))
        assert out.shape == (1, 3)
        params, fn = seq.get_encode_fn(
            seq.LstmEncoder(hidden_units=4), rng=jax.random.PRNGKey(0),
            input_dim=3,
        )
        out = fn(params, emb, np.array([2]))
        assert out.shape == (1, 4)


class TestAugment:
    def test_photometric_chain(self):
        import random

        from cap2det_tpu.config import schema
        from cap2det_tpu.data import augment

        opts = schema.Preprocess.from_dict(
            {
                "random_brightness_prob": 1.0,
                "random_contrast_prob": 1.0,
                "random_hue_prob": 1.0,
                "random_saturation_prob": 1.0,
            }
        )
        img = np.random.RandomState(0).randint(
            0, 255, (32, 32, 3), dtype=np.uint8
        )
        out = augment.apply_photometric(img, opts, random.Random(0))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)

    def test_random_crop_bounds(self):
        from cap2det_tpu.data import augment

        rng = np.random.RandomState(0)
        img = np.zeros((40, 60, 3), np.uint8)
        out = augment.random_crop(img, 0.8, rng)
        assert out.shape[0] >= 32 and out.shape[1] >= 48
