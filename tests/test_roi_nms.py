"""ROI crop (vs TF golden) and batched NMS tests."""

import numpy as np
import pytest

from cap2det_tpu.ops import nms, roi


class TestCropAndResize:
    def test_identity_crop(self):
        """Full-image crop with S == H reproduces the feature map."""
        f = np.arange(2 * 5 * 5 * 3, dtype=np.float32).reshape(2, 5, 5, 3)
        boxes = np.tile(
            np.array([[[0.0, 0.0, 1.0, 1.0]]], np.float32), (2, 1, 1)
        )
        out = np.asarray(roi.crop_and_resize(f, boxes, 5))
        np.testing.assert_allclose(out[:, 0], f, rtol=1e-5)

    def test_point_sampling(self):
        """Crop of a single-pixel box samples that pixel."""
        f = np.zeros((1, 4, 4, 1), np.float32)
        f[0, 2, 1, 0] = 7.0
        # box centered at pixel (2, 1): y = 2/3, x = 1/3 in normalized coords.
        boxes = np.array([[[2 / 3, 1 / 3, 2 / 3, 1 / 3]]], np.float32)
        out = np.asarray(roi.crop_and_resize(f, boxes, 3))
        np.testing.assert_allclose(out[0, 0, :, :, 0], 7.0 * np.ones((3, 3)), atol=1e-5)

    def test_outside_extrapolates_zero(self):
        f = np.ones((1, 4, 4, 1), np.float32)
        boxes = np.array([[[-1.0, -1.0, -0.5, -0.5]]], np.float32)
        out = np.asarray(roi.crop_and_resize(f, boxes, 2))
        np.testing.assert_allclose(out, 0.0)

    @pytest.mark.tf_interop
    def test_matches_tf_crop_and_resize(self):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(0)
        f = rng.randn(2, 9, 13, 5).astype(np.float32)
        y1 = rng.uniform(-0.2, 0.8, (2, 7)).astype(np.float32)
        x1 = rng.uniform(-0.2, 0.8, (2, 7)).astype(np.float32)
        y2 = (y1 + rng.uniform(0.05, 0.5, (2, 7))).astype(np.float32)
        x2 = (x1 + rng.uniform(0.05, 0.5, (2, 7))).astype(np.float32)
        boxes = np.stack([y1, x1, y2, x2], -1)

        ours = np.asarray(roi.crop_and_resize(f, boxes, 4))

        box_ind = np.repeat(np.arange(2), 7).astype(np.int32)
        theirs = tf.image.crop_and_resize(
            f, boxes.reshape(-1, 4), box_ind, crop_size=[4, 4]
        ).numpy().reshape(2, 7, 4, 4, 5)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_maxpool(self):
        x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
        out = np.asarray(roi.max_pool_2d(x, 2, 2))
        np.testing.assert_allclose(out[0, :, :, 0], [[5, 7], [13, 15]])


class TestNMS:
    def test_basic_suppression(self):
        boxes = np.array(
            [
                [
                    [0.0, 0.0, 1.0, 1.0],
                    [0.0, 0.05, 1.0, 1.05],  # overlaps box 0 heavily
                    [0.0, 0.5, 1.0, 1.5],  # moderate overlap
                    [2.0, 2.0, 3.0, 3.0],  # disjoint
                ]
            ],
            np.float32,
        )
        scores = np.array([[[0.9], [0.8], [0.7], [0.6]]], np.float32)
        n, b, s, c = map(
            np.asarray,
            nms.batch_multiclass_nms(
                boxes, scores, iou_thresh=0.5, max_total_size=4
            ),
        )
        assert n[0] == 3
        np.testing.assert_allclose(s[0, :3], [0.9, 0.7, 0.6])
        np.testing.assert_allclose(c[0, :3], [1.0, 1.0, 1.0])
        np.testing.assert_allclose(b[0, 0], boxes[0, 0])

    def test_classwise_independence(self):
        boxes = np.array(
            [[[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]]], np.float32
        )
        scores = np.array([[[0.9, 0.1], [0.2, 0.8]]], np.float32)
        n, b, s, c = map(
            np.asarray,
            nms.batch_multiclass_nms(boxes, scores, iou_thresh=0.5, max_total_size=4),
        )
        # Same box survives once per class (class ids 1-based).
        assert n[0] == 2
        np.testing.assert_allclose(sorted(c[0, :2]), [1.0, 2.0])

    def test_score_threshold(self):
        boxes = np.array([[[0, 0, 1, 1], [1, 1, 2, 2]]], np.float32)
        scores = np.array([[[0.9], [1e-8]]], np.float32)
        n, *_ = map(
            np.asarray,
            nms.batch_multiclass_nms(boxes, scores, score_thresh=1e-6),
        )
        assert n[0] == 1

    def test_max_size_per_class(self):
        rng = np.random.RandomState(1)
        # 10 disjoint boxes along the diagonal.
        base = np.arange(10, dtype=np.float32)
        boxes = np.stack([base, base, base + 0.5, base + 0.5], -1)[None]
        scores = rng.uniform(0.1, 1.0, (1, 10, 1)).astype(np.float32)
        n, b, s, c = map(
            np.asarray,
            nms.batch_multiclass_nms(
                boxes, scores, max_size_per_class=4, max_total_size=8
            ),
        )
        assert n[0] == 4
        np.testing.assert_allclose(s[0, :4], np.sort(scores[0, :, 0])[::-1][:4])

    def test_max_total_size_merge(self):
        base = np.arange(6, dtype=np.float32)
        boxes = np.stack([base, base, base + 0.5, base + 0.5], -1)[None]
        scores = np.random.RandomState(2).uniform(0.1, 1, (1, 6, 3)).astype(np.float32)
        n, b, s, c = map(
            np.asarray,
            nms.batch_multiclass_nms(
                boxes, scores, max_size_per_class=6, max_total_size=5
            ),
        )
        assert n[0] == 5
        assert (np.diff(s[0, :5]) <= 1e-6).all()  # sorted desc

    @pytest.mark.tf_interop
    def test_matches_tf_single_class(self):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(3)
        n_boxes = 40
        y0 = rng.uniform(0, 0.7, n_boxes)
        x0 = rng.uniform(0, 0.7, n_boxes)
        boxes = np.stack(
            [y0, x0, y0 + rng.uniform(0.1, 0.3, n_boxes),
             x0 + rng.uniform(0.1, 0.3, n_boxes)], -1
        ).astype(np.float32)
        scores = rng.uniform(0, 1, n_boxes).astype(np.float32)

        keep = tf.image.non_max_suppression(
            boxes, scores, max_output_size=20, iou_threshold=0.5,
            score_threshold=0.05,
        ).numpy()

        n, b, s, c = map(
            np.asarray,
            nms.batch_multiclass_nms(
                boxes[None], scores[None, :, None],
                score_thresh=0.05, iou_thresh=0.5,
                max_size_per_class=20, max_total_size=20,
            ),
        )
        assert n[0] == len(keep)
        np.testing.assert_allclose(s[0, : n[0]], scores[keep], rtol=1e-6)
        np.testing.assert_allclose(b[0, : n[0]], boxes[keep], rtol=1e-6)
