"""Visualization helper tests."""

import numpy as np

from cap2det_tpu.utils import visualize


def test_heatmap():
    out = visualize.convert_to_heatmap(np.random.rand(8, 10))
    assert out.shape == (8, 10, 3) and out.dtype == np.uint8


def test_draw_rectangles_and_caption():
    img = np.zeros((40, 60, 3), np.uint8)
    out = visualize.draw_rectangles(
        img,
        [[0.1, 0.1, 0.9, 0.9]],
        labels=["cat"],
        color=(0, 255, 0),
    )
    assert out.sum() > 0
    assert img.sum() == 0  # input untouched
    out = visualize.draw_caption(out, "hello")
    assert out.shape == img.shape


def test_base64_jpeg():
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    s = visualize.to_base64_jpeg(img)
    import base64

    decoded = base64.b64decode(s)
    assert decoded[:2] == b"\xff\xd8"
