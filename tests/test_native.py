"""Native C++ components: selective search + TFRecord reader."""

import numpy as np
import pytest

from cap2det_tpu import native
from cap2det_tpu.data import tfrecord

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _toy_image(seed=0):
    img = np.full((120, 160, 3), 40, np.uint8)
    img[20:60, 20:70] = [200, 30, 30]
    img[70:110, 90:150] = [30, 200, 30]
    noise = np.random.RandomState(seed).randint(0, 12, img.shape)
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


def _iou(a, b):
    ih = max(min(a[2], b[2]) - max(a[0], b[0]), 0)
    iw = max(min(a[3], b[3]) - max(a[1], b[1]), 0)
    inter = ih * iw
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


class TestSelectiveSearch:
    def test_felzenszwalb_segments_regions(self):
        labels = native.felzenszwalb(_toy_image(), k=300, min_size=50)
        assert labels.shape == (120, 160)
        # The two rectangles land in distinct segments.
        seg_a = labels[40, 45]
        seg_b = labels[90, 120]
        seg_bg = labels[5, 5]
        assert len({seg_a, seg_b, seg_bg}) == 3

    def test_proposals_cover_objects(self):
        boxes = native.selective_search(_toy_image(), quality=True)
        assert len(boxes) > 10
        assert (boxes[:, 2] > boxes[:, 0]).all()
        assert (boxes[:, 3] > boxes[:, 1]).all()
        assert boxes.min() >= 0.0 and boxes.max() <= 1.0
        gt_a = (20 / 120, 20 / 160, 60 / 120, 70 / 160)
        gt_b = (70 / 120, 90 / 160, 110 / 120, 150 / 160)
        best_a = max(_iou(b, gt_a) for b in boxes)
        best_b = max(_iou(b, gt_b) for b in boxes)
        assert best_a > 0.6, best_a
        assert best_b > 0.6, best_b

    def test_deterministic_given_seed(self):
        img = _toy_image()
        b1 = native.selective_search(img, seed=7)
        b2 = native.selective_search(img, seed=7)
        np.testing.assert_array_equal(b1, b2)


class TestNativeTFRecordReader:
    def test_parity_with_python_reader(self, tmp_path):
        path = str(tmp_path / "x.record")
        records = [b"a" * 10, b"", b"payload" * 1000, b"z"]
        with tfrecord.TFRecordWriter(path) as w:
            for r in records:
                w.write(r)
        got = list(native.read_records_native(path, verify_crc=True))
        assert got == records
        got2 = list(native.read_records_native(path, readahead=False))
        assert got2 == records

    def test_crc32c_matches_python(self):
        import ctypes

        lib = native.load()
        for data in [b"", b"123456789", bytes(range(256)) * 7]:
            buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data) if data else (ctypes.c_uint8 * 1)()
            got = lib.tfr_crc32c(buf, len(data))
            assert got == tfrecord.crc32c(data)

    def test_corrupt_record_raises(self, tmp_path):
        path = str(tmp_path / "bad.record")
        with tfrecord.TFRecordWriter(path) as w:
            w.write(b"hello world")
        raw = bytearray(open(path, "rb").read())
        raw[14] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(native.read_records_native(path, verify_crc=True))


class TestPackS2d:
    def test_matches_numpy_s2d_including_odd_edges(self):
        from cap2det_tpu.data.pipeline import _numpy_s2d

        rng = np.random.RandomState(3)
        for nh, nw, ch, cw in [
            (64, 96, 64, 96),     # exact fit
            (41, 63, 64, 96),     # odd both
            (40, 63, 64, 96),     # odd width
            (41, 64, 64, 96),     # odd height
            (1, 1, 32, 32),       # degenerate
            (100, 148, 128, 160), # typical canvas fraction
        ]:
            img = rng.randint(0, 256, (nh, nw, 3), np.uint8)
            got = native.pack_s2d(img, (ch, cw))
            full = np.zeros((ch, cw, 3), np.uint8)
            full[:nh, :nw] = img
            np.testing.assert_array_equal(
                got, _numpy_s2d(full), err_msg=str((nh, nw, ch, cw))
            )

    def test_rejects_oversized_image_and_odd_canvas(self):
        img = np.zeros((10, 10, 3), np.uint8)
        with pytest.raises(ValueError):
            native.pack_s2d(img, (8, 16))
        with pytest.raises(ValueError):
            native.pack_s2d(img, (15, 16))
