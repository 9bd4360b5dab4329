"""TFRecord + tf.Example codec tests, including TF interoperability."""

import numpy as np
import pytest

from cap2det_tpu.data import tf_example, tfrecord


def test_example_roundtrip():
    feats = {
        "image/source_id": ("bytes", [b"img-001"]),
        "image/caption/string": ("bytes", [b"a", b"cat", b"sits"]),
        "image/caption/offset": ("int64", [0]),
        "image/caption/length": ("int64", [3]),
        "image/proposal/bbox/ymin": ("float", [0.0, 0.25]),
        "image/proposal/bbox/xmax": ("float", [1.0, 0.75]),
        "neg/int": ("int64", [-7, 1 << 40]),
    }
    data = tf_example.encode_example(feats)
    out = tf_example.decode_example(data)
    assert out["image/source_id"] == ("bytes", [b"img-001"])
    assert out["image/caption/string"][1] == [b"a", b"cat", b"sits"]
    assert out["neg/int"] == ("int64", [-7, 1 << 40])
    np.testing.assert_allclose(out["image/proposal/bbox/ymin"][1], [0.0, 0.25])


def test_example_wanted_keys():
    feats = {
        "a": ("bytes", [b"x" * 1000]),
        "b": ("int64", [5]),
    }
    data = tf_example.encode_example(feats)
    out = tf_example.decode_example(data, wanted_keys={"b"})
    assert "a" not in out and out["b"] == ("int64", [5])


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.record")
    records = [b"first", b"second" * 100, b""]
    with tfrecord.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    assert list(tfrecord.read_records(path, verify_crc=True)) == records


def test_crc32c_known_values():
    # Known CRC32C test vectors (RFC 3720 / iSCSI).
    assert tfrecord.crc32c(b"") == 0
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord.crc32c(bytes(32)) == 0x8A9136AA


@pytest.mark.tf_interop
def test_tf_can_read_our_records(tmp_path):
    """Records we write must parse with TensorFlow's own reader."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "interop.record")
    feats = {
        "image/source_id": ("bytes", [b"abc"]),
        "image/proposal/bbox/ymin": ("float", [0.5, 0.25]),
        "image/caption/offset": ("int64", [0, 3]),
    }
    with tfrecord.TFRecordWriter(path) as w:
        w.write(tf_example.encode_example(feats))

    raw = next(iter(tf.data.TFRecordDataset(path)))
    ex = tf.train.Example.FromString(raw.numpy())
    f = ex.features.feature
    assert list(f["image/source_id"].bytes_list.value) == [b"abc"]
    np.testing.assert_allclose(
        list(f["image/proposal/bbox/ymin"].float_list.value), [0.5, 0.25]
    )
    assert list(f["image/caption/offset"].int64_list.value) == [0, 3]

    # And the reverse: TF-written example parses with our decoder.
    ex2 = tf.train.Example()
    ex2.features.feature["k"].int64_list.value.extend([1, 2, 3])
    ex2.features.feature["s"].bytes_list.value.append(b"zz")
    ex2.features.feature["fl"].float_list.value.extend([1.5])
    out = tf_example.decode_example(ex2.SerializeToString())
    assert out["k"] == ("int64", [1, 2, 3])
    assert out["s"] == ("bytes", [b"zz"])
    np.testing.assert_allclose(out["fl"][1], [1.5])
