"""Input pipeline tests over a synthetic TFRecord dataset."""

import numpy as np
import pytest

from cap2det_tpu.config import pbtxt, schema
from cap2det_tpu.data import pipeline, synthetic
from cap2det_tpu.fields import InputFields
from cap2det_tpu.text import extractors


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    record = str(d / "train.record-00000")
    synthetic.write_synthetic_dataset(record, num_examples=12, seed=7)
    label_file = synthetic.write_label_file(str(d / "labels.txt"))
    return record, label_file


def _reader(record, **overrides):
    text = """
      input_pattern: "%s"
      is_training: true
      shuffle_buffer_size: 4
      batch_size: 2
      image_resizer { keep_aspect_ratio_resizer { min_dimension: 128 } }
      preprocess_options { random_flip_left_right_prob: 0.5 }
      max_num_proposals: 60
      batch_resize_scale_value: 1.2
      batch_resize_scale_value: 0.8
    """ % record
    cfg = schema.Cap2DetReader.from_dict(pbtxt.parse(text))
    for k, v in overrides.items():
        object.__setattr__(cfg, k, v)
    return cfg


def test_parse_example_roundtrip(dataset):
    record, _ = dataset
    from cap2det_tpu.data import tfrecord

    raw = next(iter(tfrecord.read_records(record)))
    ex = pipeline.parse_example(raw)
    assert ex["image_id"] == "synthetic-00000"
    assert len(ex["captions"]) == 2
    assert all(len(c) == 5 for c in ex["captions"])
    assert ex["proposals"].shape == (50, 4)
    assert ex["object_boxes"].shape == (2, 4)
    assert len(ex["object_texts"]) == 2
    assert ex["image_encoded"][:2] == b"\xff\xd8"  # JPEG magic


def test_image_batches_static_shapes(dataset):
    record, label_file = dataset
    cfg = _reader(record)
    ex_cfg = schema.GroundtruthExtractor.from_dict({"label_file": label_file})
    extractor = extractors.GroundtruthExtractor(ex_cfg)
    pipe = pipeline.InputPipeline(cfg, label_extractor=extractor, seed=3, prefetch=0)

    seen_shapes = set()
    it = iter(pipe)
    for _ in range(6):
        batch = next(it)
        img = batch[InputFields.image]
        assert img.ndim == 4 and img.shape[0] == 2 and img.shape[3] == 3
        assert img.shape[1] % 32 == 0 and img.shape[2] % 32 == 0
        seen_shapes.add(img.shape[1:3])
        assert batch[InputFields.proposals].shape == (2, 60, 4)
        assert batch[InputFields.num_proposals].tolist() == [50, 50]
        labels = batch[InputFields.pseudo_labels]
        assert labels.shape == (2, 20)
        assert (labels.sum(-1) >= 1).all()
        # Boxes are canvas-normalized: within [0, 1].
        props = batch[InputFields.proposals]
        assert props.min() >= 0.0 and props.max() <= 1.0
        # Proposal extent must not exceed the true-image fraction of canvas.
        shapes = batch[InputFields.image_shape]
        for i in range(2):
            fy = shapes[i, 0] / img.shape[1]
            fx = shapes[i, 1] / img.shape[2]
            assert props[i, :, 2].max() <= fy + 1e-6
            assert props[i, :, 3].max() <= fx + 1e-6
    # Multiple scale buckets appear over several batches.
    assert len(seen_shapes) >= 2


def test_text_batches(dataset):
    record, label_file = dataset
    cfg = _reader(record)
    object.__setattr__(cfg, "decode_image", False)
    from cap2det_tpu.text import vocab as vocab_lib

    vocab = vocab_lib.Vocabulary(
        ["a", "the", "photo", "person", "dog", "cat", "car"]
    )
    pipe = pipeline.InputPipeline(cfg, vocab=vocab, seed=3, prefetch=0)
    batch = next(iter(pipe))
    assert InputFields.image not in batch
    ids = batch[InputFields.concat_caption_token_ids]
    assert ids.shape == (2, 64)
    assert (ids <= vocab.oov_id).all()
    assert batch[InputFields.num_captions].shape == (2,)
    assert batch[InputFields.caption_strings].ndim == 3


def test_eval_pass_is_finite(dataset):
    record, _ = dataset
    cfg = _reader(record)
    object.__setattr__(cfg, "is_training", False)
    object.__setattr__(cfg, "batch_size", 1)
    pipe = pipeline.InputPipeline(cfg, seed=0, prefetch=0)
    batches = list(pipe)
    assert len(batches) == 12


def test_shard_filter_partitions(dataset):
    record, _ = dataset
    ids = set()
    total = 0
    for k in range(3):
        cfg = _reader(record)
        object.__setattr__(cfg, "is_training", False)
        object.__setattr__(cfg, "batch_size", 1)
        object.__setattr__(cfg, "shard_indicator", "%d/3" % k)
        pipe = pipeline.InputPipeline(cfg, seed=0, prefetch=0)
        for batch in pipe:
            for image_id in batch[InputFields.image_id]:
                assert image_id not in ids
                ids.add(image_id)
                total += 1
    assert total == 12


def test_flip_consistency(dataset):
    """With flip probability 1, proposals must mirror with the image."""
    record, _ = dataset
    cfg_f = _reader(record)
    object.__setattr__(cfg_f, "batch_resize_scale_value", [1.0])
    flip_cfg = schema.Preprocess.from_dict({"random_flip_left_right_prob": 1.0})
    object.__setattr__(cfg_f, "preprocess_options", flip_cfg)
    pipe_f = pipeline.InputPipeline(cfg_f, seed=5, prefetch=0)

    cfg_n = _reader(record)
    object.__setattr__(cfg_n, "batch_resize_scale_value", [1.0])
    noflip_cfg = schema.Preprocess.from_dict({"random_flip_left_right_prob": 0.0})
    object.__setattr__(cfg_n, "preprocess_options", noflip_cfg)
    pipe_n = pipeline.InputPipeline(cfg_n, seed=5, prefetch=0)

    bf = next(iter(pipe_f))
    bn = next(iter(pipe_n))
    pf = bf[InputFields.proposals][0, :50]
    pn = bn[InputFields.proposals][0, :50]
    shapes = bn[InputFields.image_shape]
    fx = shapes[0, 1] / bn[InputFields.image].shape[2]
    # flipped xmin == (fx - xmax_unflipped): flip happens in image space
    # before canvas renormalization.
    np.testing.assert_allclose(pf[:, 1], fx - pn[:, 3], atol=1e-5)
    np.testing.assert_allclose(pf[:, 0], pn[:, 0], atol=1e-6)


def test_parallel_decode_matches_serial(dataset, monkeypatch):
    """map_num_parallel_calls > 1 must preserve order and content."""
    record, _ = dataset
    # The worker count is capped at cpu_count (1 in this sandbox); lift it
    # so the parallel path genuinely executes.
    import os

    monkeypatch.setattr(os, "cpu_count", lambda: 8)

    def batches(workers, n=4):
        cfg = _reader(record, map_num_parallel_calls=workers)
        pipe = pipeline.InputPipeline(cfg, seed=5, prefetch=0)
        out = []
        it = iter(pipe)
        for _ in range(n):
            out.append(next(it))
        return out

    serial = batches(1)
    parallel = batches(6)
    for b1, b2 in zip(serial, parallel):
        assert list(b1[InputFields.image_id]) == list(b2[InputFields.image_id])
        np.testing.assert_array_equal(b1[InputFields.image], b2[InputFields.image])
        np.testing.assert_array_equal(
            b1[InputFields.proposals], b2[InputFields.proposals]
        )


def test_parallel_map_bounded_on_infinite_stream():
    import itertools

    seen = []

    def fn(x):
        seen.append(x)
        return x * 2

    gen = pipeline._parallel_map(fn, itertools.count(), workers=3)
    out = [next(gen) for _ in range(10)]
    assert out == [i * 2 for i in range(10)]
    # Bounded in-flight: far fewer consumed than an eager map would.
    assert len(seen) <= 10 + 3 + 2 + 1


def test_photometric_requires_opt_in(dataset):
    record, _ = dataset
    cfg = _reader(record)
    pre = cfg.preprocess_options
    object.__setattr__(pre, "random_brightness_prob", 0.5)
    with pytest.raises(ValueError, match="enable_photometric_augmentation"):
        pipeline.InputPipeline(cfg, prefetch=0)
    # With the documented opt-in the pipeline builds and produces batches.
    object.__setattr__(pre, "enable_photometric_augmentation", True)
    pipe = pipeline.InputPipeline(cfg, seed=3, prefetch=0)
    batch = next(iter(pipe))
    assert batch[InputFields.image].shape[0] == 2


def test_packed_pipeline_matches_unpacked_s2d(dataset):
    """pack_s2d=True must emit exactly space_to_depth(unpacked batch):
    same examples, same randomness, same uint8 pixels — only the layout
    (and the fused native pack) differs."""
    record, _ = dataset
    cfg = _reader(record)
    unpacked = pipeline.InputPipeline(cfg, seed=5, pack_s2d=False)
    packed = pipeline.InputPipeline(cfg, seed=5, pack_s2d=True)
    for b_u, b_p, _ in zip(iter(unpacked), iter(packed), range(4)):
        img_u = b_u[InputFields.image]
        img_p = b_p[InputFields.image]
        assert img_u.dtype == np.uint8 and img_p.dtype == np.uint8
        assert img_p.shape == (
            img_u.shape[0], img_u.shape[1] // 2, img_u.shape[2] // 2, 12
        )
        want = np.stack([pipeline._numpy_s2d(im) for im in img_u])
        np.testing.assert_array_equal(img_p, want)
        # Non-image fields identical.
        np.testing.assert_array_equal(
            b_u[InputFields.proposals], b_p[InputFields.proposals]
        )
        assert list(b_u[InputFields.image_id]) == list(b_p[InputFields.image_id])


def test_device_batch_passthrough_and_pack(dataset):
    """cap2det.device_batch ships packed uint8 unchanged, and packs an
    unpacked uint8 canvas to the identical layout."""
    from cap2det_tpu.data import synthetic as synthetic_lib
    from cap2det_tpu.models import registry
    import cap2det_tpu.models  # noqa: F401
    import jax.numpy as jnp

    record, label_file = dataset
    model_text = """
    model {
      [Cap2DetModel.ext] {
        frcnn_options {
          feature_extractor { type: 'faster_rcnn_inception_v2' }
          initial_crop_size: 6 maxpool_kernel_size: 2 maxpool_stride: 2
          dropout_keep_prob: 1.0 dropout_on_feature_map: false
        }
        fc_hyperparams {
          op: FC
          regularizer { l2_regularizer { weight: 0.0 } }
          initializer { truncated_normal_initializer { stddev: 0.01 } }
        }
        oicr_iterations: 1
        midn_post_processor {
          score_thresh: 0.001 iou_thresh: 0.4
          max_size_per_class: 4 max_total_size: 8
        }
        oicr_post_processor {
          score_thresh: 0.001 iou_thresh: 0.4
          max_size_per_class: 4 max_total_size: 8
        }
        label_extractor { groundtruth_extractor { label_file: '%s' } }
      }
    }
    """ % label_file
    model = registry.build(
        schema.Model.from_dict(pbtxt.parse(model_text)["model"]),
        is_training=True, compute_dtype=jnp.float32,
    )
    rs = np.random.RandomState(0)
    unpacked = rs.randint(0, 256, (2, 64, 96, 3), np.uint8)
    base = {
        InputFields.image: unpacked,
        InputFields.proposals: np.zeros((2, 4, 4), np.float32),
        InputFields.num_proposals: np.full((2,), 4, np.int32),
        InputFields.pseudo_labels: np.zeros((2, 3), np.float32),
    }
    packed_batch = model.device_batch(base)
    assert packed_batch["image"].dtype == np.uint8
    assert packed_batch["image"].shape == (2, 32, 48, 12)
    want = np.stack([pipeline._numpy_s2d(im) for im in unpacked])
    np.testing.assert_array_equal(packed_batch["image"], want)

    # Already packed: byte-identical passthrough.
    pre_packed = dict(base)
    pre_packed[InputFields.image] = want
    out = model.device_batch(pre_packed)
    np.testing.assert_array_equal(out["image"], want)
