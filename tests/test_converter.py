"""TF checkpoint converter round-trip: a slim-named TF checkpoint loads
into both backbone stages tensor-for-tensor."""

import os

import jax
import numpy as np
import pytest

from cap2det_tpu.models import frcnn, inception_v2
from cap2det_tpu.config import schema, pbtxt


def _leaf_items(tree, prefix=""):
    for k, v in tree.items():
        path = prefix + "/" + k if prefix else k
        if isinstance(v, dict):
            yield from _leaf_items(v, path)
        else:
            yield path, v


@pytest.mark.tf_interop
def test_tf_checkpoint_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_tf_checkpoint as conv

    # Build the full InceptionV2 variable set from our param trees.
    rng = jax.random.PRNGKey(0)
    first = inception_v2.init_first_stage_params(rng)["InceptionV2"]
    second = inception_v2.init_second_stage_params(rng)["InceptionV2"]
    merged = dict(first)
    merged.update(second)

    tf_ckpt = str(tmp_path / "inception_v2.ckpt")
    with tf.Graph().as_default():
        tf_vars = {}
        rs = np.random.RandomState(0)
        for path, leaf in _leaf_items({"InceptionV2": merged}):
            value = rs.randn(*np.shape(leaf)).astype(np.float32)
            tf_vars[path] = tf.Variable(value, name=path)
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            expected = {p: sess.run(v) for p, v in tf_vars.items()}
            saver.save(sess, tf_ckpt)

    out_path = str(tmp_path / "converted")
    tree = conv.convert(tf_ckpt, out_path)

    # Overlay onto a fresh model and verify tensors landed in both stages.
    cfg = schema.FRCNN.from_dict(
        pbtxt.parse(
            "feature_extractor { type: 'faster_rcnn_inception_v2' } "
            "initial_crop_size: 14 maxpool_kernel_size: 2 maxpool_stride: 2"
        )
    )
    params = frcnn.init_params(jax.random.PRNGKey(1), cfg)
    loaded = frcnn.load_pretrained(params, tree)

    checked = 0
    for path, leaf in _leaf_items(loaded[frcnn.FIRST_SCOPE]):
        np.testing.assert_allclose(
            np.asarray(leaf), expected[path], rtol=1e-6, err_msg=path
        )
        checked += 1
    for path, leaf in _leaf_items(loaded[frcnn.SECOND_SCOPE]):
        np.testing.assert_allclose(
            np.asarray(leaf), expected[path], rtol=1e-6, err_msg=path
        )
        checked += 1
    assert checked > 100


def test_restore_params_all_layouts(tmp_path):
    """restore_params must read every layout a warm-start flag can point
    at: a save_params file, a trainer step dir (tree nested under
    <step>/default/), and a model_dir (newest step picked)."""
    import numpy as np

    from cap2det_tpu.train import checkpoint as ckpt_lib

    params = {"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}

    flat_path = str(tmp_path / "flat_params")
    ckpt_lib.save_params(flat_path, params)
    out = ckpt_lib.restore_params(flat_path)
    np.testing.assert_array_equal(out["layer"]["w"], params["layer"]["w"])

    model_dir = str(tmp_path / "model")
    manager = ckpt_lib.CheckpointManager(model_dir)
    state = {"params": params, "opt_state": {}, "step": 7}
    manager.save(7, state)
    manager.close()

    step_dir = ckpt_lib.latest_checkpoint(model_dir)[1]
    out = ckpt_lib.restore_params(step_dir)
    np.testing.assert_array_equal(out["layer"]["w"], params["layer"]["w"])

    out = ckpt_lib.restore_params(model_dir)
    np.testing.assert_array_equal(out["layer"]["w"], params["layer"]["w"])

    import pytest

    with pytest.raises(FileNotFoundError):
        ckpt_lib.restore_params(str(tmp_path / "nope"))
