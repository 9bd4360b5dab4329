"""Backbone numerical parity vs TensorFlow.

SURVEY hard-part #2: the faster_rcnn_inception_v2 split
(reference models/utils.py:127-186) must match TF-slim semantics or mAP
parity is hopeless. tf_slim isn't installed, so these goldens rebuild the
forward pass with raw tf.nn ops from the SAME block specs and params
pytree as cap2det_tpu.models.inception_v2 — pinning everything TF-specific:

  * conv2d SAME padding (asymmetric corners on even sizes / stride 2),
  * separable_conv2d depthwise+pointwise semantics,
  * BatchNorm placement: (x - mean) * rsqrt(var + 0.001) + beta, no gamma
    (slim inception_v2 uses scale=False),
  * max/avg pool SAME corners, avg-pool divisor excluding padding,
  * branch concat order, preprocess scaling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cap2det_tpu.models import inception_v2 as iv2

tf = pytest.importorskip("tensorflow")

RTOL, ATOL = 2e-4, 2e-4


def _np(tree):
    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


# --- TF twin built from the same specs ------------------------------------


def tf_conv_bn(p, x, stride):
    x = tf.nn.conv2d(x, p["weights"], [1, stride, stride, 1], "SAME")
    bn = p["BatchNorm"]
    x = tf.nn.batch_normalization(
        x, bn["moving_mean"], bn["moving_variance"], bn["beta"], None,
        iv2.BN_EPSILON,
    )
    return tf.nn.relu(x)


def tf_sep_conv_bn(p, x, stride):
    x = tf.nn.separable_conv2d(
        x, p["depthwise_weights"], p["pointwise_weights"],
        [1, stride, stride, 1], "SAME",
    )
    bn = p["BatchNorm"]
    x = tf.nn.batch_normalization(
        x, bn["moving_mean"], bn["moving_variance"], bn["beta"], None,
        iv2.BN_EPSILON,
    )
    return tf.nn.relu(x)


def tf_pool(x, kind, kernel, stride):
    if kind == "pool_max":
        return tf.nn.max_pool2d(x, kernel, stride, "SAME")
    return tf.nn.avg_pool2d(x, kernel, stride, "SAME")


def tf_block(p, spec, x):
    outs = []
    for b, branch in enumerate(spec):
        h = x
        bp = p["Branch_%d" % b]
        for name, k, cout, stride in branch:
            if name.startswith("pool_"):
                h = tf_pool(h, name, k, stride)
            else:
                h = tf_conv_bn(bp[name], h, stride)
        outs.append(h)
    return tf.concat(outs, axis=-1)


def tf_first_stage(params, images):
    p = params["InceptionV2"]
    x = tf_sep_conv_bn(p["Conv2d_1a_7x7"], images, 2)
    x = tf_pool(x, "pool_max", 3, 2)
    x = tf_conv_bn(p["Conv2d_2b_1x1"], x, 1)
    x = tf_conv_bn(p["Conv2d_2c_3x3"], x, 1)
    x = tf_pool(x, "pool_max", 3, 2)
    for name in ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
                 "Mixed_4d", "Mixed_4e"]:
        x = tf_block(p[name], iv2._BLOCKS_FIRST[name], x)
    return x


def tf_second_stage(params, rois):
    p = params["InceptionV2"]
    x = rois
    for name in ["Mixed_5a", "Mixed_5b", "Mixed_5c"]:
        x = tf_block(p[name], iv2._BLOCKS_SECOND[name], x)
    return x


def _rand_bn(rng, cout):
    """Non-trivial BN stats so epsilon/placement bugs can't cancel out."""
    return {
        "beta": rng.normal(0, 0.5, (cout,)).astype(np.float32),
        "moving_mean": rng.normal(0, 0.5, (cout,)).astype(np.float32),
        "moving_variance": rng.uniform(0.3, 2.0, (cout,)).astype(np.float32),
    }


def _randomize_bn(params, rng):
    def visit(node):
        if isinstance(node, dict):
            if "BatchNorm" in node:
                cout = np.asarray(node["BatchNorm"]["beta"]).shape[0]
                node["BatchNorm"] = _rand_bn(rng, cout)
            for v in node.values():
                visit(v)

    visit(params)
    return params


# --- unit goldens ----------------------------------------------------------


@pytest.mark.parametrize("stride,hw", [(1, (9, 11)), (2, (10, 13))])
def test_conv_bn_parity(stride, hw):
    rng = np.random.default_rng(0)
    p = {
        "weights": rng.normal(0, 0.1, (3, 3, 5, 7)).astype(np.float32),
        "BatchNorm": _rand_bn(rng, 7),
    }
    x = rng.normal(0, 1, (2, *hw, 5)).astype(np.float32)
    got = np.asarray(iv2._conv_bn(p, jnp.asarray(x), stride, jnp.float32))
    want = tf_conv_bn(p, tf.constant(x), stride).numpy()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_sep_conv_bn_parity():
    rng = np.random.default_rng(1)
    p = {
        "depthwise_weights": rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32),
        "pointwise_weights": rng.normal(0, 0.1, (1, 1, 24, 64)).astype(np.float32),
        "BatchNorm": _rand_bn(rng, 64),
    }
    x = rng.normal(0, 1, (2, 21, 27, 3)).astype(np.float32)
    got = np.asarray(iv2._sep_conv_bn(p, jnp.asarray(x), 2, jnp.float32))
    want = tf_sep_conv_bn(p, tf.constant(x), 2).numpy()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("kind", ["pool_max", "pool_avg"])
@pytest.mark.parametrize("stride,hw", [(1, (9, 11)), (2, (9, 11)), (2, (10, 12))])
def test_pool_parity(kind, stride, hw):
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, *hw, 4)).astype(np.float32)
    got = np.asarray(iv2._pool(jnp.asarray(x), kind, 3, stride))
    want = tf_pool(tf.constant(x), kind, 3, stride).numpy()
    # Asymmetric SAME corners + avg divisor excluding padding.
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_preprocess_parity():
    x = np.linspace(0, 255, 64, dtype=np.float32).reshape(1, 4, 4, 4)
    got = np.asarray(iv2.preprocess(jnp.asarray(x)))
    want = (2.0 / 255.0) * x - 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


# --- full-stage goldens ----------------------------------------------------


@pytest.mark.slow
def test_first_stage_parity_full():
    rng = np.random.default_rng(3)
    params = _randomize_bn(
        _np(iv2.init_first_stage_params(jax.random.PRNGKey(0))), rng
    )
    # Odd size exercises asymmetric SAME padding at every stride-2 stage.
    images = rng.uniform(-1, 1, (1, 75, 101, 3)).astype(np.float32)
    got = np.asarray(iv2.first_stage(params, jnp.asarray(images), jnp.float32))
    want = tf_first_stage(params, tf.constant(images)).numpy()
    assert got.shape == want.shape == (1, 5, 7, iv2.FIRST_STAGE_DEPTH)
    # 16 stacked convs accumulate f32 ordering noise (oneDNN vs XLA);
    # activations are O(100), so atol 5e-3 is ~1 part in 3e4.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


@pytest.mark.slow
def test_second_stage_parity_full():
    rng = np.random.default_rng(4)
    params = _randomize_bn(
        _np(iv2.init_second_stage_params(jax.random.PRNGKey(0))), rng
    )
    rois = rng.normal(0, 1, (3, 7, 7, iv2.FIRST_STAGE_DEPTH)).astype(np.float32)
    got = np.asarray(iv2.second_stage(params, jnp.asarray(rois), jnp.float32))
    want = tf_second_stage(params, tf.constant(rois)).numpy()
    assert got.shape == want.shape == (3, 4, 4, iv2.SECOND_STAGE_DEPTH)
    # Merged-branch 1x1 convs reassociate float sums vs the per-branch
    # tf.nn reconstruction; 2e-3 on O(100) activations is ~1e-5 relative.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_second_stage_remat_exact(monkeypatch):
    """CAP2DET_SECOND_STAGE_REMAT=1 (jax.checkpoint per Mixed_5 block)
    must be value- AND gradient-identical to the base path — remat only
    changes what is saved vs recomputed."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    params = iv2.init_second_stage_params(jax.random.PRNGKey(0))
    rois = rng.randn(3, 7, 7, iv2.FIRST_STAGE_DEPTH).astype(np.float32)
    g = rng.randn(3, 4, 4, iv2.SECOND_STAGE_DEPTH).astype(np.float32)

    def loss(p):
        out = iv2.second_stage(p, jnp.asarray(rois), jnp.float32)
        return jnp.sum(out * g)

    base_val, base_grad = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("CAP2DET_SECOND_STAGE_REMAT", "1")
    remat_val, remat_grad = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(base_val), float(remat_val), rtol=1e-6)
    flat_b = jax.tree_util.tree_leaves(base_grad)
    flat_r = jax.tree_util.tree_leaves(remat_grad)
    for b, r in zip(flat_b, flat_r):
        np.testing.assert_allclose(np.asarray(b), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
