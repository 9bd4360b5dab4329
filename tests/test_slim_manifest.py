"""Golden manifest of the published TF-slim InceptionV2 ImageNet checkpoint.

The reference warm-starts both FRCNN stages from
``inception_v2_2016_08_28/inception_v2.ckpt`` (models/utils.py:181-186).
This test pins the repo's parameter tree against the PUBLISHED variable
name -> shape manifest of that checkpoint (the subset the FRCNN feature
extractor consumes: stem + Mixed_3b..Mixed_5c; the classification head
Conv2d_1c_1x1/Logits is not warm-started). The table below is hardcoded
from the published slim ``nets/inception_v2.py`` architecture — it is
deliberately NOT derived from ``cap2det_tpu.models.inception_v2``'s spec
tables, so a systematic width/branch divergence there fails here.

Slim conventions encoded in the expansion: conv variables are
``weights [kh,kw,cin,cout]`` (separable stem: ``depthwise_weights
[7,7,3,8]`` + ``pointwise_weights [1,1,24,64]``) and BatchNorm carries
``beta/moving_mean/moving_variance [cout]`` only (inception_v2_arg_scope
uses scale=False -> no gamma; conv biases are replaced by BN).
"""

import numpy as np

from cap2det_tpu.models import frcnn, inception_v2 as iv2
from cap2det_tpu.config import schema
import jax

# Per block: branch index -> list of (conv_name, kernel, cin, cout).
# Pool-only branches are omitted (no variables). Hand-transcribed from the
# published slim inception_v2_base; output widths: Mixed_3b 256, 3c 320,
# 4a/4b/4c/4d/4e 576, 5a/5b/5c 1024.
_MIXED = {
    "Mixed_3b": {
        0: [("Conv2d_0a_1x1", 1, 192, 64)],
        1: [("Conv2d_0a_1x1", 1, 192, 64), ("Conv2d_0b_3x3", 3, 64, 64)],
        2: [("Conv2d_0a_1x1", 1, 192, 64), ("Conv2d_0b_3x3", 3, 64, 96),
            ("Conv2d_0c_3x3", 3, 96, 96)],
        3: [("Conv2d_0b_1x1", 1, 192, 32)],
    },
    "Mixed_3c": {
        0: [("Conv2d_0a_1x1", 1, 256, 64)],
        1: [("Conv2d_0a_1x1", 1, 256, 64), ("Conv2d_0b_3x3", 3, 64, 96)],
        2: [("Conv2d_0a_1x1", 1, 256, 64), ("Conv2d_0b_3x3", 3, 64, 96),
            ("Conv2d_0c_3x3", 3, 96, 96)],
        3: [("Conv2d_0b_1x1", 1, 256, 64)],
    },
    "Mixed_4a": {
        0: [("Conv2d_0a_1x1", 1, 320, 128), ("Conv2d_1a_3x3", 3, 128, 160)],
        1: [("Conv2d_0a_1x1", 1, 320, 64), ("Conv2d_0b_3x3", 3, 64, 96),
            ("Conv2d_1a_3x3", 3, 96, 96)],
    },
    "Mixed_4b": {
        0: [("Conv2d_0a_1x1", 1, 576, 224)],
        1: [("Conv2d_0a_1x1", 1, 576, 64), ("Conv2d_0b_3x3", 3, 64, 96)],
        2: [("Conv2d_0a_1x1", 1, 576, 96), ("Conv2d_0b_3x3", 3, 96, 128),
            ("Conv2d_0c_3x3", 3, 128, 128)],
        3: [("Conv2d_0b_1x1", 1, 576, 128)],
    },
    "Mixed_4c": {
        0: [("Conv2d_0a_1x1", 1, 576, 192)],
        1: [("Conv2d_0a_1x1", 1, 576, 96), ("Conv2d_0b_3x3", 3, 96, 128)],
        2: [("Conv2d_0a_1x1", 1, 576, 96), ("Conv2d_0b_3x3", 3, 96, 128),
            ("Conv2d_0c_3x3", 3, 128, 128)],
        3: [("Conv2d_0b_1x1", 1, 576, 128)],
    },
    "Mixed_4d": {
        0: [("Conv2d_0a_1x1", 1, 576, 160)],
        1: [("Conv2d_0a_1x1", 1, 576, 128), ("Conv2d_0b_3x3", 3, 128, 160)],
        2: [("Conv2d_0a_1x1", 1, 576, 128), ("Conv2d_0b_3x3", 3, 128, 160),
            ("Conv2d_0c_3x3", 3, 160, 160)],
        3: [("Conv2d_0b_1x1", 1, 576, 96)],
    },
    "Mixed_4e": {
        0: [("Conv2d_0a_1x1", 1, 576, 96)],
        1: [("Conv2d_0a_1x1", 1, 576, 128), ("Conv2d_0b_3x3", 3, 128, 192)],
        2: [("Conv2d_0a_1x1", 1, 576, 160), ("Conv2d_0b_3x3", 3, 160, 192),
            ("Conv2d_0c_3x3", 3, 192, 192)],
        3: [("Conv2d_0b_1x1", 1, 576, 96)],
    },
    "Mixed_5a": {
        0: [("Conv2d_0a_1x1", 1, 576, 128), ("Conv2d_1a_3x3", 3, 128, 192)],
        1: [("Conv2d_0a_1x1", 1, 576, 192), ("Conv2d_0b_3x3", 3, 192, 256),
            ("Conv2d_1a_3x3", 3, 256, 256)],
    },
    "Mixed_5b": {
        0: [("Conv2d_0a_1x1", 1, 1024, 352)],
        1: [("Conv2d_0a_1x1", 1, 1024, 192), ("Conv2d_0b_3x3", 3, 192, 320)],
        2: [("Conv2d_0a_1x1", 1, 1024, 160), ("Conv2d_0b_3x3", 3, 160, 224),
            ("Conv2d_0c_3x3", 3, 224, 224)],
        3: [("Conv2d_0b_1x1", 1, 1024, 128)],
    },
    "Mixed_5c": {
        0: [("Conv2d_0a_1x1", 1, 1024, 352)],
        1: [("Conv2d_0a_1x1", 1, 1024, 192), ("Conv2d_0b_3x3", 3, 192, 320)],
        2: [("Conv2d_0a_1x1", 1, 1024, 192), ("Conv2d_0b_3x3", 3, 192, 224),
            ("Conv2d_0c_3x3", 3, 224, 224)],
        3: [("Conv2d_0b_1x1", 1, 1024, 128)],
    },
}

FIRST_STAGE_BLOCKS = ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b",
                      "Mixed_4c", "Mixed_4d", "Mixed_4e"]
SECOND_STAGE_BLOCKS = ["Mixed_5a", "Mixed_5b", "Mixed_5c"]


def _bn(prefix, cout, out):
    for leaf in ("beta", "moving_mean", "moving_variance"):
        out["%s/BatchNorm/%s" % (prefix, leaf)] = (cout,)


def slim_manifest(blocks):
    """Expands the table into {variable_name: shape} for given blocks."""
    out = {}
    if blocks is FIRST_STAGE_BLOCKS or "Mixed_3b" in blocks:
        out["InceptionV2/Conv2d_1a_7x7/depthwise_weights"] = (7, 7, 3, 8)
        out["InceptionV2/Conv2d_1a_7x7/pointwise_weights"] = (1, 1, 24, 64)
        _bn("InceptionV2/Conv2d_1a_7x7", 64, out)
        out["InceptionV2/Conv2d_2b_1x1/weights"] = (1, 1, 64, 64)
        _bn("InceptionV2/Conv2d_2b_1x1", 64, out)
        out["InceptionV2/Conv2d_2c_3x3/weights"] = (3, 3, 64, 192)
        _bn("InceptionV2/Conv2d_2c_3x3", 192, out)
    for block in blocks:
        for branch, convs in _MIXED[block].items():
            for name, k, cin, cout in convs:
                prefix = "InceptionV2/%s/Branch_%d/%s" % (block, branch, name)
                out[prefix + "/weights"] = (k, k, cin, cout)
                _bn(prefix, cout, out)
    return out


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = prefix + "/" + key if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = tuple(value.shape)
    return out


def test_first_stage_matches_published_manifest():
    params = iv2.init_first_stage_params(jax.random.PRNGKey(0))
    got = _flatten(params)
    want = slim_manifest(FIRST_STAGE_BLOCKS)
    assert sorted(got) == sorted(want), (
        set(got) ^ set(want) or "name sets equal"
    )
    for name in want:
        assert got[name] == want[name], (name, got[name], want[name])


def test_second_stage_matches_published_manifest():
    params = iv2.init_second_stage_params(jax.random.PRNGKey(0))
    got = _flatten(params)
    want = slim_manifest(SECOND_STAGE_BLOCKS)
    assert sorted(got) == sorted(want), set(got) ^ set(want)
    for name in want:
        assert got[name] == want[name], (name, got[name], want[name])


def test_converter_consumes_every_manifest_variable():
    """A checkpoint with EXACTLY the published variable set must overlay
    every backbone leaf (models/utils.py:181-186 parity): fills each
    manifest tensor with a sentinel and asserts no init value survives."""
    import sys, os

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools"),
    )
    import convert_tf_checkpoint as converter

    manifest = slim_manifest(FIRST_STAGE_BLOCKS + SECOND_STAGE_BLOCKS)
    sentinel = 7.25
    variables = {
        name: np.full(shape, sentinel, np.float32)
        for name, shape in manifest.items()
    }
    tree = converter.variables_to_tree(variables)

    options = schema.FRCNN.from_dict(
        {"feature_extractor": {"type": "faster_rcnn_inception_v2"}}
    )
    params = frcnn.init_params(jax.random.PRNGKey(0), options)
    loaded = frcnn.load_pretrained(params, tree)
    leaves = jax.tree.leaves(loaded)
    assert leaves, "empty param tree"
    for leaf in leaves:
        np.testing.assert_array_equal(np.asarray(leaf), sentinel)
