"""second_stage_chunk semantics: exact chunking when it engages, loud
failure on non-divisible sizes, untouched behavior below the threshold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.config import pbtxt, schema
from cap2det_tpu.models import frcnn

_FRCNN_PBTXT = """
frcnn_options {
  feature_extractor { type: 'faster_rcnn_inception_v2' }
  initial_crop_size: 6
  maxpool_kernel_size: 2
  maxpool_stride: 2
  dropout_keep_prob: 1.0
  dropout_on_feature_map: false
}
"""


def _setup(batch=1, num_proposals=8):
    opts = schema.FRCNN.from_dict(pbtxt.parse(_FRCNN_PBTXT)["frcnn_options"])
    params = frcnn.init_params(jax.random.PRNGKey(0), opts)
    rng = np.random.RandomState(0)
    images = rng.uniform(0, 255, (batch, 64, 64, 3)).astype(np.float32)
    y0 = rng.uniform(0, 0.5, (batch, num_proposals))
    x0 = rng.uniform(0, 0.5, (batch, num_proposals))
    props = np.stack(
        [y0, x0, y0 + rng.uniform(0.2, 0.4, (batch, num_proposals)),
         x0 + rng.uniform(0.2, 0.4, (batch, num_proposals))], -1
    ).astype(np.float32)
    return opts, params, jnp.asarray(images), jnp.asarray(props)


def test_chunked_matches_unchunked():
    opts, params, images, props = _setup(num_proposals=8)
    base = frcnn.extract_features(
        params, images, props, opts, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    chunked = frcnn.extract_features(
        params, images, props, opts, compute_dtype=jnp.float32,
        use_pallas=False, second_stage_chunk=4,
    )
    # lax.map lowers the second-stage convs differently from the single
    # call, so XLA reassociates; ~4e-4 absolute on O(1) features.
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(chunked), rtol=1e-3, atol=1e-3
    )


def test_non_divisible_chunk_raises_only_when_engaged():
    opts, params, images, props = _setup(num_proposals=8)
    with pytest.raises(ValueError, match="does not divide"):
        frcnn.extract_features(
            params, images, props, opts, compute_dtype=jnp.float32,
            use_pallas=False, second_stage_chunk=3,
        )
    # Smaller-than-chunk batches run unchunked: no divisibility demand.
    out = frcnn.extract_features(
        params, images, props, opts, compute_dtype=jnp.float32,
        use_pallas=False, second_stage_chunk=500,
    )
    assert out.shape[:2] == (1, 8)
