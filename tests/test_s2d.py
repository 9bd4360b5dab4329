"""Host-side space-to-depth stem path.

The trainer ships [B, H/2, W/2, 12] f16 canvases (cap2det.device_batch)
and the stem runs the exact stride-1 regrouped conv
(inception_v2._s2d_pack_weights) — reformulation of the stride-2 SAME
sep-conv, so the packed path must match the raw path to numerical noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cap2det_tpu.models import inception_v2


def _params():
    return inception_v2.init_first_stage_params(jax.random.PRNGKey(0))


def test_space_to_depth_packing_matches_device_batch_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, (2, 8, 12, 3)).astype(np.float32)
    jnp_packed = np.asarray(inception_v2.space_to_depth(jnp.asarray(x)))
    b, h, w, c = x.shape
    np_packed = np.ascontiguousarray(
        x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    ).reshape(b, h // 2, w // 2, 4 * c)
    np.testing.assert_array_equal(jnp_packed, np_packed)


def test_first_stage_packed_matches_raw():
    params = _params()
    rng = np.random.RandomState(1)
    images = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    pre = inception_v2.preprocess(jnp.asarray(images))

    raw = inception_v2.first_stage(params, pre, compute_dtype=jnp.float32)
    packed = inception_v2.first_stage(
        params, inception_v2.space_to_depth(pre), compute_dtype=jnp.float32
    )
    assert raw.shape == packed.shape
    # The packed stem lowers to a differently-shaped conv, so XLA
    # accumulates in a different order; through 10+ conv layers that
    # drifts to ~1e-4 absolute. The exact-reformulation guarantee is
    # pinned by test_s2d_conv_reference_matches_dense_stride2 (single
    # conv, 1e-5); this asserts the end-to-end wiring.
    np.testing.assert_allclose(
        np.asarray(raw), np.asarray(packed), rtol=5e-2, atol=1e-3
    )


def test_s2d_conv_reference_matches_dense_stride2():
    """_s2d_pack_weights golden: packed stride-1 conv == stride-2 SAME."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 20, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32))

    dense = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    packed = inception_v2._space_to_depth_conv(x, w, 2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(packed), rtol=1e-5, atol=1e-5
    )


def test_device_batch_packs_even_canvases_only():
    from cap2det_tpu.fields import InputFields
    from cap2det_tpu.models.cap2det import Cap2DetModel

    class _Stub(Cap2DetModel):
        def __init__(self):
            pass  # device_batch needs no config

    rng = np.random.RandomState(3)
    host = {
        InputFields.image: rng.uniform(0, 255, (1, 8, 12, 3)),
        InputFields.proposals: np.zeros((1, 4, 4), np.float32),
        InputFields.num_proposals: np.array([4], np.int32),
        InputFields.pseudo_labels: np.zeros((1, 3), np.float32),
    }
    out = _Stub().device_batch(host)
    assert out["image"].shape == (1, 4, 6, 12)
    assert out["image"].dtype == np.float16
    ref = np.asarray(
        inception_v2.space_to_depth(
            jnp.asarray(host[InputFields.image].astype(np.float16))
        )
    )
    np.testing.assert_array_equal(out["image"], ref)

    host[InputFields.image] = rng.uniform(0, 255, (1, 7, 12, 3))
    out = _Stub().device_batch(host)
    assert out["image"].shape == (1, 7, 12, 3)  # odd height: raw fallback
