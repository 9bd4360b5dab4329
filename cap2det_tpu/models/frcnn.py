"""Fast-RCNN proposal feature extraction (reference models/utils.py:108-188).

Pipeline: preprocess -> first-stage InceptionV2 (full image, stride 16) ->
[optional feature-map dropout] -> ROI crop_and_resize(initial_crop_size)
-> max-pool -> second-stage InceptionV2 over B*P ROIs -> spatial mean ->
dropout -> [batch, max_num_proposals, 1024].

The ImageNet warm start (tf.train.init_from_checkpoint with "/" ->
"first/second_stage_feature_extraction/" maps, models/utils.py:181-186)
is replaced by the offline TF->JAX converter (tools/convert_tf_checkpoint.py)
feeding `load_pretrained`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cap2det_tpu.config import schema
from cap2det_tpu.models import inception_v2
from cap2det_tpu.ops import roi as roi_ops

FIRST_SCOPE = "first_stage_feature_extraction"
SECOND_SCOPE = "second_stage_feature_extraction"


def init_params(rng, options: schema.FRCNN):
    fe_type = options.feature_extractor.type if options.feature_extractor else ""
    if fe_type != "faster_rcnn_inception_v2":
        raise ValueError(
            "unsupported feature extractor %r (faster_rcnn_inception_v2 only)"
            % fe_type
        )
    r1, r2 = jax.random.split(rng)
    return {
        FIRST_SCOPE: inception_v2.init_first_stage_params(r1),
        SECOND_SCOPE: inception_v2.init_second_stage_params(r2),
    }


def _dropout(x, keep_prob, rng):
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0)


def extract_features(
    params,
    images,
    proposals,
    options: schema.FRCNN,
    *,
    is_training=False,
    dropout_rng=None,
    compute_dtype=jnp.bfloat16,
    use_pallas=None,
    second_stage_chunk=None,
):
    """Returns [batch, P, feature_dims] pooled proposal features.

    Args:
      params: {first/second_stage_feature_extraction: inception params}.
      images: [B, H, W, 3] raw pixel values in [0, 255].
      proposals: [B, P, 4] canvas-normalized boxes.
      use_pallas: route the ROI crop+pool through the fused Pallas kernel
        (kernels/roi_pool.py). Default: on when running on TPU.
      second_stage_chunk: optional chunk size for scanning large ROI
        batches through the second stage (large-P regimes); None runs
        all B*P ROIs in one call. Must divide batch*P exactly (chunks
        are lax.map'ed over a static reshape) — raises otherwise.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and (
        options.maxpool_stride != options.maxpool_kernel_size
        or options.initial_crop_size % options.maxpool_kernel_size != 0
    ):
        # The fused kernel pools via a [ps, k, ps, k] reshape, which
        # requires non-overlapping windows that tile the crop; the XLA
        # path handles arbitrary kernel/stride (all shipped configs use
        # 2/2 with even crops, so this is the rare-config fallback).
        use_pallas = False
    batch, num_proposals = proposals.shape[:2]

    # Pixels may arrive f16 (transfer-optimized, models/cap2det.py
    # device_batch); all preprocessing math runs in f32.
    preprocessed = inception_v2.preprocess(images.astype(jnp.float32))
    features = inception_v2.first_stage(
        params[FIRST_SCOPE], preprocessed, compute_dtype=compute_dtype
    )

    if options.dropout_on_feature_map and is_training:
        dropout_rng, rng = jax.random.split(dropout_rng)
        features = _dropout(features, options.dropout_keep_prob, rng)

    if use_pallas:
        from cap2det_tpu.kernels import roi_pool

        rois = roi_pool.roi_crop_maxpool(
            features,
            proposals,
            options.initial_crop_size,
            options.maxpool_kernel_size,
            options.maxpool_stride,
        )  # [B, P, S', S', C]
    else:
        rois = roi_ops.crop_resize_maxpool(
            features,
            proposals,
            crop_size=options.initial_crop_size,
            pool_kernel=options.maxpool_kernel_size,
            pool_stride=options.maxpool_stride,
        )  # [B, P, S', S', C]

    s = rois.shape[2]
    rois = rois.reshape(batch * num_proposals, s, s, rois.shape[-1])
    if (second_stage_chunk and rois.shape[0] > second_stage_chunk
            and rois.shape[0] % second_stage_chunk != 0):
        # Only when chunking would actually engage: a smaller-than-chunk
        # batch legitimately runs unchunked.
        raise ValueError(
            "second_stage_chunk=%d does not divide batch*num_proposals=%d"
            % (second_stage_chunk, rois.shape[0])
        )
    if second_stage_chunk and rois.shape[0] > second_stage_chunk:
        # Large-P regimes (voc07_inc2: 2000 ROIs/image): bound the temp
        # arena by scanning fixed ROI chunks through the box classifier.
        chunks = rois.reshape(
            rois.shape[0] // second_stage_chunk, second_stage_chunk, s, s,
            rois.shape[-1],
        )
        box_features = jax.lax.map(
            lambda r: inception_v2.second_stage(
                params[SECOND_SCOPE], r, compute_dtype=compute_dtype
            ),
            chunks,
        )
        box_features = box_features.reshape(
            batch * num_proposals, *box_features.shape[2:]
        )
    else:
        box_features = inception_v2.second_stage(
            params[SECOND_SCOPE], rois, compute_dtype=compute_dtype
        )
    # Spatial mean in fp32; downstream FC heads and losses run in fp32.
    pooled = box_features.astype(jnp.float32).mean(axis=(1, 2))  # [B*P, 1024]

    if is_training and options.dropout_keep_prob < 1.0:
        pooled = _dropout(pooled, options.dropout_keep_prob, dropout_rng)

    return pooled.reshape(batch, num_proposals, -1)


def load_pretrained(params, converted_checkpoint):
    """Overlays ImageNet InceptionV2 weights onto both stages.

    `converted_checkpoint` is the {'InceptionV2': {...}} tree produced by
    tools/convert_tf_checkpoint.py; first-stage layers take the stem +
    Mixed_3*/4* subtree, second stage takes Mixed_5*.
    """
    src = converted_checkpoint["InceptionV2"]
    out = jax.tree.map(lambda x: x, params)  # shallow copy-by-structure

    def overlay(dst, names):
        for name in names:
            if name in src:
                dst[name] = jax.tree.map(jnp.asarray, src[name])

    first = out[FIRST_SCOPE]["InceptionV2"]
    overlay(
        first,
        ["Conv2d_1a_7x7", "Conv2d_2b_1x1", "Conv2d_2c_3x3", "Mixed_3b",
         "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c", "Mixed_4d",
         "Mixed_4e"],
    )
    second = out[SECOND_SCOPE]["InceptionV2"]
    overlay(second, ["Mixed_5a", "Mixed_5b", "Mixed_5c"])
    return out
