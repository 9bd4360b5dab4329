"""Fused ROI crop_and_resize + max-pool as a Pallas TPU kernel.

The hot op of the model (reference models/utils.py:151-160): crop S x S
bilinear patches for B*P proposals from the stride-16 feature map, then
2x2 max-pool. The XLA einsum formulation (ops/roi.py) materializes a
[B, P, S, W, C] intermediate (~1.5 GB at paper scale) — pure HBM traffic.

This kernel exploits the 2-sparse structure of bilinear weights instead:
per sample row only two feature rows are touched, so the crop is a pair
of dynamic-sliced row lerps out of a VMEM-resident feature block.

  grid = (B, C/CB, P); the [H, W, CB] feature block's index map is
  constant in P, so Pallas keeps it resident across all proposals of an
  image; per program the kernel computes the S x S crop in VMEM scratch
  and writes the pooled [S', S', CB] tile.

HBM traffic drops to one read of the feature map per image per C-block
plus the pooled outputs — speed-of-light for this op.

The backward kernel recomputes the crop (cheap), routes the pooled
gradient through the max mask, and accumulates dF in float32 across the
P grid axis (dF block index also constant in P: accumulate in VMEM,
write back once). Proposal boxes receive no gradient — they are data
(the reference's proposals come straight from the reader).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_coords(start, end, crop_size, extent):
    """TF crop_and_resize sampling positions along one axis.

    Returns (floor index [S], lerp weight [S], in-bounds mask [S]) with the
    floor index clamped to [0, extent-2] so idx/idx+1 are always valid
    (weights absorb the boundary case).
    """
    h_max = extent - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (crop_size, 1), 0)[:, 0].astype(
        jnp.float32
    )
    if crop_size > 1:
        coords = start * h_max + i * (end - start) * h_max / (crop_size - 1)
    else:
        coords = jnp.full((crop_size,), (start + end) * 0.5 * h_max)
    # float32 mask: bool vector elements cannot be read as scalars in the
    # TPU lowering.
    inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
    idx = jnp.clip(jnp.floor(coords), 0, extent - 2).astype(jnp.int32)
    frac = (coords - idx.astype(jnp.float32)) * inside
    return idx, frac, inside


def _fwd_kernel(boxes_ref, feat_ref, out_ref, crop_ref, tmp_ref, *,
                crop_size, pool_kernel, pool_stride):
    height, width, cb = feat_ref.shape[1:]
    p = pl.program_id(2)
    y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))

    y_idx, y_frac, y_in = _sample_coords(y1, y2, crop_size, height)
    x_idx, x_frac, x_in = _sample_coords(x1, x2, crop_size, width)

    # Static unroll: crop_size is small (14) and dynamic vector indexing
    # does not lower on TPU; each iteration uses pl.ds with a traced start.
    # tmp is laid out [W, S, CB] so the x-pass dynamic slice lands on
    # dim 0 (untiled); Mosaic requires sublane-dim dynamic slices to be
    # 8-aligned, which interpolation offsets are not.
    for i in range(crop_size):
        rows = feat_ref[0, pl.ds(y_idx[i], 2), :, :].astype(jnp.float32)
        w = y_in[i]
        tmp_ref[:, i, :] = (
            rows[0] * ((1.0 - y_frac[i]) * w) + rows[1] * (y_frac[i] * w)
        )

    for j in range(crop_size):
        cols = tmp_ref[pl.ds(x_idx[j], 2), :, :]
        w = x_in[j]
        crop_ref[:, j, :] = (
            cols[0] * ((1.0 - x_frac[j]) * w) + cols[1] * (x_frac[j] * w)
        )

    pooled_size = (crop_size - pool_kernel) // pool_stride + 1
    crop = crop_ref[...]
    windows = crop.reshape(pooled_size, pool_kernel, pooled_size, pool_kernel, cb)
    out_ref[0, 0, :, :, :] = jnp.max(windows, axis=(1, 3)).astype(out_ref.dtype)


def _interp_matrix(start, end, crop_size, extent):
    """Dense [crop_size, extent] bilinear interpolation matrix.

    Row i holds the two-tap lerp weights of `_sample_coords` at positions
    idx[i] and idx[i]+1 — crop = W_y @ F @ W_x^T. Built with pure vector
    ops (iota + compares): no scalar reads of vectors, no dynamic slices.
    """
    h_max = extent - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (crop_size, extent), 0).astype(
        jnp.float32
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (crop_size, extent), 1).astype(
        jnp.float32
    )
    if crop_size > 1:
        coords = start * h_max + i * (end - start) * h_max / (crop_size - 1)
    else:
        coords = (start + end) * 0.5 * h_max + i * 0.0
    inside = ((coords >= 0.0) & (coords <= h_max)).astype(jnp.float32)
    idx = jnp.clip(jnp.floor(coords), 0, extent - 2)
    frac = (coords - idx) * inside
    return inside * (
        (1.0 - frac) * (pos == idx).astype(jnp.float32)
        + frac * (pos == idx + 1).astype(jnp.float32)
    )


def _bwd_kernel(boxes_ref, feat_ref, grad_ref, dfeat_ref, crop_ref, tmp_ref,
                *, crop_size, pool_kernel, pool_stride):
    """Backward: interp-matrix matmul for the x-scatter, sparse rows for dF.

    The x-direction bilinear scatter is one small matmul landing directly
    in dtmp's [W, S, CB] layout with no transposes:
      dtmp[w, sy, c] = sum_j Wx[j, w] * dcrop[sy, j, c]
                     = dot_general(Wx, dcrop; contract Wx.0 with dcrop.1)
    which replaces a full dtmp zero + 14 dynamic-slice accumulations. The
    y-direction stays a sparse 2-row scatter: a dense Wy^T matmul would
    read-modify-write the whole [H, W, CB] dfeat block per proposal
    (measured no faster than the original all-scatter kernel).
    """
    height, width, cb = feat_ref.shape[1:]
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    y1, x1, y2, x2 = (boxes_ref[0, k, p] for k in range(4))
    y_idx, y_frac, y_in = _sample_coords(y1, y2, crop_size, height)
    x_idx, x_frac, x_in = _sample_coords(x1, x2, crop_size, width)

    # Recompute the crop (same as forward; tmp laid out [W, S, CB]).
    for i in range(crop_size):
        rows = feat_ref[0, pl.ds(y_idx[i], 2), :, :].astype(jnp.float32)
        w = y_in[i]
        tmp_ref[:, i, :] = (
            rows[0] * ((1.0 - y_frac[i]) * w) + rows[1] * (y_frac[i] * w)
        )

    for j in range(crop_size):
        cols = tmp_ref[pl.ds(x_idx[j], 2), :, :]
        w = x_in[j]
        crop_ref[:, j, :] = (
            cols[0] * ((1.0 - x_frac[j]) * w) + cols[1] * (x_frac[j] * w)
        )

    # Route pooled gradient to the FIRST max only (TF MaxPoolGrad
    # semantics). A plain `windows >= maxima` mask sends the full
    # gradient to every tied element — and ties are common (post-ReLU
    # zeros, degenerate boxes), inflating dF by up to pool_kernel^2.
    pooled_size = (crop_size - pool_kernel) // pool_stride + 1
    crop = crop_ref[...]
    windows = crop.reshape(pooled_size, pool_kernel, pooled_size, pool_kernel, cb)
    maxima = jnp.max(windows, axis=(1, 3))  # [ps, ps, cb]
    g = grad_ref[0, 0, :, :, :].astype(jnp.float32)
    taken = jnp.zeros_like(maxima, dtype=jnp.float32)
    pieces = {}
    for ky in range(pool_kernel):
        for kx in range(pool_kernel):
            hit = (
                (windows[:, ky, :, kx, :] >= maxima).astype(jnp.float32)
                * (1.0 - taken)
            )
            pieces[(ky, kx)] = g * hit
            taken = jnp.maximum(taken, hit)
    dwindows = jnp.stack(
        [
            jnp.stack([pieces[(ky, kx)] for kx in range(pool_kernel)], axis=2)
            for ky in range(pool_kernel)
        ],
        axis=1,
    )  # [ps, k, ps, k, cb]
    dcrop = dwindows.reshape(crop_size, crop_size, cb)

    wx = _interp_matrix(x1, x2, crop_size, width)  # [S, W]

    dtmp = jax.lax.dot_general(
        wx, dcrop,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [W, S, CB]

    # dF: scatter dtmp rows back through the y-lerp. Sparse 2-row updates
    # beat a dense Wy^T matmul here: the latter read-modify-writes the
    # whole [H, W, CB] dfeat block per proposal (measured no faster than
    # the original all-scatter kernel).
    for i in range(crop_size):
        w = y_in[i]
        row = dtmp[:, i, :]  # [W, CB]
        contrib = jnp.stack(
            [row * ((1.0 - y_frac[i]) * w), row * (y_frac[i] * w)], axis=0
        )  # [2, W, CB]
        dfeat_ref[0, pl.ds(y_idx[i], 2), :, :] += contrib


def _pad_channels(x, cb):
    """Pads the channel axis to a multiple of the block size (Mosaic
    requires lane-dim blocks to be multiples of 128 or the full axis)."""
    channels = x.shape[-1]
    pad = (-channels) % cb
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _forward(features, boxes, crop_size, pool_kernel, pool_stride,
             channel_block, interpret):
    if features.shape[1] < 2 or features.shape[2] < 2:
        # _sample_coords clamps to [0, extent-2]; extent 1 would produce
        # a -1 dynamic-slice start (out-of-bounds read). Fail loudly —
        # a <2-cell feature map means the image was under 32px a side.
        raise ValueError(
            "roi_crop_maxpool needs a feature map of at least 2x2; got %s"
            % (features.shape,)
        )
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block)
    batch, height, width, channels = features.shape
    num_p = boxes.shape[1]
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1

    grid = (batch, channels // cb, num_p)
    kernel = functools.partial(
        _fwd_kernel,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_p, pooled, pooled, channels), features.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((crop_size, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), features)[..., :orig_channels]


def _backward(features, boxes, grad, crop_size, pool_kernel, pool_stride,
              channel_block, interpret):
    orig_channels = features.shape[-1]
    features = _pad_channels(features, channel_block)
    grad = _pad_channels(grad, channel_block)
    batch, height, width, channels = features.shape
    num_p = boxes.shape[1]
    cb = channel_block
    pooled = (crop_size - pool_kernel) // pool_stride + 1

    grid = (batch, channels // cb, num_p)
    kernel = functools.partial(
        _bwd_kernel,
        crop_size=crop_size,
        pool_kernel=pool_kernel,
        pool_stride=pool_stride,
    )
    dfeat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, num_p), lambda b, c, p: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, height, width, cb), lambda b, c, p: (b, 0, 0, c)),
            pl.BlockSpec(
                (1, 1, pooled, pooled, cb), lambda b, c, p: (b, p, 0, 0, c)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, height, width, cb), lambda b, c, p: (b, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, height, width, channels), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((crop_size, crop_size, cb), jnp.float32),
            pltpu.VMEM((width, crop_size, cb), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.transpose(boxes, (0, 2, 1)), features, grad)
    return dfeat[..., :orig_channels].astype(features.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def roi_crop_maxpool(features, boxes, crop_size, pool_kernel=2,
                     pool_stride=2, channel_block=128, interpret=False):
    """Fused TF-semantics crop_and_resize + max-pool.

    Args:
      features: [B, H, W, C] feature map.
      boxes: [B, P, 4] normalized [ymin, xmin, ymax, xmax].
      crop_size: S (pre-pool crop side).

    Returns:
      [B, P, S', S', C] pooled crops, S' = (S - pool_kernel)//pool_stride + 1.
    """
    return _forward(
        features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
        interpret,
    )


def _fwd(features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
         interpret):
    out = _forward(
        features, boxes, crop_size, pool_kernel, pool_stride, channel_block,
        interpret,
    )
    return out, (features, boxes)


def _bwd(crop_size, pool_kernel, pool_stride, channel_block, interpret,
         residuals, grad):
    features, boxes = residuals
    dfeat = _backward(
        features, boxes, grad, crop_size, pool_kernel, pool_stride,
        channel_block, interpret,
    )
    return dfeat, None  # proposals are data: no box gradient


roi_crop_maxpool.defvjp(_fwd, _bwd)
