"""ROI feature cropping with TF ``crop_and_resize`` semantics, TPU-style.

The reference crops proposal features with tf.image.crop_and_resize
(models/utils.py:151-155): normalized boxes, bilinear sampling at
``y = y1*(H-1) + i*(y2-y1)*(H-1)/(S-1)``, extrapolation value 0 outside
the feature map.

Instead of per-point gathers (slow on TPU), the bilinear interpolation is
expressed as two small matmuls with sparse interpolation-weight matrices:

    tmp[p,i,w,c] = sum_h W_y[p,i,h] * F[h,w,c]
    out[p,i,j,c] = sum_w W_x[p,j,w] * tmp[p,i,w,c]

where W_y[p,i,h] = relu(1 - |in_y(p,i) - h|) — exactly the two-tap
bilinear weights — so the whole crop runs on the MXU. The fused
crop+maxpool Pallas kernel (kernels/roi_pool.py) shares this math.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def interpolation_weights(starts, ends, crop_size, image_size):
    """Bilinear sampling weight matrix.

    Args:
      starts, ends: [...] normalized start/end coordinates per box.
      crop_size: S, number of samples.
      image_size: H, source extent in pixels.

    Returns:
      [..., S, H] weights. Sample points outside [0, H-1] get all-zero
      rows (TF extrapolation_value=0).
    """
    h_max = image_size - 1
    if crop_size > 1:
        i = jnp.arange(crop_size, dtype=jnp.float32)
        coords = (
            starts[..., None] * h_max
            + i * (ends[..., None] - starts[..., None]) * h_max / (crop_size - 1)
        )
    else:
        coords = (starts[..., None] + ends[..., None]) * 0.5 * h_max
        coords = jnp.broadcast_to(coords, starts.shape + (crop_size,))
    grid = jnp.arange(image_size, dtype=jnp.float32)
    weights = jax.nn.relu(1.0 - jnp.abs(coords[..., None] - grid))
    inside = (coords >= 0.0) & (coords <= h_max)
    return weights * inside[..., None].astype(weights.dtype)


def crop_and_resize(features, boxes, crop_size):
    """TF-compatible bilinear ROI crop.

    Args:
      features: [B, H, W, C] float feature map.
      boxes: [B, P, 4] normalized [ymin, xmin, ymax, xmax].
      crop_size: output side S.

    Returns:
      [B, P, S, S, C] cropped features.
    """
    _, height, width, _ = features.shape
    y1, x1, y2, x2 = jnp.moveaxis(boxes, -1, 0)
    wy = interpolation_weights(y1, y2, crop_size, height)  # [B, P, S, H]
    wx = interpolation_weights(x1, x2, crop_size, width)  # [B, P, S, W]
    dtype = features.dtype
    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    # Row interpolation then column interpolation, both on the MXU.
    tmp = jnp.einsum("bpih,bhwc->bpiwc", wy, features)
    out = jnp.einsum("bpjw,bpiwc->bpijc", wx, tmp)
    return out


def max_pool_2d(x, kernel, stride):
    """Max pool over the two spatial dims of [..., H, W, C] (VALID).

    Shifted-strided-slice formulation (differentiable everywhere, fuses
    into neighbors; lax.reduce_window lacks a linearization rule under jit
    on this platform).
    """
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x4 = x.reshape((-1, h, w, c))
    n = x4.shape[0]
    out_h = (h - kernel) // stride + 1
    out_w = (w - kernel) // stride + 1
    acc = None
    for i in range(kernel):
        for j in range(kernel):
            view = jax.lax.slice(
                x4,
                (0, i, j, 0),
                (n, i + (out_h - 1) * stride + 1, j + (out_w - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            acc = view if acc is None else jnp.maximum(acc, view)
    return acc.reshape(lead + (out_h, out_w, c))


def crop_resize_maxpool(features, boxes, crop_size, pool_kernel, pool_stride):
    """Fused crop_and_resize + max-pool (reference models/utils.py:151-160).

    Returns [B, P, S', S', C] where S' = (S - pool_kernel)//pool_stride + 1.
    """
    cropped = crop_and_resize(features, boxes, crop_size)
    return max_pool_2d(cropped, pool_kernel, pool_stride)
