"""Image operations: resizers, integral images, Gaussian filtering.

jnp equivalents of the reference core/imgproc.py:
  * resize_image_to_size / _to_max_dimension / _to_min_dimension
    (:193-353) — bilinear via jax.image.resize; the dynamic-shape variants
    return the static target computed host-side, since XLA needs static
    output shapes (the input pipeline picks canvas buckets instead of free
    dynamic sizes, see data/pipeline.py).
  * calc_integral_image / calc_cumsum_2d (:99-151) — cumulative sums and
    box-sum queries.
  * gaussian kernel + separable blur (:14-28, OpenCV getGaussianKernel
    semantics for the default sigma).

Edge-boxes proposal generation stays a host-side offline tool (the
reference wraps cv2.ximgproc in tf.py_func, :31-67 — never in the jitted
path); the native selective-search (native/selective_search.cc) is this
framework's proposal source.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_image_to_size(image, new_height, new_width, method="bilinear"):
    """Resizes [H, W, C] to a static size. Returns (image, shape[3])."""
    # antialias=False: TF1 resize_bilinear is a plain 2-tap kernel; the
    # jax.image default widens the kernel on downscale and would diverge
    # from the reference on every downscaled pixel.
    out = jax.image.resize(
        image.astype(jnp.float32),
        (new_height, new_width, image.shape[-1]),
        method=method,
        antialias=False,
    )
    return out, jnp.array([new_height, new_width, image.shape[-1]], jnp.int32)


def compute_new_size_min_dimension(height, width, min_dimension):
    """Target size so min(h', w') == min_dimension (reference :330-345)."""
    scale = float(min_dimension) / min(height, width)
    return int(round(height * scale)), int(round(width * scale))


def compute_new_size_max_dimension(height, width, max_dimension):
    """Target size so max(h', w') == max_dimension (reference :258-271)."""
    scale = float(max_dimension) / max(height, width)
    return int(round(height * scale)), int(round(width * scale))


def resize_image_to_min_dimension(image, min_dimension):
    """Static-shape variant: shapes must be known at trace time."""
    h, w = image.shape[:2]
    nh, nw = compute_new_size_min_dimension(h, w, min_dimension)
    return resize_image_to_size(image, nh, nw)


def resize_image_to_max_dimension(image, max_dimension, pad_to_max=False):
    h, w = image.shape[:2]
    nh, nw = compute_new_size_max_dimension(h, w, max_dimension)
    out, shape = resize_image_to_size(image, nh, nw)
    if pad_to_max:
        out = jnp.pad(
            out, ((0, max_dimension - nh), (0, max_dimension - nw), (0, 0))
        )
    return out, shape


def calc_integral_image(image):
    """[..., H, W] -> [..., H+1, W+1] integral image (zero row/col first)."""
    s = jnp.cumsum(jnp.cumsum(image, axis=-2), axis=-1)
    s = jnp.pad(s, [(0, 0)] * (image.ndim - 2) + [(1, 0), (1, 0)])
    return s


def calc_cumsum_2d(image, boxes):
    """Box sums via the integral image.

    Args:
      image: [batch, H, W] values.
      boxes: [batch, N, 4] integer [ymin, xmin, ymax, xmax] (exclusive
        max, pixel units).

    Returns:
      [batch, N] sums over each box.
    """
    integral = calc_integral_image(image)  # [B, H+1, W+1]
    ymin, xmin, ymax, xmax = jnp.moveaxis(boxes, -1, 0)

    def gather(img, ys, xs):
        return img[ys, xs]

    g = jax.vmap(gather)
    return (
        g(integral, ymax, xmax)
        - g(integral, ymin, xmax)
        - g(integral, ymax, xmin)
        + g(integral, ymin, xmin)
    )


_OPENCV_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_kernel(ksize, sigma=-1.0):
    """1-D Gaussian kernel matching OpenCV getGaussianKernel: for
    sigma<=0, small odd sizes use OpenCV's fixed binomial tables, larger
    sizes the formula sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0 and ksize in _OPENCV_SMALL_GAUSSIAN:
        return jnp.asarray(_OPENCV_SMALL_GAUSSIAN[ksize], jnp.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return jnp.asarray(k / k.sum(), jnp.float32)


def gaussian_filter(image, ksize=3, sigma=-1.0):
    """Separable Gaussian blur over [..., H, W] (reference :14-28)."""
    k = gaussian_kernel(ksize, sigma)
    pad = ksize // 2
    lead = image.shape[:-2]
    h, w = image.shape[-2:]
    x = image.reshape((-1, h, w))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    rows = sum(
        xp[:, i : i + h, :] * k[i] for i in range(ksize)
    )
    rp = jnp.pad(rows, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    out = sum(rp[:, :, j : j + w] * k[j] for j in range(ksize))
    return out.reshape(lead + (h, w))
