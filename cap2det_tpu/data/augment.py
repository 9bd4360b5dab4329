"""Photometric + crop augmentations (host-side numpy).

Implements the reference's full augmentation set (core/preprocess.py):
the v2 path used by the detection reader returns the flip decision so
boxes stay consistent (:56-78, handled inside data/pipeline.py); the v1
photometric path (:81-148) — brightness, contrast, hue, saturation,
random crop — is reproduced here with tf.image-compatible semantics.

The reference's cap2det reader never calls the v1 chain
(readers/cap2det_reader.py:91 only uses the flip-only v2 path), so the
detection pipeline REFUSES photometric knobs unless the non-reference
`enable_photometric_augmentation` opt-in is set (see data/pipeline.py and
the README deviation table).

Note the reference applies the v1 crop without adjusting boxes, so like
there, the crop is only sound for image-level training.
"""

from __future__ import annotations

import numpy as np


def has_photometric(options):
    """True when any v1 photometric probability is nonzero."""
    if options is None:
        return False
    return any(
        getattr(options, name) > 0
        for name in (
            "random_brightness_prob",
            "random_contrast_prob",
            "random_hue_prob",
            "random_saturation_prob",
        )
    )


def random_brightness(image, max_delta, rng):
    """tf.image.random_brightness on uint8: add delta*255."""
    delta = rng.uniform(-max_delta, max_delta)
    return np.clip(image.astype(np.float32) + delta * 255.0, 0, 255).astype(
        np.uint8
    )


def random_contrast(image, lower, upper, rng):
    factor = rng.uniform(lower, upper)
    x = image.astype(np.float32)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return np.clip((x - mean) * factor + mean, 0, 255).astype(np.uint8)


def _rgb_to_hsv(x):
    import cv2

    return cv2.cvtColor(x, cv2.COLOR_RGB2HSV)


def _hsv_to_rgb(x):
    import cv2

    return cv2.cvtColor(x, cv2.COLOR_HSV2RGB)


def random_hue(image, max_delta, rng):
    """tf.image.random_hue: rotate hue by delta (fraction of the wheel)."""
    delta = rng.uniform(-max_delta, max_delta)
    hsv = _rgb_to_hsv(image)
    # OpenCV uint8 hue range is [0, 180).
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(delta * 180)) % 180
    return _hsv_to_rgb(hsv)


def random_saturation(image, lower, upper, rng):
    factor = rng.uniform(lower, upper)
    hsv = _rgb_to_hsv(image).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * factor, 0, 255)
    return _hsv_to_rgb(hsv.astype(np.uint8))


def random_crop(image, min_scale, rng):
    """Crops to a random window with sides >= min_scale of the original
    (reference core/preprocess.py:10-39)."""
    h, w = image.shape[:2]
    min_h = int(round(h * min_scale))
    min_w = int(round(w * min_scale))
    target_h = rng.randint(min_h, h + 1)
    target_w = rng.randint(min_w, w + 1)
    off_h = rng.randint(0, h + 1 - target_h)
    off_w = rng.randint(0, w + 1 - target_w)
    return image[off_h : off_h + target_h, off_w : off_w + target_w]


def apply_photometric(image, options, rng):
    """Applies the v1 augmentation chain per config probabilities
    (flip and crop excluded — handled with box consistency elsewhere)."""
    if options is None:
        return image
    if options.random_brightness_prob > 0 and rng.random() < options.random_brightness_prob:
        image = random_brightness(image, options.random_brightness_max_delta, _np_rng(rng))
    if options.random_contrast_prob > 0 and rng.random() < options.random_contrast_prob:
        image = random_contrast(
            image, options.random_contrast_lower, options.random_contrast_upper,
            _np_rng(rng),
        )
    if options.random_hue_prob > 0 and rng.random() < options.random_hue_prob:
        image = random_hue(image, options.random_hue_max_delta, _np_rng(rng))
    if options.random_saturation_prob > 0 and rng.random() < options.random_saturation_prob:
        image = random_saturation(
            image, options.random_saturation_lower,
            options.random_saturation_upper, _np_rng(rng),
        )
    return image


def _np_rng(py_rng):
    return np.random.RandomState(py_rng.randrange(1 << 31))
