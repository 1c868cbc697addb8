"""On-device image augmentation (jit/vmap, static shapes).

TPU-first re-design of the reference's host-side PIL pipeline
(``main.py:169-188``): RandomResizedCrop, horizontal flip, color jitter,
random erasing and normalization all run batched on the accelerator.
Dynamic crop sizes are realized as affine bilinear sampling onto a fixed
output grid (no dynamic shapes), and erasing as a traced-box mask --
both jit-safe.

Semantics match torchvision statistically (same sampling distributions);
color jitter applies brightness/contrast/saturation/hue in fixed order
where torchvision randomizes the order (documented divergence -- it
changes no marginal distribution materially).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "random_resized_crop",
    "random_hflip",
    "color_jitter",
    "random_erasing",
    "normalize",
    "make_train_augment",
    "make_eval_transform",
]


def _bilinear_crop(
    img: jnp.ndarray, y0, x0, ch, cw, out_hw: int
) -> jnp.ndarray:
    """Bilinear-sample an (out_hw, out_hw) grid from box [y0:y0+ch, x0:x0+cw]."""
    h, w, _ = img.shape
    ys = y0 + (jnp.arange(out_hw, dtype=jnp.float32) + 0.5) * ch / out_hw - 0.5
    xs = x0 + (jnp.arange(out_hw, dtype=jnp.float32) + 0.5) * cw / out_hw - 0.5
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y_lo = jnp.floor(ys).astype(jnp.int32)
    x_lo = jnp.floor(xs).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, h - 1)
    x_hi = jnp.minimum(x_lo + 1, w - 1)
    wy = (ys - y_lo)[:, None, None]
    wx = (xs - x_lo)[None, :, None]
    a = img[y_lo][:, x_lo]
    b = img[y_lo][:, x_hi]
    c = img[y_hi][:, x_lo]
    d = img[y_hi][:, x_hi]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop(
    key, img: jnp.ndarray, out_hw: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """torchvision RandomResizedCrop semantics via affine sampling.

    Matches torchvision's sampler shape-for-shape: 10 (area, ratio)
    candidates drawn up front (vectorized -- the traced equivalent of
    the retry loop), the FIRST one whose box fits is used, and if none
    fits the fallback is the torchvision center crop clamped into the
    ratio range.  Clipping width/height independently (the old
    behavior) would emit aspect-distorted crops torchvision never
    produces.  Box geometry stays continuous-valued (documented
    divergence from torchvision's integer rounding; sub-pixel bilinear
    sampling is the point of the traced design).
    """
    h, w, _ = img.shape
    y0, x0, ch, cw = _sample_crop_box(key, h, w, scale, ratio)
    return _bilinear_crop(img, y0, x0, ch, cw, out_hw)


def _sample_crop_box(
    key, h: int, w: int,
    scale: Tuple[float, float], ratio: Tuple[float, float],
):
    """(y0, x0, ch, cw) of the torchvision crop box (see above)."""
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    attempts = 10  # torchvision RandomResizedCrop.get_params
    areas = h * w * jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio, (attempts,),
        minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]),
    )
    r = jnp.exp(log_r)
    cws = jnp.sqrt(areas * r)
    chs = jnp.sqrt(areas / r)
    valid = (cws >= 1.0) & (cws <= w) & (chs >= 1.0) & (chs <= h)
    first = jnp.argmax(valid)  # first fitting candidate
    any_valid = valid.any()
    # torchvision fallback: whole image, center-cropped into ratio range
    in_r = w / h
    fb_cw = jnp.where(in_r > ratio[1], h * ratio[1], float(w))
    fb_ch = jnp.where(in_r < ratio[0], w / ratio[0], float(h))
    cw = jnp.where(any_valid, cws[first], fb_cw)
    ch = jnp.where(any_valid, chs[first], fb_ch)
    y0 = jnp.where(
        any_valid, jax.random.uniform(k_y) * (h - ch), (h - ch) / 2.0
    )
    x0 = jnp.where(
        any_valid, jax.random.uniform(k_x) * (w - cw), (w - cw) / 2.0
    )
    return y0, x0, ch, cw


def random_hflip(key, img: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.uniform(key) < p
    return jnp.where(flip, img[:, ::-1, :], img)


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def color_jitter(
    key, img: jnp.ndarray, brightness: float = 0.4, contrast: float = 0.4,
    saturation: float = 0.4, hue: float = 0.1,
) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter on [0,1] RGB."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness > 0:
        f = jax.random.uniform(
            kb, minval=max(0.0, 1 - brightness), maxval=1 + brightness
        )
        img = img * f
    if contrast > 0:
        f = jax.random.uniform(
            kc, minval=max(0.0, 1 - contrast), maxval=1 + contrast
        )
        gray_mean = _rgb_to_gray(img).mean()
        img = (img - gray_mean) * f + gray_mean
    if saturation > 0:
        f = jax.random.uniform(
            ks, minval=max(0.0, 1 - saturation), maxval=1 + saturation
        )
        gray = _rgb_to_gray(img)
        img = gray + (img - gray) * f
    if hue > 0:
        # hue rotation in the YIQ color space
        theta = jax.random.uniform(kh, minval=-hue, maxval=hue) * 2 * jnp.pi
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        i = 0.596 * r - 0.274 * g - 0.322 * b
        q = 0.211 * r - 0.523 * g + 0.312 * b
        i, q = i * cos_t - q * sin_t, i * sin_t + q * cos_t
        img = jnp.stack(
            [
                y + 0.956 * i + 0.621 * q,
                y - 0.272 * i - 0.647 * q,
                y - 1.106 * i + 1.703 * q,
            ],
            axis=-1,
        )
    return jnp.clip(img, 0.0, 1.0)


def random_erasing(
    key, img: jnp.ndarray, p: float = 0.2,
    scale: Tuple[float, float] = (0.02, 0.33),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> jnp.ndarray:
    """torchvision RandomErasing with a traced-box zero mask."""
    h, w, _ = img.shape
    k_p, k_area, k_ratio, k_y, k_x = jax.random.split(key, 5)
    apply = jax.random.uniform(k_p) < p
    area = h * w * jax.random.uniform(
        k_area, minval=scale[0], maxval=scale[1]
    )
    r = jnp.exp(
        jax.random.uniform(
            k_ratio, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
        )
    )
    eh = jnp.clip(jnp.sqrt(area * r), 1.0, float(h))
    ew = jnp.clip(jnp.sqrt(area / r), 1.0, float(w))
    y0 = jax.random.uniform(k_y) * (h - eh)
    x0 = jax.random.uniform(k_x) * (w - ew)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    box = (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
    erased = jnp.where(box[..., None], 0.0, img)
    return jnp.where(apply, erased, img)


def normalize(
    img: jnp.ndarray, mean: Sequence[float], std: Sequence[float]
) -> jnp.ndarray:
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return (img - mean) / std


def make_train_augment(
    out_hw: int, mean: Sequence[float], std: Sequence[float],
    crop: bool = True, flip: bool = True, jitter: bool = True,
    erase: bool = True,
):
    """Build the jitted batched train pipeline (uint8 NHWC -> float32).

    Mirrors the reference CIFAR pipeline (``main.py:169-188``):
    RandomResizedCrop -> HFlip -> ColorJitter(0.4,0.4,0.4,0.1) ->
    RandomErasing(0.2) -> Normalize.
    """

    def one(key, img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if crop:
            img = random_resized_crop(k1, img, out_hw)
        if flip:
            img = random_hflip(k2, img)
        if jitter:
            img = color_jitter(k3, img)
        if erase:
            img = random_erasing(k4, img)
        return normalize(img, mean, std)

    @jax.jit
    def batch_fn(key, images_u8):
        keys = jax.random.split(key, images_u8.shape[0])
        return jax.vmap(one)(keys, images_u8)

    return batch_fn


def make_eval_transform(mean: Sequence[float], std: Sequence[float]):
    """uint8 NHWC -> normalized float32 (``main.py:190-196``)."""

    @jax.jit
    def batch_fn(images_u8):
        return normalize(images_u8.astype(jnp.float32) / 255.0, mean, std)

    return batch_fn
