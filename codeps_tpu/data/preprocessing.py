"""Host-side image preprocessing (numpy/PIL — no torchvision/skimage).

Parity targets: datasets/preprocessing.py
  - prepare_for_network: ToTensor + Normalize (:12-18) -> float32 NHWC
  - augment_data: shared horizontal flip (offsets x-sign, camera cx mirror)
    + random-order color jitter (:21-57, 82-105)
  - transfer_histogram_style: skimage match_histograms in rgb/hsv/
    saturation modes (:60-76)
  - is_low_contrast (skimage.exposure) used by the replay buffer
    (datasets/replay_buffer.py:110-115)
"""

from __future__ import annotations

import random
from typing import Any, Dict

import numpy as np
from PIL import Image, ImageEnhance

_GRAY_WEIGHTS = np.asarray([0.2125, 0.7154, 0.0721])  # skimage rgb2gray


# ------------------------------------------------------------- color jitter

def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, factor: float) -> Image.Image:
    """Shift hue by factor in [-0.5, 0.5] (torchvision PIL semantics)."""
    if not -0.5 <= factor <= 0.5:
        raise ValueError(f"hue factor {factor} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    h_np = np.array(h, dtype=np.uint8)
    h_np = (h_np.astype(np.int16) + int(factor * 255)).astype(np.uint8)
    return Image.merge("HSV", (Image.fromarray(h_np, "L"), s, v)).convert(
        img.mode)


def get_random_color_jitter(rng: random.Random, brightness, contrast,
                            saturation, hue):
    """Random factors + random application order (preprocessing.py:82-105)."""
    transforms = []
    if brightness is not None:
        factor = rng.uniform(1 - brightness, 1 + brightness)
        transforms.append(lambda img, f=factor: adjust_brightness(img, f))
    if contrast is not None:
        factor = rng.uniform(1 - contrast, 1 + contrast)
        transforms.append(lambda img, f=factor: adjust_contrast(img, f))
    if saturation is not None:
        factor = rng.uniform(1 - saturation, 1 + saturation)
        transforms.append(lambda img, f=factor: adjust_saturation(img, f))
    if hue is not None:
        factor = rng.uniform(-hue, hue)
        transforms.append(lambda img, f=factor: adjust_hue(img, f))
    rng.shuffle(transforms)

    def apply(img: Image.Image) -> Image.Image:
        for transform in transforms:
            img = transform(img)
        return img

    return apply


# --------------------------------------------------------------- pipeline

def prepare_for_network(output: Dict[str, Any], normalization_cfg) -> None:
    """PIL -> float32 (H, W, 3) in [0,1], optionally ImageNet-normalized.

    With ``normalization_cfg.uint8_transfer`` the images stay raw uint8 —
    the jitted steps normalize on device (ops/normalize.py), cutting
    host->device traffic 4x.
    """
    if normalization_cfg.get("uint8_transfer", False) \
            and normalization_cfg.active:
        # uint8_transfer presumes the device-side mean/std
        # standardization (ops/normalize.py standardizes every uint8
        # input); with normalization active:false fall through to the
        # float [0,1] path so the pure-transport flag can never change
        # what the model sees.
        for offset, img in output["rgb"].items():
            output["rgb"][offset] = np.asarray(img, np.uint8)
        return
    mean = np.asarray(normalization_cfg.rgb_mean, np.float32)
    std = np.asarray(normalization_cfg.rgb_std, np.float32)
    for offset, img in output["rgb"].items():
        arr = np.asarray(img, np.float32) / 255.0
        if normalization_cfg.active:
            arr = (arr - mean) / std
        output["rgb"][offset] = arr


def augment_data(output: Dict[str, Any], augmentation_cfg,
                 rng: random.Random | None = None) -> None:
    """Shared flip + color jitter over a sample dict (in place).

    The flip mirrors the camera cx (preprocessing.py:47-52), flips every
    spatial array along x, and negates the offset map's x channel. Arrays
    here are channel-LAST ((H, W) or (H, W, C)); the offset x channel is
    offset[..., 1].
    """
    if not augmentation_cfg.active:
        return
    rng = rng or random

    jitter = get_random_color_jitter(
        rng,
        augmentation_cfg.brightness_jitter,
        augmentation_cfg.contrast_jitter,
        augmentation_cfg.saturation_jitter,
        augmentation_cfg.hue_jitter)
    do_flip = augmentation_cfg.horizontal_flipping and rng.random() > 0.5

    for key, value in output.items():
        if key == "rgb":
            for offset, img in value.items():
                if do_flip:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                output[key][offset] = jitter(img)
        elif key == "camera_model":
            if do_flip:
                img_width = output["rgb"][0].size[0]
                value[2] = img_width - value[2] - 1  # mirror cx
        elif do_flip:
            flipped = np.flip(value, axis=1).copy()  # x is axis 1 (H, W, ...)
            if key == "offset":
                flipped[..., 1] *= -1
            output[key] = flipped


# ---------------------------------------------------- histogram matching

def _match_cumulative_cdf(source: np.ndarray,
                          template: np.ndarray) -> np.ndarray:
    """skimage.exposure.match_histograms single-channel core."""
    src_values, src_unique_indices, src_counts = np.unique(
        source.ravel(), return_inverse=True, return_counts=True)
    tmpl_values, tmpl_counts = np.unique(template.ravel(),
                                         return_counts=True)
    src_quantiles = np.cumsum(src_counts) / source.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / template.size
    interp = np.interp(src_quantiles, tmpl_quantiles, tmpl_values)
    matched = interp[src_unique_indices].reshape(source.shape)
    if source.dtype == np.uint8:
        # skimage assigns the float result into an empty uint8 array —
        # a C-cast TRUNCATION, not rounding (exposure/histogram_matching
        # .py: matched[..., channel] = matched_channel). Mirror that for
        # bit-parity with the reference's style transfer.
        matched = matched.clip(0, 255).astype(np.uint8)
    return matched


def match_histograms(image: np.ndarray,
                     reference: np.ndarray) -> np.ndarray:
    """Channel-wise histogram matching (channel_axis=-1)."""
    matched = np.empty_like(image)
    for c in range(image.shape[-1]):
        matched[..., c] = _match_cumulative_cdf(image[..., c],
                                                reference[..., c])
    return matched


def transfer_histogram_style(img: Image.Image, reference_img: Image.Image,
                             mode: str | None) -> Image.Image:
    """Histogram style transfer (preprocessing.py:60-76)."""
    if mode == "rgb":
        new_img = match_histograms(np.array(img), np.array(reference_img))
        return Image.fromarray(new_img, mode="RGB")
    if mode in ("hsv", "saturation"):
        img_hsv = np.array(img.convert("HSV"))
        ref_hsv = np.array(reference_img.convert("HSV"))
        new_img = match_histograms(img_hsv, ref_hsv)
        if mode == "saturation":
            new_img[:, :, 0] = img_hsv[:, :, 0]
            new_img[:, :, 2] = img_hsv[:, :, 2]
        return Image.fromarray(new_img, mode="HSV").convert("RGB")
    if mode is None:
        return img
    raise ValueError(f"Unknown histogram transfer mode: {mode}")


# ------------------------------------------------------------ low contrast

def is_low_contrast(image, fraction_threshold: float = 0.05,
                    lower_percentile: float = 1,
                    upper_percentile: float = 99) -> bool:
    """skimage.exposure.is_low_contrast parity for RGB/gray uint8/float.

    skimage normalizes the percentile spread by the image's dtype range
    AFTER any gray conversion: rgb2gray yields float, whose
    dtype_limits(clip_negative=False) span is (-1, 1) = 2 — so RGB
    input compares spread/2 (NOT the raw spread) against the
    threshold; uint8 grayscale compares spread/255.
    """
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[2] in (3, 4):
        image = image[..., :3]
        if image.dtype == np.uint8:
            image = image.astype(np.float64) / 255.0
        image = image @ _GRAY_WEIGHTS
        dtype_range = 2.0
    elif image.dtype == np.uint8:
        image = image.astype(np.float64)
        dtype_range = 255.0
    else:
        dtype_range = 2.0
    limits = np.percentile(image, [lower_percentile, upper_percentile])
    return bool((limits[1] - limits[0]) / dtype_range < fraction_threshold)
