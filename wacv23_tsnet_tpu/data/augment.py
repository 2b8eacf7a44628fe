"""Train-time photometric augmentation.

Matches the reference's torchvision-on-PIL jitter
(dataset_video_face.py:112-127): one brightness/contrast/saturation/hue
factor drawn per CLIP and applied to every frame (so the clip stays
photometrically consistent), then an optional horizontal mirror of
images, labels, and bboxes together. torchvision's PIL backend is
ImageEnhance + HSV-channel arithmetic, which is what we use directly.
"""

from __future__ import annotations

import random as _random

import numpy as np
from PIL import Image, ImageEnhance

JITTER_BRIGHT = 64.0 / 255
JITTER_CONTRAST = 0.25
JITTER_SAT = 0.25
JITTER_HUE = 0.04


def sample_jitter_factors(rng=None):
    rng = rng or _random
    return {
        "brightness": rng.uniform(max(0, 1 - JITTER_BRIGHT), 1 + JITTER_BRIGHT),
        "contrast": rng.uniform(max(0, 1 - JITTER_CONTRAST), 1 + JITTER_CONTRAST),
        "saturation": rng.uniform(max(0, 1 - JITTER_SAT), 1 + JITTER_SAT),
        "hue": rng.uniform(-JITTER_HUE, JITTER_HUE),
    }


def apply_jitter(img: Image.Image, f: dict) -> Image.Image:
    img = ImageEnhance.Brightness(img).enhance(f["brightness"])
    img = ImageEnhance.Contrast(img).enhance(f["contrast"])
    img = ImageEnhance.Color(img).enhance(f["saturation"])
    return _shift_hue(img, f["hue"])


def _shift_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """Cyclic hue shift by hue_factor (in turns), torchvision semantics."""
    if abs(hue_factor) < 1e-9:
        return img
    mode = img.mode
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(hue_factor * 255)) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    return Image.merge("HSV", (h, s, v)).convert(mode)
