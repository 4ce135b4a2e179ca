"""Host-side image IO and resizing with the reference's cv2 semantics.

Label parity requires exactly the reference's resize behavior
(SURVEY.md §7 hard parts): cv2 INTER_LINEAR (half-pixel centers) for
images, INTER_NEAREST for id masks (ade_semantic.py:72-73). cv2 is
available in this environment, so we use it directly; these wrappers pin
the conventions (BGR->RGB, (w, h) size order, IMREAD_UNCHANGED for 16-bit
Cityscapes instance ids) in one place.
"""

from __future__ import annotations

import numpy as np


def imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"Could not read {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f"Could not read {path}")
    return img


def imread_unchanged(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(f"Could not read {path}")
    return img


def resize_image(img: np.ndarray, size: int | tuple[int, int]) -> np.ndarray:
    import cv2

    w, h = (size, size) if isinstance(size, int) else size
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def resize_mask(mask: np.ndarray, size: int | tuple[int, int]) -> np.ndarray:
    import cv2

    w, h = (size, size) if isinstance(size, int) else size
    return cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
