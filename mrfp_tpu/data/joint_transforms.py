"""Joint (img, mask)-pair transforms — the RobustNet-era library the
reference carries at transforms/joint_transforms.py (vestigial-but-capability,
SURVEY.md §2.2 #35) plus the extended single-image transforms of
transforms/transforms.py (#36).

Implemented: pair Compose, ClassUniform (peak-detection centroid sampler,
joint_transforms.py:552-685), SlidingCrop / SlidingCropOld (:447-550),
MaskToTensor and RelaxedBoundaryLossToTensor (transforms.py:71-124 — the
one-hot border relaxation consumed by cfg.BORDER_WINDOW-style losses; the
global-cfg coupling is replaced by explicit arguments).
"""

from __future__ import annotations

import math
import random as _random
from typing import Optional, Sequence

import numpy as np
from PIL import Image
from scipy.ndimage import (
    binary_erosion,
    generate_binary_structure,
    maximum_filter,
    shift as nd_shift,
)

from mrfp_tpu.data.transforms import RandomCrop


class ComposePair:
    """transforms/joint_transforms.py:44-58: (img, mask) in, (img, mask) out."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img, mask):
        assert img.size == mask.size
        for t in self.transforms:
            img, mask = t(img, mask)
        return img, mask


class MaskToTensor:
    """transforms/transforms.py:71-73: PIL mask -> int64 array."""

    def __call__(self, mask):
        return np.asarray(mask, dtype=np.int64)


def detect_peaks(image: np.ndarray) -> np.ndarray:
    """8-connected local-maximum peaks minus the eroded background
    (joint_transforms.py:572-606)."""
    neighborhood = generate_binary_structure(2, 2)
    local_max = maximum_filter(image, footprint=neighborhood) == image
    background = image == 0
    eroded = binary_erosion(background, structure=neighborhood, border_value=1)
    return local_max ^ eroded


class ClassUniform:
    """Scale + class-centroid-biased crop (joint_transforms.py:552-685).

    With upscale factors, finds spatial density peaks of the classes of
    interest (default truck/train/bus trainIds 14/15/16) over a 250px sliding
    window and crops around a randomly chosen peak; downscales fall back to a
    plain random crop.
    """

    def __init__(self, size, crop_nopad, scale_min=0.5, scale_max=2.0,
                 ignore_index=0, class_list="16,15,14",
                 rng: Optional[_random.Random] = None):
        self.size = size
        self.rng = rng or _random
        self.crop = RandomCrop(size, ignore_index=ignore_index,
                               nopad=crop_nopad, rng=self.rng)
        if isinstance(class_list, str):
            class_list = class_list.replace(" ", "").split(",")
        self.class_list = [int(c) for c in class_list]
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.window_size = 250

    def __call__(self, img, mask):
        assert img.size == mask.size
        scale_amt = self.rng.uniform(self.scale_min, self.scale_max)
        w = int(scale_amt * img.size[0])
        h = int(scale_amt * img.size[1])
        img_new = img.resize((w, h), Image.BICUBIC)
        mask_new = mask.resize((w, h), Image.NEAREST)
        if scale_amt < 1.0:
            return self.crop(img_new, mask_new)

        origw, origh = mask.size
        data = np.asarray(mask, dtype=np.float64)
        arr = np.zeros_like(data)
        for cls in self.class_list:
            m = np.where(data == cls, data, 0.0)
            s = m.sum()
            if s > 0:
                arr += m / s / cls

        ws = self.window_size
        sum_arr = np.zeros_like(arr, dtype=np.float32)
        for x in range(0, max(arr.shape[0] - ws, 0), ws):
            for y in range(0, max(arr.shape[1] - ws, 0), ws):
                sum_arr[x + ws // 2, y + ws // 2] = arr[x:x + ws, y:y + ws].sum()

        coords = np.column_stack(np.where(detect_peaks(sum_arr))).tolist()
        if not coords:
            return self.crop(img_new, mask_new)

        ratio = (float(origw) / w, float(origh) / h)
        # peak choice flows from the injected rng (thread-deterministic),
        # not the global numpy state
        y, x = coords[self.rng.randrange(len(coords))]
        y, x = int(y * ratio[0]), int(x * ratio[1])
        wsr = ws * ratio[0]
        cropx = self.rng.uniform(
            max(0, (x - wsr / 2) - (self.size - wsr)),
            max((x - wsr / 2), (x - wsr / 2) - ((w - wsr) - x + wsr / 2)))
        cropy = self.rng.uniform(
            max(0, (y - wsr / 2) - (self.size - wsr)),
            max((y - wsr / 2), (y - wsr / 2) - ((h - wsr) - y + wsr / 2)))
        box = (cropx, cropy, cropx + self.size, cropy + self.size)
        return img_new.crop(box), mask_new.crop(box)


class SlidingCrop:
    """Tile an image into crop_size windows with stride_rate overlap,
    returning per-tile slice info for re-assembly (joint_transforms.py:502-550)."""

    def __init__(self, crop_size, stride_rate, ignore_label):
        self.crop_size = crop_size
        self.stride_rate = stride_rate
        self.ignore_label = ignore_label

    def _pad(self, img, mask):
        h, w = img.shape[:2]
        pad_h = max(self.crop_size - h, 0)
        pad_w = max(self.crop_size - w, 0)
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        mask = np.pad(mask, ((0, pad_h), (0, pad_w)),
                      constant_values=self.ignore_label)
        return img, mask, h, w

    def __call__(self, img, mask):
        assert img.size == mask.size
        w, h = img.size
        img = np.asarray(img)
        mask = np.asarray(mask)
        if max(h, w) <= self.crop_size:
            img, mask, sh, sw = self._pad(img, mask)
            return ([Image.fromarray(img.astype(np.uint8)).convert("RGB")],
                    [Image.fromarray(mask.astype(np.uint8)).convert("P")],
                    [[0, sh, 0, sw, sh, sw]])
        stride = int(math.ceil(self.crop_size * self.stride_rate))
        h_steps = int(math.ceil((h - self.crop_size) / float(stride))) + 1
        w_steps = int(math.ceil((w - self.crop_size) / float(stride))) + 1
        imgs, masks, slices = [], [], []
        for yy in range(h_steps):
            for xx in range(w_steps):
                sy, sx = yy * stride, xx * stride
                ey, ex = sy + self.crop_size, sx + self.crop_size
                sub_i, sub_m = img[sy:ey, sx:ex], mask[sy:ey, sx:ex]
                sub_i, sub_m, sh, sw = self._pad(sub_i, sub_m)
                imgs.append(Image.fromarray(sub_i.astype(np.uint8)).convert("RGB"))
                masks.append(Image.fromarray(sub_m.astype(np.uint8)).convert("P"))
                slices.append([sy, min(ey, h), sx, min(ex, w), sh, sw])
        return imgs, masks, slices


class SlidingCropOld(SlidingCrop):
    """joint_transforms.py:447-500: same tiling without slice bookkeeping."""

    def __call__(self, img, mask):
        imgs, masks, _ = super().__call__(img, mask)
        if len(imgs) == 1:
            return imgs[0], masks[0]
        return imgs, masks


def find_boundaries_thick(label: np.ndarray) -> np.ndarray:
    """skimage.segmentation.find_boundaries(mode='thick') equivalent: a pixel
    is boundary if any 4-neighbor differs."""
    b = np.zeros(label.shape, bool)
    b[:-1, :] |= label[:-1, :] != label[1:, :]
    b[1:, :] |= label[:-1, :] != label[1:, :]
    b[:, :-1] |= label[:, :-1] != label[:, 1:]
    b[:, 1:] |= label[:, :-1] != label[:, 1:]
    return b


class RelaxedBoundaryLossToTensor:
    """One-hot label with border relaxation (transforms/transforms.py:75-124).

    Output (C+1, H, W) uint8: a pixel is 'on' for every class present within
    a (2*border+1)^2 window — the multi-hot target of the border-relaxed CE.
    ``strict_classes`` keep exact one-hot; after ``reduce_border_iter`` the
    window halves and boundary pixels get weight 2.
    """

    def __init__(self, ignore_id: int, num_classes: int, border_window: int = 1,
                 strict_classes: Optional[Sequence[int]] = None,
                 reduce_border_iter: int = -1, cur_iter: int = 0):
        self.ignore_id = ignore_id
        self.num_classes = num_classes
        self.border = border_window
        self.strict_classes = strict_classes
        self.reduce_border_iter = reduce_border_iter
        self.cur_iter = cur_iter

    def _one_hot(self, a: np.ndarray) -> np.ndarray:
        ncols = self.num_classes + 1
        out = np.zeros((a.size, ncols), np.uint8)
        out[np.arange(a.size), a.ravel()] = 1
        return out.reshape(a.shape + (ncols,))

    def __call__(self, mask) -> np.ndarray:
        a = np.asarray(mask).copy()
        a[a == self.ignore_id] = self.num_classes
        strict_mask = None
        one_hot_orig = None
        if self.strict_classes is not None:
            one_hot_orig = self._one_hot(a)
            strict_mask = np.zeros(a.shape, bool)
            for cls in self.strict_classes:
                strict_mask |= a == cls
        border = self.border
        reduce_now = (self.reduce_border_iter != -1 and
                      self.cur_iter > self.reduce_border_iter)
        boundary = None
        if reduce_now:
            border //= 2
            boundary = find_boundaries_thick(a).astype(np.uint8)
        one_hot = 0
        for i in range(-border, border + 1):
            for j in range(-border, border + 1):
                shifted = nd_shift(a, (i, j), cval=self.num_classes, order=0)
                one_hot = one_hot + self._one_hot(shifted.astype(np.int64))
        one_hot = np.minimum(one_hot, 1)
        if strict_mask is not None:
            one_hot = np.where(strict_mask[..., None], one_hot_orig, one_hot)
        one_hot = np.moveaxis(one_hot, -1, 0)
        if reduce_now:
            one_hot = np.where(boundary, 2 * one_hot, one_hot)
        return one_hot.astype(np.uint8)
