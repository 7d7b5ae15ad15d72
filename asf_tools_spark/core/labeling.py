"""Connected-component labeling (8-connectivity) in pure numpy.

Replaces skimage.measure.label(connectivity=2) / scipy.ndimage.label used at
ref: src/asf_tools/hydrosar/water_map.py:170,352 and flood_map.py:265.
Labels are assigned in raster-scan order of each component's first pixel
(background = 0), matching skimage numbering so segment-level results are
directly comparable.

Used per tile inside ``applyInPandas``; cross-tile merging is a separate
boundary-equivalence pass (operators/labeling.py) because one Python process
never sees the whole grid at 100 TB scale.
"""

from __future__ import annotations

import numpy as np

_NEIGHBOR_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def label_components(flag: np.ndarray) -> np.ndarray:
    """Label True regions of a 2D bool array; 0 = background.

    Iterative vectorized min-propagation: each pixel repeatedly takes the
    min provisional label among its 8 neighbors until fixpoint, then labels
    are renumbered in scan order. O(component diameter) sweeps, each a
    handful of whole-array numpy ops — fine at tile granularity.
    """
    flag = np.asarray(flag, dtype=bool)
    h, w = flag.shape
    lab = np.where(flag, np.arange(h * w, dtype=np.int64).reshape(h, w), np.int64(h * w))

    big = np.int64(h * w)
    while True:
        new = lab.copy()
        for dr, dc in _NEIGHBOR_SHIFTS:
            shifted = np.full_like(lab, big)
            rs = slice(max(dr, 0), h + min(dr, 0))
            rd = slice(max(-dr, 0), h + min(-dr, 0))
            cs = slice(max(dc, 0), w + min(dc, 0))
            cd = slice(max(-dc, 0), w + min(-dc, 0))
            shifted[rd, cd] = lab[rs, cs]
            np.minimum(new, shifted, out=new, where=flag)
        if np.array_equal(new, lab):
            break
        lab = new

    lab = np.where(flag, lab, -1)
    flat = lab.ravel()
    roots = flat[flat >= 0]
    # renumber roots by first occurrence in scan order (skimage-compatible)
    _, first_idx = np.unique(roots, return_index=True)
    order = np.argsort(first_idx)
    remap = {int(r): i + 1 for i, r in enumerate(np.unique(roots)[order])}
    out = np.zeros(h * w, dtype=np.int64)
    if remap:
        keys = np.array(list(remap.keys()))
        vals = np.array(list(remap.values()))
        lut = np.zeros(int(keys.max()) + 1, dtype=np.int64)
        lut[keys] = vals
        pos = flat >= 0
        out[pos] = lut[flat[pos]]
    return out.reshape(h, w)


class UnionFind:
    """Small driver-side union-find for cross-tile label equivalences."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def remove_small_segments_mask(segments: np.ndarray, min_area: int = 3) -> np.ndarray:
    """Boolean keep-mask dropping segments smaller than ``min_area``
    (ref water_map.py:139-146)."""
    valid = segments != 0
    areas = np.bincount(segments.ravel())
    small = (areas < min_area).nonzero()
    np.putmask(valid, np.isin(segments, small), False)
    return valid
