"""DEM conditioning core: epsilon priority-flood depression filling.

Plays the role of the pysheds chain fill_pits -> fill_depressions ->
resolve_flats (ref: src/asf_tools/hydrosar/hand/calculate.py:108-118) in one
pass: the epsilon variant of priority-flood (Barnes et al. 2014, "Priority-
flood: An optimal depression-filling and watershed-labeling algorithm",
public literature) fills pits AND depressions, and the +eps ramp leaves every
interior cell with a strictly lower neighbor — flats are resolved by
construction, so D8 ``flow_direction`` finds no spurious interior sinks.

Exact single-array implementation (heapq Dijkstra on the minimax metric
``F(c) = max(elev(c), F(pred) + eps)``). Used two ways:

- directly, as the numpy ORACLE for the distributed operator's tests;
- per tile inside the distributed halo-merge fixpoint
  (operators.hand.condition_dem) via the ``seeds`` parameter, which lets a
  tile solve locally from halo boundary values.

The relaxation is order-independent (settled in increasing F), so tiled
iteration converges to exactly the full-array answer.
"""

from __future__ import annotations

import heapq

import numpy as np

# D8 neighbor offsets — keep identical to operators.hand.D8
_D8 = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def priority_flood_fill(
    elev: np.ndarray,
    eps: float = 1e-5,
    seeds: list[tuple[int, int, float]] | None = None,
) -> np.ndarray:
    """Epsilon priority-flood fill of a 2D elevation array.

    ``elev``: float array, NaN = nodata (no flow in or out).
    ``seeds``: optional (row, col, f0) sources. Default: every finite cell on
    the array border at its own elevation (the global drain). With seeds, the
    fill solves the local problem "given these boundary water levels, what is
    each cell's filled level" — the tile subproblem of the distributed
    operator.

    Returns F with F >= elev everywhere, F = +inf where unreachable/NaN.
    """
    h, w = elev.shape
    F = np.full((h, w), np.inf)
    heap: list[tuple[float, int, int]] = []
    if seeds is None:
        seeds = [
            (r, c, float(elev[r, c]))
            for r in range(h)
            for c in range(w)
            if (r in (0, h - 1) or c in (0, w - 1)) and np.isfinite(elev[r, c])
        ]
    for r, c, f0 in seeds:
        if not np.isfinite(elev[r, c]):
            continue
        f0 = max(float(f0), float(elev[r, c]))
        if f0 < F[r, c]:
            F[r, c] = f0
            heapq.heappush(heap, (f0, r, c))
    while heap:
        f, r, c = heapq.heappop(heap)
        if f > F[r, c]:
            continue  # stale entry
        for dr, dc in _D8:
            rr, cc = r + dr, c + dc
            if 0 <= rr < h and 0 <= cc < w and np.isfinite(elev[rr, cc]):
                nf = max(float(elev[rr, cc]), f + eps)
                if nf < F[rr, cc]:
                    F[rr, cc] = nf
                    heapq.heappush(heap, (nf, rr, cc))
    return F
