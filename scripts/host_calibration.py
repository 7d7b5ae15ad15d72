"""Host CPU-scaling calibration: how much wall-clock scaling the HARDWARE
gives pure CPU-bound work (no Spark), at the same process counts as the
bench levels. On virtualized/turbo hosts the ceiling is < 1.0 — report it
next to the engine's efficiency so the engine isn't blamed for the host.

Prints one JSON line: {"per_proc_rate": {n: rate}, "ceiling_lo_hi": r}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool


def _burn(_) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 4:
        x += sum(i * i for i in range(1000))
    return x


def main() -> None:
    lo = int(os.environ.get("SCALE_LO", "8"))
    hi = int(os.environ.get("SCALE_HI", "32"))
    rates = {}
    for n in (lo, hi):
        with Pool(n) as p:
            work = sum(p.map(_burn, range(n)))
        rates[n] = work / 4.0  # work units per second, all processes
    ceiling = (rates[hi] / rates[lo]) / (hi / lo)
    print(json.dumps({"per_proc_rate": rates, "ceiling_lo_hi": round(ceiling, 4), "lo": lo, "hi": hi}))


if __name__ == "__main__":
    main()
