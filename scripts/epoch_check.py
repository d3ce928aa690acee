"""Machine-epoch probe: is the sandbox VM in a clean epoch right now?

The VM's hypervisor throttles in multi-minute epochs (single-core
control swings 1.7-9.7 Miter/s). Scaling studies run in a dirty epoch
measure the hypervisor, not the engine — so the study runner polls
this probe and fires only when the box is clean.

Prints one JSON line {"ctrl": Miter/s, "steal_pct": %, "clean": bool}.
Exit code 0 iff clean (ctrl >= --min-ctrl, steal <= --max-steal).
"""

from __future__ import annotations

import json
import sys
import time


def cpu_stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def ctrl_score(seconds: float = 2.0) -> float:
    n = 0
    x = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        n += 100_000
    return round(n / (time.perf_counter() - t0) / 1e6, 2)


def main() -> int:
    min_ctrl = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    max_steal = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    s0, t0 = cpu_stat()
    ctrl = ctrl_score()
    s1, t1 = cpu_stat()
    steal = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    clean = ctrl >= min_ctrl and steal <= max_steal
    print(json.dumps({"ctrl": ctrl, "steal_pct": steal,
                      "clean": clean}))
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
