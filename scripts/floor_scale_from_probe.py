"""Derive GPIS_EXPERT_FLOOR_SCALE from a quad_floor_probe log.

Reads the per-B JSON lines, takes the worst measured implied_scale
(err_max / (eps*B*k0)) across probed capacities, and prints it with a 4x
safety margin, clamped to [0.05, 0.5] — the committee floor then sits just
above the MEASURED post-Newton fused-quad error instead of the r4
extrapolation.  Prints nothing (exit 1) if no probe lines parse, so the
caller falls back to the built-in default.
"""

import json
import sys


def main() -> int:
    scales = []
    try:
        with open(sys.argv[1]) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if "implied_scale" in d:
                    scales.append(float(d["implied_scale"]))
    except OSError:
        return 1
    if not scales:
        return 1
    s = max(scales) * 4.0
    s = min(max(s, 0.05), 0.5)
    print(f"{s:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
