"""Derive the next round's GATE_PRIORITY prefix from the official record.

The driver's correctness gate records a bounded prefix (~50 keys) of
registry order per round, so GATE_PRIORITY in queries/__init__.py
rotates each round to give every key an official oracle row over time.
Rounds 11 and 12 derived the rotation by ad-hoc script; this is that
script, kept: run it at the START of a round and paste the output.

Policy (the r10/r11 verdict ordering):
  (a) every registered key that has NEVER appeared in any
      CORRECTNESS_r*.json (newest additions first by registry order);
  (b) fill the remaining slots with the STALEST keys (oldest newest-
      green-row vintage, alphabetical within a vintage).

Usage:  python scripts/derive_gate_rotation.py [slots]   # default 50
Prints the key list (one quoted name per line) plus a vintage census.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from collections import Counter
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def main() -> None:
    import cellbase_spark.queries  # noqa: F401 — populates the registry
    from cellbase_spark.registry import REGISTRY

    sampled: dict[str, int] = {}  # key -> newest round with ANY row
    green: dict[str, int] = {}  # key -> newest round with a green row
    for f in sorted(glob.glob(f"{_REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            sampled[k] = max(sampled.get(k, 0), rnd)
            ok = v.get("hash_match") or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            if ok:
                green[k] = max(green.get(k, 0), rnd)

    never = [k for k in REGISTRY if k not in sampled]
    stale = sorted(
        (k for k in REGISTRY if k in sampled), key=lambda k: (green.get(k, 0), k)
    )
    head = never + [k for k in stale if k not in never]
    head = head[:SLOTS]

    print(f"# {len(never)} never-sampled + {SLOTS - min(len(never), SLOTS)}"
          f" stalest = {len(head)}-slot prefix")
    print(f"# vintage census: {dict(sorted(Counter(green.values()).items()))}")
    for k in head:
        print(f'    "{k}",')


if __name__ == "__main__":
    main()
