"""Round-4 per-site attribution of the dwgrad kernel win (on-chip).

Whole-step train A/Bs with the UNCR_DW_GW_MIN_ROWS knob slicing the
call-site population (see tools/probe_dwshapes.py for the census):
  MIN=600000 -> only the temporally-merged encoder conv (B=4; nothing at B=8)
  MIN=100000 -> encoder + decoder convs, border strips off
  (default 0 -> everything under MAX; known: B=4 35.72, B=8 36.45)
Usage: python tools/r4_dwband.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep import run_cfg

ARMS = [
    (8, 600000),   # everything off at B=8 -> expect ~39.75 (regression fix)
    (4, 600000),   # encoder-only
    (4, 100000),   # encoder+decoder, strips off
    (8, 100000),   # decoder-only (strips off, encoder 1.57M > MAX)
]


def main():
    for B, min_rows in ARMS:
        os.environ["UNCR_DW_GW_MIN_ROWS"] = str(min_rows)
        res = run_cfg("train", B=B, iters=20, timeout=1400)
        res["min_rows"] = min_rows
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
