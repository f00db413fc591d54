"""Round-4 stage-3: confirm the shipped step-hint dwgrad default (on-chip).

The auto policy now gates on the step's total activation rows via the
engine-provided hint (models/layers.py dw_gw_step_rows). Expected from the
stage-1/2 attribution: B=4 ~35.7 seq/s (kernel engaged), B=8 ~39.8 (taps).
Usage: python tools/r4_dwband3.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep import run_cfg


def main():
    for B in (4, 8):
        res = run_cfg("train", B=B, iters=20, timeout=1400)
        res["label"] = f"shipped step-hint default, B={B}"
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
