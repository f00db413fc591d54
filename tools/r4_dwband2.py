"""Round-4 stage-2 dwgrad A/B: the final two-window auto policy (on-chip).

Stage 1 (tools/r4_dwband.py) attributed the kernel win to two separate
call-site populations (see models/layers.py window comments); this stage
measures the resulting default policy directly, plus strips-only arms for
attribution:
  B=8 auto  -> strips-only engaged (big window excludes 524k and 1.57M)
  B=4 auto  -> strips + encoder engaged
  B=4 strips-only (big window emptied via MIN > MAX)
  B=4 forced-all-on (UNCR_DW_GW=1 reference: 35.72 in stage 1's session)
Usage: python tools/r4_dwband2.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep import run_cfg

ARMS = [
    (8, None, None, "auto: strips only"),
    (4, None, None, "auto: strips + encoder"),
    (4, 9_999_999, None, "strips only"),
    (4, None, True, "forced all-on reference"),
]


def main():
    for B, min_rows, forced, label in ARMS:
        if min_rows is None:
            os.environ.pop("UNCR_DW_GW_MIN_ROWS", None)
        else:
            os.environ["UNCR_DW_GW_MIN_ROWS"] = str(min_rows)
        res = run_cfg("train", B=B, dw_gw=forced, iters=20, timeout=1400)
        res["label"] = label
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
