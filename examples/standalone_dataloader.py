"""Standalone data-loading demo (the reference's standalone_dataloader.py
equivalent): iterate a dataset outside any training loop and inspect the
sample structure.

Run with the real dataset:
    python examples/standalone_dataloader.py --root ~/data/SEN12MSCRTS
or without data (synthetic source):
    python examples/standalone_dataloader.py --synthetic
"""

import argparse
import os
import sys

import numpy as np

# runnable from anywhere: put the repo root (this file's parent's parent)
# on sys.path without requiring an install or PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncrtaints_tpu.data.pipeline import BatchLoader, collate_multi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None, type=str)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--split", default="train")
    p.add_argument("--input_t", default=3, type=int)
    args = p.parse_args()

    if args.synthetic or args.root is None:
        from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS
        ds = SyntheticSEN12MSCRTS(n_samples=4, n_input_t=args.input_t,
                                  patch_size=256)
    else:
        from uncrtaints_tpu.data.sen12mscrts import SEN12MSCRTS
        ds = SEN12MSCRTS(args.root, split=args.split,
                         sample_type="cloudy_cloudfree",
                         cloud_masks="cloud_cloudshadow_mask",
                         n_input_samples=args.input_t)

    print(f"{len(ds)} samples")
    sample = ds[0]
    print("sample keys:", list(sample.keys()))
    print("input keys:", list(sample["input"].keys()))
    print("input S2 frames:", len(sample["input"]["S2"]),
          "shape:", np.asarray(sample["input"]["S2"][0]).shape)
    print("coverage:", sample["input"]["coverage"])

    loader = BatchLoader(ds, batch_size=2, shuffle=False,
                         collate=collate_multi, use_sar=True)
    batch = next(iter(loader))
    for k, v in batch.items():
        if v is not None:
            print(f"batch[{k}]: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
