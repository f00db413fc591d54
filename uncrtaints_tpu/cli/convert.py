"""tif -> HDF5 dataset converter CLI.

Replaces /root/reference/util/hdf5converter/ (script_tif2hdf5.sh + the
SEN12MSCRTS_to_hdf5 exporter). Run once; training then uses the HDF5
source everywhere. GDAL/rasterio is used when installed, but the standard
baseline-TIFF dataset tiles also decode through the in-tree pure-Python
codec (data/tiff.py), so the conversion works on a GDAL-free machine too.

    python -m uncrtaints_tpu.cli.convert --root ~/data/SEN12MSCRTS \
        --split train --region all --out train.h5
"""

from __future__ import annotations

import argparse


def create_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None, type=str,
                   help="dataset root (required unless --synthetic_data)")
    p.add_argument("--split", default="train", type=str)
    p.add_argument("--region", default="all", type=str)
    p.add_argument("--cloud_masks", default="s2cloudless_mask", type=str)
    p.add_argument("--out", required=True, type=str)
    p.add_argument("--max_patches", default=None, type=int)
    p.add_argument("--synthetic_data", action="store_true",
                   help="convert the synthetic source (tests/demo)")
    return p


def main(args) -> str:
    from uncrtaints_tpu.data.hdf5 import convert_to_hdf5

    if not args.synthetic_data and not args.root:
        raise SystemExit("--root is required unless --synthetic_data is set")

    if args.synthetic_data:
        # synthetic generic-mode stand-in: full series per patch
        from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS

        class _Generic(SyntheticSEN12MSCRTS):
            def __getitem__(self, pdx):
                s = super().__getitem__(pdx)
                return {"S1": s["input"]["S1"], "S2": s["input"]["S2"],
                        "masks": s["input"]["masks"],
                        "coverage": s["input"]["coverage"],
                        "S1 TD": s["input"]["S1 TD"],
                        "S2 TD": s["input"]["S2 TD"]}
        ds = _Generic(n_samples=args.max_patches or 8, n_input_t=4,
                      patch_size=256)
    else:
        from uncrtaints_tpu.data.sen12mscrts import SEN12MSCRTS
        ds = SEN12MSCRTS(args.root, split=args.split, region=args.region,
                         sample_type="generic", cloud_masks=args.cloud_masks)
    out = convert_to_hdf5(ds, args.out, max_patches=args.max_patches)
    print(f"Wrote {out} ({len(ds)} patches)")
    return out


def cli_main():
    """Console entry point (pyproject: uncrtaints-convert)."""
    main(create_parser().parse_args())


if __name__ == "__main__":
    cli_main()
