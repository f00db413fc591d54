"""Dataset download helper.

Replaces /root/reference/util/dl_data.sh (interactive wget/tar of per-region
per-modality archives from mediaTUM). Generates/executes the fetch plan:
SEN12MS-CR-TS train (mediaTUM m1639953), test (m1659251) and SEN12MS-CR.

    python -m uncrtaints_tpu.cli.download --dataset sen12mscrts \
        --splits train test --regions africa europa --dest ~/data [--run]

Without --run the tool prints the commands (dry run) -- useful on
air-gapped machines where the transfer happens elsewhere.
"""

from __future__ import annotations

import argparse
import os
import subprocess

MEDIATUM = {
    # media server object IDs, per dl_data.sh:1-311
    "sen12mscrts_train": "1639953",
    "sen12mscrts_test": "1659251",
    "sen12mscr": "1554803",
}
REGIONS = ["africa", "america", "asiaEast", "asiaWest", "europa"]
MODALITIES = ["s1", "s2"]

# Standard s2cloudless LightGBM weights (publicly distributed with
# sentinel2-cloud-detector releases) -- needed by the default cloud mask
# (cloud_masks='s2cloudless_mask', dataLoader.py:145 parity).
S2CLOUDLESS_MODEL = "pixel_s2_cloud_detector_lightGBM_v0.1.txt"
S2CLOUDLESS_URL = ("https://github.com/sentinel-hub/sentinel2-cloud-detector/"
                   f"raw/master/s2cloudless/models/{S2CLOUDLESS_MODEL}")


def s2cloudless_cache_dir() -> str:
    return os.path.join(os.path.expanduser(
        os.environ.get("XDG_CACHE_HOME", "~/.cache")), "uncrtaints_tpu")


def create_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="sen12mscrts",
                   choices=["sen12mscrts", "sen12mscr"])
    p.add_argument("--splits", nargs="+", default=["train"],
                   choices=["train", "test"])
    p.add_argument("--regions", nargs="+", default=REGIONS)
    p.add_argument("--modalities", nargs="+", default=MODALITIES)
    p.add_argument("--dest", default="./data", type=str)
    p.add_argument("--run", action="store_true",
                   help="execute wget/tar instead of printing the plan")
    p.add_argument("--s2cloudless-weights", dest="s2cloudless_weights",
                   action="store_true",
                   help="fetch ONLY the standard s2cloudless LightGBM model "
                        "file into the cache dir (needed by the default "
                        "cloud_masks='s2cloudless_mask')")
    return p


def plan(args):
    cmds = []
    dest = os.path.expanduser(args.dest)
    if getattr(args, "s2cloudless_weights", False):
        out = os.path.join(s2cloudless_cache_dir(), S2CLOUDLESS_MODEL)
        return [["wget", "-c", "-O", out, S2CLOUDLESS_URL]]
    if args.dataset == "sen12mscr":
        url = f"https://dataserv.ub.tum.de/s/m{MEDIATUM['sen12mscr']}/download"
        cmds.append(["wget", "-c", url, "-P", dest])
        return cmds
    for split in args.splits:
        obj = MEDIATUM[f"sen12mscrts_{split}"]
        for region in args.regions:
            for mod in args.modalities:
                fname = f"{region}_{mod}.tar.gz" if split == "train" \
                    else f"{region}_test_{mod}.tar.gz"
                url = (f"https://dataserv.ub.tum.de/s/m{obj}"
                       f"/download?path=/&files={fname}")
                out = os.path.join(dest, fname)
                cmds.append(["wget", "-c", "-O", out, url])
                cmds.append(["tar", "-xzf", out, "-C", dest])
    return cmds


def main(args):
    cmds = plan(args)
    if getattr(args, "s2cloudless_weights", False):
        os.makedirs(s2cloudless_cache_dir(), exist_ok=True)
    os.makedirs(os.path.expanduser(args.dest), exist_ok=True)
    for c in cmds:
        print(" ".join(c))
        if args.run:
            subprocess.run(c, check=True)
    if not args.run:
        print("\n(dry run -- pass --run to execute; after extraction, merge "
              "the archives' subdirectories so each ROI holds S1/ and S2/ "
              "time-point folders, e.g. `mv */* .` in the parent dir)")


def cli_main():
    """Console entry point (pyproject: uncrtaints-download)."""
    main(create_parser().parse_args())


if __name__ == "__main__":
    cli_main()
