"""Roofline-honest V100 ceilings for the reference eval step (VERDICT r4 #9).

BASELINE.md's V100 anchor (23.9 seq/s) extrapolates a same-host CPU
measurement by the peak-FLOPs ratio. This probe grounds the anchor from the
other side: UPPER BOUNDS on what the reference's eager-PyTorch graph could
possibly sustain on a V100, independent of any CPU measurement.

Method: run the actual reference model (/root/reference, imported read-only)
under forward hooks that record, per executed leaf module, the input and
output tensor bytes and the op count. Eager torch materializes every module
boundary to HBM, so per sequence the device must move at least
(input+output bytes) across HBM, and must pay at least one kernel launch
per op. That yields two independent ceilings for a V100:

  t_step >= hbm_bytes / 900 GB/s        (V100 HBM2 peak)
  t_step >= n_ops * t_launch            (5-10 us/launch typical CUDA eager)

Functional ops invisible to module hooks (tensor arithmetic inside
forward(), cat/pad/interpolate, the MGNLL vmap) only ADD traffic and
launches, and the backward pass roughly doubles both — the printed eval
ceilings are therefore strictly GENEROUS to the reference.

Run:  python tools/probe_ref_bytes.py   (CPU, ~1 min)
"""

import json
import sys

import numpy as np


def main(B=1, T=3, H=256):
    import torch
    sys.path.insert(0, "/root/reference/model")
    from src.backbones.uncrtaints import UNCRTAINTS

    model = UNCRTAINTS(
        input_dim=15, out_conv=[26], covmode="diag", scale_by=10.0,
        out_nonlin_mean=False, out_nonlin_var="softplus",
    ).eval()

    stats = {"ops": 0, "in_bytes": 0, "out_bytes": 0}

    def nbytes(t):
        if isinstance(t, torch.Tensor):
            return t.numel() * t.element_size()
        if isinstance(t, (list, tuple)):
            return sum(nbytes(u) for u in t)
        return 0

    def hook(mod, inp, out):
        stats["ops"] += 1
        stats["in_bytes"] += nbytes(inp)
        stats["out_bytes"] += nbytes(out)

    leaves = [m for m in model.modules()
              if len(list(m.children())) == 0]
    for m in leaves:
        m.register_forward_hook(hook)

    x = torch.rand(B, T, 15, H, H)
    dates = torch.randint(0, 1500, (B, T)).float()
    with torch.no_grad():
        model(x, batch_positions=dates)

    hbm_bytes = stats["in_bytes"] + stats["out_bytes"]
    v100_bw = 900e9          # HBM2 peak
    launch = 7.5e-6          # mid of the 5-10 us eager-CUDA launch range
    t_bytes = hbm_bytes / v100_bw
    t_launch = stats["ops"] * launch
    out = {
        "shape": f"B={B} T={T} {H}x{H} fp32 eager",
        "leaf_module_ops_per_fwd": stats["ops"],
        "hbm_bytes_per_fwd": hbm_bytes,
        "hbm_gb_per_seq": hbm_bytes / B / 1e9,
        "v100_bytes_ceiling_seq_per_s": B / t_bytes,
        "v100_launch_ceiling_seq_per_s": B / t_launch,
        "v100_combined_ceiling_seq_per_s": B / max(t_bytes, t_launch),
        "note": ("ceilings for the reference EVAL fwd(+materialized "
                 "boundaries only); functional ops and the MGNLL add more, "
                 "train roughly 3x"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
