"""Whole-scene cloud removal with uncertainty, end to end.

Runs the flagship UnCRtainTS model over a scene larger than the 256x256
training crops (here a synthetic 768x1024 composite; a real Sentinel-2
scene would be 10980^2 -- same code, more windows), using
``infer.predict_scene``: overlapping windows batched through one jitted
forward, seamless crossfade blending, blended aleatoric variance.

    python examples/predict_scene.py [--height 768] [--width 1024] \
        [--tile 256] [--overlap 64] [--checkpoint path/to/model.pth.tar]

Without --checkpoint it uses random weights (demonstrates the pipeline,
not the science). With a reference .pth.tar it runs the ported weights
(models/torch_import.py).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--out", type=str, default="/tmp/scene_pred.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.infer import predict_scene
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state

    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=args.batch,
                        lr=1e-3))
    model = get_generator(cfg)
    T, H, W = cfg.input_t, args.height, args.width

    rng = np.random.default_rng(0)
    scene = jnp.asarray(rng.random((T, H, W, input_dim(cfg)),
                                   dtype=np.float32))
    dates = jnp.asarray(np.array([0., 12., 24.], np.float32)[:T])

    init_batch = {
        "x": scene[None, :, :args.tile, :args.tile],
        "y": jnp.zeros((1, 1, args.tile, args.tile, 13)),
        "dates": dates[None],
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), init_batch)
    if args.checkpoint:
        from uncrtaints_tpu.models.torch_import import (
            load_torch_state_dict, import_uncrtaints)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sd = load_torch_state_dict(args.checkpoint)
        variables, matched, missing = import_uncrtaints(variables, sd, cfg)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats",
                                                        state.batch_stats))
        print(f"imported checkpoint: {len(matched)} tensors matched, "
              f"{len(missing)} missing")

    t0 = time.time()
    out = predict_scene(state, cfg, scene, dates, tile=args.tile,
                        overlap=args.overlap, batch_size=args.batch)
    dt = time.time() - t0
    mp = H * W / 1e6
    print(f"scene {H}x{W} ({mp:.1f} MP, T={T}) in {dt:.1f}s "
          f"= {mp / dt:.2f} MP/s  pred {out['pred'].shape} "
          f"var {out['var'].shape}")
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
