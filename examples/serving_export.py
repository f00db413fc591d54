"""Train-side export -> server-side inference, with zero model code shared.

Demonstrates the ahead-of-time serving path (uncrtaints_tpu/export.py):
the "trainer" half builds a model (optionally from a reference .pth.tar
checkpoint via the torch importer) and freezes it into a StableHLO
artifact; the "server" half deserializes the artifact and runs inference
at whatever batch size arrives — no Config, no Flax module, no parameter
tree on the serving side.

    python examples/serving_export.py [--height 256 --width 256] \
        [--checkpoint model.pth.tar] [--out /tmp/uncrtaints.uxp]

Small shapes by default so the CPU backend stays fast; on a TPU host the
artifact is lowered for both tpu and cpu.
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--out", type=str, default="/tmp/uncrtaints.uxp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.export import load_serving, save_serving
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state

    # ---- trainer side ---------------------------------------------------
    cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=2, lr=1e-3))
    model = get_generator(cfg)
    T, C = cfg.input_t, input_dim(cfg)
    key = jax.random.PRNGKey(0)
    init_batch = {"x": jnp.zeros((2, T, args.height, args.width, C)),
                  "y": jnp.zeros((2, 1, args.height, args.width, 13)),
                  "dates": jnp.zeros((2, T))}
    state = create_train_state(cfg, model, key, init_batch)
    if args.checkpoint:
        from uncrtaints_tpu.models.torch_import import (
            import_uncrtaints, load_torch_state_dict)
        sd = load_torch_state_dict(args.checkpoint)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables, matched, missing = import_uncrtaints(variables, sd, cfg)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats",
                                                        state.batch_stats))
        print(f"imported reference weights: {matched} matched, "
              f"{len(missing)} missing")

    platforms = ("tpu", "cpu") if jax.default_backend() == "tpu" else ("cpu",)
    t0 = time.perf_counter()
    save_serving(state, cfg, args.out, height=args.height, width=args.width,
                 platforms=platforms)
    print(f"exported {os.path.getsize(args.out)} bytes "
          f"({platforms}) in {time.perf_counter() - t0:.1f}s -> {args.out}")

    # ---- server side (no model code) ------------------------------------
    serve = load_serving(args.out)
    for B in (1, 3):
        x = jax.random.normal(key, (B, T, args.height, args.width, C))
        dates = jnp.tile(jnp.arange(float(T))[None], (B, 1))
        t0 = time.perf_counter()
        out = serve(x, dates)
        pred = np.asarray(out["pred"])
        print(f"B={B}: pred {pred.shape}, var {np.asarray(out['var']).shape}, "
              f"{time.perf_counter() - t0:.2f}s "
              f"(finite={np.isfinite(pred).all()})")


if __name__ == "__main__":
    main()
