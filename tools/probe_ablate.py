"""Marginal in-model cost map: ablate each component of the eval step and
measure the delta. XLA DCEs computations whose outputs are unused, so
replacing a component's output with a cheap substitute measures its true
in-program cost (including lost fusion opportunities).

Run: python tools/probe_ablate.py [names...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def eval_ms(tag, patch=None, iters=20, train=False, loss=None):
    import uncrtaints_tpu.models.layers as L
    import uncrtaints_tpu.models.blocks as Bk
    import uncrtaints_tpu.models.ltae as Lt
    import uncrtaints_tpu.models.aggregator as Ag
    import uncrtaints_tpu.ops.pooling as Pl
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import (create_train_state, make_eval_step,
                                      make_train_step)

    saves = {}
    if patch:
        saves = patch(L, Bk, Lt, Ag, Pl)
    try:
        B = 4 if train else 8
        kw = {"loss": loss} if loss else {}
        cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=B,
                            lr=1e-3, **kw))
        model = get_generator(cfg)
        rng = np.random.default_rng(0)
        T, H = 3, 256
        batch = {
            "x": jnp.asarray(rng.random((B, T, H, H, input_dim(cfg)), dtype=np.float32)),
            "y": jnp.asarray(rng.random((B, 1, H, H, 13), dtype=np.float32)),
            "dates": jnp.asarray(rng.integers(0, 1500, (B, T)).astype(np.float32)),
        }
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        if train:
            tstep = make_train_step(cfg)
            drng = jax.random.PRNGKey(1)
            def step(st, b):
                st, aux = tstep(st, b, drng)
                return st, aux
        else:
            estep = make_eval_step(cfg)
            step = lambda st, b: (st, estep(st, b))
        state, aux = step(state, batch)
        _ = float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, batch)
        _ = float(aux["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:36s} {dt*1e3:8.2f} ms", flush=True)
        return dt
    finally:
        for (obj, name), fn in saves.items():
            setattr(obj, name, fn)


def patch_no_se(L, Bk, Lt, Ag, Pl):
    orig = Bk.SE.__call__
    def p(self, x):
        _ = orig(self, x)
        return x
    Bk.SE.__call__ = p
    return {(Bk.SE, "__call__"): orig}


def patch_no_gelu(L, Bk, Lt, Ag, Pl):
    origs = {}
    for mod in (L, Bk):
        if hasattr(mod, "gelu"):
            origs[(mod, "gelu")] = mod.gelu
            mod.gelu = lambda x: x
    return origs


def patch_no_dw(L, Bk, Lt, Ag, Pl):
    orig = L.Conv2d.__call__
    def p(self, x, input_affine=None):
        y = orig(self, x, input_affine=input_affine)
        return x if self.groups > 1 else y
    L.Conv2d.__call__ = p
    return {(L.Conv2d, "__call__"): orig}


def patch_no_pw(L, Bk, Lt, Ag, Pl):
    """1x1 convs inside MBConv bodies -> slice/tile (kills the GEMM)."""
    orig = L.Conv2d.__call__
    def p(self, x, input_affine=None):
        y = orig(self, x, input_affine=input_affine)
        if self.kernel == 1 and self.groups == 1 and x.shape[-1] != 15:
            cin, cout = x.shape[-1], y.shape[-1]
            if cout > cin:
                return jnp.concatenate([x, x], axis=-1)[..., :cout]
            if cout < cin:
                return x[..., :cout]
            return x
        return y
    L.Conv2d.__call__ = p
    return {(L.Conv2d, "__call__"): orig}


def patch_no_norm(L, Bk, Lt, Ag, Pl):
    orig = L.Norm2d.__call__
    def p(self, x, train=False, fold_only=False):
        y = orig(self, x, train=train, fold_only=fold_only)
        if fold_only:
            return y
        return x
    L.Norm2d.__call__ = p
    return {(L.Norm2d, "__call__"): orig}


def patch_no_ltae(L, Bk, Lt, Ag, Pl):
    orig = Lt.LTAE2dtiny.__call__
    def p(self, x, batch_positions=None, pad_mask=None):
        att = orig(self, x, batch_positions=batch_positions, pad_mask=pad_mask)
        B, T = x.shape[0], x.shape[1]
        return jnp.ones_like(att) / T
    Lt.LTAE2dtiny.__call__ = p
    return {(Lt.LTAE2dtiny, "__call__"): orig}


def patch_no_agg(L, Bk, Lt, Ag, Pl):
    orig = Ag.TemporalAggregator.__call__
    def p(self, x, pad_mask=None, attn_mask=None, train=False):
        y = orig(self, x, pad_mask=pad_mask, attn_mask=attn_mask, train=train)
        return x.mean(axis=1) + 0 * y
    Ag.TemporalAggregator.__call__ = p
    return {(Ag.TemporalAggregator, "__call__"): orig}


def patch_no_pool(L, Bk, Lt, Ag, Pl):
    orig = Pl.adaptive_max_pool2d
    import uncrtaints_tpu.models.uncrtaints as U
    def p(x, hw, **kw):
        s = x.shape[-3] // hw[0]
        return x[..., ::s, ::s, :]
    Pl.adaptive_max_pool2d = p
    U.adaptive_max_pool2d = p
    return {(Pl, "adaptive_max_pool2d"): orig, (U, "adaptive_max_pool2d"): orig}


ALL = {
    "baseline": None,
    "no_se": patch_no_se,
    "no_gelu": patch_no_gelu,
    "no_dw": patch_no_dw,
    "no_pw": patch_no_pw,
    "no_norm": patch_no_norm,
    "no_ltae": patch_no_ltae,
    "no_agg": patch_no_agg,
    "no_pool": patch_no_pool,
}


def main():
    train = "--train" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or list(ALL)
    base = None
    for name in names:
        if name == "l2_loss":
            dt = eval_ms(name, None, train=train, loss="l2")
        else:
            dt = eval_ms(name, ALL[name], train=train)
        if name == "baseline":
            base = dt
        elif base:
            print(f"   -> marginal {(base-dt)*1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
