"""The shared train/val/test epoch loop.

Re-hosting of the reference's ``iterate()``
(/root/reference/model/train_reconstruct.py:279-447) on the jitted engine:
one device call per batch (the whole optimizer step is fused), per-item
image metrics at eval, TensorBoard panels, plot/export hooks, and epoch-end
calibration (ECE discard curve, UCE/AUCE).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.config import Config
from uncrtaints_tpu.train.engine import dropout_rng
from uncrtaints_tpu.metrics import (
    img_metrics_batch, AvgImgMetrics, compute_ece, compute_uce_auce,
)
from uncrtaints_tpu.train.observe import (
    Writer, plot_img, plot_mask, export, diag_to_covar, plot_discard,
    plot_err_vs_var,
)

S2_BANDS = 13


def _host_row_offset(arr, local_B: int) -> int:
    """This process's starting row in a [B_global, ...] batch-sharded array.

    After the eval allgather the metric vectors are GLOBAL while the host's
    loader batch is its local slice; attribution needs the local->global row
    offset. Deriving it as ``process_index * local_B`` assumes the mesh is
    process-major, which mesh_utils.create_device_mesh does not guarantee
    (it may reorder devices for ICI topology). Instead read the offset off
    the sharding itself: the smallest global batch index among this
    process's addressable shards. ``make_array_from_process_local_data``
    requires each process's span of the global array to be contiguous, so
    the min start fully determines the local->global mapping."""
    if getattr(arr, "is_fully_addressable", True):
        return 0
    return min((s.index[0].start or 0) for s in arr.addressable_shards)


def _to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) jax.Array as a full ndarray.

    ``np.asarray`` raises on arrays spanning non-addressable devices; in
    multi-process runs the global array is allgathered to every host first
    (metric vectors and logged panels are small relative to the step).
    Fully-REPLICATED global arrays (the multi-host replicated-tail batch's
    outputs) are read off a local shard directly — a tiled allgather would
    concatenate n_hosts copies."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def log_aleatoric(writer: Writer, cfg: Config, mode: str, step: int,
                  var: np.ndarray, name: str = "",
                  img_meter: Optional[AvgImgMetrics] = None):
    """Aleatoric-uncertainty panels (train_reconstruct.py:182-221).
    var: [B, 1, H, W, C]."""
    # patch-covariance matshow figures (train_reconstruct.py:184-201):
    # with diagonal covariance the spatially-averaged patch covmat is
    # diag(mean var per band)
    if cfg.loss == "MGNLL" and writer is not None:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        patch_diag = var.mean(axis=(1, 2, 3))         # [B, C]
        for bdx in range(min(2, patch_diag.shape[0])):
            img = np.diag(patch_diag[bdx])
            max_abs = max(abs(float(img.min())), abs(float(img.max()))) or 1.0
            for tag, lim in (("relative", max_abs), ("absolute", 0.25)):
                fig, ax = plt.subplots()
                ax.matshow(img, cmap="seismic", vmin=-lim, vmax=lim)
                ax.axis("off")
                fig.tight_layout()
                writer.add_figure(
                    f"Img/{mode}/patch covmat {tag} {bdx}", fig, step)
                plt.close(fig)

    avg_var = var.mean(axis=-1, keepdims=True)  # over bands
    flat = avg_var[0, 0].reshape(-1)
    q50 = float(np.median(flat))
    q75 = float(np.quantile(flat, 0.75))
    writer.add_image(f"Img/{mode}/{name}aleatoric [0,1]",
                     np.clip(avg_var[0, 0], 0, 1), step)
    writer.add_image(f"Img/{mode}/{name}aleatoric [0,q75]",
                     np.clip(avg_var[0, 0], 0, q75) / (q75 or 1.0), step)
    writer.add_histogram(f"Hist/{mode}/{name}aleatoric",
                         np.clip(flat, 0, 1), step)
    writer.add_scalar(f"{mode}/{name}aleatoric median all", q50, step)
    writer.add_scalar(f"{mode}/{name}aleatoric q75 all", q75, step)
    if img_meter is not None:
        vals = img_meter.value()
        if "UCE SE" in vals:
            writer.add_scalar(f"{mode}/{name}UCE SE", vals["UCE SE"], step)
            writer.add_scalar(f"{mode}/{name}AUCE SE", vals["AUCE SE"], step)


def log_train(writer: Writer, cfg: Config, step: int, batch: Dict,
              pred: np.ndarray, loss: float, var: Optional[np.ndarray] = None):
    """Periodic train logging (train_reconstruct.py:224-258)."""
    writer.add_scalar(f"train/{cfg.loss}", loss, step)
    writer.add_scalar("train/total", loss, step)
    x, y, in_m = batch["x"], batch["y"], batch["masks"]
    if cfg.use_sar:
        writer.add_image("Img/train/in_s1", x[0][..., :1], step)
        writer.add_image("Img/train/in_s2", x[0][..., [5, 4, 3]], step)
    else:
        writer.add_image("Img/train/in_s2", x[0][..., [3, 2, 1]], step)
    writer.add_image("Img/train/out", pred[0, 0][..., [3, 2, 1]], step)
    writer.add_image("Img/train/y", y[0, 0][..., [3, 2, 1]], step)
    writer.add_image("Img/train/m", in_m[0][..., None], step)
    # cloud coverage: covered at ALL (AND) or ANY (OR) time points
    and_m = np.prod(in_m, axis=1, keepdims=True)
    or_m = np.clip(np.sum(in_m, axis=1, keepdims=True), 0, 1)
    writer.add_scalar("train/OR m %", float(or_m.mean()), step)
    writer.add_scalar("train/AND m %", float(and_m.mean()), step)
    writer.add_image("Img/train/AND m", and_m[0][..., None], step)
    writer.add_image("Img/train/OR m", or_m[0][..., None], step)
    if var is not None:
        log_aleatoric(writer, cfg, "train", step, var)


def _device_batch(batch: Dict, sharding=None, replicated: bool = False) -> Dict:
    """Host batch -> device arrays; batch-sharded over the mesh when given
    (params stay replicated; XLA inserts the gradient psum over ICI).

    Multi-host: each host's loader yields only its per-host slice of the
    global batch; ``make_array_from_process_local_data`` assembles the global
    sharded array from the local shards (DCN never sees activations).
    ``replicated=True`` (the multi-host replicated-tail batch, identical on
    every host) places the SAME full array on every device instead."""
    multihost = (sharding is not None
                 and len(sharding.mesh.devices.flatten()) > len(jax.local_devices()))
    if replicated and multihost:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(sharding.mesh, P())
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif multihost:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
        elif sharding is not None:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jnp.asarray(v)
    return out


def _device_prefetch(loader, sharding, depth: int = 2):
    """Yield (host_batch, device_batch) one batch AHEAD of consumption:
    jax device transfers are asynchronous, so enqueueing batch i+1's
    host->device copy before batch i's step is consumed overlaps H2D with
    compute (the jit analogue of flax's prefetch_to_device for pmap)."""
    from collections import deque
    q = deque()
    for batch in loader:
        tail_marker = bool(batch.pop("_replicated_tail", False))
        bsh = sharding
        rep = False
        if sharding is not None:
            n_dev = len(sharding.mesh.devices.flatten())
            multihost = n_dev > len(jax.local_devices())
            B = next(v.shape[0] for v in batch.values() if v is not None)
            # multi-host loaders yield only the per-host SLICE of the global
            # batch (global_B = B * n_hosts), so divisibility is against the
            # local device count; single-host batches are global already
            n_div = len(jax.local_devices()) if multihost else n_dev
            if tail_marker and multihost:
                # the loader's GLOBAL tail, identical on every host (see
                # BatchLoader._plan): run it replicated over the mesh --
                # exact drop_last=False loss/metrics, every host computes
                # the same thing (SPMD stays convergent)
                rep = True
            elif B % n_div != 0:
                # single-host non-divisible tail: run it replicated -- exact
                # loss and metrics at the cost of no parallel speedup for
                # this one batch (+ one extra compile for the tail shape)
                if multihost:
                    raise ValueError(
                        f"per-host batch of {B} is not divisible by the "
                        f"{n_div} local devices and was not marked as a "
                        "replicated global tail; use a sharded BatchLoader "
                        "with drop_last=False")
                bsh = None
        q.append((batch, _device_batch(batch, bsh, replicated=rep)))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def iterate(state, loader, cfg: Config, writer: Optional[Writer],
            mode: str, epoch: int, train_step=None, eval_step=None,
            base_rng: Optional[jax.Array] = None, batch_sharding=None) -> Tuple:
    """One epoch over ``loader``. Returns (state, metrics, img_metrics|None).

    metrics: {f'{mode}_epoch_time', f'{mode}_loss'}; for val/test also the
    averaged image metrics dict (as the reference returns them)."""
    if len(loader) == 0:
        raise ValueError("Received data loader with zero samples!")
    if base_rng is None:
        base_rng = dropout_rng(cfg, cfg.rdm_seed)

    img_meter = AvgImgMetrics()
    losses = []
    errs, errs_se, errs_ae, vars_aleatoric = [], [], [], []
    deferred_bm = []  # per-batch device metric vectors, fetched at epoch end
    n_seen = 0

    t_start = time.time()
    for i, (batch, dev) in enumerate(_device_prefetch(loader, batch_sharding)):
        step = (epoch - 1) * len(loader) + i

        if mode == "train":
            state, aux = train_step(state, dev, jax.random.fold_in(base_rng, step))
            # keep the loss ON DEVICE: a float() here would sync the host
            # to the device every step (one dispatch round-trip per step —
            # especially costly through a remote-tunnel runtime); steps
            # dispatch back-to-back and the scalars are fetched at the
            # display cadence / epoch end
            loss = aux["loss"]
            if writer is not None and step % cfg.display_step == 0:
                pred = _to_host(aux["pred"])
                var = _to_host(aux["var"]) if "var" in aux else None
                log_train(writer, cfg, step, batch, pred, float(loss), var=var)
        else:
            aux = eval_step(state, dev)
            # NOTE: dev must not be touched past this point — CLI-built
            # eval steps donate the batch buffers (engine.make_eval_step)
            loss = aux["loss"]  # stays on device (fetched at epoch end)
            y = batch["y"]
            B = y.shape[0]
            # whole-batch metrics: fused into the eval step when the step
            # was built with with_metrics=True (one dispatch per batch),
            # else one extra jitted call; pred/var stay on device unless a
            # plot/export item actually needs them
            has_var = cfg.loss in ("GNLL", "MGNLL") and "var" in aux
            bm = aux.get("metrics")
            if bm is None:
                bm = img_metrics_batch(dev["y"], aux["pred"],
                                       var=aux["var"] if has_var else None)
            # multi-host: bm's [B_global] device arrays span non-addressable
            # devices; _to_host allgathers them (img_metrics_batch returns
            # raw jax arrays for exactly this reason). batch["y"] is this
            # host's slice, so plot/export index global rows at the
            # sharding-derived offset; the METER aggregates every global
            # row (all hosts report identical full-dataset metrics). The
            # fetch is DEFERRED to epoch end so eval steps dispatch
            # back-to-back (no per-batch host<->device sync); only the
            # sparse plot/export cadence forces a mid-epoch fetch.
            off = _host_row_offset(aux["pred"] if "pred" in aux
                                   else next(iter(bm.values())), B)
            deferred_bm.append(bm)
            pred = var = None  # host copies, materialized lazily below
            for bdx in range(B):
                # sequential sample id (reference: i*batch_size+bdx with the
                # CONFIGURED size, train_reconstruct.py:338 -- using the
                # current batch's B would collide tail-batch ids with
                # earlier samples and overwrite their plot/export files)
                idx = n_seen + bdx
                need_host = (
                    (cfg.plot_every > 0 and idx % cfg.plot_every == 0)
                    or (cfg.export_every > 0 and idx % cfg.export_every == 0))
                if need_host and pred is None:
                    if "pred" not in aux:
                        raise ValueError(
                            "plot/export cadence hit but the eval step was "
                            "built with return_outputs=False; build it with "
                            "outputs when plot_every/export_every > 0")
                    pred = _to_host(aux["pred"])
                    var = _to_host(aux["var"]) if "var" in aux else None
                if cfg.plot_every > 0 and idx % cfg.plot_every == 0:
                    plot_dir = os.path.join(cfg.res_dir, cfg.experiment_name,
                                            "plots", f"epoch_{epoch}", mode)
                    plot_img(batch["x"][bdx], "in", plot_dir, file_id=idx)
                    plot_img(pred[off + bdx], "pred", plot_dir, file_id=idx)
                    plot_img(y[bdx], "target", plot_dir, file_id=idx)
                    err_img = ((pred[off + bdx] - y[bdx]) ** 2).mean(-1, keepdims=True)
                    plot_img(err_img, "err", plot_dir, file_id=idx)
                    # discrete matshow of the time-mean input cloud mask
                    # (train_reconstruct.py:345)
                    plot_mask(np.asarray(batch["masks"][bdx]).mean(axis=0),
                              cfg.input_t, plot_dir, file_id=idx)
                    if var is not None:
                        plot_img(var[off + bdx].mean(-1, keepdims=True), "var",
                                 plot_dir, file_id=idx)
                if cfg.export_every > 0 and idx % cfg.export_every == 0:
                    export_dir = os.path.join(cfg.res_dir, cfg.experiment_name,
                                              "export", f"epoch_{epoch}", mode)
                    export(pred[off + bdx], "pred", export_dir, file_id=idx)
                    export(y[bdx], "target", export_dir, file_id=idx)
                    if var is not None:
                        if cfg.loss == "MGNLL":
                            # reference parity (train_reconstruct.py:351-353):
                            # MGNLL exports the [C,C,H,W] covariance tensor
                            # its ensemble tooling consumes
                            export(diag_to_covar(var[off + bdx]), "covar",
                                   export_dir, file_id=idx)
                        else:
                            export(var[off + bdx], "var", export_dir,
                                   file_id=idx)
            n_seen += B

        losses.append(loss)

    # drain the epoch's scalars/metric vectors: issue ALL host copies
    # asynchronously first so the fetches overlap (sequential float() calls
    # would pay one device round-trip each), then materialize
    for l in losses:
        if isinstance(l, jax.Array) and l.is_fully_addressable:
            l.copy_to_host_async()
    for bm in deferred_bm:
        for v in bm.values():
            if isinstance(v, jax.Array) and v.is_fully_addressable:
                v.copy_to_host_async()
    losses = [float(l) for l in losses]
    has_var_epoch = cfg.loss in ("GNLL", "MGNLL")
    n_total = 0  # GLOBAL sample count (== n_seen on a single host)
    for bm in deferred_bm:
        bm = {k: _to_host(v) for k, v in bm.items()}
        n_rows = len(next(iter(bm.values())))
        n_total += n_rows
        for bdx in range(n_rows):
            em = {k: float(v[bdx]) for k, v in bm.items()}
            if has_var_epoch and "mean var" in em:
                vars_aleatoric.append(em["mean var"])
                errs.append(em["error"])
                errs_se.append(em["mean se"])
                errs_ae.append(em["mean ae"])
            img_meter.add(em)
    total_time = time.time() - t_start
    print(f"Epoch time : {total_time:.1f}s")
    metrics = {f"{mode}_epoch_time": total_time,
               f"{mode}_loss": float(np.mean(losses))}

    if mode == "train":
        return state, metrics, None

    # --- eval epoch end: scalar logs + calibration -----------------------
    last_step = epoch * len(loader)
    if writer is not None:
        for key, val in img_meter.value().items():
            if np.ndim(val) == 0 and np.isfinite(val):
                writer.add_scalar(f"{mode}/{key}", float(val), last_step)
        writer.add_scalar(f"{mode}/loss", metrics[f"{mode}_loss"], last_step)

    if cfg.loss in ("GNLL", "MGNLL") and len(vars_aleatoric) > 0:
        sorted_errors_se = compute_ece(vars_aleatoric, errs_se, n_total, percent=5)
        plot_discard(sorted_errors_se, cfg, mode, last_step, writer, is_se=True)
        uce, auce, detail = compute_uce_auce(vars_aleatoric, errs, n_total,
                                             percent=5, l2=True)
        plot_err_vs_var(detail, mode, last_step, writer, l2=True)
        img_meter["UCE SE"] = uce
        img_meter["AUCE SE"] = auce
        if writer is not None and "var" in aux:
            log_aleatoric(writer, cfg, mode, last_step,
                          _to_host(aux["var"]), "model/", img_meter)

    return state, metrics, img_meter.value()
