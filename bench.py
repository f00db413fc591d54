"""Benchmark: end-to-end eval throughput of the flagship UNCRTAINTS model.

Metric: 256x256, t=3 sequences/sec/chip through the full jitted eval step
(forward + MGNLL loss + rescale), matching BASELINE.md's north-star metric.
vs_baseline compares against the driver-set reference point of a V100-class
GPU running the PyTorch reference (BASELINE.json: >=10x target per v5e chip).

Modes:
  (default)  device-step throughput on a pre-staged batch
  --train    train-step (fwd + MGNLL + backward + Adam) throughput
  --e2e      full-pipeline throughput: HDF5 store -> BatchLoader (thread
             prefetch + native collation) -> host->device transfer -> eval
             step. This is the literal BASELINE.json metric ("end-to-end
             test-split throughput"); it also reports the host-pipeline-only
             rate so host-vs-device utilization is visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# PyTorch-reference V100 throughput anchors, derived from measurement
# (see BASELINE.md "Grounding the V100 anchor"): the actual reference
# measured on this host's CPU (eval fwd+MGNLL 0.199 seq/s; train step
# 0.0328 seq/s at B=1, 256x256, t=3), scaled by the fp32-peak ratio
# V100/host = 15.7 TF / 130.6 GF (host peak measured with a 2048^3 torch
# matmul) = 120x. This is favorable to the reference (assumes eager torch
# sustains the same fraction of peak on V100 as on CPU).
V100_REFERENCE_SEQ_PER_SEC = 23.9        # eval: 0.199 * 120
V100_REFERENCE_TRAIN_SEQ_PER_SEC = 3.94  # train: 0.0328 * 120

# v5e single-chip peaks (published spec) for the hardware-grounded
# utilization numbers: MFU against the bf16 MXU peak (the model's compute
# dtype) and the HBM-roofline fraction against peak memory bandwidth.
V5E_PEAK_BF16_FLOPS_PER_SEC = 197e12
V5E_PEAK_HBM_BYTES_PER_SEC = 819e9


def _hardware_utilization(step_fn, step_args, step_seconds: float) -> dict:
    """MFU + HBM-roofline fraction from the compiled step's own cost
    analysis (flops and bytes accessed per step) over the measured wall
    time. Grounds the perf claim in hardware truth, unlike the extrapolated
    V100 anchor; the reference's equivalent was fvcore FLOP counting under
    --profile (base_model.py:64-71). Returns {} off-TPU or when the backend
    exposes no cost model.

    Caveats (labeled in the emitted JSON): XLA's 'bytes accessed' sums
    per-op operand bytes, not post-fusion HBM traffic, so hbm_fraction is
    an UPPER-BOUND estimate of real HBM utilization; mfu is the analytical
    flop count over measured wall time (the standard definition)."""
    if jax.default_backend() != "tpu":
        return {}
    try:
        cost = step_fn.lower(*step_args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        hbm_bytes = float(cost.get("bytes accessed", 0.0))
    except Exception as e:
        sys.stderr.write(f"cost analysis unavailable: {e}\n")
        return {}
    out = {}
    if flops > 0:
        tflops = flops / step_seconds / 1e12
        out["tflops_per_sec"] = round(tflops, 2)
        out["mfu"] = round(tflops * 1e12 / V5E_PEAK_BF16_FLOPS_PER_SEC, 4)
    if hbm_bytes > 0:
        out["hbm_fraction"] = round(
            hbm_bytes / step_seconds / V5E_PEAK_HBM_BYTES_PER_SEC, 4)
        # XLA cost-model operand bytes, not measured post-fusion traffic
        out["hbm_fraction_basis"] = "xla_cost_model_upper_bound"
    return out


def main(train: bool = False, batch_size: int = None):
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step, make_train_step

    # eval: B=16 -- the round-4 on-chip sweep measured 244.6 seq/s at B=16
    # vs 233.5 at B=8 (tunnel-budget OOMs recur in degraded sessions; the
    # fallback below retries at B=8, the known-good shape, in a fresh
    # process).
    # train: B=8 WITHOUT remat -- the throughput optimum across rounds
    # (round 5: 53.5 seq/s with the conv-form dw backward + step-gated pw
    # VJP, vs 40.4 at the paper-recipe B=4 and 51.1 at B=16). The
    # paper-recipe arm stays available via --train --batch 4.
    if batch_size is None:
        batch_size = 8 if train else 16
    cfg = derive(Config(use_sar=True, scale_by=10.0,
                        batch_size=batch_size, lr=1e-3))
    model = get_generator(cfg)

    B, T, H, W = cfg.batch_size, cfg.input_t, 256, 256
    # generate the bench batch ON DEVICE (uniform [0,1), same distributions
    # as the previous host-numpy batch): the axon tunnel's fresh-content
    # H2D bandwidth is shared infrastructure and was measured as low as
    # 2.5 MB/s (round 5) — a ~190 MB host batch would stall setup for
    # minutes. Steady-state step timing never re-transfers the batch, so
    # the metric is unchanged; --e2e keeps the real host->device path.
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    batch = {
        "x": jax.random.uniform(ks[0], (B, T, H, W, input_dim(cfg)),
                                jnp.float32),
        "y": jax.random.uniform(ks[1], (B, 1, H, W, 13), jnp.float32),
        "dates": jnp.floor(jax.random.uniform(ks[2], (B, T), jnp.float32,
                                              0.0, 1500.0)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    if train:
        # the train step DONATES the state buffer -- thread it through,
        # exactly as a real training loop does
        step_fn = make_train_step(cfg)
        drng = jax.random.PRNGKey(1)
        name = "uncrtaints_256px_t3_train_throughput"

        def run(st):
            st, aux = step_fn(st, batch, drng)
            return st, aux
    else:
        eval_step = make_eval_step(cfg)
        run = lambda st: (st, eval_step(st, batch))
        name = "uncrtaints_256px_t3_eval_throughput"

    # warmup / compile (axon's first post-compile dispatch is slow)
    for _ in range(3):
        state, aux = run(state)
        _ = float(aux["loss"])  # scalar round-trip = reliable sync on axon

    # sustained serving throughput: steps dispatch back-to-back (device
    # executes them in stream order), one sync at the end. Verified to scale
    # linearly in iteration count, i.e. every step really executes.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = run(state)
    _ = float(aux["loss"])
    dt = time.perf_counter() - t0

    seq_per_sec = iters * B / dt
    anchor = (V100_REFERENCE_TRAIN_SEQ_PER_SEC if train
              else V100_REFERENCE_SEQ_PER_SEC)
    if train:
        util = _hardware_utilization(step_fn, (state, batch, drng), dt / iters)
    else:
        util = _hardware_utilization(eval_step, (state, batch), dt / iters)
    import os
    print(json.dumps({
        "metric": name,
        "value": round(seq_per_sec, 2),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(seq_per_sec / anchor, 2),
        # the anchor is an extrapolation (reference measured on this host's
        # CPU, scaled by the V100/host fp32 peak-FLOPs ratio), not a V100
        # measurement -- don't read vs_baseline as a measured comparison
        "vs_baseline_estimated": True,
        "baseline_source": "cpu_measured_x_peak_flops_ratio",
        "batch_size": B,
        # host context: dispatch runs on the host, and this box's core count
        # varies per round (observed 1 core in round 3) -- record it so
        # wall-vs-device gaps are interpretable across rounds
        "host_cpus": os.cpu_count(),
        # hardware-grounded utilization (compiled-step cost analysis over
        # measured wall time): tflops_per_sec, mfu (vs v5e bf16 peak),
        # hbm_fraction (vs v5e peak HBM bandwidth -- the honest roofline
        # for this memory-bound model)
        **util,
    }))


def _e2e_store(n_patches: int, frames: int, patch: int) -> str:
    """Build (or reuse) a synthetic HDF5 store shaped like a converted
    SEN12MS-CR-TS test split: per patch a short frame series of raw-DN S2
    (uint16), preprocessed S1, masks, coverage, day offsets."""
    import os
    import tempfile
    from uncrtaints_tpu.data.synthetic import SyntheticSEN12MSCRTS
    from uncrtaints_tpu.data.hdf5 import convert_to_hdf5

    path = os.path.join(tempfile.gettempdir(),
                        f"uncrtaints_e2e_{n_patches}p{frames}f{patch}px.h5")
    if os.path.exists(path):
        return path

    class _Generic(SyntheticSEN12MSCRTS):
        def __getitem__(self, pdx):
            s = super().__getitem__(pdx)
            return {"S1": s["input"]["S1"], "S2": s["input"]["S2"],
                    "masks": s["input"]["masks"],
                    "coverage": s["input"]["coverage"],
                    "S1 TD": s["input"]["S1 TD"],
                    "S2 TD": s["input"]["S2 TD"]}

    src = _Generic(n_samples=n_patches, n_input_t=frames, patch_size=patch)
    tmp = path + ".tmp"
    convert_to_hdf5(src, tmp, compression=None)  # uncompressed = honest read BW
    import os as _os
    _os.replace(tmp, path)
    return path


def main_e2e(batch_size: int = 16, n_patches: int = 64, epochs: int = 4,
             num_workers: int = 8, host_radiometry: bool = False):
    """End-to-end: HDF5 -> BatchLoader threads (sampler + uint16 decode +
    collation) -> device_put -> jitted eval step, steps pipelined, one sync
    per epoch.

    Default path (round 5): the collate ships RAW uint16 S2 DN — a
    layout-only native copy, no host arithmetic — and the process_MS
    radiometry runs fused into the device step (engine._prepare_xy). H2D
    bytes of x's 13 S2 channels + y halve vs fp32. ``--host_radiometry``
    keeps the round-4 arm (host LUT collate, bf16 x) for A/B."""
    from uncrtaints_tpu.config import Config, derive
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state, make_eval_step
    from uncrtaints_tpu.data.hdf5 import HDF5SEN12MSCRTS
    from uncrtaints_tpu.data.pipeline import make_fast_collate, make_raw_collate, BatchLoader

    path = _e2e_store(n_patches, frames=5, patch=256)
    ds = HDF5SEN12MSCRTS(path, n_input_samples=3, raw_s2=True)
    cfg = derive(Config(use_sar=True, scale_by=10.0,
                        batch_size=batch_size, lr=1e-3))
    model = get_generator(cfg)
    from ml_dtypes import bfloat16 as np_bf16
    if host_radiometry:
        # round-4 arm: uint16-DN radiometry as a host LUT fused with the
        # transpose + bf16 cast (one native pass per frame)
        collate = make_fast_collate(x_dtype=np_bf16)
        keys = ("x", "y", "dates")
    else:
        # raw-DN arm: zero host arithmetic; S1 ships bf16, S2/y ship uint16
        collate = make_raw_collate(s1_dtype=np_bf16)
        keys = ("x_s1", "x_s2dn", "y_dn", "dates")
    loader = BatchLoader(ds, batch_size=batch_size, shuffle=False,
                         collate=collate, use_sar=True,
                         num_workers=num_workers, drop_last=True)

    def device_batch(b):
        return {k: jnp.asarray(b[k]) for k in keys}

    # collate the init/compile batch directly (an abandoned BatchLoader
    # iterator would leave its producer thread blocked on the full prefetch
    # queue, pinning collated batches for the process lifetime)
    first = device_batch(collate([ds[i] for i in range(batch_size)],
                                 use_sar=True))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), first)
    # the REAL serving path the CLIs run: metrics fused into the step, input
    # buffers donated (each device batch is used exactly once here;
    # `first` is not read again after this compile call)
    eval_step = make_eval_step(cfg, with_metrics=True, donate_batch=True)
    aux = eval_step(state, first)   # compile
    _ = float(aux["loss"])

    # host-pipeline-only rate (loader saturated, no device work)
    n_seq = len(loader) * batch_size
    t0 = time.perf_counter()
    for b in loader:
        pass
    host_dt = time.perf_counter() - t0
    host_rate = n_seq / host_dt

    # end-to-end: stream epochs through the device, sync once per epoch
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        for b in loader:
            aux = eval_step(state, device_batch(b))
            total += batch_size
        _ = float(aux["loss"])
    dt = time.perf_counter() - t0
    seq_per_sec = total / dt

    # H2D cost accounting: on a tunnelled runtime (axon) the end-to-end
    # number can be TRANSFER-bound, not host- or device-bound — measure the
    # fresh-content H2D bandwidth so the JSON says which regime this run
    # was in. (Re-sending the SAME buffer measures the tunnel's content
    # cache, round-5 finding: 1.6 GB/s cached vs ~25 MB/s fresh.)
    h2d_bytes_per_seq = sum(
        np.asarray(v).nbytes for v in collate(
            [ds[i] for i in range(batch_size)], use_sar=True).values()
    ) / batch_size
    fresh = np.random.default_rng(1).integers(
        0, 65535, (32 << 20) // 2, dtype=np.uint16)  # 64 MB, incompressible
    t0 = time.perf_counter()
    jnp.asarray(fresh).block_until_ready()
    h2d_fresh_mb_s = fresh.nbytes / (time.perf_counter() - t0) / 1e6
    h2d_bound = h2d_fresh_mb_s * 1e6 / h2d_bytes_per_seq

    print(json.dumps({
        "metric": "uncrtaints_256px_t3_e2e_eval_throughput",
        "value": round(seq_per_sec, 2),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(seq_per_sec / V100_REFERENCE_SEQ_PER_SEC, 2),
        "vs_baseline_estimated": True,
        "baseline_source": "cpu_measured_x_peak_flops_ratio",
        "host_pipeline_only_seq_per_sec": round(host_rate, 2),
        "host_cpus": os.cpu_count(),
        "includes_image_metrics": True,  # fused into the step (CLI path)
        "radiometry": "host_lut" if host_radiometry else "device_raw_dn",
        "h2d_mb_per_seq": round(h2d_bytes_per_seq / 1e6, 2),
        "h2d_fresh_mb_per_sec": round(h2d_fresh_mb_s, 1),
        "h2d_bandwidth_bound_seq_per_sec": round(h2d_bound, 2),
        "transfer_bound": bool(h2d_bound < min(host_rate, 100.0)),
    }))


def main_scene(scene_hw: int = 1024, tile: int = 256, overlap: int = 64,
               batch_size: int = 8, iters: int = 3):
    """Whole-scene serving throughput: infer.predict_scene (overlapping
    window batches through the jitted forward + host crossfade blending)
    over a synthetic [T, scene_hw, scene_hw, C] scene. Reports output
    megapixels/sec end-to-end plus the 256-squared-sequence equivalent so
    it is comparable with the eval anchor."""
    from uncrtaints_tpu.config import Config, derive, input_dim
    from uncrtaints_tpu.models import get_generator
    from uncrtaints_tpu.train import create_train_state
    from uncrtaints_tpu.infer import predict_scene

    cfg = derive(Config(use_sar=True, scale_by=10.0,
                        batch_size=batch_size, lr=1e-3))
    model = get_generator(cfg)
    T, C = cfg.input_t, input_dim(cfg)
    rng = np.random.default_rng(0)
    scene = rng.random((T, scene_hw, scene_hw, C), dtype=np.float32)
    dates = jnp.asarray(np.arange(T, dtype=np.float32) * 12.0)  # [T]
    init_batch = {
        "x": jnp.zeros((batch_size, T, tile, tile, C)),
        "y": jnp.zeros((batch_size, 1, tile, tile, 13)),
        "dates": jnp.zeros((batch_size, T)),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), init_batch)

    out = predict_scene(state, cfg, scene, dates, tile=tile,
                        overlap=overlap, batch_size=batch_size)  # compile
    assert out["pred"].shape == (1, scene_hw, scene_hw, 13)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict_scene(state, cfg, scene, dates, tile=tile,
                            overlap=overlap, batch_size=batch_size)
    dt = time.perf_counter() - t0

    mpix = iters * scene_hw * scene_hw / dt / 1e6
    seq_equiv = iters * scene_hw * scene_hw / dt / (256 * 256)
    print(json.dumps({
        "metric": "uncrtaints_scene_serving_throughput",
        "value": round(mpix, 2),
        "unit": "output_megapixels/sec/chip",
        "seq256_equivalent_per_sec": round(seq_equiv, 2),
        "vs_baseline": round(seq_equiv / V100_REFERENCE_SEQ_PER_SEC, 2),
        "vs_baseline_estimated": True,
        "baseline_source": "cpu_measured_x_peak_flops_ratio",
        "scene_hw": scene_hw, "tile": tile, "overlap": overlap,
        "batch_size": batch_size,
    }))


def _wait_for_device(max_wait: float = 600.0) -> bool:
    """The axon TPU tunnel can be transiently down, in which case ANY
    jax.devices() call blocks indefinitely (observed round 3: >1 h outage).
    Probe in short-lived child processes until the backend answers, so the
    bench either runs or fails fast with a diagnostic -- never hangs the
    driver."""
    import subprocess
    deadline = time.time() + max_wait
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=90, capture_output=True)
            if p.returncode == 0:
                return True
            sys.stderr.write(f"device probe {attempt}: rc={p.returncode} "
                             f"{p.stderr.decode()[-200:]}\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"device probe {attempt}: timed out "
                             f"(tunnel down?)\n")
        time.sleep(15)
    return False


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="benchmark the train step instead of eval")
    ap.add_argument("--e2e", action="store_true",
                    help="benchmark the full host pipeline + eval step")
    ap.add_argument("--scene", action="store_true",
                    help="benchmark whole-scene serving (infer.predict_scene)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the default batch size")
    ap.add_argument("--host_radiometry", action="store_true",
                    help="e2e A/B arm: host-LUT radiometry (round-4 path) "
                         "instead of raw-DN device radiometry")
    args = ap.parse_args()
    if not _wait_for_device():
        sys.stderr.write("bench: no jax backend became available within the "
                         "wait budget; aborting instead of hanging\n")
        sys.exit(3)
    if args.e2e:
        try:
            main_e2e(batch_size=args.batch or 16,
                     host_radiometry=args.host_radiometry)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) and args.batch is None:
                # same flaky device-buffer exhaustion story as the device
                # bench below: retry at the known-good smaller batch in a
                # FRESH process
                import subprocess
                sys.stderr.write("e2e batch exhausted device buffers; "
                                 "retrying at B=8 in a clean process\n")
                cmd = [sys.executable, __file__, "--e2e", "--batch", "8"]
                if args.host_radiometry:
                    cmd.append("--host_radiometry")
                sys.exit(subprocess.run(cmd).returncode)
            raise
        sys.exit(0)
    if args.scene:
        main_scene(batch_size=args.batch or 8)
        sys.exit(0)
    try:
        main(train=args.train, batch_size=args.batch)
    except Exception as e:
        import os as _os
        import subprocess
        oom = "RESOURCE_EXHAUSTED" in str(e)
        if oom and args.batch is None:
            # device-buffer exhaustion through axon is flaky: retry smaller
            # in a FRESH process (the failed attempt's buffers are not
            # reliably reclaimed in-process through the tunnel). Each mode
            # falls back to its known-good smaller shape: eval B=8 (233
            # seq/s round 3), train B=4 (the paper recipe, 26.3 seq/s).
            fallback = 4 if args.train else 8
            sys.stderr.write(f"default batch exhausted device buffers; "
                             f"retrying at B={fallback} in a clean process\n")
            cmd = [sys.executable, __file__, "--batch", str(fallback)]
            if args.train:
                cmd.append("--train")
            sys.exit(subprocess.run(cmd).returncode)
        if (not oom and _os.environ.get("UNCR_AGG_KERNEL") == "1"
                and _os.environ.get("UNCR_DW_GW") != "1"):
            # opt-in Pallas kernels are Mosaic-compiled only at runtime; if
            # an experiment env enabled one and something non-OOM breaks,
            # record a number on the default XLA path rather than nothing.
            # Not taken for OOM (the kernel is never the cause) nor under
            # UNCR_DW_GW=1 (an A/B arm failure should be recorded as such,
            # not retried with the experiment flag still inherited).
            sys.stderr.write(f"bench failed ({type(e).__name__}: {e}); "
                             f"retrying once with UNCR_AGG_KERNEL=0\n")
            env = dict(_os.environ, UNCR_AGG_KERNEL="0")
            cmd = [sys.executable, __file__]
            if args.train:
                cmd.append("--train")
            if args.batch is not None:
                cmd += ["--batch", str(args.batch)]
            sys.exit(subprocess.run(cmd, env=env).returncode)
        if (not oom and args.train
                and "UNCR_DW_GW" not in _os.environ):
            # the shape-aware dispatch (models/layers.py) turns the Pallas
            # dwgrad kernel ON by default for small train batches; if a
            # toolchain change ever breaks its Mosaic compile, still record
            # a number on the XLA tap form rather than nothing.
            sys.stderr.write(f"train bench failed ({type(e).__name__}: {e});"
                             f" retrying once with UNCR_DW_GW=0\n")
            env = dict(_os.environ, UNCR_DW_GW="0")
            cmd = [sys.executable, __file__, "--train"]
            if args.batch is not None:
                cmd += ["--batch", str(args.batch)]
            sys.exit(subprocess.run(cmd, env=env).returncode)
        raise
