"""Device-mesh runtime: the TPU-native replacement for the reference's
single-GPU + DataLoader-worker execution model (SURVEY.md section 2,
'Parallelism & distributed communication').

Design: a 1-D ``data`` mesh over ICI. The model (~1-2M params) is far below
HBM capacity, so parameters are replicated and the batch axis is sharded;
the jitted train step's gradient mean compiles to a single ``psum`` over ICI
-- no NCCL/MPI analogue, no hand-written collectives. Multi-host extension:
``jax.distributed.initialize()`` then the same mesh spans all hosts with DCN
between slices (per-host data feeding handled by the input pipeline's
``shard`` option).

Rationale for no TP/PP: see SURVEY.md section 2 -- at this model scale the
only profitable parallel axes are batch and H x W. Batch is covered by the
1-D ``data`` mesh; for inputs too large for one chip's HBM at batch
granularity (full Sentinel-2 scenes are 10980^2 vs the training crops'
256^2), :func:`make_mesh_2d` adds a ``spatial`` axis that shards the image
H dimension -- GSPMD inserts the conv halo exchanges and the norm/attention
reductions over ICI automatically (the TPU-idiomatic form of spatial
partitioning; no hand-written halo code).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize ``jax.distributed`` when the environment indicates a
    multi-host run, and return ``(process_index, process_count)``.

    Triggered by the standard coordination env vars
    (``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``, with
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` read by jax itself); single-host
    runs skip initialization entirely. Idempotent. This is the DCN half of
    the reference's missing distributed story (SURVEY.md section 2): the same
    1-D data mesh then spans all hosts, with gradient psums riding ICI within
    a slice and DCN between slices."""
    global _distributed_initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if coord and not _distributed_initialized:
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            # jax reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
            # JAX_PROCESS_ID itself
            jax.distributed.initialize()
        else:
            # bare COORDINATOR_ADDRESS: initialize() with no args would
            # ignore it (it only reads the JAX_* vars or cluster
            # auto-detection), so pass everything explicitly
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("PROCESS_ID", "0")))
        _distributed_initialized = True
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Raises if fewer than ``n_devices`` devices are available -- a silently
    shrunken mesh would let multi-chip checks "pass" on one device.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available ({[d.platform for d in devices]})")
        devices = devices[:n_devices]
    return Mesh(mesh_utils.create_device_mesh(
        (len(devices),), devices=devices), axis_names=("data",))


def make_mesh_2d(n_data: int, n_spatial: int, devices=None) -> Mesh:
    """2-D ``data x spatial`` mesh: batch over ``data``, image rows over
    ``spatial``. Raises on device shortfall like :func:`make_mesh`."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise RuntimeError(
            f"make_mesh_2d: requested {n_data}x{n_spatial}={need} devices "
            f"but only {len(devices)} available "
            f"({[d.platform for d in devices]})")
    return Mesh(mesh_utils.create_device_mesh(
        (n_data, n_spatial), devices=devices[:need]),
        axis_names=("data", "spatial"))


def spatial_sharding(mesh: Mesh, ndim: int, h_axis: int = 2) -> NamedSharding:
    """Batch on ``data``, image-row axis ``h_axis`` on ``spatial``; all other
    axes replicated. For the standard [B, T, H, W, C] inputs h_axis=2; for
    [B, 1, H, W, C] targets likewise."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(a, sh) if hasattr(a, "shape") and a.ndim > 0
        else a, batch)
