"""Round-5 verify drive: raw-DN path end-to-end on the REAL device.

HDF5 store (raw uint16 S2) -> BatchLoader(make_raw_collate) -> jitted eval
step with fused metrics + device radiometry, compared against the
host-processed fp32 path on the same samples. Run as
`python /root/repo/tools/verify_r5.py` (no PYTHONPATH; axon TPU default).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from uncrtaints_tpu.config import Config, derive
from uncrtaints_tpu.models import get_generator
from uncrtaints_tpu.train import create_train_state, make_eval_step
from uncrtaints_tpu.data.hdf5 import HDF5SEN12MSCRTS
from uncrtaints_tpu.data.pipeline import (BatchLoader, collate_multi,
                                          make_raw_collate)

print("backend:", jax.default_backend(), jax.devices())
path = bench._e2e_store(8, frames=4, patch=64)
ds_raw = HDF5SEN12MSCRTS(path, n_input_samples=3, raw_s2=True)
ds_ref = HDF5SEN12MSCRTS(path, n_input_samples=3)
cfg = derive(Config(use_sar=True, scale_by=10.0, batch_size=4, lr=1e-3))
model = get_generator(cfg)

mk = lambda ds, col: next(iter(BatchLoader(
    ds, batch_size=4, shuffle=False, collate=col, use_sar=True,
    num_workers=2, drop_last=True)))
raw = mk(ds_raw, make_raw_collate())
ref = mk(ds_ref, collate_multi)
dev = lambda b, keys: {k: jnp.asarray(b[k]) for k in keys}
raw_b = dev(raw, ("x_s1", "x_s2dn", "y_dn", "dates"))
ref_b = dev(ref, ("x", "y", "dates"))

state = create_train_state(cfg, model, jax.random.PRNGKey(0), raw_b)
ev = make_eval_step(cfg, with_metrics=True)
a_raw, a_ref = ev(state, raw_b), ev(state, ref_b)
print("raw loss", float(a_raw["loss"]), "ref loss", float(a_ref["loss"]))
np.testing.assert_allclose(float(a_raw["loss"]), float(a_ref["loss"]),
                           rtol=1e-5)
for k in a_ref["metrics"]:
    np.testing.assert_allclose(np.asarray(a_raw["metrics"][k]),
                               np.asarray(a_ref["metrics"][k]),
                               rtol=1e-4, atol=1e-5, err_msg=k)
print("raw-DN eval step == host-processed on", jax.default_backend(), "OK")
