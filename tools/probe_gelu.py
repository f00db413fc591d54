"""Microbench GELU variants at the encoder-pass shape [48,256,256,256] bf16.

Axon's remote-compile makes EVERY jit ~3-5 min, so all variants live in ONE
jitted function (optimization_barrier between stages prevents CSE) and
per-variant time comes from the xplane trace.

Run: python tools/probe_gelu.py
"""

import glob
import os
import tempfile
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from uncrtaints_tpu.models.layers import gelu as gelu_current

SHAPE = (48, 256, 256, 256)

# deg-16 power-basis Phi fit on [-5, 3.25] (Chebyshev interpolation)
PHI16 = np.array([
    4.9998385036923826e-01, 3.9881751627038509e-01, 1.5918373029566099e-04,
    -6.6119604241084984e-02, -2.4343590653393534e-04, 9.6326345328155184e-03,
    1.3683398170250487e-04, -1.0377683453717157e-03, -3.6585971580561924e-05,
    7.8285664546424481e-05, 5.1063481548881891e-06, -3.7514069808272519e-06,
    -3.7076326557369812e-07, 9.4593333344467583e-08, 1.2392754534435731e-08,
    -7.5637204865789892e-10, -1.2003197938917135e-10], np.float32)


def gelu_poly16(x):
    x32 = x.astype(jnp.float32)
    u = jnp.clip(x32, -5.0, 3.25)
    p = jnp.full_like(u, PHI16[-1])
    for c in PHI16[-2::-1]:
        p = p * u + c
    g = x32 * p
    g = jnp.where(x32 > 3.25, x32, g)
    g = jnp.where(x32 < -5.0, 0.0, g)
    return g.astype(x.dtype)


VARIANTS = [
    ("passthrough", lambda x: (x.astype(jnp.float32) * 0.5).astype(x.dtype)),
    ("current_rational_erf", gelu_current),
    ("xla_exact_erf", lambda x: jax.nn.gelu(
        x.astype(jnp.float32), approximate=False).astype(x.dtype)),
    ("tanh_approx", lambda x: jax.nn.gelu(x, approximate=True)),
    ("poly16_phi", gelu_poly16),
]


def main():
    # generate ON DEVICE: host->device of a [48,256,256,256] tensor through
    # the axon tunnel takes minutes and dwarfs everything else
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    a = jax.random.uniform(k0, (SHAPE[-1],), jnp.float32)
    b = jax.random.uniform(k1, (SHAPE[-1],), jnp.float32)
    x = (jax.random.normal(k2, SHAPE, jnp.float32) * 2.0).astype(jnp.bfloat16)
    x.block_until_ready()

    @jax.jit
    def all_variants(x):
        outs = []
        cur = x
        for _, fn in VARIANTS:
            cur = jax.lax.optimization_barrier(cur)
            y = fn(cur * a.astype(cur.dtype) + b.astype(cur.dtype))
            outs.append(jnp.sum(y.astype(jnp.float32)))
            cur = jax.lax.optimization_barrier(y)
        return jnp.stack(outs)

    t0 = time.time()
    r = all_variants(x)
    _ = np.asarray(r)
    print(f"compile+1 in {time.time()-t0:.0f}s")

    iters = 10
    trace_dir = tempfile.mkdtemp(prefix="gelu_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            r = all_variants(x)
        _ = np.asarray(r)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    p = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    pl_ = [q for q in xs.planes if q.name == "/device:TPU:0"][0]
    meta = pl_.event_metadata
    per = defaultdict(float)
    line = [l for l in pl_.lines if l.name == "XLA Ops"][0]
    tot = 0.0
    for ev in line.events:
        per[meta[ev.metadata_id].name] += ev.duration_ps * 1e-9
        tot += ev.duration_ps * 1e-9
    print(f"total {tot/iters:.2f} ms/step over {len(VARIANTS)} variants")
    for n, d in sorted(per.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {d/iters:7.2f} ms  {n[:120]}")


if __name__ == "__main__":
    main()
