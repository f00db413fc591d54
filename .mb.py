import time, sys, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from functools import partial

N, H, W, C, HID = 48, 256, 256, 128, 256  # encoder workload for B=16,T=3

def gn(x, groups=4):
    xf = x.astype(jnp.float32)
    B, H, W, Cc = xf.shape
    xg = xf.reshape(B, H, W, groups, Cc//groups)
    m = xg.mean(axis=(1,2,4), keepdims=True)
    v = xg.var(axis=(1,2,4), keepdims=True)
    return ((xg-m)*jax.lax.rsqrt(v+1e-5)).reshape(B,H,W,Cc).astype(x.dtype)

def gelu(x): return jax.nn.gelu(x, approximate=False)

def make(variant):
    k_pw1 = jnp.zeros((1,1,C,HID), jnp.bfloat16)
    k_dw  = jnp.zeros((3,3,1,HID), jnp.bfloat16)
    k_pw2 = jnp.zeros((1,1,HID,C), jnp.bfloat16)
    w1 = jnp.zeros((HID,32), jnp.bfloat16); w2 = jnp.zeros((32,HID), jnp.bfloat16)
    def block(x):
        h = gn(x) if 'nonorm' not in variant else x
        h = jax.lax.conv_general_dilated(h, k_pw1, (1,1), 'VALID',
            dimension_numbers=('NHWC','HWIO','NHWC'))
        if 'nonorm' not in variant: h = gn(h)
        if 'nogelu' not in variant: h = gelu(h)
        if 'nodw' not in variant:
            hp = jnp.pad(h, [(0,0),(1,1),(1,1),(0,0)], mode='reflect')
            h = jax.lax.conv_general_dilated(hp, k_dw, (1,1), 'VALID',
                dimension_numbers=('NHWC','HWIO','NHWC'), feature_group_count=HID)
        if 'nonorm' not in variant: h = gn(h)
        if 'nogelu' not in variant: h = gelu(h)
        if 'nose' not in variant:
            s = h.mean(axis=(1,2))
            s = jax.nn.sigmoid(gelu(s @ w1) @ w2)
            h = h * s[:,None,None,:]
        h = jax.lax.conv_general_dilated(h, k_pw2, (1,1), 'VALID',
            dimension_numbers=('NHWC','HWIO','NHWC'))
        if 'nonorm' not in variant: h = gn(h)
        return x + h
    return jax.jit(block)

variant = sys.argv[1]
f = make(variant)
x = jnp.asarray(np.random.rand(N,H,W,C).astype(np.float32)).astype(jnp.bfloat16)
y = f(x); _ = float(y.sum())
t0 = time.perf_counter()
for _ in range(10): y = f(x)
_ = float(y.sum())
dt = (time.perf_counter()-t0)/10
print(f"{variant:14s} {dt*1000:7.2f} ms/block({N} frames)", flush=True)
