import numpy as np, jax, jax.numpy as jnp
from uncrtaints_tpu.models.unet3d import UNet3D
m = UNet3D(in_channel=5, out_channel=13, feats=2)
x = jnp.zeros((1,4,16,16,5))
v = m.init(jax.random.PRNGKey(0), x)
def paths(tree, pre=""):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return ["/".join(str(getattr(k,'key',k)) for k in kp) + f" {l.shape}" for kp,l in flat]
print("PARAMS:"); [print(" ", p) for p in paths(v["params"])]
print("BSTATS:"); [print(" ", p) for p in paths(v.get("batch_stats", {}))]

import torch
tc = torch.nn.ConvTranspose3d(3, 4, 3, stride=2, padding=1, output_padding=1)
xin = np.random.default_rng(0).standard_normal((1,3,4,8,8)).astype(np.float32)
with torch.no_grad():
    ref = tc(torch.from_numpy(xin)).numpy()
import flax.linen as nn
fl = nn.ConvTranspose(4, kernel_size=(3,3,3), strides=(2,2,2), padding="SAME")
w = tc.weight.detach().numpy()  # [I,O,kt,kh,kw]
wf = np.transpose(w[:, :, ::-1, ::-1, ::-1], (2,3,4,0,1)).copy()
vars_fl = {"params": {"kernel": jnp.asarray(wf), "bias": jnp.asarray(tc.bias.detach().numpy())}}
out = fl.apply(vars_fl, jnp.asarray(xin.transpose(0,2,3,4,1)))
out_nchw = np.asarray(out).transpose(0,4,1,2,3)
print("convT3d shapes:", ref.shape, out_nchw.shape)
print("convT3d max|diff|:", np.abs(ref - out_nchw).max())
