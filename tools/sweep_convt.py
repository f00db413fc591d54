"""Find the flax ConvTranspose kernel transform matching torch ConvTranspose3d
(k=3, s=2, p=1, output_padding=1). Scratch tool."""
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
import torch

tc = torch.nn.ConvTranspose3d(3, 4, 3, stride=2, padding=1, output_padding=1)
xin = np.random.default_rng(0).standard_normal((1, 3, 4, 8, 8)).astype(np.float32)
with torch.no_grad():
    ref = tc(torch.from_numpy(xin)).numpy()
w = tc.weight.detach().numpy()  # [I,O,kt,kh,kw]
b = tc.bias.detach().numpy()
x_nhwc = jnp.asarray(xin.transpose(0, 2, 3, 4, 1))

candidates = {
    "flip_IO": np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)),
    "noflip_IO": np.transpose(w, (2, 3, 4, 0, 1)),
    "flip_OI": np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 1, 0)),
    "noflip_OI": np.transpose(w, (2, 3, 4, 1, 0)),
}
for tk in (False, True):
    for name, wf in candidates.items():
        for pad in ("SAME", [(1, 1), (1, 1), (1, 1)], [(0, 1), (0, 1), (0, 1)],
                    [(1, 2), (1, 2), (1, 2)]):
            fl = nn.ConvTranspose(4, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                                  padding=pad, transpose_kernel=tk)
            try:
                out = fl.apply({"params": {"kernel": jnp.asarray(wf.copy()),
                                           "bias": jnp.asarray(b)}}, x_nhwc)
            except Exception as e:
                continue
            o = np.asarray(out).transpose(0, 4, 1, 2, 3)
            if o.shape != ref.shape:
                continue
            d = np.abs(o - ref).max()
            if d < 1e-4:
                print("MATCH:", name, "transpose_kernel=", tk, "pad=", pad, "diff=", d)
            elif d < 0.5:
                print("close:", name, tk, pad, d)
print("done")
