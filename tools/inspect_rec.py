"""Print flax param trees for RecUNet and FPNConvLSTM (scratch)."""
import numpy as np, jax, jax.numpy as jnp
from uncrtaints_tpu.models.recurrent import RecUNet, FPNConvLSTM

def paths(tree, pre=""):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return ["/".join(str(getattr(k, 'key', k)) for k in kp) + f" {l.shape}"
            for kp, l in flat]

m = RecUNet(input_dim=5, encoder_widths=(8, 16), decoder_widths=(8, 16),
            temporal="lstm", hidden_dim=12)
x = jnp.zeros((1, 3, 16, 16, 5))
v = m.init(jax.random.PRNGKey(0), x)
print("RECUNET PARAMS:")
for p in paths(v["params"]):
    print(" ", p)
print("RECUNET BSTATS:")
for p in paths(v.get("batch_stats", {})):
    print(" ", p)

m2 = FPNConvLSTM(input_dim=5, num_classes=13, inconv=(8, 16), n_levels=3,
                 n_channels=8, hidden_size=12)
v2 = m2.init(jax.random.PRNGKey(0), x)
print("FPN PARAMS:")
for p in paths(v2["params"]):
    print(" ", p)
