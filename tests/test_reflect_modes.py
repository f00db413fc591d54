"""The two reflect-conv lowerings agree (values and gradients).

layers.Conv2d lowers 3x3/stride-1 reflect convs as a zero-SAME conv plus
border-strip corrections by default; UNCR_REFLECT=pad forces the generic
materialized-pad branch (an on-chip A/B escape hatch, tools/r4_reflect_ab.py).
Both must compute the identical mathematical conv (torch nn.Conv2d
padding_mode='reflect' parity, /root/reference/model/src/backbones/uncrtaints.py:60-66)
up to fp reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncrtaints_tpu.models.layers import Conv2d


@pytest.mark.parametrize("groups,cin,cout", [(1, 8, 16), (8, 8, 8)])
def test_pad_mode_matches_strip_mode(monkeypatch, groups, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, cin)), jnp.float32)
    conv = Conv2d(features=cout, kernel=3, stride=1, pad=1,
                  padding_mode="reflect", groups=groups)
    variables = conv.init(jax.random.PRNGKey(1), x)

    def loss(v, x):
        return jnp.sum(jnp.square(conv.apply(v, x)))

    y_fast = conv.apply(variables, x)
    g_fast = jax.grad(loss, argnums=(0, 1))(variables, x)
    monkeypatch.setenv("UNCR_REFLECT", "pad")
    y_pad = conv.apply(variables, x)
    g_pad = jax.grad(loss, argnums=(0, 1))(variables, x)

    np.testing.assert_allclose(y_fast, y_pad, atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_pad)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
