"""WDNet: the legacy wavelet-demoireing generator/discriminator stack
(Flax, NHWC).

Re-implements the reference's ``model_dense.py`` family (models/model_dense.py:
471-560 WDNet, 324-379 ResidualDenseBlock_5C, 437-465 DMDB2, 529-560
Discriminator, 126-143 SEBlock, 157-168 weights_init_normal).  In the shipped
pipeline only ``weights_init_normal`` is active (HFRM init, train_hfrm.py:170);
the rest is provided for inventory completeness and for users of the original
WDNet demoireing model.

The reference's custom TF-style same-padding Conv2d (models/model_dense.py:
180-276) maps to Flax "SAME" padding (for its odd kernels and even total
padding the two are identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def lrelu(x):
    return nn.leaky_relu(x, 0.2)


class SEBlock(nn.Module):
    """Squeeze-excite with a bottleneck of ``reduction`` units (note the
    reference bottlenecks to `reduction`, not `dim/reduction`;
    models/model_dense.py:126-143)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block (RDN-style), output scaled by 0.2
    (models/model_dense.py:346-379)."""
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        nc = x.shape[-1]
        feats = [x]
        for i in range(4):
            h = nn.Conv(self.gc, (3, 3), padding="SAME",
                        name=f"conv{i + 1}")(jnp.concatenate(feats, -1))
            h = lrelu(h)
            feats.append(h)
        out = nn.Conv(nc, (3, 3), padding="SAME",
                      name="conv5")(jnp.concatenate(feats, -1))
        return out * 0.2


class DMDB2(nn.Module):
    """DeMoireing Dense Block: two RDBs + dilated shortcut branch
    (models/model_dense.py:437-465)."""
    gc: int = 32
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out = ResidualDenseBlock5C(self.gc, name="rdb1")(x) + x
        out2 = ResidualDenseBlock5C(self.gc, name="rdb2")(out)
        deli = nn.Conv(c, (3, 3), padding="SAME",
                       kernel_dilation=(self.dilation, self.dilation),
                       name="deli")
        deli2 = nn.Conv(c, (3, 3), padding="SAME", name="deli2")
        d = lrelu(deli(x))
        out3 = d + 0.2 * lrelu(deli2(d))
        return out2 * 0.2 + out3


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block (models/model_dense.py:385-433).

    Never instantiated anywhere in the reference (its only mention is the
    dormant RRDB chain comment in WDNet); provided for inventory
    completeness.  Reference quirks preserved: the forward chains three
    RDB5Cs with *running* residual adds (out = RDB1(x)+x; out2 = RDB2(out)
    +out; out3 = RDB3(out2)+out2 -- NOT the ESRGAN out*0.2+x form), returns
    ``out3*0.2 + deli(x)`` with a dilated-conv shortcut, and instantiates a
    ``SAM(64, 2, 1)`` whose forward call is commented out
    (models/model_dense.py:405,421) -- the module exists here too so a
    converted checkpoint keeps its parameter layout, but it is never applied.
    """
    gc: int = 32
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        from wavedm_tpu.models.sam import SAM
        # dead-by-design: forward on zeros only materialises the parameter
        # subtree for checkpoint-layout parity (see docstring)
        _unused = SAM(out_channels=2, name="sam1")(
            jnp.zeros(x.shape[:3] + (64,), x.dtype))
        del _unused
        out = ResidualDenseBlock5C(self.gc, name="rdb1")(x) + x
        out2 = ResidualDenseBlock5C(self.gc, name="rdb2")(out) + out
        out3 = ResidualDenseBlock5C(self.gc, name="rdb3")(out2) + out2
        d = lrelu(nn.Conv(c, (3, 3), padding="SAME",
                          kernel_dilation=(self.dilation, self.dilation),
                          name="deli")(x))
        return out3 * 0.2 + d


class WDNet(nn.Module):
    """Wavelet-domain demoireing generator: 48ch wavelet input -> 7 DMDB2
    blocks at dilations (1,2,5,7,12,19,31) -> 48ch wavelet output
    (models/model_dense.py:471-525)."""
    in_channel: int = 3

    @nn.compact
    def __call__(self, x):
        # xbranch exists in the reference but is never used in forward
        # (models/model_dense.py:512-515); params kept for ckpt parity.
        _unused = nn.Conv(64, (3, 3), padding="SAME", name="xbranch")(
            jnp.zeros(x.shape[:3] + (3,), x.dtype))
        del _unused
        h = nn.Conv(64, (1, 1), name="cascade1_conv1")(x)
        h = lrelu(h)
        h = nn.Conv(64, (3, 3), padding="SAME", name="cascade1_conv2")(h)
        h = lrelu(h)
        for i, d in enumerate((1, 2, 5, 7, 12, 19, 31)):
            h = DMDB2(dilation=d, name=f"dmdb_{i}")(h)
        return nn.Conv(48, (1, 1), name="final")(h)


class Discriminator(nn.Module):
    """PatchGAN conditional discriminator (models/model_dense.py:529-560)."""

    @nn.compact
    def __call__(self, img_a, img_b):
        h = jnp.concatenate([img_a, img_b], axis=-1)
        for i, (filters, use_norm) in enumerate(
                [(64, False), (128, True), (256, True), (512, True)]):
            h = nn.Conv(filters, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"block_{i}_conv")(h)
            if use_norm:
                # InstanceNorm2d(affine=False): per-sample spatial norm
                mu = jnp.mean(h, axis=(1, 2), keepdims=True)
                var = jnp.var(h, axis=(1, 2), keepdims=True)
                h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
            h = lrelu(h)
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv_out")(h)
        return jax.nn.sigmoid(h)


def apply_identity_center_init(params):
    """Re-initialise every 4D conv kernel in a param tree with
    identity_center_init (the reference applies ``weights_init_normal`` to the
    whole HFRM module, train_hfrm.py:170); biases/norms are left as-is."""
    def visit(path, p):
        if path[-1].key == "kernel" and np.ndim(p) == 4:
            return identity_center_init(None, np.shape(p), p.dtype)
        return p
    return jax.tree_util.tree_map_with_path(visit, params)


def identity_center_init(key, shape, dtype=jnp.float32):
    """Conv init used for HFRM stage-1: zeros with an identity across the
    in/out channel square at the spatial center (reference
    ``weights_init_normal``, models/model_dense.py:157-168; applied at
    train_hfrm.py:170).  ``shape`` is HWIO."""
    kh, kw, cin, cout = shape
    w = np.zeros(shape, np.float32)
    cy, cx = kh // 2, kw // 2
    eye = np.eye(cout, cin, dtype=np.float32)  # torch eye_ on (out, in) slice
    w[cy, cx, :, :] = eye.T
    return jnp.asarray(w, dtype)
