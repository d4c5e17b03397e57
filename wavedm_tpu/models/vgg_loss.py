"""VGG19 perceptual-loss feature network (reference ``LossNetwork``).

Re-implements the reference's VGG19-features extractor
(train_hfrm.py:58-83): the torchvision ``vgg19().features`` stack truncated
at relu5_2, tapping {relu1_2, relu2_2, relu3_2, relu4_2, relu5_2} (indices
3/8/13/22/31 in the torch Sequential).  The perceptual loss combines L1
distances on those taps with the reference's per-layer divisors
(2.6/4.8/3.7/5.6/5.6, the commented-out p1..p5 terms at
train_hfrm.py:259-265).

All of this is DEAD CODE in the reference (only the 2*L1*255 pixel term is
active, train_hfrm.py:259-267); it is provided as an opt-in
(``hfrm.use_perceptual``) for inventory completeness.  Pretrained ImageNet
weights cannot be downloaded in a hermetic environment -- load them from a
local torchvision checkpoint via ``convert_vgg19_features`` when available;
random-init features still define a valid (if weaker) perceptual metric.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg19.features layout: (out_channels, convs) per stage,
# maxpool between stages; taps after the SECOND conv of each stage.
_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
_TAPS = ("relu1", "relu2", "relu3", "relu4", "relu5")
# reference divisors for p1..p5 (train_hfrm.py:261-265)
PERCEPTUAL_DIVISORS = (2.6, 4.8, 3.7, 5.6, 5.6)


class VGG19Features(nn.Module):
    """Truncated VGG19 feature extractor; returns the five relu taps.

    Input: (B, H, W, 3).  The reference feeds [0,255]-scaled images
    (train_hfrm.py:257 commented ``lossnet(fake_B*255)``) without ImageNet
    mean/std normalisation -- reproduced as-is.
    """

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        h = x
        for s, (width, convs) in enumerate(_STAGES):
            for c in range(convs):
                h = nn.Conv(width, (3, 3), padding="SAME",
                            name=f"conv{s + 1}_{c + 1}")(h)
                h = nn.relu(h)
                if c == 1:  # tap after the second conv of each stage
                    taps[_TAPS[s]] = h
                if s == 4 and c == 1:
                    return taps  # truncate at relu5_2 (torch index 31)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return taps


def perceptual_loss(feats_fake: Dict[str, jnp.ndarray],
                    feats_real: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """sum_i L1(tap_i(fake), tap_i(real)) / divisor_i
    (the reference's p1..p5 composition, train_hfrm.py:259-265)."""
    total = 0.0
    for name, div in zip(_TAPS, PERCEPTUAL_DIVISORS):
        total = total + jnp.mean(
            jnp.abs(feats_fake[name] - feats_real[name])) / div
    return total


def convert_vgg19_features(torch_state_dict) -> dict:
    """torchvision ``vgg19().features`` state_dict -> VGG19Features params.

    Torch keys are ``features.<idx>.weight/bias`` with conv indices
    0,2 / 5,7 / 10,12,14,16 / 19,21,23,25 / 28,30 (OIHW); only layers up to
    relu5_2 (index 30) are consumed.
    """
    import numpy as np
    idx_iter = iter([0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30])
    params = {}
    for s, (width, convs) in enumerate(_STAGES):
        for c in range(convs):
            idx = next(idx_iter, None)
            if idx is None:
                break
            w = torch_state_dict[f"features.{idx}.weight"]
            b = torch_state_dict[f"features.{idx}.bias"]
            w = np.asarray(w, np.float32).transpose(2, 3, 1, 0)  # OIHW->HWIO
            params[f"conv{s + 1}_{c + 1}"] = {
                "kernel": jnp.asarray(w), "bias": jnp.asarray(
                    np.asarray(b, np.float32))}
            if s == 4 and c == 1:
                return params
    return params
