"""PyTorch-checkpoint interop: convert reference state_dicts to Flax pytrees.

The reference stores raw ``state_dict`` tensors (NCHW convs, (O,I) linears;
utils/logging.py:17-21, models/ddm_wavelet.py:282-292).  These converters map
them onto our NHWC Flax parameter trees so reference-trained checkpoints can
be evaluated (and parity-tested) in this framework.

Key maps are derived from the reference module trees:
  DiffusionUNet  -- models/unet.py:196-344
  HFRM           -- models/arch.py:158-253
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv_w(t) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O); depthwise (O, 1, kh, kw) included."""
    return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def _lin_w(t) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(t), (1, 0)))


def _arr(t) -> np.ndarray:
    return np.asarray(t)


def _conv(sd: Mapping, key: str) -> Dict:
    out = {"kernel": _conv_w(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = _arr(sd[f"{key}.bias"])
    return out


def _dense(sd: Mapping, key: str) -> Dict:
    return {"kernel": _lin_w(sd[f"{key}.weight"]), "bias": _arr(sd[f"{key}.bias"])}


def _norm(sd: Mapping, key: str) -> Dict:
    return {"norm": {"scale": _arr(sd[f"{key}.weight"]),
                     "bias": _arr(sd[f"{key}.bias"])}}


def _resnet_block(sd: Mapping, p: str) -> Dict:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "temb_proj": _dense(sd, f"{p}.temb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn_block(sd: Mapping, p: str) -> Dict:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_unet_state_dict(
    sd: Mapping,
    *,
    num_levels: int,
    num_res_blocks: int,
) -> Dict:
    """Reference DiffusionUNet state_dict -> our Flax params dict."""
    params: Dict = {
        "temb": {"dense0": _dense(sd, "temb.dense.0"),
                 "dense1": _dense(sd, "temb.dense.1")},
        "conv_in": _conv(sd, "conv_in"),
        "mid_block_1": _resnet_block(sd, "mid.block_1"),
        "mid_attn_1": _attn_block(sd, "mid.attn_1"),
        "mid_block_2": _resnet_block(sd, "mid.block_2"),
        "norm_out": _norm(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for i in range(num_levels):
        for j in range(num_res_blocks):
            params[f"down_{i}_block_{j}"] = _resnet_block(sd, f"down.{i}.block.{j}")
            if f"down.{i}.attn.{j}.q.weight" in sd:
                params[f"down_{i}_attn_{j}"] = _attn_block(sd, f"down.{i}.attn.{j}")
        if f"down.{i}.downsample.conv.weight" in sd:
            params[f"down_{i}_downsample"] = {"conv": _conv(sd, f"down.{i}.downsample.conv")}
        for j in range(num_res_blocks + 1):
            params[f"up_{i}_block_{j}"] = _resnet_block(sd, f"up.{i}.block.{j}")
            if f"up.{i}.attn.{j}.q.weight" in sd:
                params[f"up_{i}_attn_{j}"] = _attn_block(sd, f"up.{i}.attn.{j}")
        if f"up.{i}.upsample.conv.weight" in sd:
            params[f"up_{i}_upsample"] = {"conv": _conv(sd, f"up.{i}.upsample.conv")}
    return params


def _hfrm_block(sd: Mapping, p: str) -> Dict:
    return {
        "norm1": {"weight": _arr(sd[f"{p}.norm1.weight"]),
                  "bias": _arr(sd[f"{p}.norm1.bias"])},
        "norm2": {"weight": _arr(sd[f"{p}.norm2.weight"]),
                  "bias": _arr(sd[f"{p}.norm2.bias"])},
        "conv1": _conv(sd, f"{p}.conv1"),
        "conv2": _conv(sd, f"{p}.conv2"),
        "conv3": _conv(sd, f"{p}.conv3"),
        "conv4": _conv(sd, f"{p}.conv4"),
        "conv5": _conv(sd, f"{p}.conv5"),
        "channel_attn": {"chan_conv": _conv(sd, f"{p}.channel_attn.chan_conv")},
        "beta": _arr(sd[f"{p}.beta"]).reshape(-1),
        "gamma": _arr(sd[f"{p}.gamma"]).reshape(-1),
    }


def convert_hfrm_state_dict(
    sd: Mapping,
    *,
    enc_blk_nums,
    mid_blk_num: int,
    dec_blk_nums,
) -> Dict:
    """Reference HFRM state_dict -> our Flax params dict."""
    params: Dict = {
        "conv_in": _conv(sd, "conv_in"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for li, num in enumerate(enc_blk_nums):
        for bi in range(num):
            params[f"enc_{li}_{bi}"] = _hfrm_block(sd, f"encoders.{li}.{bi}")
        params[f"down_{li}"] = _conv(sd, f"downs.{li}")
    for bi in range(mid_blk_num):
        params[f"mid_{bi}"] = _hfrm_block(sd, f"mid_blks.{bi}")
    for li, num in enumerate(dec_blk_nums):
        params[f"up_{li}"] = _conv(sd, f"ups.{li}.0")
        for bi in range(num):
            params[f"dec_{li}_{bi}"] = _hfrm_block(sd, f"decoders.{li}.{bi}")
    return params


def _to_numpy_sd(obj) -> Dict:
    return {k: v.detach().numpy() if hasattr(v, "detach") else v
            for k, v in obj.items()}


def load_torch_checkpoint(path: str, ema: bool = False) -> Dict:
    """Load a torch .pth/.pth.tar file into a numpy state_dict (CPU).

    With ``ema=True``, returns the EMA shadow instead
    (``obj['ema_helper']`` -- same key layout as ``state_dict``: the
    reference registers EMAHelper on the unwrapped module before the DDP
    wrap, models/ddm_wavelet.py:157-168, so shadow keys are unprefixed;
    these are the weights a reference eval would use with
    ``load_ddm_ckpt(..., ema=True)``).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if ema:
        if not (isinstance(obj, dict) and "ema_helper" in obj):
            raise KeyError(f"checkpoint {path} has no 'ema_helper' entry")
        return _to_numpy_sd(obj["ema_helper"])
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return _to_numpy_sd(obj)
