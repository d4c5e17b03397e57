"""Checkpoint save/restore via Orbax.

Replaces the reference's torch.save dict checkpoints
({epoch, step, state_dict, optimizer, ema_helper, params, config} ->
<data_dir>/ckpts/<name>.pth.tar; models/ddm_wavelet.py:282-292,
utils/logging.py:17-31) with Orbax pytree checkpoints carrying the same
logical payload.  Multi-host: only process 0 writes (the reference's
rank-0 gating).

Reference-trained ``.pth.tar`` files can be imported through
wavedm_tpu.utils.torch_compat instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from wavedm_tpu.training.state import TrainState


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: TrainState, *, epoch: int = 0,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write {params, opt_state, ema, step, rng, epoch, extra} to ``path``."""
    if jax.process_index() != 0:
        return
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "ema": state.ema,
        "step": state.step,
        "rng": state.rng,
        "meta": {"epoch": np.int64(epoch), **(extra or {})},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_dir(path), payload, force=True)


def load_checkpoint(path: str, state_template: Optional[TrainState] = None):
    """Load a checkpoint.  With a template, arrays are restored with the
    template's shardings/dtypes; returns (TrainState, meta)."""
    ckptr = ocp.PyTreeCheckpointer()
    if state_template is None:
        payload = ckptr.restore(_ckpt_dir(path))
    else:
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "ema": state_template.ema,
            "step": state_template.step,
            "rng": state_template.rng,
            "meta": None,
        }
        payload = ckptr.restore(_ckpt_dir(path), item=template)
    state = TrainState(
        params=payload["params"], opt_state=payload["opt_state"],
        ema=payload["ema"], step=payload["step"], rng=payload["rng"])
    return state, payload.get("meta") or {}
