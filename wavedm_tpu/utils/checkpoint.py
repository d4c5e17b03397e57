"""Checkpoint save/restore via Orbax.

Replaces the reference's torch.save dict checkpoints
({epoch, step, state_dict, optimizer, ema_helper, params, config} ->
<data_dir>/ckpts/<name>.pth.tar; models/ddm_wavelet.py:282-292,
utils/logging.py:17-31) with Orbax pytree checkpoints carrying the same
logical payload: array state (params/opt-state/EMA/step/rng) goes through
Orbax; scalar metadata (epoch, user extras) rides a JSON side file so
restores with a state template never hit tree-structure mismatches.
Multi-host: only process 0 writes (the reference's rank-0 gating).

Reference-trained ``.pth.tar`` files import through
wavedm_tpu.utils.torch_compat instead.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from wavedm_tpu.training.state import TrainState

_META_FILE = "wavedm_meta.json"


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: TrainState, *, epoch: int = 0,
                    extra: Optional[Dict[str, Any]] = None,
                    extra_arrays: Optional[Dict[str, Any]] = None) -> None:
    """Write array state + {epoch, **extra} metadata to ``path``.

    ``extra_arrays``: additional named pytrees checkpointed atomically with
    the train state (e.g. the lap translator's params/opt-state)."""
    if jax.process_index() != 0:
        return
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "ema": state.ema,
        "step": state.step,
        "rng": state.rng,
    }
    for k, v in (extra_arrays or {}).items():
        if k in payload:
            raise ValueError(f"extra_arrays key {k!r} collides with state")
        payload[k] = v
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_dir(path), payload, force=True)
    meta = {"epoch": int(epoch)}
    for k, v in (extra or {}).items():
        meta[k] = float(v) if isinstance(v, (int, float, np.floating)) else v
    with open(os.path.join(_ckpt_dir(path), _META_FILE), "w") as f:
        json.dump(meta, f)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recently written checkpoint directory under ``ckpt_dir`` (for
    ``--resume auto``); None if none exist."""
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = [
        os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
        if os.path.isdir(os.path.join(ckpt_dir, d))
        and os.path.exists(os.path.join(ckpt_dir, d, _META_FILE))
    ]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


def prune_checkpoints(ckpt_dir: str, keep: int) -> int:
    """Delete the oldest snapshot dirs under ``ckpt_dir``, keeping the
    ``keep`` most recent (plus anything named ``best``).  Returns the
    number removed.  No-op for keep <= 0 (keep everything).

    Operational need the reference never hits (it writes one ~600 MB
    .pth.tar per snapshot to a big disk; utils/logging.py:17-31): a
    flagship Orbax TrainState is ~3.1 GB, and an unpruned long run fills
    the host disk (round-3 incident).
    """
    if keep <= 0 or jax.process_index() != 0:
        return 0
    import shutil
    if not os.path.isdir(ckpt_dir):
        return 0
    snaps = sorted(
        (os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
         if d != "best" and os.path.isdir(os.path.join(ckpt_dir, d))
         and os.path.exists(os.path.join(ckpt_dir, d, _META_FILE))),
        key=os.path.getmtime)
    removed = 0
    for path in snaps[:-keep] if keep < len(snaps) else []:
        shutil.rmtree(path, ignore_errors=True)
        removed += 1
    return removed


def _saved_top_level_keys(path: str):
    """Top-level pytree keys stored in a checkpoint, or None if they cannot
    be determined (older orbax layouts) -- used to probe for optional
    extras before building a restore template."""
    try:
        payload = ocp.PyTreeCheckpointer().metadata(_ckpt_dir(path))
        tree = getattr(payload, "item_metadata", None) or payload
        if hasattr(tree, "tree"):
            tree = tree.tree
        return set(tree.keys())
    except Exception:
        return None


def load_checkpoint(path: str, state_template: Optional[TrainState] = None,
                    extras_template: Optional[Dict[str, Any]] = None):
    """Load a checkpoint.  With a template, arrays are restored with the
    template's shardings/dtypes; returns (TrainState, meta), or
    (TrainState, meta, extras) when ``extras_template`` is given (matching
    ``save_checkpoint``'s ``extra_arrays``)."""
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
        }
        # only request extras the checkpoint actually stored: restoring a
        # template key absent from the payload fails inside orbax with a
        # tree mismatch (e.g. resuming a lap-configured run from a ckpt
        # saved before the translator existed); missing extras degrade to
        # an empty entry so trainer.resume can start them fresh
        saved_keys = _saved_top_level_keys(path)
        for k, v in (extras_template or {}).items():
            if saved_keys is None or k in saved_keys:
                template[k] = v
        payload = ckptr.restore(_ckpt_dir(path), item=template)
    state = TrainState(
        params=payload["params"], opt_state=payload["opt_state"],
        ema=payload["ema"], step=payload["step"], rng=payload["rng"])
    meta_path = os.path.join(_ckpt_dir(path), _META_FILE)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if extras_template is None:
        return state, meta
    extras = {k: payload[k] for k in extras_template if k in payload}
    return state, meta, extras
