"""Checkpointing (Orbax) with the reference's module granularity.

Parity: io_utils/io_utils.py:36-115 —
  - save_checkpoint: config snapshot + per-module state + optimizer +
    RNG + meters + epoch/global_step (io_utils.py:76-88),
  - resume_from_checkpoint: per-module load (io_utils.py:36-49),
  - pretrained_from_checkpoints with ``module:path`` CLI syntax and
    non-strict shape-checked loads (io_utils.py:52-73, 91-115),
  - one-shot conversion from reference ``.pth`` files via
    codeps_tpu.io.convert_pth.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

from codeps_tpu.models.codeps_net import MODULE_NAMES


def make_modules_list(cfg) -> List[str]:
    """Module names implied by the model flags (io_utils.py:18-33)."""
    modules = ["backbone_po_depth"]
    if cfg.model.make_depth:
        modules += ["backbone_pose_sflow", "depth_head", "pose_head"]
        if cfg.model.make_sflow:
            modules += ["flow_head"]
    if cfg.model.make_semantic:
        modules += ["semantic_head"]
    if cfg.model.make_instance:
        modules += ["instance_head"]
    return modules


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, cfg, epoch: int, global_step: int,
                    params: Dict[str, Any], batch_stats: Dict[str, Any],
                    opt_state=None, rng=None,
                    meters: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint directory (Orbax) or pickle fallback."""
    payload = {
        "config": cfg.dump() if hasattr(cfg, "dump") else str(cfg),
        "state_dict": {
            "params": _to_numpy(params),
            "batch_stats": _to_numpy(batch_stats),
        },
        "training_meta": {"epoch": epoch, "global_step": global_step},
    }
    if opt_state is not None:
        # Stored as the flat leaf list: optax containers are NamedTuples
        # whose structure Orbax does not round-trip verbatim; the list is
        # re-unflattened against a freshly built tx.init(params) treedef
        # on restore (restore_opt_state).
        payload["state_dict"]["optimizer"] = [
            np.asarray(leaf) for leaf in jax.tree.leaves(opt_state)]
    if rng is not None:
        payload["state_dict"]["rng"] = np.asarray(rng)
    if meters is not None:
        payload["state_dict"]["meters"] = {
            name: meter.state_dict() for name, meter in meters.items()}

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if _HAS_ORBAX and not str(path).endswith(".pkl"):
        # Orbax save is a collective: it synchronizes all processes via
        # global barriers and gates the actual file writes to the
        # primary host. Callers must therefore invoke save_checkpoint on
        # EVERY process in a multi-process run (a lead-only call
        # deadlocks on the save_start barrier).
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(str(path.absolute()), payload, force=True)
    elif jax.process_index() == 0:
        # Pickle fallback has no cross-process coordination: lead-only
        # write (every process holds the same replicated payload).
        with open(path, "wb") as handle:
            pickle.dump(payload, handle)


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = Path(path)
    if path.is_dir() and _HAS_ORBAX:
        checkpointer = ocp.PyTreeCheckpointer()
        return checkpointer.restore(str(path.absolute()))
    with open(path, "rb") as handle:
        return pickle.load(handle)


def _check_and_merge(target: Dict[str, Any], loaded: Dict[str, Any],
                     module: str) -> Dict[str, Any]:
    """Non-strict, shape-checked module load (io_utils.py:91-115)."""
    flat_target = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = dict(target)
    for key_path, value in flat_target:
        if key_path in flat_loaded:
            new_value = flat_loaded[key_path]
            assert np.shape(new_value) == np.shape(value), (
                f"Shape mismatch in module {module} at {key_path}: "
                f"{np.shape(new_value)} vs {np.shape(value)}")
    # tree structure equal -> take loaded verbatim; extra/missing leaves
    # keep target defaults (non-strict).
    def merge(t, l):
        if isinstance(t, dict):
            return {k: merge(t[k], l[k]) if isinstance(l, dict) and k in l
                    else t[k] for k in t}
        return l if l is not None else t
    return merge(target, loaded)


def resume_from_checkpoint(checkpoint: Dict[str, Any],
                           params: Dict[str, Any],
                           batch_stats: Dict[str, Any],
                           modules: Optional[List[str]] = None):
    """Load per-module params/stats from a saved checkpoint dict."""
    modules = modules or list(MODULE_NAMES)
    ckpt_params = checkpoint["state_dict"]["params"]
    ckpt_stats = checkpoint["state_dict"].get("batch_stats", {})
    new_params = dict(params)
    new_stats = dict(batch_stats)
    for module in modules:
        if module in ckpt_params and module in new_params:
            new_params[module] = _check_and_merge(
                new_params[module], ckpt_params[module], module)
        if module in ckpt_stats and module in new_stats:
            new_stats[module] = _check_and_merge(
                new_stats[module], ckpt_stats[module], module)
    return new_params, new_stats


def restore_opt_state(checkpoint: Dict[str, Any], opt_state_template):
    """Rebuild the optimizer state saved by save_checkpoint.

    The reference restores the torch optimizer state on resume
    (io_utils/io_utils.py:80, scripts/train_codeps.py:502-506); here the
    flat leaf list is unflattened against ``opt_state_template`` (a fresh
    ``tx.init(params)``), restoring Adam moments and schedule counts.
    """
    leaves = checkpoint["state_dict"].get("optimizer")
    if leaves is None:
        return None
    if isinstance(leaves, dict):
        # orbax restores a saved list as an int-keyed dict
        leaves = [leaves[key] for key in sorted(leaves, key=int)]
    template_leaves, treedef = jax.tree.flatten(opt_state_template)
    assert len(leaves) == len(template_leaves), (
        f"optimizer state leaf count mismatch: checkpoint has "
        f"{len(leaves)}, template has {len(template_leaves)} — was the "
        "optimizer config changed?")
    leaves = [np.asarray(leaf).astype(ref.dtype).reshape(np.shape(ref))
              for leaf, ref in zip(leaves, template_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def restore_rng(checkpoint: Dict[str, Any]):
    """Restore the training-step PRNG key (reference restores torch +
    numpy RNG states, io_utils/io_utils.py:81-84)."""
    rng = checkpoint["state_dict"].get("rng")
    if rng is None:
        return None
    return np.asarray(rng).astype(np.uint32)


def restore_meters(checkpoint: Dict[str, Any], meters: Dict[str, Any]):
    """Load meter states saved by save_checkpoint into live meters
    (reference: meter state dicts in the checkpoint,
    io_utils/io_utils.py:85-86, scripts/train_codeps.py:537-543)."""
    saved = checkpoint["state_dict"].get("meters") or {}
    for name, meter in meters.items():
        if name in saved:
            meter.load_state_dict({
                key: np.asarray(value)
                for key, value in saved[name].items()})
    return meters


def pretrained_from_checkpoints(checkpoint_specs: List[str],
                                params: Dict[str, Any],
                                batch_stats: Dict[str, Any], cfg):
    """Load pretrained weights from files, with ``module:path`` syntax
    (io_utils.py:52-73). Bare paths load every module present. ``.pth``
    files are converted from the reference torch format on the fly."""
    new_params, new_stats = dict(params), dict(batch_stats)
    for spec in checkpoint_specs:
        module = None
        path = spec
        if ":" in spec and not Path(spec).exists():
            module, path = spec.split(":", 1)
        if str(path).endswith(".pth"):
            import torch

            from codeps_tpu.io.convert_pth import convert_checkpoint
            torch_ckpt = torch.load(path, map_location="cpu",
                                    weights_only=False)
            conv_params, conv_stats = convert_checkpoint(torch_ckpt, cfg)
            checkpoint = {"state_dict": {"params": conv_params,
                                         "batch_stats": conv_stats}}
        else:
            checkpoint = load_checkpoint(path)
        modules = [module] if module else None
        new_params, new_stats = resume_from_checkpoint(
            checkpoint, new_params, new_stats, modules)
    return new_params, new_stats
