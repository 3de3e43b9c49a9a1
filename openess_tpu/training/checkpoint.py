"""Checkpointing with orbax (reference: utils/saver.py + base_trainer_ov.py:33-44).

Three flavors, mirroring the reference:
- full         — models + optimizer state + epoch/step (``ckp.pt``, saver.py:14-29)
- model-only   — per-epoch params snapshot (``Epoch_N.pt``, saver.py:31-55)
- partial load — stage-to-stage transfer with shape filtering and classifier
                 exclusion (saver.py:73-96) via :func:`load_pretrained_params`
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(ckpt_dir: str, state, epoch: int):
    """Full training state (params + batch_stats + opt_state + step)."""
    mgr = _mgr(ckpt_dir)
    mgr.save(
        epoch,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(
                {
                    "step": state.step,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                }
            )
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def save_model_only(ckpt_dir: str, params, batch_stats, epoch: int):
    """Per-epoch params snapshot (Epoch_N equivalent)."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "batch_stats": batch_stats}, force=True)
    ckptr.wait_until_finished()


def _merge_superset(target, loaded, prefix=""):
    """Fill ``target``'s structure from ``loaded``, IGNORING extra on-disk
    subtrees (e.g. the dead E2VID decoder params of a checkpoint saved
    before ``latent_only`` training builds) but refusing to invent values:
    a target leaf missing from the checkpoint raises."""
    if isinstance(target, dict):
        if not isinstance(loaded, dict):
            raise ValueError(f"checkpoint missing subtree at '{prefix}'")
        return {
            k: _merge_superset(v, loaded.get(k), prefix + "/" + k)
            for k, v in target.items()
        }
    if loaded is None:
        raise ValueError(f"checkpoint missing leaf at '{prefix}'")
    if np.shape(loaded) != np.shape(target):
        raise ValueError(
            f"checkpoint shape mismatch at '{prefix}': "
            f"{np.shape(loaded)} vs {np.shape(target)}"
        )
    # Enforce the target's dtype like the strict StandardRestore path does —
    # an as-saved dtype leaking through here would change the state pytree's
    # dtypes and force a jit recompile (or a silent precision change).
    dtype = target.dtype if hasattr(target, "dtype") else np.asarray(target).dtype
    return jax.numpy.asarray(loaded, dtype=dtype)


def restore_checkpoint(
    ckpt_dir: str,
    state,
    step: Optional[int] = None,
    *,
    restore_optimizer: bool = False,
):
    """Resume: restores params/batch_stats/step into ``state``.

    ``restore_optimizer=False`` (the default) matches the reference, which
    deliberately does NOT restore optimizers on resume (base_trainer_ov.py:36,
    load_optimizer=False) — the optimizer keeps its fresh init. Pass True for
    bit-exact training continuation.

    Checkpoints whose param tree is a SUPERSET of the current build's (e.g.
    saved before the latent-only E2VID scan dropped the frozen decoder
    subtrees) restore fine: orbax's strict structure match is retried with a
    tolerant merge that drops the extra subtrees.
    """
    mgr = _mgr(ckpt_dir)
    target = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    try:
        step = mgr.latest_step() if step is None else step
        try:
            restored = mgr.restore(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardRestore(target)),
            )["state"]
        except ValueError:
            # structure mismatch — restore as-saved, then merge tolerantly
            if restore_optimizer:
                raise ValueError(
                    "restore_optimizer=True requires an exactly matching "
                    "checkpoint structure; this checkpoint's tree differs from "
                    "the current build (re-save with the current code, or "
                    "resume with restore_optimizer=False)"
                )
            raw = mgr.restore(
                step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
            )["state"]
            restored = {
                "step": jax.numpy.asarray(raw["step"]),
                "params": _merge_superset(state.params, raw["params"], "params"),
                "batch_stats": _merge_superset(
                    state.batch_stats, raw["batch_stats"], "batch_stats"
                ),
                "opt_state": state.opt_state,
            }
    finally:
        mgr.close()
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=(
            restored["opt_state"] if restore_optimizer else state.opt_state
        ),
    ), step


def load_model_only(path: str, params_like, batch_stats_like):
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": params_like, "batch_stats": batch_stats_like},
        )
    except ValueError:
        raw = ckptr.restore(os.path.abspath(path))
        restored = {
            "params": _merge_superset(params_like, raw["params"], "params"),
            "batch_stats": _merge_superset(
                batch_stats_like, raw["batch_stats"], "batch_stats"
            ),
        }
    return restored["params"], restored["batch_stats"]


def load_pretrained_params(path: str, params, batch_stats, *, exclude_substrings=()):
    """Shape-filtered partial transfer (saver.py:73-96 semantics): leaves
    whose path matches an exclusion or whose shape differs keep their fresh
    init; everything else loads from ``path``."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    loaded = restored.get("params", restored)
    loaded_bs = restored.get("batch_stats", {})

    def merge(fresh_tree, loaded_tree, prefix=""):
        if not isinstance(fresh_tree, dict):
            ok = (
                loaded_tree is not None
                and np.shape(loaded_tree) == np.shape(fresh_tree)
                and not any(sub in prefix for sub in exclude_substrings)
            )
            return jax.numpy.asarray(loaded_tree) if ok else fresh_tree
        out = {}
        for k, v in fresh_tree.items():
            sub = loaded_tree.get(k) if isinstance(loaded_tree, dict) else None
            out[k] = merge(v, sub, prefix + "/" + k)
        return out

    return merge(params, loaded), merge(batch_stats, loaded_bs)
