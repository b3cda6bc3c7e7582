"""Checkpointing: save/restore param + optimizer pytrees.

Mirrors the reference's semantics (tools/optims.py:7-32,65-78):
  - checkpoints hold {params [, opt_state, epoch]};
  - restore is shape-tolerant and non-strict: entries whose shape
    mismatches the live tree are skipped with a log line;
  - auto-resume probes output_dir/latest (utils/config.py:read_args) —
    and unlike the reference we save under the same name we probe
    (the reference's latest.pt vs latest_states.pt mismatch,
    SURVEY.md §5, is deliberately fixed).

Backends behind one API:
  - npz (default for small trees): one .npz of flattened path->array
    leaves + a JSON header — trivially shape-tolerant, dependency-free;
  - orbax (default for >=1 GiB trees, or backend="orbax"): async,
    sharded, multi-host-safe writes for 7B-scale checkpoints; restore
    goes through the same shape-tolerant merge.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "/"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        arr = np.asarray(leaf)
        # np.savez writes ml_dtypes bfloat16 as raw '|V2' bytes, which
        # np.load cannot cast back — store bf16 as float32 (lossless
        # upcast; _restore_into casts to the live leaf's dtype)
        if arr.dtype == jax.numpy.bfloat16:
            arr = arr.astype(np.float32)
        flat[key] = arr
    return flat


_ORBAX_THRESHOLD_BYTES = 1 << 30


def _tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def save_checkpoint(path: str | Path, params, opt_state=None,
                    epoch: Optional[int] = None, backend: str = "auto"):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "auto":
        backend = "orbax" if _tree_bytes(params) >= _ORBAX_THRESHOLD_BYTES \
            else "npz"
    header: Dict[str, Any] = {"epoch": epoch, "backend": backend}
    if backend == "orbax":
        import orbax.checkpoint as ocp
        item = {"params": params}
        if opt_state is not None:
            item["opt"] = opt_state
            header["has_opt"] = True
        ckptr = ocp.PyTreeCheckpointer()
        odir = path.with_suffix(".orbax")
        ckptr.save(str(odir.absolute()), item, force=True)
    else:
        arrays = {"params" + SEP + k: v for k, v in _flatten(params).items()}
        if opt_state is not None:
            arrays.update({"opt" + SEP + k: v
                           for k, v in _flatten(opt_state).items()})
            header["has_opt"] = True
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, **arrays)
        os.replace(tmp, path.with_suffix(".npz"))
    with open(path.with_suffix(".json"), "w") as f:
        json.dump(header, f)


def _undo_void(arr: np.ndarray) -> np.ndarray:
    """Recover bf16 leaves from LEGACY npz checkpoints written before
    the save-time float32 upcast in _flatten: np.savez stored ml_dtypes
    bfloat16 as raw '|V2' bytes, which np.load returns as void — the
    bit pattern is intact, so view it back as bfloat16 instead of
    crashing _restore_into's dtype cast (ADVICE r3)."""
    if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
        import ml_dtypes
        return arr.view(ml_dtypes.bfloat16)
    return arr


def _restore_into(tree, flat: Dict[str, np.ndarray], prefix: str, logger=None):
    """Merge flat arrays into a live tree, skipping shape mismatches."""
    skipped = []

    def merge(path, leaf):
        key = prefix + SEP + SEP.join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if key in flat and flat[key].shape == leaf.shape:
            restored = jax.numpy.asarray(flat[key], leaf.dtype)
            # keep the live leaf's placement: under a mesh the tree is
            # sharded (tp / ZeRO-1) and a default-device restore would
            # both lose the layout and OOM at 7B
            if hasattr(leaf, "sharding"):
                restored = jax.device_put(restored, leaf.sharding)
            return restored
        if key in flat:
            skipped.append((key, flat[key].shape, leaf.shape))
        return leaf

    out = jax.tree_util.tree_map_with_path(merge, tree)
    if logger is not None:
        for key, got, want in skipped:
            logger.info("Ignore weight %s: %s (model wants %s)"
                        % (key, got, want))
    return out


def load_checkpoint(path: str | Path, params, opt_state=None, logger=None
                    ) -> Tuple[Any, Any, int]:
    """Returns (params, opt_state, resume_from_epoch)."""
    path = Path(path)
    header_path = path.with_suffix(".json")
    header = {}
    if header_path.exists():
        with open(header_path) as f:
            header = json.load(f)
    epoch = header.get("epoch")

    if header.get("backend") == "orbax" or (
            not path.with_suffix(".npz").exists()
            and path.with_suffix(".orbax").exists()):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(str(path.with_suffix(".orbax").absolute()))
        flat = {"params" + SEP + k: v
                for k, v in _flatten(raw["params"]).items()}
        if "opt" in raw:
            flat.update({"opt" + SEP + k: v
                         for k, v in _flatten(raw["opt"]).items()})
    else:
        data = np.load(path.with_suffix(".npz"), allow_pickle=False)
        flat = {k: _undo_void(data[k]) for k in data.files}

    params = _restore_into(params, flat, "params", logger)
    if opt_state is not None and any(k.startswith("opt" + SEP) for k in flat):
        opt_state = _restore_into(opt_state, flat, "opt", logger)
    resume = (epoch + 1) if epoch is not None else 0
    return params, opt_state, resume


def checkpoint_exists(path: str | Path) -> bool:
    p = Path(path)
    return p.with_suffix(".npz").exists() or p.with_suffix(".orbax").exists()
