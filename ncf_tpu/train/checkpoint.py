"""Checkpoint save / restore / discovery / consolidation.

TPU-native re-design of the reference checkpointing
(reference: src/model/trainer.py:548-622 — torch.save dicts with a
``best_model.pt`` symlink — plus the torchrec *sharded* checkpoint
artifact, a directory of 62 raw tensor blobs reassembled by size-matching
in src/inference/demo/consolidate_shards.py:72-116, and the broken
``_find_latest_checkpoint`` resume path, trainer.py:450 / SURVEY.md §2.9.2).

Design: a checkpoint is a directory of ``.npy`` leaves keyed by their
pytree path plus a ``manifest.json`` carrying step/epoch/metrics/config
and per-leaf sharding metadata.  Sharded arrays save only the shards the
current process addresses (each host writes ``{path}.shard{k}.npy`` with
its index-offset recorded in the manifest), so a multi-host job writes
disjoint files with no coordination; ``consolidate`` merges them into
single-file leaves for serving export — by *recorded metadata*, not
size-matching guesswork.  Restore is template-driven (a pytree of like
leaves from ``init``), never pickle.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)

MANIFEST = "manifest.json"
BEST_LINK = "best"
_CKPT_RE = re.compile(r"^ckpt_(\d+)$")


def _path_str(path: Tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts) or "leaf"


def _leaf_filename(path_s: str) -> str:
    return path_s.replace("/", "_") + ".npy"


_ORBAX_CKPTR = None   # lazily-created (Async)Checkpointer singleton


def _orbax_checkpointer(async_save: bool):
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        handler = ocp.StandardCheckpointHandler()
        _ORBAX_CKPTR = (ocp.AsyncCheckpointer(handler) if async_save
                        else ocp.Checkpointer(handler))
    return _ORBAX_CKPTR


def wait_for_pending() -> None:
    """Block until any in-flight async (orbax) save has committed.  Call
    before reading a just-written checkpoint or at end of training."""
    if _ORBAX_CKPTR is not None and hasattr(_ORBAX_CKPTR, "wait_until_finished"):
        _ORBAX_CKPTR.wait_until_finished()


def save(
    directory: str,
    pytree: Any,
    step: int = 0,
    epoch: int = 0,
    metrics: Optional[Dict[str, float]] = None,
    config: Optional[Dict[str, Any]] = None,
    process_index: Optional[int] = None,
    backend: str = "native",
    async_save: bool = False,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write ``pytree`` under ``directory/ckpt_{step:08d}``.

    backend "native": one ``.npy`` per pytree leaf + manifest (see module
    docstring).  For fully-addressable arrays the whole leaf is written;
    for arrays sharded over a multi-host mesh, only this process's
    addressable shards are written, with (index-offset, global-shape)
    metadata recorded.

    backend "orbax": leaves stored by orbax's StandardCheckpointHandler
    under ``ckpt_dir/state`` (optionally async — roadmap #10); manifest,
    discovery, best-marking and GC stay identical across backends.
    """
    proc = jax.process_index() if process_index is None else process_index
    ckpt_dir = os.path.join(directory, f"ckpt_{step:08d}")
    os.makedirs(ckpt_dir, exist_ok=True)

    if backend == "orbax":
        ckptr = _orbax_checkpointer(async_save)
        wait_for_pending()       # one in-flight save at a time
        state_dir = os.path.join(os.path.abspath(ckpt_dir), "state")
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        ckptr.save(state_dir, pytree)
        manifest = {
            "step": int(step),
            "epoch": int(epoch),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            "config": config or {},
            "extra": extra or {},
            "backend": "orbax",
            "format_version": 1,
        }
        if proc == 0:
            with open(os.path.join(ckpt_dir, MANIFEST), "w") as f:
                json.dump(manifest, f, indent=1)
        log.info("checkpoint saved (orbax%s): %s",
                 " async" if async_save else "", ckpt_dir)
        return ckpt_dir

    leaves = jax.tree_util.tree_flatten_with_path(pytree)[0]
    leaf_meta: Dict[str, Dict[str, Any]] = {}
    for path, leaf in leaves:
        path_s = _path_str(path)
        if not hasattr(leaf, "shape"):  # python scalar (e.g. optax counts)
            leaf_meta[path_s] = {"kind": "scalar", "value": float(leaf)}
            continue
        arr = leaf
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            shards = []
            for shard in arr.addressable_shards:
                fname = _leaf_filename(f"{path_s}.p{proc}s{shard.index}")
                np.save(os.path.join(ckpt_dir, fname), np.asarray(shard.data))
                shards.append({
                    "file": fname,
                    "index": [[s.start or 0, s.stop if s.stop is not None else dim]
                              for s, dim in zip(shard.index, arr.shape)],
                })
            leaf_meta[path_s] = {
                "kind": "sharded",
                "global_shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "shards": shards,
            }
        else:
            fname = _leaf_filename(path_s)
            if proc == 0 or (isinstance(arr, jax.Array) and arr.is_fully_addressable):
                np.save(os.path.join(ckpt_dir, fname), np.asarray(arr))
            leaf_meta[path_s] = {
                "kind": "dense",
                "file": fname,
                "dtype": str(np.asarray(arr).dtype) if proc == 0 else None,
            }

    manifest = {
        "step": int(step),
        "epoch": int(epoch),
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        "config": config or {},
        "extra": extra or {},
        "leaves": leaf_meta,
        "format_version": 1,
    }
    if proc == 0:
        with open(os.path.join(ckpt_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
    log.info("checkpoint saved: %s", ckpt_dir)
    return ckpt_dir


def restore(ckpt_dir: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint into the structure of ``template``.

    Returns (pytree, manifest).  Sharded leaves are reassembled from their
    recorded index offsets; dtype/shape mismatches against the template
    raise (the reference only *warned* on config diffs, trainer.py:611-622
    — silent shape corruption is how sharded checkpoints rot)."""
    with open(os.path.join(ckpt_dir, MANIFEST)) as f:
        manifest = json.load(f)

    if manifest.get("backend") == "orbax":
        wait_for_pending()
        ckptr = _orbax_checkpointer(False)
        state = ckptr.restore(
            os.path.join(os.path.abspath(ckpt_dir), "state"), template)
        return state, manifest

    leaf_meta = manifest["leaves"]

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        path_s = _path_str(path)
        if path_s not in leaf_meta:
            raise KeyError(f"checkpoint missing leaf {path_s!r}")
        meta = leaf_meta[path_s]
        if meta["kind"] == "scalar":
            new_leaves.append(type(leaf)(meta["value"]) if not hasattr(leaf, "shape")
                              else np.asarray(meta["value"], np.asarray(leaf).dtype))
            continue
        if meta["kind"] == "sharded":
            arr = np.zeros(meta["global_shape"], dtype=np.dtype(meta["dtype"]))
            for sh in meta["shards"]:
                sl = tuple(slice(a, b) for a, b in sh["index"])
                arr[sl] = np.load(os.path.join(ckpt_dir, sh["file"]))
        else:
            arr = np.load(os.path.join(ckpt_dir, meta["file"]))
        tmpl = np.asarray(leaf)
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"shape mismatch for {path_s}: checkpoint {arr.shape} "
                f"vs template {tmpl.shape}")
        new_leaves.append(arr.astype(tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), manifest


def find_latest(directory: str) -> Optional[str]:
    """Newest ``ckpt_*`` under ``directory`` — the checkpoint-discovery the
    reference calls but never implemented (trainer.py:450, §2.9.2)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m and os.path.exists(os.path.join(directory, name, MANIFEST)):
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def mark_best(directory: str, ckpt_dir: str) -> None:
    """Point ``directory/best`` at the given checkpoint
    (the ``best_model.pt`` symlink, trainer.py:582-586)."""
    link = os.path.join(directory, BEST_LINK)
    target = os.path.basename(ckpt_dir)
    tmp = link + ".tmp"
    if os.path.islink(tmp) or os.path.exists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, link)


def find_best(directory: str) -> Optional[str]:
    link = os.path.join(directory, BEST_LINK)
    if os.path.islink(link):
        return os.path.join(directory, os.readlink(link))
    return None


def garbage_collect(directory: str, keep: int = 3,
                    in_epoch_only: bool = False) -> List[str]:
    """Delete old checkpoints, keeping the newest ``keep`` plus whatever
    ``best`` points at.

    ``in_epoch_only=True`` restricts deletion to MID-EPOCH checkpoints
    (manifest ``extra.in_epoch``): frequent ``checkpoint_every_dispatches``
    saves would otherwise cycle epoch-boundary checkpoints — the states a
    user expects for export/rollback — out of the shared retention budget.
    """
    if not os.path.isdir(directory):
        return []
    best = find_best(directory)
    best_name = os.path.basename(best) if best else None
    ckpts = sorted(
        (name for name in os.listdir(directory) if _CKPT_RE.match(name)),
        key=lambda n: int(_CKPT_RE.match(n).group(1)))
    if in_epoch_only:
        def _is_mid(name: str) -> bool:
            try:
                with open(os.path.join(directory, name, MANIFEST)) as f:
                    return bool((json.load(f).get("extra") or {})
                                .get("in_epoch"))
            except OSError:
                return False

        ckpts = [n for n in ckpts if _is_mid(n)]
    removed = []
    for name in ckpts[:-keep] if keep > 0 else []:
        if name == best_name:
            continue
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)
        removed.append(name)
    return removed


def consolidate(ckpt_dir: str, out_dir: str) -> str:
    """Merge a (possibly shard-file) checkpoint into single-file dense
    leaves for serving export — the metadata-driven replacement for the
    reference's size-matching shard reassembly
    (consolidate_shards.py:72-116)."""
    with open(os.path.join(ckpt_dir, MANIFEST)) as f:
        manifest = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    new_meta: Dict[str, Any] = {}
    for path_s, meta in manifest["leaves"].items():
        if meta["kind"] == "scalar":
            new_meta[path_s] = meta
            continue
        if meta["kind"] == "sharded":
            arr = np.zeros(meta["global_shape"], dtype=np.dtype(meta["dtype"]))
            for sh in meta["shards"]:
                sl = tuple(slice(a, b) for a, b in sh["index"])
                arr[sl] = np.load(os.path.join(ckpt_dir, sh["file"]))
        else:
            arr = np.load(os.path.join(ckpt_dir, meta["file"]))
        fname = _leaf_filename(path_s)
        np.save(os.path.join(out_dir, fname), arr)
        new_meta[path_s] = {"kind": "dense", "file": fname, "dtype": str(arr.dtype)}
    manifest["leaves"] = new_meta
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir
