"""Embedding export: normalized item/user vectors -> JSONL.

Capability-parity with the reference's offline serving prep
(reference: src/inference/generate_embeddings.py:122-254 — per-product
one-at-a-time forward passes writing L2-normalized ``{id, embedding}``
JSONL for the Vertex index — and bq_to_gcs.py's view-to-JSONL export).
Here the whole catalog is embedded in a handful of batched device calls.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ncf_tpu.data.interactions import Interactions
from ncf_tpu.models import get_model
from ncf_tpu.utils.config import Config


def l2_normalize(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """L2 normalization (generate_embeddings.py:210-215)."""
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, 1e-12)


def export_product_embeddings(
    params,
    cfg: Config,
    out_path: str,
    item_dept: Optional[np.ndarray] = None,
    item_cat: Optional[np.ndarray] = None,
    item_ids: Optional[List] = None,
    which: str = "mlp",          # mlp | mf | category
    batch: int = 8192,
) -> str:
    """Embed every product and write ``{"id": ..., "embedding": [...]}``
    JSONL (generate_embeddings.py:210-241).  Returns the path."""
    model = get_model(cfg.model.name)
    I = cfg.model.num_items
    ext_ids = item_ids if item_ids is not None else list(range(I))
    dept = jnp.asarray(item_dept) if item_dept is not None else None
    cat = jnp.asarray(item_cat) if item_cat is not None else None

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        for start in range(0, I, batch):
            ids = jnp.arange(start, min(start + batch, I), dtype=jnp.int32)
            embs = model.get_product_embeddings(
                params, cfg.model, ids, dept, cat)
            vecs = l2_normalize(np.asarray(embs[which], np.float32))
            for row, item in zip(vecs, ids.tolist()):
                f.write(json.dumps({
                    "id": str(ext_ids[item]),
                    "embedding": [round(float(v), 6) for v in row],
                }) + "\n")
    return out_path


def export_user_embeddings(
    params, cfg: Config, out_path: str,
    user_ids: Optional[List] = None, which: str = "mlp", batch: int = 8192,
) -> str:
    model = get_model(cfg.model.name)
    U = cfg.model.num_users
    ext_ids = user_ids if user_ids is not None else list(range(U))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        for start in range(0, U, batch):
            ids = jnp.arange(start, min(start + batch, U), dtype=jnp.int32)
            embs = model.get_user_embeddings(params, ids)
            vecs = l2_normalize(np.asarray(embs[which], np.float32))
            for row, uid in zip(vecs, ids.tolist()):
                f.write(json.dumps({
                    "id": str(ext_ids[uid]),
                    "embedding": [round(float(v), 6) for v in row],
                }) + "\n")
    return out_path


def load_embeddings_jsonl(path: str):
    """Read an embeddings JSONL back into (ids, matrix) — the index-build
    side of setup_tree_ah_endpoint.py."""
    ids, rows = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            ids.append(rec["id"])
            rows.append(rec["embedding"])
    return ids, np.asarray(rows, np.float32)


def export_interactions_jsonl(inter: Interactions, out_path: str,
                              limit: Optional[int] = None) -> str:
    """Dataset -> newline-JSON export (the bq_to_gcs.py:6-45 analogue)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = len(inter) if limit is None else min(limit, len(inter))
    with open(out_path, "w") as f:
        for r in range(n):
            f.write(json.dumps({
                "user_id": int(inter.user_ids[r]),
                "item_id": int(inter.item_ids[r]),
                "timestamp": int(inter.timestamps[r]),
                "amount": float(inter.amounts[r]),
            }) + "\n")
    return out_path
