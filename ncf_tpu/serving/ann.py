"""ProductSearch — on-chip vector search replacing Vertex Vector Search.

The reference deploys a Vertex Matching Engine Tree-AH index (dims=64,
COSINE, ~100 approx neighbors) and queries it over the network
(reference: src/inference/setup_tree_ah_endpoint.py:7-147), importing a
phantom ``ProductSearch`` (routes.py:17, §2.9.1).  On TPU, exact
brute-force over the embedding matrix through the streaming top-k kernels
is faster than a network hop to an ANN service at any catalog size that
fits HBM, so this is exact cosine/dot retrieval with the Vertex surface:
``find_neighbors``, ``get_index_stats``, ``refresh``.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ncf_tpu.ops.topk import topk_scores


class ProductSearch:
    """Exact nearest-neighbor retrieval over item embeddings."""

    def __init__(
        self,
        embeddings: np.ndarray,         # [I, D]
        ids: Optional[List] = None,      # external ids, default 0..I-1
        metric: str = "cosine",         # cosine | dot
        impl: str = "auto",
    ):
        if metric not in ("cosine", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.impl = impl
        self._lock = threading.Lock()
        self.refresh(embeddings, ids)

    def refresh(self, embeddings: np.ndarray,
                ids: Optional[List] = None) -> None:
        """Swap the index contents (reference: POST /index/refresh,
        routes.py:197-212)."""
        emb = np.asarray(embeddings, np.float32)
        if self.metric == "cosine":
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)
        with self._lock:
            self._emb = jnp.asarray(emb)
            self._ids = list(ids) if ids is not None else list(range(len(emb)))
            self._refreshed_at = time.time()
            self._queries = 0

    def find_neighbors(
        self,
        queries: np.ndarray,            # [B, D] or [D]
        num_neighbors: int = 10,
    ) -> List[List[Tuple[object, float]]]:
        """Top-k neighbors per query: list of (id, similarity) lists —
        the Vertex ``endpoint.find_neighbors`` surface
        (setup_tree_ah_endpoint.py:122-126)."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        with self._lock:
            emb = self._emb
            self._queries += q.shape[0]
        vals, idxs = topk_scores(jnp.asarray(q), emb, num_neighbors,
                                 impl=self.impl)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        return [
            [(self._ids[int(i)], float(v)) for v, i in zip(vrow, irow)]
            for vrow, irow in zip(vals, idxs)
        ]

    def get_index_stats(self) -> Dict:
        """Index metadata for GET /metrics (routes.py:180-195)."""
        with self._lock:
            return {
                "num_items": int(self._emb.shape[0]),
                "dims": int(self._emb.shape[1]),
                "metric": self.metric,
                "refreshed_at": self._refreshed_at,
                "queries_served": self._queries,
            }
