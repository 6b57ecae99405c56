"""ncf_tpu — a TPU-native neural collaborative filtering framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capability surface
of the `Neural-Collaborative-Filtering-Demo` reference (PyTorch/TorchRec +
GCP retail recommender; see SURVEY.md): AdvancedNCF-class models (dual
MF+MLP embedding tables, temporal encoding, multi-head attention over
candidate interactions), BCE-on-sampled-negatives training with
HR@k/NDCG@k/MRR@k/MAP@k leave-one-out eval, sharded embedding tables over a
device mesh, Pallas kernels for the hot ops, checkpoint/resume, and an
offline + online serving path with batched on-chip top-k scoring.

Package layout
--------------
- ``ncf_tpu.data``      — synthetic retail datagen, MovieLens loaders,
                          id-mapping, splits, negative sampling, batching.
- ``ncf_tpu.models``    — functional model definitions (param pytrees +
                          pure apply fns): NCF, NeuMF, AdvancedNCF.
- ``ncf_tpu.ops``       — Pallas TPU kernels (embedding lookup/scatter-add,
                          fused candidate attention, streaming top-k) with
                          XLA reference implementations.
- ``ncf_tpu.parallel``  — mesh construction, sharding specs, row-sharded
                          embedding all-to-all exchange.
- ``ncf_tpu.train``     — optimizers, jitted train/eval steps, Trainer with
                          early stopping, checkpoint save/restore/resume.
- ``ncf_tpu.evals``     — ranking metrics + leave-one-out evaluation.
- ``ncf_tpu.serving``   — model server, brute-force ANN, top-k scorer,
                          feature store/cache, embedding export.
- ``ncf_tpu.api``       — HTTP JSON API (stdlib server; no external deps).
- ``ncf_tpu.utils``     — config, JSONL metrics logging, profiling.
"""

__version__ = "0.2.0"
