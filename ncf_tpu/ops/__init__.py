from ncf_tpu.ops.embedding import embedding_lookup, get_impl, set_impl

__all__ = ["embedding_lookup", "get_impl", "set_impl"]
