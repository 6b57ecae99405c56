from ncf_tpu.api.app import RecommendationAPI, make_handler, serve

__all__ = ["RecommendationAPI", "make_handler", "serve"]
