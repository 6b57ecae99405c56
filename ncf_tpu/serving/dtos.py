"""Pydantic request/response DTOs for the recommendation API.

Mirror of the reference's serving models (reference:
src/inference/models.py:7-60): ProductMetadata, ProductRecommendation,
RecommendationRequest/Response, BatchRecommendationRequest/Response (max
100 customer ids), ErrorResponse.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class ProductMetadata(BaseModel):
    name: Optional[str] = None
    department: Optional[str] = None
    category: Optional[str] = None
    avg_price: Optional[float] = None
    popularity_score: Optional[float] = None


class ProductRecommendation(BaseModel):
    product_id: str
    score: float
    rank: int
    metadata: Optional[ProductMetadata] = None
    explanation: Optional[str] = None


class RecommendationRequest(BaseModel):
    customer_id: str
    num_recommendations: int = Field(default=10, ge=1, le=100)
    context: Optional[Dict[str, int]] = None   # hour/day/month/day_of_year
    exclude_purchased: bool = False


class RecommendationResponse(BaseModel):
    customer_id: str
    recommendations: List[ProductRecommendation]
    model_version: str
    inference_time_ms: float


class IntelligenceRequest(BaseModel):
    """POST /api/v1/intelligence — the web demo's dashboard query
    (reference: demo/app.py:79-248 Model Intelligence Dashboard +
    the :43-77 hour-of-day toggle)."""

    customer_id: str
    num_recommendations: int = Field(default=10, ge=1, le=100)
    hour: Optional[int] = Field(default=None, ge=0, le=23)


class BatchRecommendationRequest(BaseModel):
    customer_ids: List[str] = Field(..., max_length=100)  # models.py max 100
    num_recommendations: int = Field(default=10, ge=1, le=100)
    context: Optional[Dict[str, int]] = None


class BatchRecommendationResponse(BaseModel):
    results: List[RecommendationResponse]
    total_time_ms: float


class ErrorResponse(BaseModel):
    error: str
    detail: Optional[str] = None
    status_code: int = 500
