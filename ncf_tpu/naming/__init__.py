from ncf_tpu.naming.generator import ProductNameGenerator, TextClient
from ncf_tpu.naming.parser import ParsedProduct, parse_response
from ncf_tpu.naming.prompts import CATEGORY_PROMPTS, prompt_for_category
from ncf_tpu.naming.validators import (
    validate_category_keywords,
    validate_line_format,
)

__all__ = [
    "ProductNameGenerator",
    "TextClient",
    "ParsedProduct",
    "parse_response",
    "CATEGORY_PROMPTS",
    "prompt_for_category",
    "validate_line_format",
    "validate_category_keywords",
]
