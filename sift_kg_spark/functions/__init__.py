from sift_kg_spark.functions.text import (
    extract_text_py,
    extract_text_udf,
    normalize_text_py,
    normalize_text_udf,
)

__all__ = [
    "extract_text_py",
    "extract_text_udf",
    "normalize_text_py",
    "normalize_text_udf",
]
