from sift_kg_spark.operators.components import connected_components
from sift_kg_spark.operators.exact import exact_dup_pairs
from sift_kg_spark.operators.graphstats import ego_bfs
from sift_kg_spark.operators.lsh import candidate_pairs, explode_keys
from sift_kg_spark.operators.search import search_predicate, search_substring
from sift_kg_spark.operators.suffix import longest_common_span
from sift_kg_spark.operators.verify import verify_pairs

__all__ = [
    "candidate_pairs",
    "connected_components",
    "ego_bfs",
    "exact_dup_pairs",
    "explode_keys",
    "longest_common_span",
    "search_predicate",
    "search_substring",
    "verify_pairs",
]
