from elvis_tpu.search.grid import grid_search, is_valid_overrides, slugify
from elvis_tpu.search.random_search import random_search

__all__ = ["grid_search", "is_valid_overrides", "random_search", "slugify"]
