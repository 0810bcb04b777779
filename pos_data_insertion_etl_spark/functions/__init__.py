from .text import (  # noqa: F401
    fingerprint,
    shingles,
    stopword_hits,
    tokens,
)
from .vectors import cosine_similarity_fixed_point, quantize_vec  # noqa: F401
