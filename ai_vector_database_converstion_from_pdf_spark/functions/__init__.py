from .vector import dot, l2_norm, cosine, cosine_rounded, query_vector_lit  # noqa: F401
from .text import tokens, norm_text, trust_score  # noqa: F401
