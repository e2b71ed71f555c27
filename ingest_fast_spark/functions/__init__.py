from .scalars import (  # noqa: F401
    fast_id,
    last_segment,
    normalize_label,
    normalize_label_py,
    nt_literal,
    singularize_words,
)
