from .cleaning import (
    INVALID_TOKENS,
    clean_text_chain,
    extract_category_head,
    impute_with_default,
    valid_expr,
)
from .dedup import dedup_exact, dedup_keep_latest
from .dq import (
    assert_count_parity,
    assert_no_orphans,
    assert_unique,
    assert_within_bounds,
)
from .keys import add_surrogate_key
from .validation import apply_bounds

__all__ = [
    "INVALID_TOKENS",
    "valid_expr",
    "impute_with_default",
    "clean_text_chain",
    "extract_category_head",
    "dedup_keep_latest",
    "dedup_exact",
    "add_surrogate_key",
    "apply_bounds",
    "assert_unique",
    "assert_no_orphans",
    "assert_count_parity",
    "assert_within_bounds",
]
