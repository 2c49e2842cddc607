"""Sentinel-error payloads: failures persisted in place of data.

Reference parity (SURVEY.md §5): the reference persists failures as string
pickles so every work item maps to an output and resume-by-rerun is exact —
``predict_human.py:206-213`` ("NO HUMANS", "MORE THAN 2 HUMANS"),
``initialize_depth.py:361-364``, ``optimize_depth.py:529-535,710-713``,
consumed downstream by ``compute_metrics.py:222-224``, ``filter.py:64-65``,
``extract_coma.py:233-243``.
"""
from __future__ import annotations

NO_HUMANS = "NO HUMANS"
MORE_THAN_2_HUMANS = "MORE THAN 2 HUMANS"
TOO_SMALL_HUMAN = "ERRONEOUS SAMPLE DUE TO TOO SMALL HUMAN"
TOO_LITTLE_INLIERS = "TOO LITTLE INLIERS"
LARGELY_PENETRATED = "LARGELY PENETRATED HUMAN"
NOT_ALLOWED_VIEWPOINT = "NOT ALLOWED VIEWPOINT PROMPTS"

SENTINELS = frozenset(
    {
        NO_HUMANS,
        MORE_THAN_2_HUMANS,
        TOO_SMALL_HUMAN,
        TOO_LITTLE_INLIERS,
        LARGELY_PENETRATED,
        NOT_ALLOWED_VIEWPOINT,
    }
)


def is_sentinel(payload) -> bool:
    """True if a loaded pickle payload is a sentinel-error string.

    The reference treats *any* string payload as an error
    (``extract_coma.py:241-243`` asserts only known sentinels appear).
    """
    return isinstance(payload, str)
