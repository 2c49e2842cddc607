"""Global metadata (reference: ``constants/metadata.py``)."""

DEFAULT_SEED = 42
