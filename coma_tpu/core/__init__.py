"""Core: typed work keys, path schema, artifact store, sentinels."""
from coma_tpu.core.paths import ResultsTree, SampleKey, scam_of
from coma_tpu.core.sentinels import SENTINELS, is_sentinel

__all__ = ["ResultsTree", "SampleKey", "scam_of", "SENTINELS", "is_sentinel"]
