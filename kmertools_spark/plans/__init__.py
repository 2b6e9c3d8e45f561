"""Job drivers: checkpointed backfill with lineage + resume."""

from .backfill import BackfillDriver, bucket_of, default_feature_fn

__all__ = ["BackfillDriver", "bucket_of", "default_feature_fn"]
