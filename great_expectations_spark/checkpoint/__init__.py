from .runner import CheckpointRunner, fingerprint_parquet_dir

__all__ = ["CheckpointRunner", "fingerprint_parquet_dir"]
