from .concurrent import FAIR_SCHEDULER_CONFS, run_validations
from .runner import CheckpointRunner, fingerprint_parquet_dir

__all__ = [
    "CheckpointRunner",
    "FAIR_SCHEDULER_CONFS",
    "fingerprint_parquet_dir",
    "run_validations",
]
