"""Expectation-type → compiler registry.

Replaces the reference's metaclass-scan metric registry
(expectations/registry.py:163-234, metric_provider.py:101-168) with a
flat dict assembled at import time.
"""

from __future__ import annotations

from .ann_gate import ANN_COMPILERS
from .library_agg import AGG_COMPILERS
from .library_map import MAP_COMPILERS
from .distribution import DISTRIBUTION_COMPILERS
from .query import QUERY_COMPILERS
from .referential import REFERENTIAL_COMPILERS
from .sequence import SEQUENCE_COMPILERS
from .uniqueness import UNIQUE_COMPILERS
from ..payload.image import IMAGE_COMPILERS
from ..payload.media import MEDIA_COMPILERS

COMPILERS = {}
for src in (
    MAP_COMPILERS,
    AGG_COMPILERS,
    DISTRIBUTION_COMPILERS,
    QUERY_COMPILERS,
    REFERENTIAL_COMPILERS,
    SEQUENCE_COMPILERS,
    UNIQUE_COMPILERS,
    IMAGE_COMPILERS,
    MEDIA_COMPILERS,
    ANN_COMPILERS,
):
    COMPILERS.update(src)


def get_compiler(expectation_type: str):
    try:
        return COMPILERS[expectation_type]
    except KeyError:
        raise ValueError(
            f"Unrecognized expectation type: {expectation_type!r}"
        ) from None


def list_expectation_types():
    return sorted(COMPILERS)
