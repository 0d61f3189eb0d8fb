"""Static Data Docs — human-readable HTML from validation results.

Replaces the reference's Jinja/marshmallow render stack
(great_expectations/render/renderer/page_renderer.py:36
``ValidationResultsPageRenderer`` + renderer/site_builder.py +
checkpoint/actions.py:1001 ``UpdateDataDocsAction``) with a
dependency-free string renderer: one self-contained HTML page per
validation run plus a site index. Driver-side only — it formats an
already-collected :class:`ExpectationSuiteValidationResult`; no Spark
job is launched by rendering.
"""

from .data_docs import (
    UpdateDataDocsAction,
    build_index,
    render_suite_result_page,
)

__all__ = [
    "UpdateDataDocsAction",
    "build_index",
    "render_suite_result_page",
]
