from .pipeline import (
    PipelineResult,
    lineage_table,
    run_sketch_pipeline,
    run_summary_pipeline,
)

__all__ = [
    "PipelineResult",
    "lineage_table",
    "run_sketch_pipeline",
    "run_summary_pipeline",
]
