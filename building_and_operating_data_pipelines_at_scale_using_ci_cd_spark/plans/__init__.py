from .engine import Orchestrator, JobResult  # noqa: F401
from .pipeline import Pipeline, PipelineTask  # noqa: F401
