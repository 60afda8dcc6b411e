from .canonicalize import connected_components  # noqa: F401
from .checkpoint import CheckpointedRun  # noqa: F401
from .kg import build_kg, GAZETTEER, KGPipelineResult  # noqa: F401
from .pages import extract_text, extract_text_batch, read_pages  # noqa: F401
