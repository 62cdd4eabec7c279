"""Pipeline runners (SURVEY.md §2.9) and incremental state."""

from .pipeline import MedallionPipeline
from .watermark import WatermarkManager

__all__ = ["MedallionPipeline", "WatermarkManager"]
