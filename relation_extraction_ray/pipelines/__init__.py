"""Ray-Data-native pipelines composing the stage library."""

from .kg import KGPipeline, documents_from_plain_text  # noqa: F401
