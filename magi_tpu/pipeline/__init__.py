from magi_tpu.pipeline.pipeline import MagiPipeline

__all__ = ["MagiPipeline"]
