from magi_tpu.sampling.transport import ArdfSampler, InferenceInput

__all__ = ["ArdfSampler", "InferenceInput"]
