from acestep_tpu.pipeline.handler import AceStepHandler, GenerationResult  # noqa: F401
