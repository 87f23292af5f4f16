from acestep_tpu.llm.handler import LLMHandler  # noqa: F401
