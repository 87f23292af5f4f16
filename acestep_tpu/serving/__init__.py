"""Serving stack: REST job server + OpenRouter chat adapter.

TPU-native re-design of the reference's FastAPI server
(/root/reference/acestep/api_server.py): the endpoint surface, job
lifecycle, and persistence model are preserved, but the implementation is
stdlib-only (http.server + threads). One JAX process owns the TPU; worker
threads serialize generation through the handler while HTTP I/O threads
stay responsive (XLA dispatch releases the GIL).
"""

from acestep_tpu.serving.jobstore import JobRecord, JobStore, LocalResultCache
from acestep_tpu.serving.schemas import GenerateMusicRequest
from acestep_tpu.serving.server import AppState, create_server, main

__all__ = [
    "JobRecord",
    "JobStore",
    "LocalResultCache",
    "GenerateMusicRequest",
    "AppState",
    "create_server",
    "main",
]
