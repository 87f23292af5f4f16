"""LoRA / LoKr adapter runtime + training for the DiT decoder.

Capability parity with the reference's PEFT-LoRA + LyCORIS-LoKr stack
(/root/reference/acestep/core/generation/handler/lora/*,
acestep/training/lora_utils.py): named adapters targeting the decoder's
q/k/v/o and gate/up/down projections, per-adapter scale, enable/disable
toggle, load/save, and a registry — re-designed for JAX param pytrees:

- The decoder's 24 layers are STACKED (leading layer axis) for `lax.scan`;
  adapters are stacked the same way, so a LoRA delta is two tensors
  (L, in, r) x (L, r, out) per target, and the merge is one batched matmul
  per target inside a single jitted program.
- "Applying" an adapter produces a merged effective-params tree (cached
  until adapters/scales change) — zero per-step overhead at inference,
  exactly like merged-weight PEFT deployment.
"""

from acestep_tpu.lora.adapters import (
    LORA_TARGETS,
    init_lokr,
    init_lora,
    lora_delta,
    lokr_delta,
    merge_adapter,
    merge_weights,
    target_paths,
)
from acestep_tpu.lora.manager import LoraManager, load_adapter_file, save_adapter

__all__ = [
    "LORA_TARGETS",
    "init_lora",
    "init_lokr",
    "lora_delta",
    "lokr_delta",
    "merge_adapter",
    "merge_weights",
    "target_paths",
    "LoraManager",
    "load_adapter_file",
    "save_adapter",
]
