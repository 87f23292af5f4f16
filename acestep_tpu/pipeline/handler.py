"""AceStepHandler — DiT-side orchestration (TPU-native).

Capability parity with the reference handler stack
(/root/reference/acestep/handler.py + core/generation/handler/*): task
resolution (text2music/repaint/cover/extract/lego/complete), batch
conditioning (silence/src latents, chunk masks + repaint spans, is_covers,
code hints), reference-audio timbre conditioning, turbo + guided sampling,
tiled VAE decode, audio post-processing.

TPU-first redesign:
- One jitted generation program per (batch, frames, text-len, lyric-len,
  schedule, method) bucket; durations are padded up to 10 s buckets so 600 s
  of requests share ~60 programs, not thousands.
- All per-item Python branching (task switches, spans, seeds) happens at
  trace-input build time on host; everything on-device is static-shape.
- Per-item seeds become jax.random.fold_in keys (the reference's
  per-item torch.Generator list, modeling_acestep_v15_turbo.py:1730-1767).
"""

from __future__ import annotations

import dataclasses
import os
import random
import time
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.constants import LATENT_RATE, SAMPLE_RATE, VAE_HOP
from acestep_tpu.models.dit import init_dit_params, prepare_condition
from acestep_tpu.models.sampler import (
    ConditionSet, build_continuous_schedule, build_turbo_schedule, renoise,
    sample_guided, sample_turbo, truncate_for_cover_noise,
)
from acestep_tpu.models.vae import init_vae_params
from acestep_tpu.models.vae_tiled import tiled_decode, tiled_encode
from acestep_tpu.pipeline import text as textlib
from acestep_tpu.pipeline.embedder import HashTextEmbedder
from acestep_tpu.utils.audio import AudioSaver, load_audio, peak_normalize

FRAME_BUCKET = 250          # 10 s of 25 Hz latents
MIN_FRAMES = 128            # reference pads latents to >= 128 frames
REFER_FRAMES = 750          # 30 s timbre reference budget (timbre_fix_frame)


def _pad_frames_to(T: int, bucket: int, min_frames: int) -> int:
    T = max(T, min_frames)
    return -(-T // bucket) * bucket


def _femb(x):
    """Embedding input for a jitted program: device-resident embeddings
    (QwenTextEmbedder output) pass through — an np.asarray would pull
    them D2H only to re-upload; host arrays become f32 numpy."""
    return x if isinstance(x, jax.Array) else np.asarray(x, np.float32)


def _is_oom_error(e: Exception) -> bool:
    """XLA device-memory exhaustion (any backend's phrasing)."""
    from acestep_tpu.utils.memory import is_oom_error

    return is_oom_error(e)


def _degrade_plan(e: Exception, chunk: int, groups: int, *,
                  min_chunk: int = 32) -> tuple:
    """One step down the OOM ladder; re-raises non-OOM errors and raises
    when the ladder is exhausted (reference vae_decode_chunks.py:40-81)."""
    if not _is_oom_error(e):
        raise e
    if groups > 1:
        return chunk, max(1, groups // 2)
    if chunk > min_chunk:
        return max(min_chunk, chunk // 2), 1
    raise e


@dataclasses.dataclass
class GenerationResult:  # noqa: D101
    audios: List[np.ndarray]              # (samples, 2) float32 each
    pred_latents: np.ndarray              # (B, T, 64)
    seeds: List[int]
    time_costs: Dict[str, float]
    sample_rate: int = SAMPLE_RATE
    audio_paths: Optional[List[str]] = None
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)




class AceStepHandler:
    """Service facade. Construct, `initialize_service()`, then
    `generate_music(...)`."""

    def __init__(self, dit_config: Optional[DiTConfig] = None,
                 vae_config: Optional[VAEConfig] = None,
                 dtype=jnp.bfloat16, frame_bucket: int = FRAME_BUCKET,
                 min_frames: int = MIN_FRAMES,
                 refer_frames: int = REFER_FRAMES):
        self.cfg = dit_config or DiTConfig()
        if os.environ.get("ACESTEP_DIT_UNROLL", "0") == "1":
            self.cfg = dataclasses.replace(self.cfg, unroll_layers=True)
        self.vae_cfg = vae_config or VAEConfig()
        self.dtype = dtype
        self.frame_bucket = frame_bucket
        self.min_frames = min_frames
        self.refer_frames = refer_frames
        self.params: Optional[dict] = None
        self.vae_params: Optional[dict] = None
        self.silence_latent: Optional[jnp.ndarray] = None  # (1, T, 64)
        self.text_embedder = None
        self.lora = None          # LoraManager attached by acestep_tpu.lora
        self.mesh = None          # set via enable_mesh() for multi-chip dp
        self._fn_cache: Dict[tuple, Any] = {}
        # device-resident constant inputs (silence broadcasts, all-ones
        # chunk masks), keyed by shape: the text2music hot path re-sends
        # ~3x (B,T,64) f32 of constants per request otherwise — pure link
        # traffic on tunneled/PCIe-attached devices. LRU, capped by BYTES
        # (a count cap would let 64 (8,15000,64) f32 entries pin ~2 GB of
        # HBM on exactly the tiers that have none to spare)
        import collections
        self._dev_const: "collections.OrderedDict[tuple, Any]" = \
            collections.OrderedDict()
        self._dev_const_bytes = 0
        self._dev_const_cap = 128 * 2**20   # 128 MB of cached constants
        # exact f32 audio download instead of the int16+peak wire format
        # (ACESTEP_EXACT_AUDIO_TRANSFER=1; costs 2x device->host bytes)
        self._exact_transfer = os.environ.get(
            "ACESTEP_EXACT_AUDIO_TRANSFER", "0") == "1"
        # latent frames per decode segment before splitting the decode into
        # overlapped dispatch+transfer segments. Smaller segments = more
        # concurrent readback streams (the tunnel's device->host bandwidth
        # is per-stream limited: ~+33% aggregate measured with 3 parallel
        # readbacks) AND decode compute overlapping transfer; the 16-frame
        # receptive-field margins cost <2% extra compute at 8 segments.
        # 768 frames (~30 s) engages the pipeline from 60 s songs up —
        # the b1 60 s VAE stage is transfer-dominated on slow-link days
        # (measured 0.6-10.4 s for the same 11.5 MB), exactly when the
        # extra streams matter (VERDICT r4 items 2-3). Measured A/B on the
        # same link: b8x30s VAE 3.4-5.7 s -> 1.5-2.4 s with per-item groups
        # + 6 fetch streams; 512-frame segments made b1x60s slightly WORSE
        # (3 skinny streams under-fill the link), so 768 it is.
        self._seg_frames = int(os.environ.get("ACESTEP_SEG_FRAMES", "768"))
        self.initialized = False
        from acestep_tpu.runtime_config import get_global_config
        self.tier = get_global_config()
        from acestep_tpu.utils.progress import ProgressEstimator
        self.progress_estimator = ProgressEstimator()

    # --------------------------------------------------------------
    # Init (reference init_service_orchestrator.py)
    # --------------------------------------------------------------

    def initialize_service(self, checkpoint_dir: Optional[str] = None,
                           vae_dir: Optional[str] = None,
                           text_embedder=None, seed: int = 0,
                           quantization: Optional[str] = None,
                           vae_params: Optional[dict] = None) -> None:
        """Load checkpoints when given, otherwise seeded random init (all
        structural behavior is weight-independent).

        quantization='int8' stores DiT weights int8 + per-channel scales
        (reference torchao int8_weight_only policy, DiT-only filter,
        init_service_loader.py:89-114); dequant runs inside each jitted
        program so XLA fuses it into the consuming matmuls."""
        self.checkpoint_dir = checkpoint_dir   # remembered for reinitialize
        if checkpoint_dir:
            from acestep_tpu.utils.checkpoint import load_dit_checkpoint
            self.params, silence = load_dit_checkpoint(checkpoint_dir, self.cfg,
                                                       self.dtype)
            self.silence_latent = np.asarray(silence, np.float32)
        else:
            # One compiled program for the whole init: eager per-leaf RNG would
            # be hundreds of tiny dispatches (seconds each over a TPU tunnel).
            dit_init = jax.jit(lambda k: jax.tree.map(
                lambda x: x.astype(self.dtype), init_dit_params(k, self.cfg)))
            self.params = dit_init(jax.random.PRNGKey(seed))
        if vae_params is not None:
            # multi-model serving shares one VAE across DiT variants
            self.vae_params = vae_params
        elif vae_dir:
            from acestep_tpu.utils.checkpoint import load_vae_checkpoint
            self.vae_params = load_vae_checkpoint(vae_dir, self.vae_cfg, self.dtype)
        else:
            vae_init = jax.jit(lambda k: jax.tree.map(
                lambda x: x.astype(self.dtype),
                init_vae_params(k, self.vae_cfg)))
            self.vae_params = vae_init(jax.random.PRNGKey(seed + 1))
        if self.silence_latent is None:
            self.silence_latent = np.zeros(
                (1, 15360, self.cfg.audio_acoustic_hidden_dim), np.float32)
        self._clear_dev_const()     # silence may have changed
        self.quantization = quantization
        if quantization:
            from acestep_tpu.ops.quant import MODE_ALIASES, quantize_tree
            if quantization not in MODE_ALIASES:
                raise ValueError(
                    f"unsupported quantization {quantization!r}; supported: "
                    f"{sorted(MODE_ALIASES)}")
            from functools import partial
            self.params = jax.jit(
                partial(quantize_tree, mode=quantization))(self.params)
        if text_embedder is None and (
                checkpoint_dir or os.environ.get("ACESTEP_TEXT_ENCODER_DIR")):
            # real-checkpoint mode: condition on the actual Qwen3-Embedding
            # trunk when its checkpoint is locally available — hash
            # embeddings are a structural fallback, not a substitute for
            # semantics (reference loads the text encoder alongside the
            # DiT, init_service_loader.py)
            text_embedder = self._build_qwen_embedder()
        self.text_embedder = text_embedder or HashTextEmbedder(
            dim=self.cfg.text_hidden_dim)
        from acestep_tpu.lora.manager import LoraManager
        self.lora = LoraManager(self.params)
        self.initialized = True

    def _build_qwen_embedder(self):
        """Qwen3-Embedding text encoder from ACESTEP_TEXT_ENCODER_DIR or
        the downloads cache (LOCAL resolution only — initialize_service
        must not surprise-download GBs; use acestep-tpu-download first).
        Returns None when unavailable -> HashTextEmbedder fallback."""
        try:
            path = os.environ.get("ACESTEP_TEXT_ENCODER_DIR")
            if not path and self.checkpoint_dir:
                # reference layout nests it inside the main checkpoint dir
                # (init_service_loader.py:150); also try the sibling level
                for cand in (
                        os.path.join(self.checkpoint_dir,
                                     "Qwen3-Embedding-0.6B"),
                        os.path.join(os.path.dirname(self.checkpoint_dir),
                                     "Qwen3-Embedding-0.6B")):
                    if os.path.isdir(cand):
                        path = cand
                        break
            if not path:
                from acestep_tpu.utils.downloads import ensure_model
                path = ensure_model("Qwen3-Embedding-0.6B",
                                    allow_download=False)
            from acestep_tpu.config import LMConfig
            from acestep_tpu.llm.tokenizer import load_hf_tokenizer
            from acestep_tpu.pipeline.embedder import QwenTextEmbedder
            from acestep_tpu.utils.checkpoint import load_lm_checkpoint

            cfg = LMConfig.from_checkpoint(path)
            params = load_lm_checkpoint(path, cfg, self.dtype)
            tok = load_hf_tokenizer(path)
            print(f"[acestep_tpu] text encoder: Qwen3-Embedding at {path}")
            return QwenTextEmbedder(params, cfg, tok, dtype=self.dtype)
        except Exception as e:       # noqa: BLE001 — fallback is by design
            print(f"[acestep_tpu] text encoder unavailable ({e!r}); "
                  f"using hash embeddings")
            return None

    def enable_mesh(self, dp: Optional[int] = None, tp: int = 1) -> None:
        """Shard generation over a dp x tp device mesh.

        dp (batch parallelism): weights replicate over ICI, latents/noise/
        conditioning shard on the batch axis; batch sizes must be multiples
        of dp. tp (tensor parallelism): attention/MLP projections shard
        head-/column-wise (parallel.dit_param_pspecs) so a SINGLE song's
        denoising spreads over tp chips — XLA inserts the all-reduces.
        The reference declares an equivalent DiT TP plan but never executes
        it (configuration_acestep_v15.py:133-146); here it runs."""
        from jax.sharding import Mesh

        devices = jax.devices()
        if dp is None:
            dp = max(1, len(devices) // tp)
        need = dp * tp
        if len(devices) < need:
            raise ValueError(f"mesh dp={dp} x tp={tp} needs {need} devices, "
                             f"have {len(devices)}")
        if tp > 1:
            self.mesh = Mesh(np.asarray(devices[:need]).reshape(dp, tp),
                             ("dp", "tp"))
        else:
            self.mesh = Mesh(np.asarray(devices[:dp]).reshape(dp), ("dp",))
        self._fn_cache.clear()
        self._clear_dev_const()

    def get_service_status(self) -> Dict[str, Any]:
        return {
            "initialized": self.initialized,
            "model_version": self.cfg.model_version,
            "dtype": str(self.dtype.__name__ if hasattr(self.dtype, "__name__")
                         else self.dtype),
            "devices": [str(d) for d in jax.devices()],
        }

    # --------------------------------------------------------------
    # Latent helpers
    # --------------------------------------------------------------

    def _silence(self, T: int) -> np.ndarray:
        """Host-side (T, 64) silence latent slice/tile."""
        sl = self.silence_latent
        if sl.shape[1] >= T:
            return sl[0, :T, :]
        reps = -(-T // sl.shape[1])
        return np.tile(sl[0], (reps, 1))[:T]

    def _dev_cached(self, key: tuple, build):
        """LRU byte-capped cache of device-resident constants."""
        cache = self._dev_const
        if key in cache:
            cache.move_to_end(key)
            return cache[key]
        val = build()
        nbytes = int(val.size) * val.dtype.itemsize
        while cache and self._dev_const_bytes + nbytes > self._dev_const_cap:
            _, old = cache.popitem(last=False)
            self._dev_const_bytes -= int(old.size) * old.dtype.itemsize
        cache[key] = val
        self._dev_const_bytes += nbytes
        return val

    def _clear_dev_const(self):
        self._dev_const.clear()
        self._dev_const_bytes = 0

    def _dev_silence(self, B: int, T: int):
        """Device-cached (B, T, 64) f32 silence broadcast (uploaded once
        per shape; the text2music hot path reuses it every request)."""
        def build():
            sil = jnp.asarray(self._silence(T).astype(np.float32))
            return jnp.broadcast_to(
                sil[None], (B, T, sil.shape[-1])) + 0.0   # materialize
        return self._dev_cached(("sil", B, T), build)

    def _dev_ones(self, B: int, T: int):
        """Device-cached (B, T, C) f32 all-ones chunk mask."""
        return self._dev_cached(("ones", B, T), lambda: jnp.ones(
            (B, T, self.cfg.audio_acoustic_hidden_dim), jnp.float32))

    # encode/decode run as one compiled program per input shape (cached):
    # the tiled lax.map loop must live under jit, or every conv in every
    # chunk becomes an individual device dispatch.

    def _encode_fn(self, shape: tuple, chunk: Optional[int] = None,
                   groups: Optional[int] = None):
        key = ("enc", shape, chunk, groups)
        if key not in self._fn_cache:
            kw = {}
            if chunk is not None:
                kw["chunk_size"] = chunk
            if groups is not None:
                kw["parallel_windows"] = groups
            self._fn_cache[key] = jax.jit(
                lambda p, x: tiled_encode(p, self.vae_cfg, x, **kw))
        return self._fn_cache[key]

    def _decode_fn(self, shape: tuple, chunk: int, groups: int):
        key = ("dec", shape, chunk, groups, self._exact_transfer)
        if key not in self._fn_cache:
            if self._exact_transfer:
                fn = lambda p, z: tiled_decode(  # noqa: E731
                    p, self.vae_cfg, z.astype(self.dtype),
                    chunk_size=chunk,
                    parallel_windows=groups).astype(jnp.float32)
            else:
                # Device->host audio moves as int16 + per-item peak (half
                # the bytes of f32; the quantization grid equals what a
                # 16-bit export keeps anyway). Host PCIe/tunnel bandwidth
                # is the VAE stage's real bottleneck at long durations.
                def fn(p, z):
                    audio = tiled_decode(
                        p, self.vae_cfg, z.astype(self.dtype),
                        chunk_size=chunk,
                        parallel_windows=groups).astype(jnp.float32)
                    peak = jnp.max(jnp.abs(audio), axis=(1, 2),
                                   keepdims=True)
                    scale = jnp.maximum(peak, 1e-8) / 32767.0
                    i16 = jnp.clip(jnp.round(audio / scale),
                                   -32768, 32767).astype(jnp.int16)
                    return i16, peak
            self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key]

    def _decode_plan(self, T: int) -> tuple:
        """(chunk, parallel_windows) defaults for a T-frame decode.

        Long songs decode faster with bigger windows / smaller groups
        (measured on v5e: 600 s 19.1 s @ (256,16) vs 11.7 s @ (512,8));
        the tier caps the window on smaller-HBM parts."""
        chunk, groups = ((512, 8) if T > 2048 else (256, 16))
        return min(chunk, self.tier.decode_chunk), groups

    def encode_audio(self, audio: np.ndarray) -> np.ndarray:
        """(samples, ch) float32 -> (T, 64) latents via tiled VAE encode.

        Audio pads to a frame-bucket multiple of hop samples so arbitrary
        upload lengths share one compiled program per 10 s bucket (the same
        discipline as generation; exact-shape keys would recompile per
        request and grow the cache unboundedly)."""
        from acestep_tpu.models.vae_tiled import DEFAULT_ENCODE_CHUNK

        x = np.asarray(audio, np.float32)
        hop = self.vae_cfg.hop_length
        T_real = -(-x.shape[0] // hop)
        bucket_samples = self.frame_bucket * hop
        pad = (-x.shape[0]) % bucket_samples
        if pad:
            x = np.pad(x, ((0, pad), (0, 0)))
        # explicit first-attempt plan: the OOM ladder must be seeded with
        # the chunk the FAILED attempt actually used (a tier.encode_chunk
        # larger than the default would make the first retry no smaller
        # than the failure, burning a recompile for nothing)
        chunk = min(self.tier.encode_chunk, DEFAULT_ENCODE_CHUNK)
        groups = 8
        while True:
            try:
                z = self._encode_fn(x[None].shape, chunk, groups)(
                    self.vae_params, x[None].astype(self.dtype))
                return np.asarray(z[0][:T_real], np.float32)
            except Exception as e:  # noqa: BLE001 — ladder filters below
                chunk, groups = _degrade_plan(e, chunk, groups, min_chunk=64)

    def decode_latents(self, latents) -> np.ndarray:
        """(B, T, 64) -> (B, samples, 2) float32.

        Degrades gracefully under device memory pressure (the reference's
        OOM ladder, vae_decode_chunks.py:40-81 + memory_utils.py:105-155):
        on RESOURCE_EXHAUSTED, first halve the parallel window group, then
        the decode window itself, and retry."""
        if isinstance(latents, jax.Array):
            # device-resident hand-off from the diffusion stage: segment /
            # group slicing below stays on device, no host round-trip
            z = latents if latents.dtype == jnp.float32 \
                else latents.astype(jnp.float32)
        else:
            z = np.asarray(latents, np.float32)
        B, T = z.shape[:2]
        segs = min(8, max(1, -(-T // self._seg_frames)))   # ceil: a 60 s
        # song (T=1500, seg 768) already decodes as 2 overlapped segments
        groups = 1
        if B > 1 and B * T >= self._seg_frames:
            want = min(B, -(-B * T // self._seg_frames))
            groups = max(g for g in range(1, want + 1) if B % g == 0)
        if segs > groups and segs > 1:
            # time-axis split wins (few items, long song)
            return self._decode_segmented(z, segs)
        if groups > 1:
            # batch items are independent: decode equal item-groups with
            # every group dispatched before any fetch, overlapping group
            # i's audio transfer with group i+1's decode compute
            g = B // groups
            chunk, gw = self._decode_plan(T)
            while True:
                try:
                    fn = self._decode_fn((g, T, z.shape[2]), chunk, gw)
                    outs = [fn(self.vae_params, z[i * g:(i + 1) * g])
                            for i in range(groups)]
                    # concurrent per-group readback (see
                    # _decode_segmented: per-stream bandwidth limit)
                    import concurrent.futures as _cf

                    with _cf.ThreadPoolExecutor(min(6, groups)) as ex:
                        hosts = list(ex.map(self._audio_to_host, outs))
                    return np.concatenate(hosts, axis=0)
                except Exception as e:  # noqa: BLE001 — OOM ladder
                    chunk, gw = _degrade_plan(e, chunk, gw)
        chunk, groups = self._decode_plan(z.shape[1])
        while True:
            try:
                out = self._decode_fn(z.shape, chunk, groups)(
                    self.vae_params, z)
                return self._audio_to_host(out)
            except Exception as e:  # noqa: BLE001 — ladder filters below
                chunk, groups = _degrade_plan(e, chunk, groups)

    def _audio_to_host(self, out) -> np.ndarray:
        if self._exact_transfer:
            return np.asarray(out)
        i16, peak = out
        i16 = np.asarray(i16)
        peak = np.asarray(peak, np.float32)
        return i16.astype(np.float32) * (peak / 32767.0)

    def _decode_segmented(self, z: np.ndarray, segs: int) -> np.ndarray:
        """Long songs: split the latent axis into equal segments (plus a
        16-frame receptive-field margin each side, the tiled-decode overlap
        guarantee) and dispatch every segment's decode before fetching any —
        JAX's async dispatch then overlaps segment i's device->host audio
        transfer with segment i+1's decode compute. Worth ~the full decode
        compute time at 600 s, where transfer dominates the VAE stage."""
        from acestep_tpu.models.vae_tiled import DEFAULT_DECODE_OVERLAP

        margin = DEFAULT_DECODE_OVERLAP
        B, T, _C = z.shape
        hop = self.vae_cfg.hop_length
        core = -(-T // segs)
        pad_spec = ((0, 0), (margin, segs * core - T + margin), (0, 0))
        zp = (jnp.pad(z, pad_spec) if isinstance(z, jax.Array)
              else np.pad(z, pad_spec))
        seg_len = core + 2 * margin
        chunk, groups = self._decode_plan(seg_len)
        while True:
            try:
                fn = self._decode_fn((B, seg_len, zp.shape[2]), chunk, groups)
                outs = [fn(self.vae_params,
                           zp[:, i * core: i * core + seg_len])
                        for i in range(segs)]
                # fetch segments CONCURRENTLY: the tunnel's device->host
                # bandwidth is per-stream limited (~+33% aggregate with 3
                # parallel readbacks, measured), and all segments were
                # dispatched above so device compute already overlaps
                import concurrent.futures as _cf

                def fetch(out):
                    return self._audio_to_host(out)[
                        :, margin * hop: (margin + core) * hop]

                with _cf.ThreadPoolExecutor(min(6, segs)) as ex:
                    parts = list(ex.map(fetch, outs))
                return np.concatenate(parts, axis=1)[:, : T * hop]
            except Exception as e:  # noqa: BLE001 — ladder filters below
                chunk, groups = _degrade_plan(e, chunk, groups)

    # --------------------------------------------------------------
    # Core generation
    # --------------------------------------------------------------

    def _build_generate_fn(self, *, schedule: tuple,
                           method: str, guidance_scale: float,
                           use_adg: bool, cfg_interval: tuple,
                           has_non_cover: bool, cover_steps: Optional[int],
                           start_t: Optional[float]):
        """One compiled program covering condition-encode + full trajectory."""
        cfg = self.cfg
        is_turbo = cfg.model_version == "turbo"
        do_cfg = (not is_turbo) and guidance_scale > 1.0

        def fn(params, inputs, noise_key):
            from acestep_tpu.ops.quant import dequantize_params
            params = dequantize_params(params, self.dtype)
            # cast float inputs to compute dtype on-device (host arrays are f32)
            inputs = {
                k: (v.astype(self.dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in inputs.items()
            }
            cond_inputs = dict(
                text_hidden_states=inputs["text_hidden_states"],
                text_attention_mask=inputs["text_attention_mask"],
                lyric_hidden_states=inputs["lyric_hidden_states"],
                lyric_attention_mask=inputs["lyric_attention_mask"],
                refer_audio_packed=inputs["refer_audio_packed"],
                refer_order_mask=inputs["refer_order_mask"],
                src_latents=inputs["src_latents"],
                chunk_masks=inputs["chunk_masks"],
                is_covers=inputs["is_covers"],
                silence_latent=inputs["silence_latent"],
            )
            if "audio_codes" in inputs:
                cond_inputs["audio_codes"] = inputs["audio_codes"]
                if "audio_codes_valid_frames" in inputs:
                    cond_inputs["audio_codes_valid_frames"] = \
                        inputs["audio_codes_valid_frames"]
            if "precomputed_lm_hints_25hz" in inputs:
                cond_inputs["precomputed_lm_hints_25hz"] = \
                    inputs["precomputed_lm_hints_25hz"]
            enc, _m, ctx = prepare_condition(params, cfg, **cond_inputs)
            cond = ConditionSet.build(params, cfg, enc, ctx)

            cond_nc = None
            if has_non_cover:
                enc_nc, _m2, ctx_nc = prepare_condition(
                    params, cfg,
                    text_hidden_states=inputs["non_cover_text_hidden_states"],
                    text_attention_mask=inputs["non_cover_text_attention_mask"],
                    lyric_hidden_states=inputs["lyric_hidden_states"],
                    lyric_attention_mask=inputs["lyric_attention_mask"],
                    refer_audio_packed=inputs["refer_audio_packed"],
                    refer_order_mask=inputs["refer_order_mask"],
                    src_latents=inputs["silence_src"],
                    chunk_masks=inputs["chunk_masks"],
                    is_covers=jnp.zeros_like(inputs["is_covers"]),
                    silence_latent=inputs["silence_latent"],
                )
                cond_nc = ConditionSet.build(params, cfg, enc_nc, ctx_nc)

            null_cond = None
            if do_cfg:
                null = jnp.broadcast_to(
                    params["null_condition_emb"].astype(enc.dtype), enc.shape)
                null_cond = ConditionSet.build(params, cfg, null, ctx)

            B, T = inputs["src_latents"].shape[:2]
            if "initial_noise" in inputs:
                # seed-parity seam (SURVEY §7 hard parts): externally
                # supplied noise (e.g. torch.randn from the reference) so
                # trajectories can be compared bit-for-bit across frameworks.
                noise = inputs["initial_noise"].astype(self.dtype)
            else:
                keys = jax.vmap(lambda s: jax.random.fold_in(noise_key, s))(
                    inputs["seeds"])
                noise = jax.vmap(
                    lambda k: jax.random.normal(
                        k, (T, cfg.audio_acoustic_hidden_dim), self.dtype))(keys)
            if start_t is not None:
                x_init = renoise(inputs["src_latents"], jnp.asarray(start_t), noise)
            else:
                x_init = noise

            if is_turbo:
                x0 = sample_turbo(params, cfg, x_init=x_init, schedule=schedule,
                                  cond=cond, cond_non_cover=cond_nc,
                                  cover_steps=cover_steps,
                                  infer_method=method, key=noise_key)
            else:
                x0 = sample_guided(params, cfg, x_init=x_init, schedule=schedule,
                                   cond=cond, null_cond=null_cond,
                                   cond_non_cover=cond_nc,
                                   cover_steps=cover_steps,
                                   guidance_scale=guidance_scale,
                                   cfg_interval=cfg_interval, use_adg=use_adg,
                                   infer_method=method, key=noise_key)
            x0 = x0.astype(jnp.float32)
            # validity scalars computed on device: the caller syncs on these
            # 8 bytes instead of fetching the whole latent tensor, which
            # keeps x0 device-resident for the VAE stage (the D2H+H2D
            # round-trip of f32 latents costs ~0.6 s at 600 s over a
            # bandwidth-limited link)
            return x0, jnp.isfinite(x0).all(), jnp.abs(x0).sum() > 0

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh
            replicated = NamedSharding(mesh, P())
            batched = NamedSharding(mesh, P("dp"))

            # params replicated over ICI (dp) and, when the mesh has a tp
            # axis, sharded head-/column-wise per dit_param_pspecs; every
            # batch-leading input shards on dp (prefix pytree applies to
            # all dict leaves). dp-only runs the whole trajectory SPMD with
            # zero cross-chip collectives; tp adds XLA all-reduces after
            # attention/MLP — the TPU-native replacement for the
            # reference's single-GPU batch loop (SURVEY §7.7).
            # silence_latent is tiled to the batch when a mesh is active.
            param_shardings: Any = replicated
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                from acestep_tpu.parallel import dit_param_pspecs
                from acestep_tpu.parallel.mesh import sanitize_pspecs

                pspecs = sanitize_pspecs(
                    self.params, dit_param_pspecs(self.params), mesh)
                param_shardings = jax.tree.map(
                    lambda s: NamedSharding(mesh, s), pspecs,
                    is_leaf=lambda x: isinstance(x, P))
            return jax.jit(
                fn,
                in_shardings=(param_shardings, batched, replicated),
                out_shardings=(batched, replicated, replicated),
            )
        return jax.jit(fn)

    def _get_generate_fn(self, cache_key: tuple, **kwargs):
        if cache_key not in self._fn_cache:
            self._fn_cache[cache_key] = self._build_generate_fn(**kwargs)
        return self._fn_cache[cache_key]

    # --------------------------------------------------------------
    # Public API (reference generate_music.py / service_generate.py)
    # --------------------------------------------------------------

    def generate_music(
        self,
        captions: Union[str, Sequence[str]],
        lyrics: Union[str, Sequence[str]] = "",
        *,
        metas: Union[None, textlib.MetaLike, Sequence[textlib.MetaLike]] = None,
        task: str = "text2music",
        instructions: Union[None, str, Sequence[str]] = None,
        vocal_languages: Union[str, Sequence[str]] = "en",
        audio_duration: Optional[float] = None,
        batch_size: Optional[int] = None,
        seeds: Union[None, int, str, Sequence[int]] = None,
        use_random_seed: bool = False,
        # editing inputs
        src_audio: Union[None, str, np.ndarray] = None,
        refer_audios: Union[None, str, np.ndarray,
                            Sequence[Union[str, np.ndarray]]] = None,
        audio_code_hints: Union[None, str, Sequence[Optional[str]]] = None,
        repainting_start: Union[None, float, Sequence[Optional[float]]] = None,
        repainting_end: Union[None, float, Sequence[Optional[float]]] = None,
        audio_cover_strength: float = 1.0,
        cover_noise_strength: float = 0.0,
        # sampler controls
        infer_method: str = "ode",
        shift: float = 3.0,
        infer_steps: int = 8,
        timesteps: Optional[Sequence[float]] = None,
        guidance_scale: float = 7.0,
        use_adg: bool = False,
        cfg_interval: tuple = (0.0, 1.0),
        # output
        latent_shift: float = 0.0,
        latent_rescale: float = 1.0,
        normalize: bool = True,
        normalize_db: float = -1.0,
        save_dir: Optional[str] = None,
        audio_format: str = "wav",
        key: Optional[jax.Array] = None,
        initial_noise: Optional[np.ndarray] = None,
        track_name: Optional[str] = None,
        track_classes: Optional[Sequence[str]] = None,
        progress_callback=None,
    ) -> GenerationResult:
        if not self.initialized:
            raise RuntimeError("call initialize_service() first")
        if infer_method not in ("ode", "sde"):
            # reference diffusion.py rejects unknown methods rather than
            # silently sampling with a different one
            raise ValueError(
                f"invalid infer_method {infer_method!r}: expected 'ode' or "
                f"'sde'")
        t_start = time.time()
        time_costs: Dict[str, float] = {}
        cfg = self.cfg

        # ---- normalize request lists
        from acestep_tpu.runtime_config import (
            effective_batch, effective_duration)
        if isinstance(captions, str):
            captions = [captions]
        B = batch_size or len(captions)
        B = effective_batch(B, self.tier)    # tier guard (ref memory_utils)
        B_req = B
        if self.mesh is not None:
            # SPMD programs need the batch divisible by dp; pad with repeats
            # of the request rows (trimmed from every output below) so an
            # operator-facing mesh serves ANY batch size, batch 1 included
            dp = self.mesh.shape["dp"]
            B = -(-B // dp) * dp
        if audio_duration and audio_duration > 0:
            audio_duration = effective_duration(audio_duration, self.tier)
        captions = (list(captions) * B)[:B]
        lyrics = [lyrics] * B if isinstance(lyrics, str) else (list(lyrics) * B)[:B]
        if metas is None or isinstance(metas, (str, dict)):
            metas = [metas] * B
        metas = (list(metas) * B)[:B]
        if isinstance(vocal_languages, str):
            vocal_languages = [vocal_languages] * B
        vocal_languages = (list(vocal_languages) * B)[:B]
        if audio_code_hints is None or isinstance(audio_code_hints, str):
            audio_code_hints = [audio_code_hints] * B
        audio_code_hints = (list(audio_code_hints) * B)[:B]
        seeds_list = textlib.prepare_seeds(B, seeds, use_random_seed)

        # parse hints FIRST; only actually-valid codes engage cover mode
        # (a junk hint string must not silently produce an all-zero cover)
        codes_arrays = [self._parse_code_hint(h) for h in audio_code_hints]
        has_codes = any(c is not None and len(c) for c in codes_arrays)
        if not has_codes:
            codes_arrays = [None] * B
        if task == "text2music" and has_codes:
            task = "cover"       # reference auto-switch (generate_music_request.py:47-56)
        if isinstance(instructions, str):
            instructions = [instructions] * B
        if instructions is None:
            instructions = [textlib.resolve_instruction(
                task, track_name=track_name, track_classes=track_classes)] * B
        instructions = (list(instructions) * B)[:B]
        instructions = [i or textlib.resolve_instruction(
            task, track_name=track_name, track_classes=track_classes)
            for i in instructions]

        # ---- source audio -> latents & frame geometry
        t0 = time.time()

        # normalize repaint coordinates to per-row lists (the reference
        # service API accepts per-item lists, service_generate_request.py:
        # 86-101; scalars broadcast). A negative end means "to the end"
        # (padding_utils.py:42-44 treats None and <0 identically).
        def _norm_repaint(v):
            if v is None:
                return [None] * B
            if isinstance(v, (int, float)):
                v = [float(v)]
            v = [None if x is None else float(x) for x in v]
            if not v:                 # [] means "no repaint", not a crash
                return [None] * B
            return (list(v) * B)[:B]

        rs_list = _norm_repaint(repainting_start)
        re_list = [None if (x is not None and x < 0) else x
                   for x in _norm_repaint(repainting_end)]
        repaint_any = any(s is not None or e is not None
                          for s, e in zip(rs_list, re_list))

        src_latent_single = None
        if (src_audio is not None and task == "text2music"
                and not repaint_any):
            # reference generate_music_request.py:118: text2music does not
            # use src_audio — conditioning on it anyway would silently turn
            # a pure-text request into a quasi-cover. (Repaint coordinates
            # signal repaint intent here even under the default task; the
            # reference requires task_type="repaint" for those.)
            src_audio = None
        if src_audio is not None and has_codes:
            # reference :121: audio codes win over src_audio (encoding the
            # src would also waste a VAE pass and change the derived length)
            src_audio = None
        if src_audio is not None:
            if isinstance(src_audio, str):
                src_audio = load_audio(src_audio)
            src_latent_single = self.encode_audio(np.asarray(src_audio))

        # ---- outpainting (reference padding_utils.py:37-67 + the
        # coordinate shift of conditioning_masks.py:39-41): a negative
        # repainting_start extends the song LEFT of the source audio, an
        # end beyond the source duration extends it RIGHT — the source is
        # padded with silence latents and every row's repaint span shifts
        # into the padded timeline, so only the new material regenerates.
        # The padding itself is batch-global (one src), sized by the
        # extremes across rows, like the reference's single padded target.
        if src_latent_single is not None and repaint_any:
            src_T0 = src_latent_single.shape[0]
            src_dur = src_T0 / LATENT_RATE
            left_s = max((max(0.0, -(s or 0.0)) for s in rs_list),
                         default=0.0)
            right_s = max(
                (max(0.0, (e if e is not None else src_dur) - src_dur)
                 for e in re_list), default=0.0)
            left_f = int(left_s * LATENT_RATE)
            right_f = int(right_s * LATENT_RATE)
            if left_f or right_f:
                sil = np.asarray(self._silence(max(left_f, right_f)),
                                 np.float32)
                src_latent_single = np.concatenate(
                    [sil[:left_f],
                     np.asarray(src_latent_single, np.float32),
                     sil[:right_f]], axis=0)
                # the timeline just grew for EVERY row, but implicit
                # coordinates mean "start/end of MY source": pin each
                # repaint row's None sides to the source window before
                # shifting, or a row that never asked to outpaint would
                # repaint the padding another row created
                for i in range(B):
                    if rs_list[i] is None and re_list[i] is None:
                        continue                    # not a repaint row
                    if rs_list[i] is None:
                        rs_list[i] = 0.0
                    if re_list[i] is None:
                        re_list[i] = src_dur
            if left_s > 0:
                rs_list = [None if s is None else s + left_s
                           for s in rs_list]
                re_list = [None if e is None else e + left_s
                           for e in re_list]

        if audio_duration and audio_duration > 0:
            T_req = int(audio_duration * LATENT_RATE)
        elif src_latent_single is not None:
            T_req = src_latent_single.shape[0]
        elif has_codes:
            T_req = max(len(c) for c in codes_arrays if c is not None) * \
                cfg.pool_window_size
        else:
            # an unspecified length draws a random 10-120 s song, like the
            # reference (padding_utils.py:78-81) — not a fixed default
            T_req = int(random.uniform(10.0, 120.0) * LATENT_RATE)
        # the tier duration ceiling applies however the length was derived
        # (explicit duration, src-audio length, or code hints) — a 600 s
        # upload on a small tier must not bypass the guard and OOM the
        # jitted diffusion program, which has no degradation ladder
        T_req = min(T_req, int(
            effective_duration(T_req / LATENT_RATE, self.tier) * LATENT_RATE))
        T = _pad_frames_to(T_req, self.frame_bucket, self.min_frames)

        silence_T = self._silence(T).astype(np.float32)

        target_rows, is_cover_rows, code_rows = [], [], []
        for i in range(B):
            codes = codes_arrays[i]
            if codes is not None:
                code_rows.append(codes)
                target_rows.append(silence_T)
                is_cover_rows.append(True)
            elif src_latent_single is not None:
                row = np.asarray(src_latent_single[:T], np.float32)
                if row.shape[0] < T:
                    row = np.concatenate([row, silence_T[row.shape[0]:]], axis=0)
                target_rows.append(row)
                instr = (instructions[i] or "").lower()
                is_cover_rows.append(
                    "generate audio semantic tokens" in instr
                    and "based on the given conditions" in instr)
            else:
                target_rows.append(silence_T)
                instr = (instructions[i] or "").lower()
                is_cover_rows.append(
                    "generate audio semantic tokens" in instr
                    and "based on the given conditions" in instr)
        target_latents = np.stack(target_rows)                        # (B,T,64)

        # ---- chunk masks + repaint spans, per row (reference
        # conditioning_masks.py:35-64 — repaint coordinates are per item;
        # rows without coordinates keep the full span and their normal
        # is_cover classification)
        chunk = np.ones((B, T), np.float32)
        src_rows = []
        spans = []
        for i in range(B):
            rs_i, re_i = rs_list[i], re_list[i]
            if rs_i is not None or re_i is not None:
                rs = max(0.0, rs_i if rs_i is not None else 0.0)
                re_ = re_i if re_i is not None else T_req / LATENT_RATE
                s_lat = int(rs * SAMPLE_RATE // VAE_HOP)
                e_lat = int(re_ * SAMPLE_RATE // VAE_HOP)
                s_lat = max(0, min(s_lat, T - 1))
                e_lat = max(s_lat + 1, min(e_lat, T))
                chunk[i] = 0.0
                chunk[i, s_lat:e_lat] = 1.0
                spans.append(("repainting", s_lat, e_lat))
                row = target_latents[i].copy()
                row[s_lat:e_lat] = silence_T[s_lat:e_lat]
                src_rows.append(row)
                is_cover_rows[i] = False
            else:
                spans.append(("full", 0, T))
                has_target = (codes_arrays[i] is not None
                              or src_latent_single is not None)
                src_rows.append(target_latents[i] if has_target
                                else silence_T)
        src_latents = np.stack(src_rows)
        chunk_masks = np.broadcast_to(
            chunk[..., None],
            (B, T, cfg.audio_acoustic_hidden_dim)).astype(np.float32)
        time_costs["prepare_time_cost"] = time.time() - t0

        # ---- reference audio -> packed timbre latents
        t0 = time.time()
        refer_packed, refer_order = self._prepare_refer(refer_audios, B)

        # ---- code hints -> padded array (all rows or none, static shape)
        extra_inputs = {}
        if has_codes:
            T5 = T // cfg.pool_window_size
            codes_mat = np.zeros((B, T5), np.int64)
            valid_frames = np.zeros((B,), np.int32)
            for i, c in enumerate(codes_arrays):
                if c is not None:
                    n = min(len(c), T5)
                    codes_mat[i, :n] = c[:n]
                    valid_frames[i] = n * cfg.pool_window_size
            extra_inputs["audio_codes"] = codes_mat.astype(np.int32)
            # frames beyond each row's real codes take the silence latent
            # (reference conditioning_text.py:33-55 silence-pads short
            # hints and gives hint-less rows full silence — never the
            # detokenization of the zero padding in this matrix)
            extra_inputs["audio_codes_valid_frames"] = valid_frames

        # ---- text conditioning
        actual_captions, actual_languages = textlib.extract_caption_and_language(
            metas, captions, vocal_languages)
        meta_strs = textlib.parse_metas(metas)
        text_prompts = [
            textlib.build_text_prompt(instructions[i], actual_captions[i],
                                      meta_strs[i]) for i in range(B)
        ]
        lyric_prompts = [
            textlib.format_lyrics(lyrics[i], actual_languages[i]) for i in range(B)
        ]
        text_h, text_m = self.text_embedder.encode_text(text_prompts)
        lyric_h, lyric_m = self.text_embedder.encode_lyrics(lyric_prompts)

        has_non_cover = audio_cover_strength < 1.0
        if has_non_cover:
            nc_prompts = [
                textlib.build_text_prompt(
                    textlib.resolve_instruction("text2music"),
                    actual_captions[i], meta_strs[i]) for i in range(B)
            ]
            nc_h, nc_m = self.text_embedder.encode_text(nc_prompts)
            if nc_h.shape[1] != text_h.shape[1]:   # keep one bucket
                # device-resident embeddings pad on device (one dispatch)
                # instead of a D2H fetch + re-upload of the whole tensor
                L = text_h.shape[1]
                xp = jnp if isinstance(nc_h, jax.Array) else np
                nc_h = xp.pad(nc_h[:, :L],
                              ((0, 0), (0, max(0, L - nc_h.shape[1])), (0, 0)))
                nc_m = xp.pad(nc_m[:, :L],
                              ((0, 0), (0, max(0, L - nc_m.shape[1]))))
        time_costs["text_encode_time_cost"] = time.time() - t0
        t0 = time.time()

        # ---- schedule
        if cfg.model_version == "turbo":
            schedule = build_turbo_schedule(shift=shift, timesteps=timesteps)
        elif cfg.model_version == "sft" and timesteps is not None:
            # sft: user-supplied continuous timesteps (ref models/sft/
            # modeling_acestep_v15_base.py:1811,1864-1875)
            ts = [float(t) for t in timesteps]
            if not ts or ts[-1] != 0.0:
                ts = ts + [0.0]
            schedule = ts
        else:
            schedule = build_continuous_schedule(infer_steps, shift=shift)
        start_t = None
        if cover_noise_strength > 0.0:
            schedule, start_t = truncate_for_cover_noise(schedule,
                                                         cover_noise_strength)
        cover_steps = None
        if has_non_cover:
            n_steps = len(schedule) if cfg.model_version == "turbo" \
                else len(schedule) - 1
            cover_steps = int(n_steps * audio_cover_strength)

        # B is already dp-padded above (request rows cycled, outputs trimmed)
        silence_input = self._dev_silence(B if self.mesh is not None else 1, T)
        # the text2music hot path sends only constants for src/chunk/silence:
        # use the device-cached copies (zero link traffic after first shape)
        plain_src = (not has_codes and src_latent_single is None
                     and not repaint_any)
        chunk_all_ones = not repaint_any

        # host numpy (one transfer into the jitted program, zero eager ops)
        # EXCEPT device-resident embeddings (kept on device via _femb) and
        # the cached device constants swapped in above
        inputs = dict(
            text_hidden_states=_femb(text_h),
            text_attention_mask=np.asarray(text_m),
            lyric_hidden_states=_femb(lyric_h),
            lyric_attention_mask=np.asarray(lyric_m),
            refer_audio_packed=refer_packed,
            refer_order_mask=refer_order,
            src_latents=(self._dev_silence(B, T) if plain_src
                         else src_latents),
            chunk_masks=(self._dev_ones(B, T) if chunk_all_ones
                         else chunk_masks),
            is_covers=np.asarray(is_cover_rows, np.int32),
            silence_latent=silence_input,
            seeds=np.asarray(seeds_list, np.uint32),
            **extra_inputs,
        )
        if initial_noise is not None:
            noise_arr = np.asarray(initial_noise, np.float32)
            if noise_arr.ndim == 2:
                noise_arr = noise_arr[None]
            if noise_arr.shape[1] < T:
                noise_arr = np.pad(noise_arr, ((0, 0),
                                               (0, T - noise_arr.shape[1]),
                                               (0, 0)))
            noise_arr = noise_arr[:, :T]
            if noise_arr.shape[0] not in (1, B):
                # mesh dp-padding cycles request rows (B_req -> B above);
                # per-row noise must cycle the same way or broadcast fails
                reps = -(-B // noise_arr.shape[0])
                noise_arr = np.tile(noise_arr, (reps, 1, 1))[:B]
            inputs["initial_noise"] = np.broadcast_to(
                noise_arr, (B, T, cfg.audio_acoustic_hidden_dim)).copy()
        if has_non_cover:
            inputs["non_cover_text_hidden_states"] = _femb(nc_h)
            inputs["non_cover_text_attention_mask"] = nc_m
            inputs["silence_src"] = self._dev_silence(B, T)

        cache_key = (
            B, T, text_h.shape[1], lyric_h.shape[1], tuple(schedule),
            infer_method, round(guidance_scale, 3), use_adg, tuple(cfg_interval),
            has_non_cover, cover_steps, start_t, has_codes,
        )
        gen = self._get_generate_fn(
            cache_key, schedule=tuple(schedule), method=infer_method,
            guidance_scale=guidance_scale, use_adg=use_adg,
            cfg_interval=cfg_interval, has_non_cover=has_non_cover,
            cover_steps=cover_steps, start_t=start_t)

        time_costs["dispatch_prep_time_cost"] = time.time() - t0
        t0 = time.time()
        params = self.lora.effective_params() if self.lora is not None else self.params
        n_steps = len(schedule) if cfg.model_version == "turbo" \
            else len(schedule) - 1
        est = self.progress_estimator.estimate_seconds(
            n_steps, B, T_req / LATENT_RATE)
        from acestep_tpu.utils.progress import ProgressTicker
        with ProgressTicker(est, progress_callback or (lambda f: None)):
            x0, finite, nonzero = gen(
                params, inputs,
                key if key is not None else jax.random.PRNGKey(0))
            # sync on the two validity scalars (8 bytes): the trajectory is
            # complete once they resolve, and x0 stays ON DEVICE for the
            # VAE stage — fetching f32 latents here just to re-upload them
            # costs two link crossings (axon: block_until_ready lies, a
            # host fetch is the only real barrier)
            finite, nonzero = bool(finite), bool(nonzero)
        dt = time.time() - t0
        time_costs["diffusion_time_cost"] = dt
        self.progress_estimator.record(n_steps, B, T_req / LATENT_RATE, dt)

        # ---- validate + post (reference generate_music_decode.py)
        if not finite:
            raise RuntimeError("Generation produced NaN or Inf latents.")
        if x0.size > 0 and not nonzero:
            raise RuntimeError("Generation produced zero latents.")
        pred = x0
        if latent_shift != 0.0 or latent_rescale != 1.0:
            pred = pred * latent_rescale + latent_shift

        if B_req < B:
            pred = pred[:B_req]          # drop mesh padding rows pre-decode
            seeds_list = seeds_list[:B_req]
            spans = spans[:B_req]        # keep extra{} aligned with audios
            is_cover_rows = is_cover_rows[:B_req]

        t0 = time.time()
        audio = self.decode_latents(pred)[:, : T_req * VAE_HOP]
        time_costs["vae_decode_time_cost"] = time.time() - t0
        t0 = time.time()
        # single D2H of the user-facing latents, after both timed stages
        pred = np.asarray(pred)
        time_costs["latent_fetch_time_cost"] = time.time() - t0
        t0 = time.time()

        audios = []
        for i in range(B_req):
            a = audio[i]
            # the reference normalizes only for non-positive targets
            # (inference.py:674: enable_normalization and
            # normalization_db <= 0.0) at the requested dBFS
            if normalize and normalize_db <= 0.0:
                a = peak_normalize(a, normalize_db)
            audios.append(a)

        time_costs["postprocess_time_cost"] = time.time() - t0
        paths = None
        t_save = time.time()
        if save_dir:
            saver = AudioSaver(save_dir)
            paths = []
            for i, a in enumerate(audios):
                from acestep_tpu.utils.audio import generate_uuid_from_params
                # active LoRA state feeds the uuid (reference
                # audio_utils_uuid_test.py): otherwise the same request
                # under different adapters/scales collides on one filename
                lora_sig = ""
                if self.lora is not None:
                    lora_sig = self.lora.signature()
                uid = generate_uuid_from_params({
                    "caption": captions[i], "lyrics": lyrics[i],
                    "meta": meta_strs[i], "seed": seeds_list[i], "task": task,
                    "lora": lora_sig,
                })
                paths.append(saver.save_audio(a, uid, audio_format))

        if save_dir:
            # encoding/writing the output files (reference generation_info
            # block 2 `audio_conversion_time`)
            time_costs["audio_conversion_time"] = time.time() - t_save
        time_costs["total_time_cost"] = time.time() - t_start
        # the DiT service call under the reference's key name so the
        # generation-info summary can split LM vs DiT phases (reference
        # generation_info.py:59-71). File conversion is reported in its own
        # processing block, so subtract it here or the summary double-counts.
        time_costs["dit_total_time_cost"] = (
            time_costs["total_time_cost"]
            - time_costs.get("audio_conversion_time", 0.0))
        return GenerationResult(
            audios=audios, pred_latents=pred[:, :T_req], seeds=seeds_list,
            time_costs=time_costs, audio_paths=paths,
            extra={"task": task, "spans": spans, "frames": T_req,
                   "schedule": list(schedule),
                   "is_covers": [bool(x) for x in is_cover_rows]},
        )

    # Batch-level alias matching the reference's service_generate entry
    # (service_generate.py:21 — same capability; generate_music already
    # operates on batches here).
    service_generate = generate_music

    # --------------------------------------------------------------
    # Shape prewarming (serving: compile common buckets before traffic)
    # --------------------------------------------------------------

    def warmup(self, durations: Sequence[float] = (10, 30, 60),
               batch_sizes: Sequence[int] = (1,),
               infer_steps: int = 8) -> Dict[str, float]:
        """Compile + run the generation program for common duration/batch
        buckets (first compiles cost minutes on tunneled TPUs; the
        persistent cache then makes every process fast). Returns seconds
        per warmed shape."""
        timings: Dict[str, float] = {}
        for batch in batch_sizes:
            for duration in durations:
                t0 = time.time()
                self.generate_music(
                    ["warmup"] * batch, ["[inst]"] * batch,
                    audio_duration=float(duration), batch_size=batch,
                    seeds=list(range(batch)), infer_steps=infer_steps,
                    save_dir=None)
                timings[f"b{batch}_d{int(duration)}"] = round(
                    time.time() - t0, 2)
        return timings

    # --------------------------------------------------------------
    # Audio -> 5 Hz codes (reference audio_codes.py:68-99)
    # --------------------------------------------------------------

    def audio_to_codes(self, audio: np.ndarray) -> str:
        """(samples, ch) -> '<|audio_code_N|>...' 5 Hz semantic codes."""
        return self.latents_to_codes(self.encode_audio(np.asarray(audio)))

    def latents_to_codes(self, latents: np.ndarray) -> str:
        """(T, 64) latents -> 5 Hz codes (dataset builder reuses cached
        latents from its encode stage instead of re-encoding audio)."""
        from acestep_tpu.models.dit import audio_tokenize

        latents = np.asarray(latents)
        P = self.cfg.pool_window_size
        T = latents.shape[0]
        pad = (-T) % P
        if pad:
            latents = np.concatenate(
                [latents, self._silence(pad).astype(latents.dtype)], axis=0)
        key = ("tok", latents.shape)
        if key not in self._fn_cache:
            from acestep_tpu.ops.quant import dequantize_params
            self._fn_cache[key] = jax.jit(
                lambda p, z: audio_tokenize(
                    dequantize_params(p, self.dtype), self.cfg,
                    z.astype(self.dtype)[None])[1])
        params = self.lora.effective_params() if self.lora is not None \
            else self.params
        indices = np.asarray(self._fn_cache[key](params, latents))[0]
        return "".join(f"<|audio_code_{int(i)}|>" for i in indices)

    # --------------------------------------------------------------
    # LRC lyric alignment (reference lyric_timestamp.py + scoring/)
    # --------------------------------------------------------------

    def generate_lrc(self, pred_latents: np.ndarray, caption: str,
                     lyrics: str, *, metas=None, vocal_language: str = "en",
                     infer_steps: int = 8, seed: int = 0,
                     capture: Optional[dict] = None) -> Dict[str, Any]:
        """Lyric-timestamp LRC for a generated latent sequence.

        Re-runs the decoder once at t = 1/infer_steps with cross-attention
        capture on the reference's alignment layers/heads (handler.py:129),
        DTWs the lyric-span attention, and formats LRC. Returns
        {lrc, sentences, tokens, score}."""
        from acestep_tpu.models.dit import dit_decoder_attn_capture
        from acestep_tpu.scoring.alignment import (
            DEFAULT_CAPTURE, MusicStampsAligner)
        from acestep_tpu.scoring.lyric_score import lyric_alignment_score

        capture = capture or DEFAULT_CAPTURE
        n_heads = self.cfg.num_attention_heads
        capture = {layer: [h for h in heads if h < n_heads] or [0]
                   for layer, heads in capture.items()
                   if layer < self.cfg.num_hidden_layers}
        if not capture:
            capture = {0: [0]}
        x0 = np.asarray(pred_latents, np.float32)
        if x0.ndim == 2:
            x0 = x0[None]
        # bucket T so want_lrc shares compiled programs across durations
        T_real = x0.shape[1]
        T = _pad_frames_to(T_real, self.frame_bucket, self.min_frames)
        if T > T_real:
            x0 = np.pad(x0, ((0, 0), (0, T - T_real), (0, 0)))
        B = x0.shape[0]
        q_real = -(-T_real // self.cfg.patch_size)   # real query patches

        meta_strs = textlib.parse_metas([metas] if not isinstance(metas, list)
                                        else metas)
        instruction = textlib.resolve_instruction("text2music")
        text_prompt = textlib.build_text_prompt(instruction, caption,
                                                meta_strs[0])
        lyric_prompt = textlib.format_lyrics(lyrics, vocal_language)
        text_h, text_m = self.text_embedder.encode_text([text_prompt] * B)
        lyric_h, lyric_m = self.text_embedder.encode_lyrics([lyric_prompt] * B)
        token_strs = self.text_embedder.lyric_token_strings(lyric_prompt)
        lyric_len = int(np.asarray(lyric_m)[0].sum())

        refer_packed, refer_order = self._prepare_refer(None, B)
        t_small = 1.0 / max(infer_steps, 1)

        inputs = dict(
            text_hidden_states=_femb(text_h),
            text_attention_mask=np.asarray(text_m),
            lyric_hidden_states=_femb(lyric_h),
            lyric_attention_mask=np.asarray(lyric_m),
            refer_audio_packed=refer_packed,
            refer_order_mask=refer_order,
            src_latents=self._dev_silence(B, T),
            chunk_masks=self._dev_ones(B, T),
            is_covers=np.zeros((B,), np.int32),
            silence_latent=self._dev_silence(1, T),
            x0=x0,
        )
        cache_key = ("lrc", B, T, text_h.shape[1], lyric_h.shape[1],
                     tuple(sorted((k, tuple(v)) for k, v in capture.items())),
                     round(t_small, 6))
        if cache_key not in self._fn_cache:
            cfg = self.cfg
            dtype = self.dtype

            def fn(params, inputs, key):
                from acestep_tpu.ops.quant import dequantize_params
                params = dequantize_params(params, dtype)
                cast = {
                    k: (v.astype(dtype)
                        if jnp.issubdtype(v.dtype, jnp.floating) else v)
                    for k, v in inputs.items()
                }
                x0_d = cast.pop("x0")
                enc, _m, ctx = prepare_condition(
                    params, cfg,
                    text_hidden_states=cast["text_hidden_states"],
                    text_attention_mask=cast["text_attention_mask"],
                    lyric_hidden_states=cast["lyric_hidden_states"],
                    lyric_attention_mask=cast["lyric_attention_mask"],
                    refer_audio_packed=cast["refer_audio_packed"],
                    refer_order_mask=cast["refer_order_mask"],
                    src_latents=cast["src_latents"],
                    chunk_masks=cast["chunk_masks"],
                    is_covers=cast["is_covers"],
                    silence_latent=cast["silence_latent"],
                )
                noise = jax.random.normal(key, x0_d.shape, x0_d.dtype)
                t = jnp.full((x0_d.shape[0],), t_small, x0_d.dtype)
                xt = t_small * noise + (1.0 - t_small) * x0_d
                return dit_decoder_attn_capture(
                    params, cfg, xt, t, t, ctx, enc, capture)

            self._fn_cache[cache_key] = jax.jit(fn)

        params = self.lora.effective_params() if self.lora is not None \
            else self.params
        captured = self._fn_cache[cache_key](params, inputs,
                                             jax.random.PRNGKey(seed))
        # trim padded query frames so DTW only aligns real audio
        captured = {k: np.asarray(v)[:, :, :q_real, :]
                    for k, v in captured.items()}

        aligner = MusicStampsAligner(patch_size=self.cfg.patch_size)
        tokens, sentences, lrc = aligner.get_timestamps_and_lrc(
            captured, token_strs[:lyric_len], lyric_len=lyric_len)
        score = lyric_alignment_score(captured, lyric_len)
        return {"lrc": lrc, "sentences": sentences, "tokens": tokens,
                "score": score}

    # --------------------------------------------------------------
    # helpers
    # --------------------------------------------------------------

    @staticmethod
    def _parse_code_hint(hint) -> Optional[np.ndarray]:
        """'<|audio_code_123|>...' or int list -> int array clamped to
        [0, 63999] (reference audio_codes.py:20-45)."""
        if hint is None or (isinstance(hint, str) and not hint.strip()):
            return None
        if isinstance(hint, str):
            import re
            vals = [int(v) for v in re.findall(r"<\|audio_code_(\d+)\|>", hint)]
            if not vals:
                return None
        else:
            vals = [int(v) for v in hint]
            if not vals:
                # an empty SEQUENCE is 'no hint', like None/'' — returning
                # an empty array would classify the row as a cover
                # conditioned on an all-zero code matrix downstream
                return None
        return np.clip(np.asarray(vals, np.int64), 0, 63999)

    def _prepare_refer(self, refer_audios, B: int):
        """Reference audio list -> packed (N, 750, 64) latents + order mask
        (reference conditioning_embed.infer_refer_latent; silence rows use the
        silence latent)."""
        RF = self.refer_frames
        silence_ref = self._silence(RF).astype(np.float32)
        if refer_audios is None:
            packed = np.broadcast_to(
                silence_ref[None],
                (B, RF, self.cfg.audio_acoustic_hidden_dim)).copy()
            return packed, np.arange(B, dtype=np.int32)
        if isinstance(refer_audios, (str, np.ndarray)):
            refer_audios = [refer_audios]
        rows, order = [], []
        cache: Dict[int, np.ndarray] = {}
        for b in range(B):
            ra = refer_audios[b % len(refer_audios)]
            if ra is None:
                rows.append(silence_ref)
                order.append(b)
                continue
            key = id(ra)
            if key not in cache:
                if isinstance(ra, str):
                    ra = load_audio(ra)
                ra = np.asarray(ra)
                if ra.size == 0 or np.all(np.abs(ra) < 1e-6):
                    # reference generate_music_request.py:99-110: a silent/
                    # empty reference upload fails the request explicitly
                    # instead of silently conditioning on nothing
                    raise ValueError(
                        "Reference audio is invalid, unreadable, or "
                        "silent. Please upload a valid audible audio "
                        "file.")
                ra = self._sample_reference_segments(ra)
                z = self.encode_audio(ra)[:RF]
                if z.shape[0] < RF:
                    z = np.concatenate(
                        [z, silence_ref[z.shape[0]:]], axis=0)
                cache[key] = z.astype(np.float32)
            rows.append(cache[key])
            order.append(b)
        return np.stack(rows), np.asarray(order, np.int32)

    @staticmethod
    def _sample_reference_segments(audio: np.ndarray,
                                   budget_s: int = 30, seg_s: int = 10,
                                   sr: int = SAMPLE_RATE) -> np.ndarray:
        """30 s timbre budget: 10 s from head/middle/tail of longer audio;
        shorter audio LOOPS to fill the budget (reference io_audio.py:92-93
        repeats it) — silence-padding instead would dilute the timbre
        conditioning to mostly-silence for short references.

        Deliberate deviation: the reference draws a RANDOM offset inside
        each third (io_audio.py process_reference_audio, unseeded
        random.randint) so the same request can condition on different
        windows across retries; here the windows are fixed at the start
        of each third, keeping generation deterministic per seed and the
        result uuid honest about its inputs."""
        n = audio.shape[0]
        budget = budget_s * sr
        if n < budget:
            reps = -(-budget // n)
            audio = np.tile(audio, (reps, 1))[:budget]
            n = audio.shape[0]
        if n <= budget:
            return audio
        seg = seg_s * sr
        mid = (n - seg) // 2
        return np.concatenate(
            [audio[:seg], audio[mid:mid + seg], audio[-seg:]], axis=0)
