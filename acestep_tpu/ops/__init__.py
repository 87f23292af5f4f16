from acestep_tpu.ops.basic import (
    attention,
    init_attention,
    init_linear,
    init_mlp,
    init_rms_norm,
    linear,
    mlp,
    rms_norm,
    rope_cos_sin,
    timestep_sinusoidal,
)
from acestep_tpu.ops.masks import (
    bidirectional_mask,
    causal_mask,
    cross_mask,
    mask_to_bias,
)
from acestep_tpu.ops.fsq import (
    fsq_codes_to_indices,
    fsq_indices_to_codes,
    fsq_quantize,
)
from acestep_tpu.ops.conv import conv1d, conv1d_transpose, init_conv1d, init_conv1d_transpose
