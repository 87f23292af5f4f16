from acestep_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    dit_param_pspecs,
    lm_param_pspecs,
    make_mesh,
    parse_mesh_spec,
    replicated,
    shard_pytree,
)
