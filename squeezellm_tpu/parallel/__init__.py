from squeezellm_tpu.parallel.gspmd import (  # noqa: F401
    make_mesh,
    param_partition_specs,
    shard_params,
    cache_partition_specs,
)
from squeezellm_tpu.parallel.tp_shard_map import (  # noqa: F401
    make_tp_mesh,
    shard_model_params,
    put_params,
    init_tp_cache,
    make_tp_step_fns,
)
