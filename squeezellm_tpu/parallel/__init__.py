from squeezellm_tpu.parallel.gspmd import (  # noqa: F401
    make_mesh,
    param_partition_specs,
    shard_params,
    cache_partition_specs,
)
