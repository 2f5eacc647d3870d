from squeezellm_tpu.ops.quant_linear import (  # noqa: F401
    QuantLinearSpec,
    quant_linear_apply,
    make_random_params,
    pack_linear,
)
from squeezellm_tpu.ops import xla_ops  # noqa: F401
