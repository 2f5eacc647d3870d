from squeezellm_tpu.models.common import LinearSpec, apply_linear, init_kv_cache  # noqa: F401
from squeezellm_tpu.models.llama import LlamaConfig  # noqa: F401
from squeezellm_tpu.models.opt import OPTConfig  # noqa: F401
from squeezellm_tpu.models import registry  # noqa: F401
