from squeezellm_tpu.quantize.kmeans import (  # noqa: F401
    weighted_kmeans_batched,
    fit_module_luts,
)
from squeezellm_tpu.quantize.outliers import (  # noqa: F401
    remove_outliers,
    remove_outliers_by_sensitivity,
    remove_outliers_by_threshold,
)
from squeezellm_tpu.quantize.outlier_config import make_outlier_config  # noqa: F401
