"""SqueezeLLM-TPU: a TPU-native Dense-and-Sparse quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SqueezeLLM
(reference: SqueezeAILab/SqueezeLLM): sensitivity-weighted non-uniform
(k-means) 3/4-bit per-output-channel codebook quantization with a sparse
outlier sidecar, fused LUT-dequant matmul kernels, and a quantization
pipeline (chunk -> outlier config -> NUQ k-means -> pack).

Layer map (TPU-first, not a port):
  formats       packed-weight / LUT / sparse tensor specs (+ reference ckpt layout)
  ops           LUT-dequant matmul: pure-XLA reference path + fused Pallas kernels
  models        functional LLaMA/Mistral/OPT decoders in jnp (no HF runtime dep)
  quantize      offline pipeline: chunk, outlier config, weighted k-means, pack
  parallel      mesh / NamedSharding / shard_map tensor-parallel decode
  engine        prefill+decode loop, KV cache, benchmark harness
  eval          GPTQ-protocol perplexity evaluator
"""

__version__ = "0.1.0"

from squeezellm_tpu import formats  # noqa: F401
