"""Hardware correctness smoke for the fused kernels (run on the real chip).

Catches Mosaic-lowering bugs that interpret mode cannot (e.g. the default
MXU precision truncating f32 operands to bf16, or 3D-block layout bugs).
Exit code 0 iff every config matches the dense-math reference.
"""

import sys

import numpy as np
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops


def main():
    rng = np.random.default_rng(0)
    failures = 0
    for bits in (3, 4):
        for (in_f, out_f, batch) in ((640, 512, 4), (4096, 1024, 1),
                                     (4096, 1024, 20), (11008, 512, 1)):
            lut = np.sort(
                rng.normal(size=(out_f, 2**bits)).astype(np.float32), axis=1
            )
            codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
            qweight = formats.pack_codes(codes, bits)
            w_dense = formats.dequant_np(codes, lut)
            x = rng.normal(size=(batch, in_f)).astype(np.float32)
            for mode in ("select", "gather"):
                y = pallas_ops.lut_matmul(
                    jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut),
                    bits, b_blk=8, w_blk=128, o_blk=512, mode=mode,
                )
                err = np.abs(np.asarray(y) - x @ w_dense).max()
                ok = err < 5e-4 * np.sqrt(in_f / 640)
                failures += not ok
                print(
                    f"{'OK ' if ok else 'BAD'} bits={bits} in={in_f} "
                    f"out={out_f} b={batch} {mode}: err {err:.2e}",
                    flush=True,
                )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
