"""Projected multi-chip decode scaling from measured single-chip numbers.

No multi-chip slice is attachable in this environment (the TP/DP paths
run on the 8-device CPU mesh and the driver dryrun instead), so this is
an explicit, assumption-labeled analytical projection — NOT a
measurement. Single-chip terms are measured (see README); collective
costs use public v5e ICI characteristics.

Model (per decode token, LLaMA-2-7B shapes, Megatron TP over `tp` chips):
  lut      = max(VPU_ops / VPU_RATE, bytes / HBM_BW) / tp
             (weights are row/column-sharded: both the streamed bytes and
             the dequant VPU work divide by tp)
  sparse   = sparse_ms / tp          (sidecar partitioned per shard)
  lm_head  = lm_head_ms / tp         (column-parallel + gather)
  other    = other_ms                (norms/rope/attention/argmax: NOT
             sharded at decode batch 1 — head-parallel attention divides
             some of it, conservatively kept whole)
  coll     = 2 * n_layers * (ICI_LAT + act_bytes / ICI_BW) + lm_coll
             (two psums per layer at the Megatron cut points, plus one
             all-gather for the sharded lm_head logits)

Run: python scripts/scaling_model.py [3|4]
"""

import sys

N_LAYERS = 32
HIDDEN = 4096
VOCAB = 32000

# measured on v5e, round 4 (README "Measured performance",
# profile_decode.py: lut self-time 7.4 ms at w4; attention 0.18 + norms
# 0.37 + tail ~= 0.6 ms of unsharded "other"; quantized lm_head ~0.17;
# sparse folded into the lut kernels ~0.15)
MEASURED = {
    4: dict(lut_vpu_ms=7.40, lut_dma_ms=4.0, sparse_ms=0.15, lm_head_ms=0.17,
            other_ms=0.57, total_ms=8.29),
    3: dict(lut_vpu_ms=2.76, lut_dma_ms=2.98, sparse_ms=0.15, lm_head_ms=0.17,
            other_ms=0.57, total_ms=4.89),
}

ICI_LAT_S = 2e-6          # per-hop collective latency (public v5e ~1-3us)
ICI_BW = 186e9            # bytes/s per link direction (v5e: 1.6 Tbps ICI)


def project(bits: int, tp: int) -> float:
    m = MEASURED[bits]
    # calibrate the per-chip overlap inefficiency from the measured total
    serial = max(m["lut_vpu_ms"], m["lut_dma_ms"])
    slack = m["total_ms"] - (serial + m["sparse_ms"] + m["lm_head_ms"]
                             + m["other_ms"])
    lut = (serial + slack) / tp
    sparse = m["sparse_ms"] / tp
    lm = m["lm_head_ms"] / tp
    other = m["other_ms"]
    act_bytes = HIDDEN * 4
    coll_ms = 0.0
    if tp > 1:
        psum = ICI_LAT_S + act_bytes / ICI_BW
        lm_gather = ICI_LAT_S + VOCAB * 4 / ICI_BW
        coll_ms = (2 * N_LAYERS * psum + lm_gather) * 1e3
    return lut + sparse + lm + other + coll_ms


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    m = MEASURED[bits]
    print(f"w{bits}-s45 7B decode projection (measured 1-chip "
          f"{m['total_ms']:.2f} ms/tok = {1e3/m['total_ms']:.0f} tok/s)")
    print(f"{'tp':>3} {'ms/tok':>8} {'tok/s':>8} {'scaling':>8}")
    base = project(bits, 1)
    for tp in (1, 2, 4, 8):
        t = project(bits, tp)
        print(f"{tp:>3} {t:8.2f} {1e3/t:8.0f} {base/t:7.2f}x")


if __name__ == "__main__":
    main()
