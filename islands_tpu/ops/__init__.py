"""Device ops: batched distance kernels + Pallas TPU kernels."""

from islands_tpu.ops import distance
from islands_tpu.ops.pallas_kernels import adc_scan, pairwise_l2, pairwise_neg_dot

__all__ = ["adc_scan", "distance", "pairwise_l2", "pairwise_neg_dot"]
