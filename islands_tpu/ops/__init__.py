from islands_tpu.ops import distance

__all__ = ["distance"]
