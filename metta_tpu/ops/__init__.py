from metta_tpu.ops.discounted_sum import discounted_sum_reverse

__all__ = ["discounted_sum_reverse"]
