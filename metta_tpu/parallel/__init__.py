from metta_tpu.parallel.distributed import DistributedTrainer, make_mesh

__all__ = ["DistributedTrainer", "make_mesh"]
