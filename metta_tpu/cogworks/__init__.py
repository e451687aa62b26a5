from metta_tpu.cogworks.curriculum import (
    BucketedTaskGenerator,
    Curriculum,
    CurriculumConfig,
    CurriculumTask,
    DiscreteRandomConfig,
    LearningProgressAlgorithm,
    LearningProgressConfig,
    SingleTaskGenerator,
    TaskGenerator,
    TaskGeneratorSet,
    bucketed,
)

__all__ = [
    "BucketedTaskGenerator", "Curriculum", "CurriculumConfig", "CurriculumTask",
    "DiscreteRandomConfig", "LearningProgressAlgorithm", "LearningProgressConfig",
    "SingleTaskGenerator", "TaskGenerator", "TaskGeneratorSet", "bucketed",
]
