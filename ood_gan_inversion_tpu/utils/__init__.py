from .registry import (Registry, ARCH_REGISTRY, MODEL_REGISTRY, LOSS_REGISTRY,
                       METRIC_REGISTRY, DATASET_REGISTRY)
