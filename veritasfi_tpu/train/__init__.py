from .reranker_lora import (
    LoRATrainConfig,
    RerankerTrainer,
    anonymize_company,
    group_loss,
    param_sharding_rules,
)

__all__ = ["LoRATrainConfig", "RerankerTrainer", "group_loss",
           "param_sharding_rules", "anonymize_company"]
