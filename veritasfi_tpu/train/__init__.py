from .contrastive import ContrastiveTrainer, info_nce
from .m3 import M3ContrastiveTrainer
from .reranker_lora import (
    LoRATrainConfig,
    RerankerTrainer,
    anonymize_company,
    group_loss,
    param_sharding_rules,
)

__all__ = ["LoRATrainConfig", "RerankerTrainer", "group_loss",
           "param_sharding_rules", "anonymize_company",
           "ContrastiveTrainer", "info_nce", "M3ContrastiveTrainer"]
