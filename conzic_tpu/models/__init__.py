from conzic_tpu.models.bert import BertForMaskedLM
from conzic_tpu.models.clip import CLIPModel, CLIPTextTower, CLIPVisionTower
from conzic_tpu.models.configs import (
    BertConfig,
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)

__all__ = [
    "BertForMaskedLM",
    "CLIPModel",
    "CLIPTextTower",
    "CLIPVisionTower",
    "BertConfig",
    "CLIPConfig",
    "CLIPTextConfig",
    "CLIPVisionConfig",
]
