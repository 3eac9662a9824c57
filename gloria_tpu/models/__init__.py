"""Model registry (reference: gloria/models/__init__.py:8-12)."""

from . import bert, gloria_model, resnet, text_model, vision_model
from .bert import BertConfig, BertModel
from .gloria_model import GLoRIA
from .text_model import TextEncoder
from .vision_model import ImageClassifier, ImageEncoder, PretrainedImageClassifier

IMAGE_MODELS = {
    "pretrain": ImageEncoder,
    "classification": PretrainedImageClassifier,
}
