"""gloria_tpu: TPU-native GLoRIA-style vision-language grounding framework.

Public surface mirrors the reference ``gloria`` package
(``/root/reference/gloria/__init__.py``): model zoo loading, similarity and
zero-shot APIs, builder factories, constants — implemented JAX/XLA-first.
"""

from . import constants
from .api import (
    GloriaModel,
    available_models,
    available_segmentation_models,
    generate_chexpert_class_prompts,
    load_gloria,
)
from .configs import Config, load_config

__version__ = "0.1.0"
