"""Compute kernels: matching/losses, resizes, segment aggregation, Pallas."""

from . import contrastive_loss, gloria_loss, resize, segment, segmentation_loss
from .gloria_loss import (
    attention_fn, global_loss, global_similarities, local_loss,
    local_matching, local_similarities_eval, make_word_mask,
)
