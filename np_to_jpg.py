"""Convert saved .npy attention/image artifacts to JPGs for inspection.

Equivalent of the reference's ``np_to_jpg.py``: attention grids smaller than
the target size go through the pyramid overlay first.

    python np_to_jpg.py [directory]
"""

import os
import sys

import numpy as np
from PIL import Image

from gloria_tpu.utils.viz import pyramid_attn_overlay


def np_to_jpg(directory: str = ".", size: int = 224) -> None:
    for file in os.listdir(directory):
        if not file.endswith(".npy"):
            continue
        path = os.path.join(directory, file)
        image = np.load(path)
        if image.ndim == 3 and image.shape[-1] in (1, 3):
            image = image[..., 0] if image.shape[-1] == 1 else image.mean(-1)
        if image.shape[0] != size:
            image = pyramid_attn_overlay(image, (size, size))
        image = (image - image.min()) / (image.max() - image.min() + 1e-8) * 255
        Image.fromarray(image.astype(np.uint8)).convert("RGB").save(
            path.replace(".npy", ".jpg"))


if __name__ == "__main__":
    np_to_jpg(sys.argv[1] if len(sys.argv) > 1 else ".")
