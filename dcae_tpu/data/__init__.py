"""Data tooling (L7)."""

from dcae_tpu.data.datasets import (ImageFolder, center_crop, list_images,
                                    load_image, random_crop)

__all__ = ["ImageFolder", "list_images", "load_image", "random_crop",
           "center_crop"]
