from .color import extract_luma, subtract_mean, swap_luma
from .image import load_image, write_image, write_greyscale_image

__all__ = [
    "extract_luma",
    "subtract_mean",
    "swap_luma",
    "load_image",
    "write_image",
    "write_greyscale_image",
]
