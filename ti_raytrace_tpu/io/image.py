"""PNG read/write (host-side, PIL + numpy; replaces the reference's cv2
loop loader at Texture.py:18-34 which converted pixels one-by-one in
Python).
"""

import numpy as np
from PIL import Image


def read_image(path: str) -> np.ndarray:
    """Load an image as float32 RGB in [0,1], shape (H, W, 3), row 0 = top.
    """
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def write_png(path: str, img: np.ndarray) -> None:
    """Save a float [0,1] RGB array (H, W, 3), row 0 = top, to PNG."""
    arr = np.clip(np.asarray(img), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


def film_to_image(film_xy: np.ndarray) -> np.ndarray:
    """Convert the renderer's film layout (W, H, 3) indexed [x, y] with
    y=0 at the bottom (the reference's Taichi GUI convention,
    Example.py:44) into a standard top-row-first (H, W, 3) image."""
    return np.transpose(np.asarray(film_xy), (1, 0, 2))[::-1]


def image_to_film(img: np.ndarray) -> np.ndarray:
    """Inverse of film_to_image."""
    return np.transpose(np.asarray(img)[::-1], (1, 0, 2))
