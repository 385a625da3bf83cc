"""Interactive 3D-position map utilities (PIL) — marker drawing + placeholder.

Port of the map helpers at /root/reference/raytracer_studio.py:817-862 and
the placeholder generation at :1337-1342.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw

from .. import config


def ensure_map_asset(base_path: Optional[str] = None) -> str:
    """Create a placeholder surround map PNG if the asset is missing."""
    path = base_path or config.BASE_SURROUND_MAP_PATH
    if not os.path.exists(path):
        img = Image.new("RGB", (300, 200), color=(210, 210, 225))
        draw = ImageDraw.Draw(img)
        draw.text((10, 10), "Surround Map\n(Click for X/Y)", fill=(0, 0, 0))
        img.save(path)
    return path


def update_marker_image(
    x_pos: float, y_pos: float, base_image_path: Optional[str] = None
) -> Optional[str]:
    """Draw the red position marker onto the map → temp PNG path (ref :817-839)."""
    base_path = base_image_path
    if not base_path or not isinstance(base_path, str) or not os.path.exists(base_path):
        if os.path.exists(config.BASE_SURROUND_MAP_PATH):
            base_path = config.BASE_SURROUND_MAP_PATH
        else:
            return None
    try:
        x = float(x_pos)
        y = float(y_pos)
        with Image.open(base_path).convert("RGBA") as bg:
            width, height = bg.size
            if width <= 0 or height <= 0:
                return None
            x_pixel = int(np.clip(x, 0.0, 1.0) * (width - 1))
            y_pixel = int(np.clip(y, 0.0, 1.0) * (height - 1))
            out = bg.copy()
            draw = ImageDraw.Draw(out)
            radius = max(5, min(width, height) // 60)
            outline_width = max(1, radius // 4)
            bbox = (x_pixel - radius, y_pixel - radius, x_pixel + radius, y_pixel + radius)
            draw.ellipse(
                bbox,
                fill=(255, 0, 0, 200),
                outline=(255, 255, 255, 220),
                width=outline_width,
            )
        with tempfile.NamedTemporaryFile(delete=False, suffix=".png", prefix="marker_") as tmp:
            out.save(tmp.name, "PNG")
            return tmp.name
    except Exception:  # noqa: BLE001 — marker failure must not break the UI
        return None


def click_to_normalized(
    x_click: float, y_click: float, base_image_path: Optional[str] = None
) -> Optional[tuple[float, float]]:
    """Pixel click coordinates → normalized (x, y) (ref :841-854)."""
    base_path = base_image_path or config.BASE_SURROUND_MAP_PATH
    if not os.path.exists(base_path):
        return None
    with Image.open(base_path) as img:
        width, height = img.size
    if width <= 0 or height <= 0:
        return None
    return (
        float(np.clip(x_click / width, 0.0, 1.0)),
        float(np.clip(y_click / height, 0.0, 1.0)),
    )
