"""Semantic class palettes for visualization.

Parity: utils/labels.py in the reference -- the Semantic-SuPer classes
(Beef / Chicken / Tool) and the superv1 binary tissue palette
(nodes.py:727-737 chooses between them by dataset).
"""

from __future__ import annotations

import numpy as np

# Semantic-SuPer classes (utils/labels.py:41-43): id -> RGB in [0, 1].
SEMANTIC_CLASSES = ("Beef", "Chicken", "Tool")
ID2COLOR = np.array(
    [[0, 0, 0], [50, 50, 50], [150, 150, 150]], dtype=np.float32) / 255.0

# superv1 binary tissue palette (utils/labels.py:57).
BINARY_ID2COLOR = np.array(
    [[50, 50, 50], [255, 255, 255]], dtype=np.float32) / 255.0


def seg_to_color(seg: np.ndarray, data: str = "superv2") -> np.ndarray:
    """(H, W) labels -> (3, H, W) RGB image (nodes.py:727-737 behavior)."""
    pal = BINARY_ID2COLOR if data == "superv1" else ID2COLOR
    idx = np.clip(seg, 0, len(pal) - 1)
    return pal[idx].transpose(2, 0, 1)
