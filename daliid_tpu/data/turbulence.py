"""Turbulence-companion path resolution.

The reference pairs every clean image with a pre-rendered atmospheric-
turbulence copy named ``<stem>_turbstrength{1..5}.jpg`` in a separate
directory — with an MSMT17-specific pid prefix — at
``Person-ReID/train_encodersKIT.py:365-377`` (training) and
``Person-ReID/getFeatures.py:25-35`` (distorted-gallery eval).
"""

from __future__ import annotations

import os


def turbulence_path(
    image_path: str,
    turbulence_dir: str,
    strength: int,
    dataset: str | None = None,
) -> str:
    """Path of the pre-rendered turbulence copy of ``image_path`` at the
    given strength (1-5)."""
    stem = os.path.basename(image_path)
    stem = stem[: stem.rfind(".")] if "." in stem else stem
    if dataset == "MSMT17":
        pid_on_path = stem.split("_")[0]
        name = f"{pid_on_path}_{stem}_turbstrength{strength}.jpg"
    else:
        name = f"{stem}_turbstrength{strength}.jpg"
    return os.path.join(turbulence_dir, name)
