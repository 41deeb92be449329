#!/usr/bin/env python
"""Resize a directory of scene photos into the standard per-resolution layout.

Equivalent of the reference's ``DatasetUtils/resize_images.py`` (which has
hard-coded paths); this one is a proper CLI::

    python tools/resize_images.py Assets/MyScene --name myscene \
        --resolutions 50 100 256 512

Writes ``{src}/{res}px_{n}pics/{name}_{i:03}.jpg`` for each resolution —
the directory convention the COLMAP loader and stock configs expect.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="directory containing the source images")
    p.add_argument("--name", required=True, help="output image basename")
    p.add_argument(
        "--resolutions", type=int, nargs="+", default=[50, 100, 256, 512]
    )
    args = p.parse_args()

    import cv2

    src = Path(args.src)
    names = sorted(
        f for f in os.listdir(src) if f.lower().endswith((".jpg", ".png", ".jpeg"))
    )
    if not names:
        raise SystemExit(f"no images in {src}")
    for res in args.resolutions:
        out_dir = src / f"{res}px_{len(names)}pics"
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, fname in enumerate(names):
            img = cv2.imread(str(src / fname))
            small = cv2.resize(img, dsize=(res, res), interpolation=cv2.INTER_AREA)
            cv2.imwrite(str(out_dir / f"{args.name}_{i:03}.jpg"), small)
        print(f"wrote {len(names)} images at {res}px -> {out_dir}")


if __name__ == "__main__":
    main()
