#!/usr/bin/env python
"""Split a video into frames for dataset authoring (every Nth frame).

Equivalent of the reference's ``DatasetUtils/video2jpg.py`` as a CLI::

    python tools/video2jpg.py Assets/MyScene/video.mp4 --every 5
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video", help="path to the video file")
    p.add_argument("--every", type=int, default=5, help="save 1 frame out of N")
    p.add_argument("--out", default=None, help="output dir (default: video's dir)")
    args = p.parse_args()

    import cv2

    video = Path(args.video)
    out_dir = Path(args.out) if args.out else video.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(video))
    count = saved = 0
    success, frame = cap.read()
    while success:
        if count % args.every == 0:
            cv2.imwrite(
                str(out_dir / f"{video.stem}_{saved:05d}.jpg"), frame
            )
            saved += 1
        success, frame = cap.read()
        count += 1
    print(f"wrote {saved} frames to {out_dir}")


if __name__ == "__main__":
    main()
