"""Clip cutting: extract [start_sec, end_sec) segments from videos.

Capability match of reference workoutdetector/scripts/cut.py:10-26
(ffmpeg CLI). The ffmpeg binary is not in this image, so cutting goes
through the native libav decoder + cv2 writer instead of a subprocess.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

from workoutdetector_tpu.data.video import VideoReader, write_video


def cut_video(input_dir: str, vid: str, start_sec: float, end_sec: float,
              output_dir: str, fps: float = 30.0) -> str:
    """Cut one clip → `{output_dir}/{vid}_{start_sec}.mp4` at 30 fps."""
    input_file = osp.join(input_dir, f"{vid}.mp4")
    os.makedirs(output_dir, exist_ok=True)
    output_file = osp.join(output_dir, f"{vid}_{start_sec}.mp4")
    with VideoReader(input_file) as r:
        src_fps = r.fps or fps
        frames = r.read_raw()
    s = int(start_sec * src_fps)
    e = min(int(end_sec * src_fps), len(frames))
    if e <= s:
        raise ValueError(f"empty cut [{start_sec}, {end_sec}) for {input_file}")
    # resample to the output fps (the reference's ffmpeg '-filter:v fps=30')
    # — writing src-fps frames at 30 fps would change clip duration/speed
    # for non-30fps sources and skew every downstream annotation
    import numpy as np
    n_out = max(1, int(round((e - s) * fps / src_fps)))
    idx = s + np.minimum(
        (np.arange(n_out) * src_fps / fps).astype(np.int64), e - s - 1)
    write_video(output_file, frames[idx], fps)
    return output_file


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Cut video clips from a csv")
    parser.add_argument("-i", "--input-dir", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--csv", required=True,
                        help="csv with columns vid,start_sec,end_sec")
    args = parser.parse_args(argv)
    import pandas as pd
    df = pd.read_csv(args.csv)
    for _, row in df.iterrows():
        cut_video(args.input_dir, row["vid"], row["start_sec"], row["end_sec"],
                  args.output)


if __name__ == "__main__":
    main()
