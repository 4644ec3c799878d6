"""Relabel tooling: mpv screenshot timestamps → CSV → rawframe lists.

Capability match of reference workoutdetector/scripts/
mpvscreenshot_process.py:11-239 and scripts/build_label_list.py:104-165
(relabeled_csv_to_rawframe_list): annotators screenshot rep boundaries in
mpv; filenames encode video + timestamp; this converts them to labeled
frame lists (FPS-scaled).
"""

from __future__ import annotations

import os
import os.path as osp
from os.path import join as osj
from typing import List, Tuple


def process_screenshot(s: str) -> Tuple[str, float]:
    """mpv screenshot filename → (video name, seconds).

    >>> process_screenshot('stu2_48.mp4_00_00_09.943.png')
    ('stu2_48.mp4', 9.943)
    """
    assert s.endswith(".png")
    name, ts = s.split(".mp4")
    name = name.split("/")[-1] + ".mp4"
    ts = ts[1:-4]
    h, m, sec = float(ts[0:2]), float(ts[3:5]), float(ts[6:])
    return name, h * 3600 + m * 60 + sec


def name_to_png(vid: str, sec: float) -> str:
    """Inverse: video name + seconds → mpv screenshot filename."""
    # single integer millisecond base so rounding can't disagree with the
    # h/m/s truncation (59.9997 must become 01_00.000, not 59.000)
    ms_total = round(sec * 1000)
    h, rem = divmod(ms_total, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{vid}_{h:02}_{m:02}_{s:02}.{ms:03}.png"


def screenshots_to_csv(path: str, csv_path: str, num_frame: int = 3) -> None:
    """Folder of mpv screenshots (train/val/test subdirs) → CSV rows
    ``name,sec,label,split``; consecutive triples are (start, mid, end) of
    one rep, labeled 0/1/0-pattern as in the reference (:38-70)."""
    assert os.path.isdir(path), f"{path} must be a dir"
    assert num_frame == 3, "num_frame must be 3"
    with open(csv_path, "w") as f:
        f.write("name,sec,label,split\n")
        for split in ("train", "val", "test"):
            d = osj(path, split)
            if not osp.isdir(d):
                continue
            shots = sorted(x for x in os.listdir(d) if x.endswith(".png"))
            for i, shot in enumerate(shots):
                name, sec = process_screenshot(shot)
                # reference :66-70 labels each (start, mid, end) triple
                # 0/1/0 — the END frame is a class-0 ('start-like') state
                label = 1 if i % num_frame == 1 else 0
                f.write(f"{name},{sec},{label},{split}\n")


def relabeled_csv_to_rawframe_list(csv_path: str,
                                   out_dir: str,
                                   video_fps: float = 30.0,
                                   num_segments_min: int = 2) -> None:
    """CSV of (name, sec, label[start/mid/end]) → 4-col rawframe lists
    ``dir start length label`` with FPS-scaled frame indices
    (reference build_label_list.py:104-165)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    os.makedirs(out_dir, exist_ok=True)
    for split in df["split"].unique():
        rows: List[str] = []
        ds = df[df["split"] == split].reset_index(drop=True)
        for name in ds["name"].unique():
            dv = ds[ds["name"] == name].sort_values("sec").reset_index(drop=True)
            # consecutive (start, mid, end) triples
            for i in range(0, len(dv) - 2, 3):
                s = int(dv.loc[i, "sec"] * video_fps) + 1  # frames are 1-based
                m = int(dv.loc[i + 1, "sec"] * video_fps) + 1
                e = int(dv.loc[i + 2, "sec"] * video_fps) + 1
                stem = name.split(".")[0]
                if m - s >= num_segments_min:
                    rows.append(f"{split}/{stem} {s} {m - s + 1} 0\n")
                if e - m >= num_segments_min:
                    rows.append(f"{split}/{stem} {m + 1} {e - m} 1\n")
        with open(osj(out_dir, f"{split}.txt"), "w") as f:
            f.writelines(rows)
