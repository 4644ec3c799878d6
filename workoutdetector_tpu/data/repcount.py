"""RepCount annotation layer.

The annotation API over RepCount's ``annotation.csv``: split/action
filtering, per-video rep boundaries, and count evaluation. Pure
pandas/stdlib — behavior-compatible with the reference
(workoutdetector/datasets/repcount_dataset.py:115-251) including its two
metric definitions (normalized MAE, within-one OBO) which differ from
counting.obo_mae (raw MAE, exact-one OBO); see BASELINE.md caveats.
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import pandas as pd

ACTIONS = ["situp", "push_up", "pull_up", "jump_jack", "squat", "front_raise"]


@dataclass
class RepcountItem:
    """One annotated RepCount video
    (reference repcount_dataset.py:115-139)."""

    video_path: str
    frames_path: str
    total_frames: int
    class_: str
    count: int
    reps: List[int]  # start_1, end_1, start_2, end_2, ...
    split: str
    video_name: str
    ytb_id: Optional[str] = None
    ytb_start_sec: Optional[int] = None
    ytb_end_sec: Optional[int] = None

    def __getitem__(self, key):
        return self.__dict__[key]

    def __iter__(self):
        return iter(self.__dict__.items())


@dataclass
class RepcountItemWithPred(RepcountItem):
    """RepcountItem plus prediction fields
    (reference repcount_dataset.py:141-149)."""

    pred_count: int = 0
    pred_reps: Optional[List[int]] = None
    mae: float = 0.0
    obo_acc: bool = False
    model_type: Optional[str] = None


class RepcountHelper:
    """Annotation helper: filter annotation.csv by split/action, evaluate
    count predictions (reference repcount_dataset.py:152-251).

    Args:
        data_root: dataset root, e.g. '.../data/RepCount'
        anno_file: path to annotation.csv
    """

    def __init__(self, data_root: str, anno_file: str):
        self.data_root = data_root
        self.anno_file = anno_file
        self.classes = list(ACTIONS)

    def get_rep_data(self,
                     split: List[str] = ("test",),
                     action: Optional[List[str]] = ("situp",)
                     ) -> Dict[str, RepcountItem]:
        """``action=None`` filters by split ONLY — every csv row regardless
        of class (incl. classes outside the cleaned 6-action list, NaN
        cells, or a class literally named 'all') — the reference
        get_video_list's semantics (repcount_dataset.py:333-385)."""
        assert len(split) > 0, 'split must be specified, e.g. ["train", "val"]'
        split = [x.lower() for x in split]
        df = pd.read_csv(self.anno_file, index_col=0)
        df = df[df["split"].isin(split)]
        if action is not None:
            assert len(action) > 0, 'action must be specified, e.g. ["pull_up"]'
            action = [x.lower() for x in action]
            if "all" in action:
                action = self.classes
            df = df[df["class_"].isin(action)]
        df = df.reset_index(drop=True)
        ret: Dict[str, RepcountItem] = {}
        for _, row in df.iterrows():
            name = row["name"]
            name_no_ext = name.split(".")[0]
            split_ = row["split"]
            video_path = os.path.join(self.data_root, "videos", split_, name)
            frames_path = os.path.join(self.data_root, "rawframes", split_, name_no_ext)
            total_frames = -1
            if os.path.isdir(frames_path):
                total_frames = len(os.listdir(frames_path))
            # NaN/non-numeric count cells behave like the reference's
            # ``count > 0`` check on NaN (simply False): no count, no reps.
            count_cell = row["count"]
            count = int(count_cell) if pd.notna(count_cell) else 0
            reps = [int(x) for x in str(row["reps"]).split()] if count > 0 else []
            ret[name] = RepcountItem(video_path, frames_path, total_frames,
                                     row["class_"], count, reps, split_, name,
                                     row.get("vid"), row.get("start"), row.get("end"))
        return ret

    def eval_count(
        self,
        pred_reps: Dict[str, int],
        split: List[str] = ("test",),
        action: List[str] = (),
    ) -> Tuple[float, float, Dict[str, RepcountItemWithPred]]:
        """Normalized-MAE / within-one-OBO count evaluation.

        MAE is |pred-gt|/gt per video (0 when gt == 0); OBO counts |diff|<=1.
        NOTE (parity caveat, kept intentionally): totals are divided by the
        number of items in the selected split/action — not by the number of
        predictions — matching reference repcount_dataset.py:251.
        """
        items = self.get_rep_data(split=split, action=action)
        total_mae = 0.0
        total_obo = 0.0
        pred_items: Dict[str, RepcountItemWithPred] = {}
        for name, count in pred_reps.items():
            gt_count = items[name].count
            diff = abs(count - gt_count)
            mae = diff / gt_count if gt_count > 0 else 0.0
            obo = diff <= 1
            total_mae += mae
            total_obo += obo
            pred_items[name] = RepcountItemWithPred(**items[name].__dict__,
                                                    pred_count=count,
                                                    pred_reps=[],
                                                    mae=mae,
                                                    obo_acc=obo)
        return total_mae / len(items), total_obo / len(items), pred_items


def build_label_list(data_root: str,
                     anno_file: str,
                     actions: List[str],
                     out_dir: str,
                     overwrite: bool = False) -> None:
    """Write train/val/test.txt image lists of first-rep start/mid frames
    with class ids 2k / 2k+1 (reference repcount_dataset.py:18-85)."""
    for a in actions:
        assert a in ACTIONS, f"action {a} not in {ACTIONS}"
    paths = {s: osp.join(out_dir, f"{s}.txt") for s in ("train", "val", "test")}
    if not osp.exists(out_dir):
        os.makedirs(out_dir)
    elif not overwrite and any(osp.isfile(p) for p in paths.values()):
        return
    tmpl = "img_{:05d}.jpg"  # frame files are 1-indexed
    helper = RepcountHelper(data_root=data_root, anno_file=anno_file)
    data = helper.get_rep_data(split=["train", "val", "test"], action=actions)
    handles = {s: open(p, "w") for s, p in paths.items()}
    try:
        for item in data.values():
            if item.count < 1:
                continue
            start_idx, end_idx = item.reps[0], item.reps[1]
            mid_idx = (start_idx + end_idx) // 2
            cls_idx = actions.index(item.class_)
            rel_path = osp.relpath(item.frames_path, data_root)
            f = handles[item.split]
            f.write(f"{rel_path}/{tmpl.format(start_idx + 1)} {cls_idx * 2}\n")
            f.write(f"{rel_path}/{tmpl.format(mid_idx + 1)} {cls_idx * 2 + 1}\n")
    finally:
        for f in handles.values():
            f.close()


def build_video_label_list(data_root: str,
                           anno_file: str,
                           actions: List[str],
                           out_dir: str,
                           max_reps: int = 2,
                           overwrite: bool = False) -> None:
    """Write 4-col rawframe lists `path start length label` of per-rep
    half-segments per action plus all-{split}.txt (12-class 2k/2k+1).

    Mirrors reference scripts/build_label_list.py:41-101 build_with_start.
    """
    if not osp.exists(out_dir):
        os.makedirs(out_dir)
    helper = RepcountHelper(data_root=data_root, anno_file=anno_file)
    for split in ("train", "val", "test"):
        all_lines: List[str] = []
        for action in actions:
            data = helper.get_rep_data(split=[split], action=[action])
            lines: List[str] = []
            for item in data.values():
                if item.count < 1:
                    continue
                reps = item.reps[:max_reps * 2] if max_reps > 0 else item.reps
                rel = osp.relpath(item.frames_path, data_root)
                for start, end in zip(reps[0::2], reps[1::2]):
                    start, end = start + 1, end + 1  # frames are 1-indexed
                    mid = (start + end) // 2
                    if end - start < 2:
                        continue
                    cls = actions.index(action)
                    lines.append(f"{rel} {start} {mid - start + 1} {cls * 2}\n")
                    lines.append(f"{rel} {mid + 1} {end - mid} {cls * 2 + 1}\n")
            adir = osp.join(out_dir, action)
            os.makedirs(adir, exist_ok=True)
            ap = osp.join(adir, f"{split}.txt")
            if overwrite or not osp.isfile(ap):
                with open(ap, "w") as f:
                    # per-action lists use binary labels 0/1
                    for ln in lines:
                        parts = ln.split()
                        parts[-1] = str(int(parts[-1]) % 2)
                        f.write(" ".join(parts) + "\n")
            all_lines.extend(lines)
        allp = osp.join(out_dir, f"all-{split}.txt")
        if overwrite or not osp.isfile(allp):
            with open(allp, "w") as f:
                f.writelines(all_lines)
